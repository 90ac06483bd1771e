"""ann/centroid: per-label integer-exact centroid distances + outliers."""
import numpy as np
import pandas as pd
import ray.data as rd

from axosyslog_ray.ann.centroid import centroid_outliers, label_centroids


def _ds(n=120, d=8, seed=0):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 3, n).astype(np.int64)
    base = rng.randn(3, d).astype(np.float32) * 0.1
    vecs = base[labels] + rng.randn(n, d).astype(np.float32) * 0.01
    # plant one far outlier per label
    for lab in range(3):
        i = int(np.where(labels == lab)[0][0])
        vecs[i] += 5.0
    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v for v in vecs],
        "label": labels,
    })), labels, vecs


class TestLabelCentroids:
    def test_rational_mean_exact(self, ray_session):
        ds, labels, vecs = _ds()
        cents = label_centroids(ds.repartition(5))
        for lab in np.unique(labels):
            micro = np.sign(vecs[labels == lab].astype(np.float64) * 1e6) * \
                np.floor(np.abs(vecs[labels == lab].astype(np.float64) * 1e6) + 0.5)
            s = micro.astype(np.int64).sum(axis=0)
            n = int((labels == lab).sum())
            want = np.sign(s) * ((2 * np.abs(s) + n) // (2 * n))
            assert (cents[lab] == want.astype(np.int64)).all()

    def test_partitioning_invariant(self, ray_session):
        ds, _, _ = _ds()
        a = label_centroids(ds)
        b = label_centroids(ds.repartition(11))
        assert set(a) == set(b)
        for k in a:
            assert (a[k] == b[k]).all()


class TestCentroidOutliers:
    def test_planted_outliers_flagged(self, ray_session):
        ds, labels, _ = _ds()
        out = centroid_outliers(ds, q=0.95).to_pandas()
        assert len(out) == len(labels)
        # each label's planted far vector must be its max distance & flagged
        for lab in np.unique(labels):
            g = out[out["label"] == lab]
            top = g.loc[g["d2_micro2"].idxmax()]
            assert bool(top["is_outlier"])
        # roughly 5% flagged
        frac = out["is_outlier"].mean()
        assert 0.0 < frac <= 0.15
