"""Deterministic hash split: disjointness, coverage, partitioning
invariance, fast/md5 parity of construction."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.curation import hash_split


def _ds(df: pd.DataFrame, blocks: int = 4):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
             .repartition(blocks)


@pytest.fixture()
def frame():
    return pd.DataFrame({"doc_id": np.arange(4000, dtype=np.int64)})


@pytest.mark.parametrize("method", ["fast", "md5"])
def test_split_partition_and_fractions(ray_session, frame, method):
    out = hash_split(_ds(frame), {"train": 0.8, "val": 0.1, "test": 0.1},
                     method=method).to_pandas()
    assert len(out) == 4000
    assert out["split"].notna().all()          # fractions sum to 1 -> total
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02


@pytest.mark.parametrize("method", ["fast", "md5"])
def test_split_partitioning_invariance(ray_session, frame, method):
    a = hash_split(_ds(frame, blocks=1), {"a": 0.5, "b": 0.5},
                   method=method).to_pandas().sort_values("doc_id")
    b = hash_split(_ds(frame, blocks=9), {"a": 0.5, "b": 0.5},
                   method=method).to_pandas().sort_values("doc_id")
    assert (a["split"].to_numpy() == b["split"].to_numpy()).all()


def test_split_remainder_is_null(ray_session, frame):
    out = hash_split(_ds(frame), {"train": 0.5}, method="fast").to_pandas()
    kept = out["split"].notna()
    assert 0.4 < kept.mean() < 0.6
    assert (out.loc[kept, "split"] == "train").all()


def test_split_rejects_over_one(ray_session, frame):
    with pytest.raises(ValueError):
        hash_split(_ds(frame), {"a": 0.7, "b": 0.7})


def test_split_consistent_with_hash_sample(ray_session, frame):
    # the fast split's 'train' interval [0, 0.5) is exactly
    # hash_sample's keep set at rate 0.5 (same coordinate) — selection
    # and splitting compose without correlation surprises
    from axosyslog_ray.curation import hash_sample

    df = frame.assign(lang="en")
    s = hash_split(_ds(df), {"train": 0.5}, method="fast").to_pandas()
    kept = hash_sample(_ds(df), rates={"en": 0.5}, key_col="doc_id",
                       strat_col="lang").to_pandas()
    train_ids = set(s.loc[s["split"] == "train", "doc_id"])
    assert train_ids == set(kept["doc_id"])


# ---------------------------------------------------------------------------
# weighted sampling coordinate (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

def test_weighted_sample_prefers_heavy_rows():
    from axosyslog_ray.curation import weighted_sample_key

    # two populations: weight 100 vs weight 1 — over many draws the
    # heavy rows must dominate the top of the key ordering
    n = 2000
    keys = np.arange(n)
    w = np.where(keys < n // 2, 100.0, 1.0)
    k = weighted_sample_key(keys, w, method="fast")
    top = np.argsort(-k)[:200]
    heavy_frac = (top < n // 2).mean()
    assert heavy_frac > 0.9


def test_weighted_sample_methods_and_edge_weights():
    from axosyslog_ray.curation import weighted_sample_key

    keys = np.array([1, 2, 3, 4])
    w = np.array([1.0, 0.0, -3.0, 2.0])
    for m in ("md5", "fast"):
        k = weighted_sample_key(keys, w, method=m)
        assert k[1] == 0.0 and k[2] == 0.0       # non-positive weights last
        assert ((0 <= k) & (k < 1)).all()
    import pytest as _pt
    with _pt.raises(ValueError):
        weighted_sample_key(keys, w, method="nope")


def test_weighted_sample_deterministic():
    from axosyslog_ray.curation import weighted_sample_key

    keys = np.arange(500)
    w = np.linspace(1, 50, 500)
    a = weighted_sample_key(keys, w, method="md5")
    b = weighted_sample_key(keys, w, method="md5")
    assert (a == b).all()
