"""MMR diversified top-k: lam=1 == plain top-k, diversity property,
determinism."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.ann.mmr import mmr_select, mmr_topk


def _emb_ds(vecs: np.ndarray, blocks: int = 3):
    import ray.data as rd

    t = pa.table({"vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
                  "embedding": pa.array(list(vecs))})
    return rd.from_arrow(t).repartition(blocks)


@pytest.fixture()
def clustered_vecs():
    rng = np.random.default_rng(12)
    # two tight clusters near the query direction + scattered rest
    base1 = rng.normal(size=8)
    base2 = rng.normal(size=8)
    vecs = []
    for i in range(10):                      # cluster A (near-dups)
        vecs.append(base1 + rng.normal(scale=0.01, size=8))
    for i in range(10):                      # cluster B (near-dups)
        vecs.append(base2 + rng.normal(scale=0.01, size=8))
    for i in range(30):                      # background
        vecs.append(rng.normal(size=8))
    return np.array(vecs), base1


def test_lam1_equals_plain_topk(ray_session, clustered_vecs):
    from axosyslog_ray.ann.brute import ann_topk

    vecs, q = clustered_vecs
    ds = _emb_ds(vecs)
    plain = ann_topk(ds, q.reshape(1, -1), k=5)
    got = mmr_topk(ds, q, k=5, pool=20, lam=1.0)
    assert list(got["vec_id"]) == list(plain["vec_id"][:5])
    np.testing.assert_allclose(got["sim"].to_numpy(),
                               plain["sim"].to_numpy()[:5])


def test_mmr_diversifies(ray_session, clustered_vecs):
    vecs, q = clustered_vecs
    ds = _emb_ds(vecs)
    plain = mmr_topk(ds, q, k=5, pool=20, lam=1.0)
    divers = mmr_topk(ds, q, k=5, pool=20, lam=0.5)

    def max_pairwise(ids):
        v = vecs[np.asarray(ids)]
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        s = v @ v.T
        np.fill_diagonal(s, -1)
        return s.max()

    # plain top-k drowns in cluster-A near-dups; MMR set must be
    # strictly less self-similar
    assert max_pairwise(divers["vec_id"]) < max_pairwise(plain["vec_id"]) - 0.05


def test_mmr_select_deterministic_ties():
    vecs = np.eye(4)
    ids = np.array([3, 1, 2, 0], dtype=np.int64)
    rel = np.array([0.5, 0.5, 0.5, 0.5])
    out = mmr_select(vecs, ids, rel, k=2, lam=1.0)
    assert list(out["id"]) == [0, 1]  # equal scores -> smallest id first


def test_mmr_select_empty_and_small_pool():
    out = mmr_select(np.zeros((0, 4)), np.array([], dtype=np.int64),
                     np.array([]), k=3)
    assert len(out) == 0
    out = mmr_select(np.eye(2), np.array([7, 9], dtype=np.int64),
                     np.array([0.9, 0.1]), k=10, lam=0.6)
    assert len(out) == 2 and list(out["rank"]) == [1, 2]


def test_mmr_rejects_bad_lambda():
    with pytest.raises(ValueError):
        mmr_select(np.eye(2), np.array([0, 1]), np.array([1.0, 0.5]),
                   k=1, lam=1.5)
