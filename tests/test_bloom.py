"""Bloom filter: distributed build, membership guarantees, FP sizing."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from axosyslog_ray.dedup.bloom import (
    bloom_params, bloom_test_u64, build_bloom_u64, gram_bloom_flags)
from axosyslog_ray.hashutil import hash_idx


def test_no_false_negatives_and_fp_rate(ray_session):
    # insert 10k keys into a filter sized for 1e-3 FPR, probe 100k others
    n = 10_000
    keys = hash_idx(np.arange(n), seed=1)
    others = hash_idx(np.arange(n, n + 100_000), seed=1)
    num_bits, k = bloom_params(n, fpr=1e-3)
    ds = rd.from_pandas(pd.DataFrame({"h": keys.astype(np.uint64)})).repartition(8)
    bm = build_bloom_u64(ds, "h", num_bits, k)
    assert bloom_test_u64(bm, keys, k).all()  # FN impossible
    fp = bloom_test_u64(bm, others, k).mean()
    assert fp < 5e-3, fp  # sized for 1e-3; 5x head-room against variance


def test_build_is_partitioning_invariant(ray_session):
    keys = hash_idx(np.arange(3000), seed=9).astype(np.uint64)
    df = pd.DataFrame({"h": keys})
    a = build_bloom_u64(rd.from_pandas(df).repartition(2), "h", 1 << 16, 5)
    b = build_bloom_u64(rd.from_pandas(df).repartition(13), "h", 1 << 16, 5)
    assert np.array_equal(a, b)


def test_gram_bloom_matches_exact_membership(ray_session):
    rng = np.random.default_rng(21)
    vocab = [f"t{i}" for i in range(50)]

    def doc(n):
        return " ".join(vocab[int(i)] for i in rng.integers(0, 50, n))

    ref_rows = [{"doc_id": i, "text": doc(30), "source": "ref"} for i in range(20)]
    cor_rows = [{"doc_id": 100 + i, "text": doc(30), "source": "c"} for i in range(40)]
    # plant one exact reference passage inside a corpus doc
    cor_rows[7]["text"] = ref_rows[3]["text"]
    corpus = rd.from_pandas(pd.DataFrame(cor_rows)).repartition(4)
    ref = rd.from_pandas(pd.DataFrame(ref_rows)).repartition(3)
    out = (gram_bloom_flags(corpus, ref, n=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # exact oracle in-process
    def grams(t):
        w = t.split()
        return [" ".join(w[i:i + 3]) for i in range(len(w) - 2)]

    ref_set = set(g for r in ref_rows for g in grams(r["text"]))
    for _, row in out.iterrows():
        t = next(r["text"] for r in cor_rows if r["doc_id"] == row["doc_id"])
        gs = grams(t)
        assert row["n_grams"] == len(gs)
        assert row["n_hit"] == sum(g in ref_set for g in gs)
    full = out.set_index("doc_id").loc[107]
    assert full["n_hit"] == full["n_grams"]  # the planted copy hits everywhere
