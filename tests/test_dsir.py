"""DSIR importance weights + exact-Jaccard decontamination."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.dsir import (_bucket_stream, bucket_counts, dsir_weights,
                                log_ratio_micro)
from axosyslog_ray.curation import jaccard_decontaminate


def _ds(df: pd.DataFrame, blocks: int = 4):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
             .repartition(blocks)


@pytest.fixture()
def corpora():
    rng = np.random.default_rng(11)
    cooking = [f"recipe{i}" for i in range(40)]
    legal = [f"statute{i}" for i in range(40)]
    def mk(words, n, start):
        return pd.DataFrame({
            "doc_id": np.arange(start, start + n, dtype=np.int64),
            "text": [" ".join(rng.choice(words, 30)) for _ in range(n)],
        })
    target = mk(cooking, 30, 0)                      # pure target domain
    raw = pd.concat([mk(cooking, 20, 100), mk(legal, 20, 200)],
                    ignore_index=True)
    return target, raw


def test_dsir_separates_domains(ray_session, corpora):
    target, raw = corpora
    out = dsir_weights(_ds(raw), _ds(target), num_buckets=2048).to_pandas()
    assert len(out) == 40
    w_t = out[out.doc_id < 200]["weight_micro"].to_numpy()
    w_o = out[out.doc_id >= 200]["weight_micro"].to_numpy()
    # every target-domain doc must outscore every off-domain doc
    assert w_t.min() > w_o.max()
    assert (out["n_feats"] == 59).all()  # 30 unigrams + 29 bigrams


def test_dsir_fast_md5_rank_agreement(ray_session, corpora):
    target, raw = corpora
    a = dsir_weights(_ds(raw), _ds(target), num_buckets=2048,
                     method="fast").to_pandas().sort_values("doc_id")
    b = dsir_weights(_ds(raw), _ds(target), num_buckets=2048,
                     method="md5").to_pandas().sort_values("doc_id")
    # different bucket hashes -> different micro values, same statistics:
    # both methods must induce the identical domain split and agree on
    # the overall ordering
    for out in (a, b):
        w_t = out[out.doc_id < 200]["weight_micro"].to_numpy()
        w_o = out[out.doc_id >= 200]["weight_micro"].to_numpy()
        assert w_t.min() > w_o.max()
    ra = a.weight_micro.rank().to_numpy()
    rb = b.weight_micro.rank().to_numpy()
    # within-domain order is hash noise (docs are near-identical); the
    # between-domain ordering alone bounds the rank corr near ~0.75
    assert np.corrcoef(ra, rb)[0, 1] > 0.7


def test_dsir_partitioning_invariance(ray_session, corpora):
    target, raw = corpora
    a = dsir_weights(_ds(raw, blocks=1), _ds(target, blocks=1),
                     num_buckets=1024).to_pandas().sort_values("doc_id")
    b = dsir_weights(_ds(raw, blocks=7), _ds(target, blocks=5),
                     num_buckets=1024).to_pandas().sort_values("doc_id")
    assert (a.weight_micro.to_numpy() == b.weight_micro.to_numpy()).all()


def test_bucket_counts_tree_sum(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b a", "b c"]})
    c1 = bucket_counts(_ds(df, blocks=1), 64)
    c2 = bucket_counts(_ds(df, blocks=2), 64)
    assert (c1 == c2).all()
    # 3+2 unigrams + 2+1 bigrams = 8 occurrences
    assert c1.sum() == 8


def test_log_ratio_micro_is_int_exact():
    ct = np.array([10, 0, 3], dtype=np.int64)
    cr = np.array([1, 5, 3], dtype=np.int64)
    q = log_ratio_micro(ct, cr, alpha=0.5)
    assert q.dtype == np.int64
    assert q[0] > 0 and q[1] < 0  # over/under-represented buckets


def test_bucket_stream_methods_same_shape():
    texts = np.array(["one two three", "", "solo"], dtype=object)
    for m in ("fast", "md5"):
        flat, seg = _bucket_stream(texts, 128, m)
        assert list(seg) == [0, 5, 5, 6]  # 3+2, 0, 1+0
        assert flat.max() < 128 and flat.min() >= 0


def test_jaccard_decontaminate_self_and_disjoint(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["alpha beta gamma delta epsilon",
                 "alpha beta gamma delta zeta",     # near-dup of 0
                 "one two three four five",          # disjoint
                 "alpha beta gamma delta epsilon"],  # exact dup of 0
    })
    evald = docs[docs.doc_id == 0]
    out = jaccard_decontaminate(_ds(docs, blocks=2), _ds(evald, blocks=1),
                                n=3, threshold=0.4).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "max_jaccard"] == 1.0 and bool(out.loc[0, "contaminated"])
    assert bool(out.loc[3, "contaminated"])           # exact dup
    assert out.loc[2, "max_jaccard"] == 0.0           # disjoint vocab
    # near-dup: 3-gram sets share 2 of 4 -> jaccard 0.5 >= 0.4
    assert bool(out.loc[1, "contaminated"])


def test_jaccard_decontaminate_short_docs(ray_session):
    docs = pd.DataFrame({"doc_id": np.array([0, 1], dtype=np.int64),
                         "text": ["ab", ""]})  # < n tokens -> no grams
    evald = pd.DataFrame({"doc_id": np.array([9], dtype=np.int64),
                          "text": ["x y z w"]})
    out = jaccard_decontaminate(_ds(docs, blocks=1), _ds(evald, blocks=1),
                                n=3).to_pandas().sort_values("doc_id")
    assert (out.max_jaccard == 0.0).all()
    assert not out.contaminated.any()


def test_lm_quality_scores_rare_text_ranks_low(ray_session):
    from axosyslog_ray.dsir import lm_quality_scores

    rng = np.random.default_rng(5)
    common = [f"w{i}" for i in range(20)]
    docs = pd.DataFrame({
        "doc_id": np.arange(21, dtype=np.int64),
        "text": [" ".join(rng.choice(common, 30)) for _ in range(20)]
                + ["zzqx1 zzqx2 zzqx3 " * 10],   # gibberish outlier
    })
    out = lm_quality_scores(_ds(docs), num_buckets=4096).to_pandas()
    per_tok = out.logprob_micro / out.n_feats.clip(lower=1)
    # the gibberish doc has the lowest per-token log-probability
    assert out.loc[per_tok.idxmin(), "doc_id"] == 20
    assert (out.n_feats.iloc[:20] == 30).all()


def test_lm_quality_fast_md5_rank_agreement(ray_session):
    from axosyslog_ray.dsir import lm_quality_scores

    rng = np.random.default_rng(6)
    zipf = [f"w{min(int(rng.zipf(1.5)), 50)}" for _ in range(400)]
    docs = pd.DataFrame({
        "doc_id": np.arange(30, dtype=np.int64),
        "text": [" ".join(rng.choice(np.array(zipf, dtype=object), 40))
                 for _ in range(30)],
    })
    a = lm_quality_scores(_ds(docs), num_buckets=4096,
                          method="fast").to_pandas().sort_values("doc_id")
    b = lm_quality_scores(_ds(docs), num_buckets=4096,
                          method="md5").to_pandas().sort_values("doc_id")
    assert (a.n_feats.to_numpy() == b.n_feats.to_numpy()).all()
    ra = a.logprob_micro.rank().to_numpy()
    rb = b.logprob_micro.rank().to_numpy()
    assert np.corrcoef(ra, rb)[0, 1] > 0.9


def test_jaccard_decontaminator_sparse_memory():
    """Peak memory of one batch must scale with ACTUAL overlap, not
    batch_docs x n_eval: a 5000-eval-doc / 50k-gram index vs a mostly
    disjoint 1024-doc batch must stay far below the 41 MB dense count
    matrix the pre-r5 implementation allocated (VERDICT r4 #3)."""
    import tracemalloc

    import pyarrow as pa

    from axosyslog_ray.curation import JaccardDecontaminator

    rng = np.random.default_rng(11)
    n_eval, per = 5000, 10
    e_hash = rng.integers(0, 2**63, size=n_eval * per, dtype=np.uint64)
    e_code = np.repeat(np.arange(n_eval, dtype=np.int32), per)
    order = np.argsort(e_hash, kind="stable")
    index = (e_hash[order], e_code[order],
             np.full(n_eval, per, dtype=np.int64))
    texts = [" ".join(f"w{rng.integers(0, 50_000)}" for _ in range(30))
             for _ in range(1024)]
    batch = pa.table({"doc_id": pa.array(range(1024), type=pa.int64()),
                      "text": pa.array(texts)})
    dec = JaccardDecontaminator(index=index, n=3)
    dec(batch)  # warm import/compile paths outside the measurement
    tracemalloc.start()
    out = dec(batch)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    dense_bytes = 1024 * n_eval * 8
    assert peak < dense_bytes // 4, f"peak {peak} vs dense {dense_bytes}"
    assert out.num_rows == 1024
    assert not out.column("contaminated").to_pandas().any()
