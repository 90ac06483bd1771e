"""Round-3 LLM-pipeline operators: vocabulary stats, tf-idf keywords,
sequence packing, chunk-level dedup, distributed k-means + SemDeDup."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from axosyslog_ray.curation import pack_sequences, token_counts
from axosyslog_ray.dedup.chunks import dedup_chunks
from axosyslog_ray.textstats.vocab import tfidf_topk, vocab_topk


def _docs_ds(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows]),
    }))


def _emb_ds(vecs):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    }))


class TestVocab:
    def test_topk_counts_and_ties(self, ray_session):
        ds = _docs_ds([
            (1, "apple banana apple"),
            (2, "banana cherry APPLE"),
            (3, "date! cherry?"),
        ])
        out = vocab_topk(ds, k=10).to_pandas()
        got = dict(zip(out["word"], out["cnt"]))
        assert got == {"apple": 3, "banana": 2, "cherry": 2, "date": 1}
        # desc count, asc word on ties
        assert list(out["word"]) == ["apple", "banana", "cherry", "date"]

    def test_limit_applies(self, ray_session):
        ds = _docs_ds([(1, "a b c d e f g")])
        assert vocab_topk(ds, k=3).count() == 3

    def test_tfidf_rare_word_wins(self, ray_session):
        ds = _docs_ds([
            (1, "common rareword common"),
            (2, "common other other"),
            (3, "common common plain"),
        ])
        out = tfidf_topk(ds, k=1).to_pandas()
        top = out.set_index("doc_id")["word"]
        # 'common' appears in every doc (df=3); doc-unique words win
        assert top.loc[1] == "rareword"
        assert top.loc[2] == "other"
        assert top.loc[3] == "plain"
        r = out[out["doc_id"] == 1].iloc[0]
        assert r["tf"] == 1 and r["df"] == 1 and r["score"] == 1_000_000

    def test_tfidf_k_and_tie_order(self, ray_session):
        ds = _docs_ds([(1, "zeta alpha"), (2, "unrelated words")])
        out = tfidf_topk(ds, k=2).to_pandas()
        d1 = out[out["doc_id"] == 1]
        # equal scores tie-break word-ascending
        assert list(d1.sort_values(["score", "word"],
                                   ascending=[False, True])["word"]) == ["alpha", "zeta"]


class TestPackSequences:
    def test_prefix_sum_bins(self, ray_session):
        # token counts: 3, 4, 5 -> starts 0, 3, 7 -> bins 0, 0, 1 (window 5)
        ds = _docs_ds([(0, "a b c"), (1, "d e f g"), (2, "h i j k l")])
        out = pack_sequences(ds, window=5, range_size=2).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        assert list(out["n_tokens"]) == [3, 4, 5]
        assert list(out["seq_bin"]) == [0, 0, 1]

    def test_range_boundaries_dont_break_offsets(self, ray_session):
        # every doc has 2 tokens; with window 4, bins = doc_id // 2
        rows = [(i, "tok tok") for i in range(20)]
        out = pack_sequences(_docs_ds(rows), window=4, range_size=3).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        assert list(out["seq_bin"]) == [i // 2 for i in range(20)]

    def test_token_counts_null_and_empty(self, ray_session):
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["one two", None]),
        }))
        out = token_counts(ds).to_pandas().sort_values("doc_id")
        assert list(out["n_tokens"]) == [2, 0]


class TestDedupChunks:
    def test_first_occurrence_survives(self, ray_session):
        boiler = "this license header repeats " * 5  # 20 tokens -> 1 chunk
        ds = _docs_ds([
            (1, boiler + "unique tail one two"),
            (2, boiler + "different unique tail here"),
        ])
        out = dedup_chunks(ds, chunk_tokens=20).to_pandas()
        key = set(zip(out["doc_id"], out["chunk_id"]))
        assert (1, 0) in key and (2, 0) not in key  # boilerplate deduped
        assert (1, 1) in key and (2, 1) in key      # unique tails survive

    def test_within_doc_duplicates(self, ray_session):
        ds = _docs_ds([(5, "x y " * 20)])  # two identical 20-token chunks
        out = dedup_chunks(ds, chunk_tokens=20).to_pandas()
        assert list(out["chunk_id"]) == [0]


class TestKMeans:
    def _clustered(self, n_per=30, d=8, seed=3):
        rng = np.random.default_rng(seed)
        centers = np.eye(4, d) * 0.9
        vecs = np.vstack([
            c + rng.normal(scale=0.02, size=(n_per, d)) for c in centers
        ]).astype(np.float32)
        # ids 0..3 = one seed point per true cluster (init uses id < k)
        order = np.concatenate([np.arange(4) * n_per,
                                np.setdiff1d(np.arange(4 * n_per),
                                             np.arange(4) * n_per)])
        return vecs[order]

    def test_recovers_planted_clusters(self, ray_session):
        from axosyslog_ray.ann.kmeans import kmeans_labels

        vecs = self._clustered()
        labels, cents = kmeans_labels(_emb_ds(vecs), k=4, iters=3)
        out = labels.to_pandas().sort_values("vec_id")
        assert cents.dtype == np.int64
        # each true cluster is label-pure
        lab = out["cluster"].to_numpy()
        from axosyslog_ray.ann.kmeans import _assign_ids, _quantized
        truth = _assign_ids(
            _quantized(pa.array([list(map(float, v)) for v in vecs],
                                type=pa.list_(pa.float32()))),
            np.floor(vecs[:4].astype(np.float64) * (1 << 20) + 0.5).astype(np.int64))
        # with well-separated planted clusters the seed assignment is final
        assert (lab == truth).all()
        assert len(np.unique(lab)) == 4

    def test_batching_invariance(self, ray_session):
        """Assignments are exact integer math — identical under different
        block shapes (the float-matmul formulation provably was NOT)."""
        from axosyslog_ray.ann.kmeans import kmeans_labels

        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(200, 16)).astype(np.float32)
        a = kmeans_labels(_emb_ds(vecs), k=4, iters=2)[0].to_pandas()
        ds_many = _emb_ds(vecs).repartition(17)
        b = kmeans_labels(ds_many, k=4, iters=2)[0].to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("vec_id").reset_index(drop=True),
            b.sort_values("vec_id").reset_index(drop=True))

    def test_semdedup_drops_near_copies(self, ray_session):
        from axosyslog_ray.ann.kmeans import semdedup

        # random gaussians: pairwise cosine well below 0.9 at d=32
        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(120, 32)).astype(np.float32)
        n = len(vecs)
        # append two near-copies of existing rows (later ids -> dropped)
        dup = np.vstack([vecs[10] * 1.0001, vecs[50] * 0.9999]).astype(np.float32)
        all_vecs = np.vstack([vecs, dup])
        out = semdedup(_emb_ds(all_vecs), k=4, iters=2, threshold=0.9).to_pandas()
        kept = set(out["vec_id"])
        assert n not in kept and (n + 1) not in kept
        # the earlier originals survive
        assert 10 in kept and 50 in kept
        # nothing else dropped (no other pair is above the threshold)
        assert len(kept) == n


def test_cluster_balanced_sample_caps_and_determinism(ray_session):
    import ray.data as rd

    from axosyslog_ray.ann.kmeans import cluster_balanced_sample

    rng = np.random.default_rng(9)
    # three well-separated blobs of very different sizes
    blobs = [rng.normal(c, 0.05, size=(n, 8))
             for c, n in ((0.0, 200), (5.0, 40), (10.0, 12))]
    X = np.vstack(blobs)
    df = pd.DataFrame({"vec_id": np.arange(len(X), dtype=np.int64),
                       "embedding": [r.astype(np.float32).tolist() for r in X]})

    def run(blocks):
        ds = rd.from_pandas(df).repartition(blocks)
        return cluster_balanced_sample(ds, k=3, iters=4, cap=20,
                                       method="fast").to_pandas() \
            .sort_values(["cluster", "rk"]).reset_index(drop=True)

    out = run(3)
    per = out.groupby("cluster").size()
    # every cluster capped; ranks dense 1..n within each cluster
    assert (per <= 20).all()
    assert (out.groupby("cluster")["rk"].max() == per).all()
    assert (out.groupby("cluster")["rk"].min() == 1).all()
    # partitioning-invariant (deterministic coordinate + total order)
    pd.testing.assert_frame_equal(out, run(7))
