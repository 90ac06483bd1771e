"""fuzzy_dedup: MinHash LSH + true components + representative purge."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from axosyslog_ray.dedup.fuzzy import fuzzy_dedup, minhash_star_edges


def _corpus():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(400)]

    def doc(seed_words, mutate=0):
        words = list(seed_words)
        for _ in range(mutate):
            words[rng.integers(0, len(words))] = vocab[rng.integers(0, len(vocab))]
        return " ".join(words)

    base_a = [vocab[i] for i in rng.choice(400, 60, replace=False)]
    base_b = [vocab[i] for i in rng.choice(400, 60, replace=False)]
    rows = []
    # cluster A: doc 0 + 3 light mutations (near-dups)
    for i, m in enumerate([0, 1, 2, 1]):
        rows.append({"doc_id": i, "text": doc(base_a, m)})
    # cluster B: docs 10, 11
    for i, m in zip([10, 11], [0, 1]):
        rows.append({"doc_id": i, "text": doc(base_b, m)})
    # unique docs: fully disjoint per-doc token namespaces
    for i in range(20, 26):
        rows.append({"doc_id": i, "text": " ".join(f"u{i}x{j}" for j in range(40))})
    return pd.DataFrame(rows)


@pytest.mark.usefixtures("ray_session")
class TestFuzzyDedup:
    def test_planted_clusters_keep_min_rep(self):
        df = _corpus()
        out = fuzzy_dedup(rd.from_pandas(df), num_perm=64, bands=32).to_pandas()
        kept = sorted(out["doc_id"])
        # representatives: 0 for cluster A, 10 for cluster B; uniques kept
        assert 0 in kept and 10 in kept
        assert not ({1, 2, 3} & set(kept)), kept
        assert 11 not in kept
        assert set(range(20, 26)) <= set(kept)
        # schema: input columns preserved
        assert sorted(out.columns) == ["doc_id", "text"]

    def test_star_edges_connect_buckets(self):
        df = _corpus()
        e = minhash_star_edges(rd.from_pandas(df), num_perm=64, bands=32).to_pandas()
        assert (e["id_a"] != e["id_b"]).all()
        # cluster A members appear as edge endpoints
        touched = set(e["id_a"]) | set(e["id_b"])
        assert {0, 1, 2, 3} <= touched

    def test_no_dups_is_identity(self):
        df = _corpus()
        uniq = df[df["doc_id"] >= 20].reset_index(drop=True)
        out = fuzzy_dedup(rd.from_pandas(uniq), num_perm=64, bands=32).to_pandas()
        assert sorted(out["doc_id"]) == sorted(uniq["doc_id"])
