"""textstats/winnow: MOSS winnowing fingerprints."""
import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from axosyslog_ray.textstats.winnow import winnow_batch, winnow_fingerprints


def _t(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


class TestWinnowBatch:
    def test_single_window_selects_min(self):
        # 9 tokens -> 7 grams (k=3) -> 4 windows (w=4)
        toks = "a b c d e f g h i"
        out = winnow_batch(_t([toks]), k=3, w=4).to_pandas()
        grams = [" ".join(toks.split()[i:i + 3]) for i in range(7)]
        hs = [_md5(g) for g in grams]
        expect = {min(hs[j:j + 4]) for j in range(4)}
        assert set(out["fingerprint"]) == expect

    def test_too_short_docs_emit_nothing(self):
        # < k tokens: no grams; k..k+w-2 grams: no full window
        out = winnow_batch(_t(["a b", "a b c d e", ""]), k=3, w=4)
        assert out.num_rows == 0

    def test_shared_run_guarantee(self):
        # any shared w+k-1 = 6-word run must share a fingerprint
        shared = "the quick brown fox jumps over"
        a = "xx yy " + shared + " zz"
        b = shared + " aa bb cc"
        out = winnow_batch(_t([a, b]), k=3, w=4).to_pandas()
        fa = set(out.loc[out.doc_id == 0, "fingerprint"])
        fb = set(out.loc[out.doc_id == 1, "fingerprint"])
        assert fa & fb

    def test_no_cross_document_windows(self):
        # identical tokens split across two docs must not create grams
        # or windows that span the boundary
        out = winnow_batch(_t(["a b c d e f g", "h i j k l m n"]),
                           k=3, w=4).to_pandas()
        cross = _md5("f g h")
        assert cross not in set(out["fingerprint"])

    def test_density(self):
        # expected fingerprint density ~ 2/(w+1) of grams, loose bounds
        rng = np.random.default_rng(7)
        toks = " ".join(str(rng.integers(0, 10**9)) for _ in range(2000))
        out = winnow_batch(_t([toks]), k=3, w=4)
        density = out.num_rows / (2000 - 2)
        assert 0.2 < density < 0.6


class TestWinnowDataset:
    def test_partitioning_invariant(self, ray_session):
        rng = np.random.default_rng(11)
        texts = [" ".join(f"w{rng.integers(0, 50)}"
                          for _ in range(rng.integers(0, 30)))
                 for _ in range(40)]
        df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                           "text": texts})
        a = winnow_fingerprints(rd.from_pandas(df)).to_pandas() \
            .sort_values(["doc_id", "fingerprint"]).reset_index(drop=True)
        b = winnow_fingerprints(rd.from_pandas(df).repartition(6)) \
            .to_pandas().sort_values(["doc_id", "fingerprint"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestWinnowPairs:
    def test_planted_near_dup_found(self, ray_session):
        from axosyslog_ray.textstats.winnow import winnow_pairs
        rng = np.random.default_rng(5)
        base = " ".join(f"w{rng.integers(0, 10**9)}" for _ in range(40))
        texts = [base, base + " tail extra", "completely different words only " +
                 " ".join(f"z{i}" for i in range(30))]
        df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                           "text": texts})
        out = winnow_pairs(rd.from_pandas(df).repartition(2),
                           min_shared=2).to_pandas()
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (0, 1) in pairs
        assert (0, 2) not in pairs and (1, 2) not in pairs

    def test_stop_fingerprint_cap(self, ray_session):
        from axosyslog_ray.textstats.winnow import winnow_pairs
        # 30 docs all sharing the same boilerplate run: with max_df=20
        # the shared fingerprints drop and no pairs emerge
        boiler = "one two three four five six seven eight nine"
        df = pd.DataFrame({
            "doc_id": np.arange(30, dtype=np.int64),
            "text": [boiler + f" unique{i}" for i in range(30)],
        })
        out = winnow_pairs(rd.from_pandas(df), min_shared=1,
                           max_df=20).to_pandas()
        assert len(out) == 0
