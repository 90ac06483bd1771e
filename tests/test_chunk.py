"""textstats/chunk: fixed-token-window chunking with overlap."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from axosyslog_ray.textstats.chunk import chunk_batch, chunk_documents


def _t(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


class TestChunkBatch:
    def test_short_doc_one_chunk(self):
        out = chunk_batch(_t(["a b c"]), window=10, overlap=2)
        assert out.to_pylist() == [{"doc_id": 0, "chunk_id": 0,
                                    "n_tokens": 3, "chunk_text": "a b c"}]

    def test_empty_and_null_docs_emit_nothing(self):
        t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                      "text": pa.array(["", None], type=pa.string())})
        assert chunk_batch(t, window=4).num_rows == 0

    def test_overlap_windows(self):
        toks = " ".join(str(i) for i in range(12))
        out = chunk_batch(_t([toks]), window=5, overlap=2).to_pylist()
        # stride 3 -> starts 0,3,6,9 -> 4 chunks; last is short
        assert [c["chunk_text"] for c in out] == [
            "0 1 2 3 4", "3 4 5 6 7", "6 7 8 9 10", "9 10 11"]
        assert [c["n_tokens"] for c in out] == [5, 5, 5, 3]
        assert [c["chunk_id"] for c in out] == [0, 1, 2, 3]

    def test_exact_multiple_no_overlap(self):
        toks = " ".join("abcdef"[i] for i in range(6))
        out = chunk_batch(_t([toks]), window=3, overlap=0).to_pylist()
        assert [c["chunk_text"] for c in out] == ["a b c", "d e f"]

    def test_every_token_covered(self):
        rng = np.random.default_rng(3)
        texts = [" ".join(f"w{j}" for j in range(rng.integers(0, 40)))
                 for _ in range(50)]
        out = chunk_batch(_t(texts), window=7, overlap=3)
        df = out.to_pandas()
        for i, text in enumerate(texts):
            toks = text.split()
            got = set()
            for ct in df.loc[df.doc_id == i, "chunk_text"]:
                got.update(ct.split())
            assert got == set(toks)

    def test_overlap_must_be_smaller(self):
        with pytest.raises(ValueError):
            chunk_batch(_t(["a"]), window=3, overlap=3)


class TestChunkDataset:
    def test_partitioning_invariant(self, ray_session):
        df = pd.DataFrame({
            "doc_id": np.arange(20, dtype=np.int64),
            "text": [" ".join(f"t{i}_{j}" for j in range(i)) for i in range(20)],
        })
        a = chunk_documents(rd.from_pandas(df), window=4, overlap=1) \
            .to_pandas().sort_values(["doc_id", "chunk_id"]) \
            .reset_index(drop=True)
        b = chunk_documents(rd.from_pandas(df).repartition(7), window=4,
                            overlap=1).to_pandas() \
            .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
