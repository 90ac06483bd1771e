"""Fixed-token-window document chunking with overlap — the standard
RAG / long-context preprocessing step (no reference analogue; the
LLM-pipeline half of the brief).

Semantics (pinned, SQL-replayable): tokens are whitespace runs; chunk k
of a document covers tokens [k*stride, k*stride + window) where
stride = window - overlap; chunks are emitted while k*stride < n_tokens
(so every token appears in at least one chunk and the last chunk may be
short); a document with no tokens emits no chunks.

Scale shape: map-only — one pandas split to a flat token table, the
chunk index built by pure numpy repeat/arange arithmetic, chunk text
reassembled with one Arrow `binary_join` over a LargeListArray (no
per-chunk interpreter loop). Output (doc_id, chunk_id, n_tokens,
chunk_text) is ~(1 + overlap/window)x the input text bytes — the
expected duplication cost of overlap, and the reason overlap defaults
small."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def chunk_batch(batch: pa.Table, window: int, overlap: int = 0,
                text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    if overlap >= window:
        raise ValueError("overlap must be < window")
    stride = window - overlap
    texts = batch.column(text_col).to_pandas()
    ids = batch.column(id_col)
    from .tokens import flat_tokens
    flat, lens, _doc = flat_tokens(texts)
    doc_start = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(lens, out=doc_start[1:])

    # chunks per doc: ceil(len / stride) over docs with tokens
    n_chunks = -(-lens // stride)
    total = int(n_chunks.sum())
    cdoc = np.repeat(np.arange(len(texts), dtype=np.int64), n_chunks)
    # within-doc chunk index 0..n_chunks-1
    cix = (np.arange(total, dtype=np.int64)
           - np.repeat(np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
                       .astype(np.int64), n_chunks))
    starts = cix * stride
    clen = np.minimum(window, lens[cdoc] - starts)
    # gather indices into the flat token array: per-chunk contiguous runs
    offsets = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(clen, out=offsets[1:])
    idx = (np.arange(int(offsets[-1]), dtype=np.int64)
           - np.repeat(offsets[:-1], clen)
           + np.repeat(doc_start[cdoc] + starts, clen))
    values = pa.array(flat[idx] if len(idx) else
                      np.empty(0, dtype=object), type=pa.string())
    list_arr = pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), values)
    joined = pa.compute.binary_join(list_arr, " ").cast(pa.string())
    return pa.table({
        id_col: ids.take(pa.array(cdoc, type=pa.int64())) if total
        else pa.array([], type=ids.type),
        "chunk_id": pa.array(cix, type=pa.int64()),
        "n_tokens": pa.array(clen, type=pa.int64()),
        "chunk_text": joined,
    })


def chunk_documents(ds, window: int, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Dataset-level chunking: one map-only stage, no shuffle."""
    return ds.map_batches(
        lambda b: chunk_batch(b, window, overlap, text_col, id_col),
        batch_format="pyarrow")
