"""SimHash near-dup fingerprints + banded hamming grouping.

Charikar's simhash (public construction): each token hashed to 64 bits;
the fingerprint's bit i is 1 iff the sum of (+1/-1) over token-bit i is
positive. Near-dups have small hamming distance; candidate retrieval
bands the 64 bits into `bands` chunks — two docs within
hamming < bands differ in at most bands-1 chunks, so they must share at
least one chunk value (the standard pigeonhole banding).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashutil import hash_str_array

_BITS = np.uint64(1) << np.arange(64, dtype=np.uint64)


def simhash_text(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    h = hash_str_array(np.array(toks, dtype=object))
    bits = (h[:, None] & _BITS[None, :]) != 0  # (n_tokens, 64)
    votes = bits.sum(axis=0) * 2 - len(toks)
    fp = np.bitwise_or.reduce(_BITS[votes > 0]) if (votes > 0).any() else np.uint64(0)
    return int(np.array([fp], dtype=np.uint64).view(np.int64)[0])  # signed view for Arrow int64


class SimHasher:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pandas().fillna("").to_numpy(dtype=object)
        fps = np.array([simhash_text(t) for t in texts], dtype=np.int64)
        return pa.table({self.id_col: batch.column(self.id_col), "simhash": pa.array(fps)})


def hamming(a: int, b: int) -> int:
    return bin((a & 0xFFFFFFFFFFFFFFFF) ^ (b & 0xFFFFFFFFFFFFFFFF)).count("1")


def simhash_bands(batch: pa.Table, bands: int = 4, id_col: str = "doc_id") -> pa.Table:
    """Fingerprint -> (band_id, band_val, id) candidate rows."""
    ids = batch.column(id_col).to_numpy()
    fp = batch.column("simhash").to_numpy().view(np.uint64)
    width = 64 // bands
    out_id, out_band, out_val = [], [], []
    for b in range(bands):
        seg = ((fp >> np.uint64(b * width)) & np.uint64((1 << width) - 1)).astype(np.int64)
        out_id.append(ids)
        out_band.append(np.full(len(ids), b, dtype=np.int32))
        out_val.append(seg)
    return pa.table(
        {
            id_col: pa.array(np.concatenate(out_id) if out_id else []),
            "band_id": pa.array(np.concatenate(out_band), type=pa.int32()),
            "band_val": pa.array(np.concatenate(out_val), type=pa.int64()),
        }
    )


def simhash_candidates(ds, bands: int = 4, max_hamming: int = 3,
                       text_col: str = "text", id_col: str = "doc_id", concurrency=4):
    """Dataset[(doc_id, cluster_id)] where cluster_id = min doc over docs
    sharing a band AND within max_hamming (verified exactly per bucket)."""
    from ray.data.aggregate import Min

    fps = ds.map_batches(SimHasher(text_col, id_col), batch_format="pyarrow", concurrency=concurrency)

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        # exact hamming verification against the bucket's min doc
        g = g.sort_values(id_col)
        rep_fp = int(g["simhash"].iloc[0])
        rep_id = int(g[id_col].iloc[0])
        ok = g["simhash"].map(lambda f: hamming(int(f), rep_fp) <= max_hamming)
        out = g[[id_col]].copy()
        out["bucket_min"] = np.where(ok, rep_id, g[id_col])
        return out

    def emit(b: pa.Table) -> pa.Table:
        t = simhash_bands(b, bands, id_col)
        # attach fingerprints (small in-batch merge)
        fp_map = dict(zip(b.column(id_col).to_pylist(), b.column("simhash").to_pylist()))
        sims = pa.array([fp_map[i] for i in t.column(id_col).to_pylist()], type=pa.int64())
        return t.append_column("simhash", sims)

    buckets = fps.map_batches(emit, batch_format="pyarrow")
    labeled = buckets.groupby(["band_id", "band_val"]).map_groups(bucket_verify, batch_format="pandas")
    return labeled.groupby(id_col).aggregate(Min("bucket_min", alias_name="cluster_id"))
