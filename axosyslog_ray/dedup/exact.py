"""Exact dedup: content hash -> hash-partitioned first-wins.

The reference's only dedup is suppress() (adjacent duplicates,
lib/logwriter.c:575-660); exact corpus dedup generalizes it: hash the
content column per batch (stable siphash), shuffle ONLY (hash, id)
pairs, keep the minimum id per hash as the canonical representative.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashutil import hash_str_array


def add_content_hash(batch: pa.Table, col: str = "text", out: str = "content_hash") -> pa.Table:
    h = hash_str_array(batch.column(col).to_pandas().fillna("").to_numpy(dtype=object))
    # int64 view for Arrow/parquet friendliness (stable bit pattern)
    return batch.append_column(out, pa.array(h.view(np.int64), type=pa.int64()))


def dedup_stats(ds, col: str = "text", id_col: str = "doc_id"):
    """(content_hash -> representative id, n_copies): the shuffle moves one
    small row per (hash, batch), not the documents."""
    from ray.data.aggregate import Count, Min

    pairs = ds.map_batches(
        lambda b: add_content_hash(b, col).select(["content_hash", id_col]), batch_format="pyarrow"
    )
    return pairs.groupby("content_hash").aggregate(
        Min(id_col, alias_name="rep_id"), Count(alias_name="n_copies")
    )


def dedup_rows(ds, col: str = "text", id_col: str = "doc_id", num_buckets: int | None = None):
    """Return the dataset with only the canonical row per distinct content
    (min id wins). Full-row shuffle by a coarse hash bucket — grouping by
    the raw content hash would make one tiny map_groups group per
    distinct document (the measured 50x overhead pattern); inside each
    bucket the dedup is one vectorized drop_duplicates. num_buckets
    defaults to 8x cluster CPUs (bounded group size at any scale)."""
    import pandas as pd

    from .minhash import default_num_shards

    if num_buckets is None:
        num_buckets = default_num_shards()

    def hash_and_bucket(b: pa.Table) -> pa.Table:
        t = add_content_hash(b, col)
        bucket = (t.column("content_hash").to_numpy() % num_buckets).astype(np.int64)
        return t.append_column("_bucket", pa.array(bucket))

    hashed = ds.map_batches(hash_and_bucket, batch_format="pyarrow")

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").drop_duplicates("content_hash", keep="first").drop(columns=["_bucket"])

    return hashed.groupby("_bucket").map_groups(dedup_bucket, batch_format="pandas")
