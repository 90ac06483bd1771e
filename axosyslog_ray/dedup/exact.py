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


def dedup_rows(ds, col: str = "text", id_col: str = "doc_id"):
    """Return the dataset with only the canonical row per distinct content
    (min id wins). Full-row shuffle by content hash — use when the
    deduplicated corpus itself is the output."""
    import pandas as pd

    hashed = ds.map_batches(lambda b: add_content_hash(b, col), batch_format="pyarrow")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return hashed.groupby("content_hash").map_groups(first, batch_format="pandas")
