"""parallelize(): explicit keyed/rr partitioning of a stream.

Mirrors the reference's parallelize() rebalance point (reference
lib/logscheduler.c:277-300 — hash `log_template_hash(msg) % N` or
round-robin batches to N partition queues; LOGSCHEDULER_MAX_PARTITIONS
32, lib/logscheduler.h:35): here the partition id becomes a column, and
the physical move is either free (round-robin ≙ Ray's default block
splitting — no-op) or an explicit key-affine shuffle when downstream
stages need key locality (the reference's partition-key mode).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .functions.templates import template_hash


def add_partition_key(ds, partition_key: str, partitions: int = 32, out_col: str = "_partition"):
    """Annotate rows with hash(template) % partitions (deterministic)."""

    def fn(b: pa.Table) -> pa.Table:
        h = template_hash(partition_key, b, partitions)
        return b.append_column(out_col, pa.array(h.astype(np.int64), type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def parallelize(ds, partitions: int = 32, partition_key: str | None = None):
    """Key mode: one shuffle co-locating each partition id (downstream
    map_batches then sees key-affine blocks — the reference's
    worker-partition-key). Round-robin mode: no data movement, just
    `repartition(partitions)` block splitting."""
    if partition_key is None:
        return ds.repartition(partitions)
    keyed = add_partition_key(ds, partition_key, partitions)
    import pandas as pd

    def ident(g: pd.DataFrame) -> pd.DataFrame:
        return g

    return keyed.groupby("_partition").map_groups(ident, batch_format="pandas")
