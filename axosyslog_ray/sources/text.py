"""file() source for raw text logs: lines -> message table.

Mirrors the reference's file source + line framing
(reference modules/affile/affile-source.c; framing lib/logproto/
logproto-text-server.c — one message per line): `ray.data.read_text`
yields one row per line; this stage wraps them in the engine's message
shape (text + synthetic receive metadata), ready for parse_syslog_table.

Multi-line modes (reference lib/multi-line/):
- `indented`: a line starting with whitespace continues the previous
  message (indented-multi-line.c) — handled per batch with a carry-over
  caveat documented below;
- `regexp prefix`: a line matching `prefix_re` starts a new message,
  others continue (regexp-multi-line.c).

Batch-boundary caveat: joining lines within map_batches cannot merge a
continuation spanning two blocks; read each file as one block
(`override_num_blocks=n_files`) when exact multi-line reassembly
matters, or use state.correlate.group_lines keyed by file for the
shuffle-based exact variant.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


def read_log_lines(paths, recv_ts=None, **read_kwargs):
    """read_text -> (text, warc_ts) message table; recv_ts stamps arrival
    (the reference's RECVD timestamp; defaults to a fixed epoch so runs
    are deterministic)."""
    import ray.data as rd

    plist = [paths] if isinstance(paths, str) else list(paths)
    # one block per file: keeps a file's lines together so multi-line
    # framing (MultiLineJoiner) sees whole messages — read_text would
    # otherwise byte-range-split even tiny files into per-line blocks
    read_kwargs.setdefault("override_num_blocks", len(plist))
    ds = rd.read_text(plist, **read_kwargs)
    stamp = np.datetime64(recv_ts or "2026-01-01T00:00:00", "us")

    def wrap(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "text": b.column("text"),
                "warc_ts": pa.array(np.full(n, stamp), type=pa.timestamp("us")),
            }
        )

    return ds.map_batches(wrap, batch_format="pyarrow")


class MultiLineJoiner:
    """Join continuation lines inside a batch (mode 'indented' or
    'regexp' with a prefix pattern)."""

    def __init__(self, mode: str = "indented", prefix_re: str | None = None, separator: str = "\n"):
        if mode not in ("indented", "regexp"):
            raise ValueError(mode)
        self.mode = mode
        self.prefix = re.compile(prefix_re) if prefix_re else None
        self.sep = separator

    def _starts_new(self, line: str) -> bool:
        if self.mode == "indented":
            return not line[:1].isspace()
        return bool(self.prefix.match(line)) if self.prefix else True

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = batch.column("text").to_pylist()
        out_rows: list[list[str]] = []
        for line in lines:
            line = line or ""
            if out_rows and not self._starts_new(line):
                out_rows[-1].append(line)
            else:
                out_rows.append([line])
        joined = [self.sep.join(parts) for parts in out_rows]
        n_lines = [len(parts) for parts in out_rows]
        cols = {"text": pa.array(joined, type=pa.string()),
                "n_lines": pa.array(n_lines, type=pa.int64())}
        # carry every OTHER column through (first line's value wins for
        # the joined message — same rule as warc_ts); empty batches take
        # the empty-slice path rather than an out-of-bounds take
        firsts = pa.array(np.cumsum([0] + n_lines[:-1]) if n_lines else [], type=pa.int64())
        for name in batch.column_names:
            if name == "text":
                continue
            cols[name] = batch.column(name).take(firsts)
        return pa.table(cols)
