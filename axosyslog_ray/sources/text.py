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
    """Join continuation lines inside a batch.

    Modes (reference lib/multi-line/multi-line-factory.c:36-76):
    - 'indented': whitespace-led lines continue (indented-multi-line.c)
    - 'regexp': a line matching `prefix_re` starts a new message
    - 'prefix-garbage': a message runs until a line containing
      `garbage_re`; the garbage match AND the rest of that line are
      dropped (regexp-multi-line.c:27-34 — offset = match START);
      a `prefix_re` match mid-message also starts a new one
    - 'prefix-suffix': same, but the suffix match itself is KEPT
      (regexp-multi-line.c:37-44 — offset = match END)
    - 'smart': automatic stack-trace detection via the FSM rule set
      (sources/smartml.py; smart-multi-line.c)
    """

    MODES = ("indented", "regexp", "prefix-garbage", "prefix-suffix", "smart")

    def __init__(self, mode: str = "indented", prefix_re: str | None = None,
                 separator: str = "\n", garbage_re: str | None = None):
        if mode not in self.MODES:
            raise ValueError(mode)
        # garbage/suffix may be omitted (multi_line_pattern_find on a
        # NULL pattern returns FALSE, regexp-multi-line.c:86-87): the
        # message then only ends at the next prefix — the mbox shape
        # (scl/mbox/mbox.conf: prefix-suffix with prefix '^From ' only)
        self.mode = mode
        self.prefix = re.compile(prefix_re) if prefix_re else None
        self.garbage = re.compile(garbage_re) if garbage_re else None
        self.sep = separator

    def _starts_new(self, line: str) -> bool:
        if self.mode == "indented":
            return not line[:1].isspace()
        return bool(self.prefix.match(line)) if self.prefix else True

    def _join_garbage(self, lines: list[str]) -> list[list[str]]:
        """prefix-garbage / prefix-suffix accumulation
        (regexp-multi-line.c:55-80): garbage/suffix extracts the message
        with the line truncated at the match (start or end); a prefix
        match on a continuation rewinds — the pending message is
        extracted and the line re-examined as an initial line."""
        keep_end = self.mode == "prefix-suffix"
        out: list[list[str]] = []
        buf: list[str] = []
        for line in lines:
            line = line or ""
            m = self.garbage.search(line) if self.garbage else None
            if m is not None:
                cut = m.end() if keep_end else m.start()
                buf.append(line[:cut])
                out.append(buf)
                buf = []
            elif buf and self.prefix is not None and self.prefix.search(line):
                out.append(buf)
                buf = [line]
            else:
                buf.append(line)
        if buf:
            out.append(buf)
        return out

    def _group(self, lines: list[str]) -> list[list[str]]:
        if self.mode == "smart":
            from .smartml import smart_join

            return smart_join(lines)
        if self.mode in ("prefix-garbage", "prefix-suffix"):
            return self._join_garbage(lines)
        out_rows: list[list[str]] = []
        for line in lines:
            line = line or ""
            if out_rows and not self._starts_new(line):
                out_rows[-1].append(line)
            else:
                out_rows.append([line])
        return out_rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = batch.column("text").to_pylist()
        out_rows = self._group(lines)
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
