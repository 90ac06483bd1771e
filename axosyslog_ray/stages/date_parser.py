"""date-parser(): strptime over a column with a format list + tz handling.

Semantics mirror the reference date parser
(reference modules/timestamp/date-parser.c:163-189, flags :237-244):
an ordered list of strptime formats, first match wins per row; an
explicit `time_zone` applied to formats without their own offset; the
result overwrites the stamp column (the reference writes STAMP).

Vectorization: each format is tried with one vectorized
`pd.to_datetime(format=...)` over only the still-unparsed rows — k
formats = k C-driven passes, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class DateParser:
    def __init__(
        self,
        formats: list[str],
        source_col: str = "message",
        target_col: str = "ts_stamp",
        time_zone: str | None = None,
    ):
        self.formats = list(formats)
        self.source_col = source_col
        self.target_col = target_col
        self.time_zone = time_zone

    def __call__(self, table: pa.Table) -> pa.Table:
        s = table.column(self.source_col).to_pandas().astype("string")
        n = len(s)
        result = np.full(n, np.datetime64("NaT"), dtype="datetime64[us]")
        todo = np.ones(n, dtype=bool)
        for fmt in self.formats:
            if not todo.any():
                break
            has_tz = "%z" in fmt or "%Z" in fmt
            sub = s[todo]
            parsed = pd.to_datetime(sub, format=fmt, errors="coerce", utc=has_tz)
            if has_tz:
                parsed = parsed.dt.tz_localize(None)  # normalize to naive UTC
            elif self.time_zone:
                parsed = (
                    parsed.dt.tz_localize(self.time_zone, ambiguous="NaT", nonexistent="NaT")
                    .dt.tz_convert("UTC")
                    .dt.tz_localize(None)
                )
            ok = parsed.notna().to_numpy()
            rows = np.flatnonzero(todo)[ok]
            result[rows] = parsed[parsed.notna()].to_numpy(dtype="datetime64[us]")
            todo[rows] = False
        matched = ~todo
        out = table
        if self.target_col in out.column_names:
            old = out.column(self.target_col).to_pandas().to_numpy(dtype="datetime64[us]")
            result = np.where(matched, result, old)  # only overwrite on success
            out = out.drop_columns([self.target_col])
        out = out.append_column(self.target_col, pa.array(result, type=pa.timestamp("us")))
        return out.append_column("date_parsed", pa.array(matched))
