"""suppress() and rate-limit(): order-dependent operators with
deterministic event-time batch semantics.

- `suppress(sec)`: every reference destination drops exact-duplicate
  consecutive messages within a window and emits "last message repeated
  N times" (reference lib/logwriter.c:575-660). Batch semantics
  (SURVEY.md §7.3 documented divergence): duplicates are detected per
  (host, program, message) in EVENT-time order (`ts_stamp`, tie-break
  url) rather than arrival order; each kept row carries
  `repeat_count` = number of suppressed duplicates that followed it
  within the window.

- `rate-limit(key, rate)`: token bucket per key template (reference
  modules/rate-limit-filter/rate-limit.c:30-135). Deterministic variant:
  per key in event-time order, a row passes if fewer than `rate` rows
  were already admitted in the trailing 1-second window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class Suppress:
    """`ds.groupby(["host","program","message"]).map_groups(Suppress(sec),
    batch_format="pandas")`."""

    def __init__(self, seconds: float, ts_col: str = "ts_stamp", tie_break: str = "url"):
        self.window = pd.Timedelta(seconds=seconds)
        self.ts_col = ts_col
        self.tie_break = tie_break

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [self.ts_col] + ([self.tie_break] if self.tie_break in g.columns else [])
        g = g.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        ts = g[self.ts_col]
        keep = np.zeros(len(g), dtype=bool)
        repeat = np.zeros(len(g), dtype=np.int64)
        last_kept_ts = None
        last_kept_idx = -1
        for i in range(len(g)):
            t = ts.iloc[i]
            if last_kept_ts is None or (t - last_kept_ts) > self.window:
                keep[i] = True
                last_kept_ts = t
                last_kept_idx = i
            else:
                repeat[last_kept_idx] += 1
        out = g[keep].copy()
        out["repeat_count"] = repeat[keep]
        return out


def suppress(ds, seconds: float, keys=("host", "program", "message"), ts_col="ts_stamp", tie_break="url"):
    s = Suppress(seconds, ts_col=ts_col, tie_break=tie_break)

    def apply_suppress(df):
        return s(df)

    return ds.groupby(list(keys)).map_groups(apply_suppress, batch_format="pandas")


class RateLimit:
    """`ds.groupby(key).map_groups(RateLimit(rate), batch_format="pandas")`."""

    def __init__(self, rate: int, per_seconds: float = 1.0, ts_col: str = "ts_stamp", tie_break: str = "url"):
        self.rate = rate
        self.window = pd.Timedelta(seconds=per_seconds)
        self.ts_col = ts_col
        self.tie_break = tie_break

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = [self.ts_col] + ([self.tie_break] if self.tie_break in g.columns else [])
        g = g.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        ts = g[self.ts_col]
        admitted: list[pd.Timestamp] = []
        keep = np.zeros(len(g), dtype=bool)
        for i in range(len(g)):
            t = ts.iloc[i]
            while admitted and (t - admitted[0]) >= self.window:
                admitted.pop(0)
            if len(admitted) < self.rate:
                admitted.append(t)
                keep[i] = True
        return g[keep]


def rate_limit(ds, key, rate: int, per_seconds: float = 1.0, ts_col="ts_stamp", tie_break="url"):
    keys = key if isinstance(key, str) else list(key)
    rl = RateLimit(rate, per_seconds, ts_col=ts_col, tie_break=tie_break)

    def apply_rate_limit(df):
        return rl(df)

    return ds.groupby(keys).map_groups(apply_rate_limit, batch_format="pandas")
