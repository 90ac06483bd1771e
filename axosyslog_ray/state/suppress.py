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
  were already admitted in the trailing window.

Scale shape (VERDICT r1 #8): the shuffle is a coarse `hash(key)%B`
bucket (bounded group size, no per-key tiny groups); within a bucket the
greedy chains run as numpy searchsorted JUMPS over int64 timestamps —
one iteration per KEPT row, not per row, and no pandas .iloc scalar
access on the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _sorted_segments(g: pd.DataFrame, keys: list[str], ts_col: str, tie_break: str | None):
    """Sort a bucket by (keys, ts[, tie]) and return (sorted frame,
    int64-ns timestamps, segment start offsets incl. end sentinel)."""
    from ..shuffle import key_segments

    # keys absent from the frame (unit-test single-group use) -> one segment
    keys = [k for k in keys if k in g.columns]
    sort_cols = list(keys) + [ts_col] + ([tie_break] if tie_break and tie_break in g.columns else [])
    g = g.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    ts = g[ts_col].to_numpy(dtype="datetime64[ns]").astype(np.int64)
    starts = np.nonzero(key_segments(g, keys))[0]
    bounds = np.append(starts, len(g))
    return g, ts, bounds


class Suppress:
    """Per-bucket callable: suppress duplicates per key segment via the
    searchsorted jump chain (one step per KEPT row)."""

    def __init__(self, seconds: float, keys=("host", "program", "message"),
                 ts_col: str = "ts_stamp", tie_break: str = "url"):
        self.window_ns = int(seconds * 1_000_000_000)
        self.keys = list(keys)
        self.ts_col = ts_col
        self.tie_break = tie_break

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            out = g.copy()
            out["repeat_count"] = pd.Series([], dtype="int64")
            return out
        g, ts, bounds = _sorted_segments(g, self.keys, self.ts_col, self.tie_break)
        keep = np.zeros(len(g), dtype=bool)
        repeat = np.zeros(len(g), dtype=np.int64)
        w = self.window_ns
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = ts[s:e]
            i = 0
            while i < len(seg):
                # first index past the window — everything before it is
                # suppressed by row i (same greedy chain as the reference's
                # last-message-repeated logic)
                nxt = int(np.searchsorted(seg, seg[i] + w, side="right"))
                nxt = max(nxt, i + 1)
                keep[s + i] = True
                repeat[s + i] = nxt - i - 1
                i = nxt
        out = g[keep].copy()
        out["repeat_count"] = repeat[keep]
        return out


def suppress(ds, seconds: float, keys=("host", "program", "message"), ts_col="ts_stamp",
             tie_break="url", num_buckets: int | None = None):
    from ..shuffle import bucketed_map_groups

    s = Suppress(seconds, keys=keys, ts_col=ts_col, tie_break=tie_break)

    def apply_suppress(df):
        return s(df)

    return bucketed_map_groups(ds, list(keys), apply_suppress, num_buckets=num_buckets)


class RateLimit:
    """Per-bucket callable: trailing-window admission per key segment.
    Ring buffer of the last `rate` admitted timestamps; rejected runs are
    skipped in ONE searchsorted jump, so iterations ~ O(admitted)."""

    def __init__(self, rate: int, per_seconds: float = 1.0, keys=("user_id",),
                 ts_col: str = "ts_stamp", tie_break: str = "url"):
        self.rate = rate
        self.window_ns = int(per_seconds * 1_000_000_000)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.ts_col = ts_col
        self.tie_break = tie_break

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or self.rate <= 0:  # rate 0 = block everything
            return g.iloc[0:0].copy()
        g, ts, bounds = _sorted_segments(g, self.keys, self.ts_col, self.tie_break)
        keep = np.zeros(len(g), dtype=bool)
        w, rate = self.window_ns, self.rate
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = ts[s:e]
            n = len(seg)
            ring = np.empty(rate, dtype=np.int64)  # circular: last `rate` admits
            head = 0  # index of oldest admitted
            count = 0
            i = 0
            while i < n:
                t = seg[i]
                if count < rate:
                    ring[(head + count) % rate] = t
                    count += 1
                    keep[s + i] = True
                    i += 1
                    continue
                oldest = ring[head]
                if t - oldest >= w:  # oldest expired: admit, rotate ring
                    ring[head] = t
                    head = (head + 1) % rate
                    keep[s + i] = True
                    i += 1
                else:
                    # every row before oldest+w is rejected — skip them all
                    i = max(i + 1, int(np.searchsorted(seg, oldest + w, side="left")))
        return g[keep]


def rate_limit(ds, key, rate: int, per_seconds: float = 1.0, ts_col="ts_stamp",
               tie_break="url", num_buckets: int | None = None):
    from ..shuffle import bucketed_map_groups

    keys = [key] if isinstance(key, str) else list(key)
    rl = RateLimit(rate, per_seconds, keys=keys, ts_col=ts_col, tie_break=tie_break)

    def apply_rate_limit(df):
        return rl(df)

    return bucketed_map_groups(ds, keys, apply_rate_limit, num_buckets=num_buckets)
