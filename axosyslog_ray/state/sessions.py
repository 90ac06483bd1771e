"""grouping-by(): event-time session windows with aggregate emission.

Mirrors the reference's streaming GROUP BY
(reference modules/correlation/groupingby.c; options
grouping-parser.c:233-290): `key` grouping, `where` pre-filter,
`timeout` closes a context when no message arrives within the gap,
`trigger` completes a context early, `having` gates emission
(groupingby.c:94-132), `sort-key` orders buffered messages, and the
aggregate emits one synthetic row per closed context with
template-evaluated fields (synthetic-message.c).

Ray shape: `ds.groupby(key).map_groups(session_fn)` — the group sees ALL
rows for its key (shuffle by the full key; session windows cannot be
salted, SURVEY.md §7.3), sorts by event time, splits on timeout gaps,
applies trigger/having, and emits synthetic rows. Windows are *session*
windows exactly like the reference's timer-wheel timeouts, but computed
deterministically in event time — stronger than the reference's
arrival-order semantics (SURVEY.md §2.6 note).

Aggregate field expressions available (the reference's context funcs —
$(context-length), $(sum), $(context-lookup)): `count`, `sum:COL`,
`avg:COL`, `min:COL`, `max:COL`, `first:COL`, `last:COL`,
`values:COL` (comma-joined context-lookup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _agg_value(g: pd.DataFrame, spec: str):
    if spec == "count":
        return len(g)
    op, _, col = spec.partition(":")
    s = g[col]
    if op == "sum":
        return s.sum()
    if op == "avg":
        return s.mean()
    if op == "min":
        return s.min()
    if op == "max":
        return s.max()
    if op == "first":
        return s.iloc[0]
    if op == "last":
        return s.iloc[-1]
    if op == "values":
        return ",".join(s.astype(str))
    raise ValueError(f"unknown aggregate spec {spec!r}")


class GroupingBy:
    """Callable for `ds.groupby(key).map_groups(self, batch_format="pandas")`."""

    def __init__(
        self,
        key: str | list[str],
        timeout: float,
        ts_col: str = "ts_stamp",
        aggregates: dict[str, str] | None = None,
        where=None,  # FilterExpr or callable(df)->bool mask (pre-filter)
        having=None,  # callable(session_df)->bool (emission gate)
        trigger=None,  # callable(df)->bool mask; a True row force-closes its session
        sort_key: str | None = None,
    ):
        self.key = [key] if isinstance(key, str) else list(key)
        self.timeout = pd.Timedelta(seconds=timeout)
        self.ts_col = ts_col
        self.aggregates = aggregates or {"count": "count"}
        self.where = where
        self.having = having
        self.trigger = trigger
        self.sort_key = sort_key

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        g = group
        if self.where is not None:
            mask = self.where(g) if callable(self.where) else self.where.mask(
                __import__("pyarrow").Table.from_pandas(g, preserve_index=False)
            )
            g = g[np.asarray(mask, dtype=bool)]
        if g.empty:
            return self._empty()
        g = g.sort_values(self.sort_key or self.ts_col, kind="mergesort")
        ts = g[self.ts_col]
        gap_break = ts.diff() > self.timeout
        if self.trigger is not None:
            trig = np.asarray(self.trigger(g), dtype=bool)
            # a trigger row completes its context: next row starts a new one
            after_trigger = np.concatenate([[False], trig[:-1]])
            gap_break = gap_break.to_numpy() | after_trigger
        session_id = np.cumsum(np.asarray(gap_break, dtype=np.int64))
        out_rows = []
        for sid, sess in g.groupby(session_id, sort=True):
            if self.having is not None and not self.having(sess):
                continue
            row = {k: sess[k].iloc[0] for k in self.key}
            row["session_id"] = int(sid)
            row["session_start"] = sess[self.ts_col].iloc[0]
            row["session_end"] = sess[self.ts_col].iloc[-1]
            for name, spec in self.aggregates.items():
                row[name] = _agg_value(sess, spec)
            out_rows.append(row)
        if not out_rows:
            return self._empty()
        return pd.DataFrame(out_rows)

    def _empty(self) -> pd.DataFrame:
        cols = self.key + ["session_id", "session_start", "session_end"] + list(self.aggregates)
        return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})


def sessionize(ds, key, timeout, ts_col="ts_stamp", aggregates=None, **kw):
    """groupby(key).map_groups(GroupingBy(...)) with the full-key shuffle."""
    gb = GroupingBy(key, timeout, ts_col=ts_col, aggregates=aggregates, **kw)
    keys = gb.key if len(gb.key) > 1 else gb.key[0]

    def apply_sessions(df):
        return gb(df)

    return ds.groupby(keys).map_groups(apply_sessions, batch_format="pandas")
