"""fix-time-zone() / set-time-zone() / guess-time-zone() rewrites.

Mirrors the reference timestamp module (reference
modules/timestamp/rewrite-fix-timezone.c, rewrite-set-timezone.c,
rewrite-guess-timezone.c; core math lib/timeutils/unixtime.c:179-310):

- fix-time-zone(zone): the timestamp was parsed with the WRONG zone
  assumption — re-interpret the wall-clock in `zone`:
  ut_sec -= (new_gmtoff - implied_gmtoff); gmtoff = new_gmtoff, with the
  reference's second lookup pass for DST-transition crossings
  (unix_time_fix_timezone_with_tzinfo's alt_gmtoff step).
- set-time-zone(zone): the instant is CORRECT, only the display zone
  changes: gmtoff = zone's offset at ut_sec, ut_sec unchanged.
- guess-time-zone(): assume the message time is ~real time: the offset
  error equals the difference to `now`, rounded to quarter hours with
  30 s tolerance, capped at 24 h (lib/timeutils/unixtime.c
  _guess_recv_timezone_offset_based_on_time_difference).

Data model: the engine stores timestamps UTC-normalized (ut_sec) in a
datetime64 column; the per-row zone annotation lives in a companion
int64 `<ts>_gmtoff` seconds column (-1 = unknown), created on first use.
All math is vectorized numpy over int64 seconds; zone offset lookup is
one pandas tz_convert per batch (DST-correct via the tz database).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MAX_GMTOFF = 14 * 3600  # valid gmtoff range, +/- (tzdb extremes)


def zone_offsets_at(ts_ns: np.ndarray, zone: str) -> np.ndarray:
    """Vectorized UTC offset (seconds) of `zone` at each UTC instant.
    NaT rows get 0 (callers mask them)."""
    idx = pd.DatetimeIndex(ts_ns.view("datetime64[ns]"))
    valid = ~idx.isna()
    out = np.zeros(len(idx), dtype=np.int64)
    if valid.any():
        sub = idx[valid].tz_localize("UTC").tz_convert(zone)
        # local wall time minus UTC wall time == offset
        off_ns = sub.tz_localize(None).asi8 - idx[valid].asi8
        out[np.asarray(valid)] = off_ns // 1_000_000_000
    return out


def _get_cols(batch: pa.Table, ts_col: str, gmtoff_col: str | None):
    gmtoff_col = gmtoff_col or f"{ts_col}_gmtoff"
    ts = batch.column(ts_col).to_pandas().to_numpy(dtype="datetime64[ns]")
    if gmtoff_col in batch.column_names:
        gmtoff = batch.column(gmtoff_col).to_pandas().fillna(-1).to_numpy(dtype=np.int64)
    else:
        gmtoff = np.full(len(ts), -1, dtype=np.int64)
    return gmtoff_col, ts, gmtoff


def _emit(batch: pa.Table, ts_col: str, gmtoff_col: str, ts: np.ndarray, gmtoff: np.ndarray) -> pa.Table:
    out = batch.set_column(batch.column_names.index(ts_col), ts_col,
                           pa.array(pd.Series(ts.view("datetime64[ns]"))))
    arr = pa.array(gmtoff, type=pa.int64())
    if gmtoff_col in out.column_names:
        out = out.set_column(out.column_names.index(gmtoff_col), gmtoff_col, arr)
    else:
        out = out.append_column(gmtoff_col, arr)
    return out


def _apply_fix(ts: np.ndarray, gmtoff: np.ndarray, new_off: np.ndarray,
               valid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """unix_time_fix_timezone: ut_sec -= (new - implied); gmtoff = new."""
    implied = np.where(gmtoff == -1, 0, gmtoff)
    delta_ns = (new_off - implied) * 1_000_000_000
    sec = ts.view(np.int64)
    sec2 = np.where(valid, sec - delta_ns, sec)
    off2 = np.where(valid, new_off, gmtoff)
    return sec2.view("datetime64[ns]"), off2


def fix_time_zone(batch: pa.Table, zone: str, ts_col: str = "ts_stamp",
                  gmtoff_col: str | None = None) -> pa.Table:
    """Vectorized port of unix_time_fix_timezone_with_tzinfo
    (lib/timeutils/unixtime.c:222-321): step 1 adjusts by the offset at
    the original instant, step 2 re-adjusts when the move crossed a DST
    transition, step 3 handles landing INSIDE the transition hour — a
    spring-forward hit skips forward an hour, a fall-back hit keeps the
    second 02:00 and bumps gmtoff. Pinned against
    lib/timeutils/tests/test_unixtime.c's four DST-hour matrices."""
    gmtoff_col, ts, gmtoff = _get_cols(batch, ts_col, gmtoff_col)
    valid = ~np.isnat(ts)
    sec = ts.view(np.int64)
    implied = np.where(gmtoff == -1, 0, gmtoff)
    ns = np.int64(1_000_000_000)

    fixed = zone_offsets_at(sec, zone)
    need = valid & (fixed != gmtoff)
    sec1 = np.where(need, sec - (fixed - implied) * ns, sec)
    off1 = np.where(need, fixed, gmtoff)

    alt = zone_offsets_at(sec1, zone)
    need2 = need & (alt != fixed)
    sec2 = np.where(need2, sec1 - (alt - fixed) * ns, sec1)
    off2 = np.where(need2, alt, off1)

    if need2.any():
        third = zone_offsets_at(sec2, zone)
        in_hour = need2 & (third == fixed)
        spring = in_hour & (alt > fixed)
        sec2 = np.where(spring, sec2 + (alt - fixed) * ns, sec2)
        autumn = in_hour & (alt <= fixed)
        off2 = np.where(autumn, off2 + (fixed - alt), off2)

    return _emit(batch, ts_col, gmtoff_col, sec2.view("datetime64[ns]"),
                 off2)


def set_time_zone(batch: pa.Table, zone: str, ts_col: str = "ts_stamp",
                  gmtoff_col: str | None = None) -> pa.Table:
    gmtoff_col, ts, gmtoff = _get_cols(batch, ts_col, gmtoff_col)
    valid = ~np.isnat(ts)
    new = zone_offsets_at(ts.view(np.int64), zone)
    off = np.where(valid, new, gmtoff)
    return _emit(batch, ts_col, gmtoff_col, ts, off)


def guess_time_zone(batch: pa.Table, now, ts_col: str = "ts_stamp",
                    gmtoff_col: str | None = None) -> pa.Table:
    """`now` is the receive wall-clock (pd.Timestamp, UTC) — passed
    explicitly so pipelines stay deterministic (the reference reads the
    cached realtime clock)."""
    gmtoff_col, ts, gmtoff = _get_cols(batch, ts_col, gmtoff_col)
    valid = ~np.isnat(ts)
    now_sec = int(pd.Timestamp(now).value // 1_000_000_000)
    sec = ts.view(np.int64) // 1_000_000_000
    diff = now_sec - sec
    # quarter-hour rounding, half away from zero (C integer _div_round)
    q = 900
    diff_q = (np.sign(diff) * ((np.abs(diff) + q // 2) // q) * q).astype(np.int64)
    implied = np.where(gmtoff == -1, 0, gmtoff)
    target = implied - diff_q
    guessable = (
        valid
        & (np.abs(diff) < 24 * 3600)
        & (np.abs(diff - diff_q) <= 30)
        & (np.abs(target) <= _MAX_GMTOFF)
    )
    ts1, off1 = _apply_fix(ts, gmtoff, target.astype(np.int64), guessable)
    return _emit(batch, ts_col, gmtoff_col, ts1, off1)
