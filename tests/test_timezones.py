"""fix/set/guess-time-zone rewrite tests (reference modules/timestamp/)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from axosyslog_ray.stages.timezones import fix_time_zone, guess_time_zone, set_time_zone


def _t(*ts, gmtoff=None):
    cols = {"ts_stamp": pa.array(pd.Series(pd.to_datetime(list(ts)), dtype="datetime64[ns]"))}
    if gmtoff is not None:
        cols["ts_stamp_gmtoff"] = pa.array(gmtoff, type=pa.int64())
    return pa.table(cols)


def test_fix_time_zone_reinterprets_wall_clock():
    # parsed as UTC (implied 0) but actually Budapest summer time (+02:00):
    # ut_sec moves back 2h, gmtoff becomes 7200
    out = fix_time_zone(_t("2026-08-17 12:00:00"), "Europe/Budapest")
    assert str(out.column("ts_stamp").to_pylist()[0]) == "2026-08-17 10:00:00"
    assert out.column("ts_stamp_gmtoff").to_pylist() == [7200]


def test_fix_time_zone_respects_implied_offset():
    # already annotated +01:00; fixing to +02:00 moves only the delta
    out = fix_time_zone(_t("2026-08-17 12:00:00", gmtoff=[3600]), "Europe/Budapest")
    assert str(out.column("ts_stamp").to_pylist()[0]) == "2026-08-17 11:00:00"
    assert out.column("ts_stamp_gmtoff").to_pylist() == [7200]


def test_fix_time_zone_winter_offset_differs():
    # winter: Budapest is +01:00 (DST-correct lookup)
    out = fix_time_zone(_t("2026-01-15 12:00:00"), "Europe/Budapest")
    assert str(out.column("ts_stamp").to_pylist()[0]) == "2026-01-15 11:00:00"
    assert out.column("ts_stamp_gmtoff").to_pylist() == [3600]


def test_set_time_zone_keeps_instant():
    out = set_time_zone(_t("2026-08-17 12:00:00"), "America/New_York")
    assert str(out.column("ts_stamp").to_pylist()[0]) == "2026-08-17 12:00:00"
    assert out.column("ts_stamp_gmtoff").to_pylist() == [-4 * 3600]


def test_guess_time_zone_quarter_hour():
    now = pd.Timestamp("2026-08-17 10:00:05")
    # message 2h ahead of real time -> guessed zone +02:00, instant fixed
    out = guess_time_zone(_t("2026-08-17 12:00:00"), now)
    assert str(out.column("ts_stamp").to_pylist()[0]) == "2026-08-17 10:00:00"
    assert out.column("ts_stamp_gmtoff").to_pylist() == [7200]


def test_guess_time_zone_rejects_non_quarter_and_old():
    now = pd.Timestamp("2026-08-17 10:00:00")
    # 37 min off: not a quarter-hour multiple -> untouched
    out = guess_time_zone(_t("2026-08-17 10:37:00"), now)
    assert str(out.column("ts_stamp").to_pylist()[0]) == "2026-08-17 10:37:00"
    assert out.column("ts_stamp_gmtoff").to_pylist() == [-1]
    # > 24h off -> untouched
    out = guess_time_zone(_t("2026-08-20 10:00:00"), now)
    assert str(out.column("ts_stamp").to_pylist()[0]) == "2026-08-20 10:00:00"


def test_fix_time_zone_null_ts_untouched():
    out = fix_time_zone(_t("2026-08-17 12:00:00", None), "Europe/Budapest")
    vals = out.column("ts_stamp").to_pylist()
    assert vals[1] is None
    assert out.column("ts_stamp_gmtoff").to_pylist()[1] == -1
