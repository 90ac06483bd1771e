"""unix_time fix/set/guess timezone conformance.

Pins lib/timeutils/tests/test_unixtime.c through stages/timezones: the
four DST-transition-hour matrices (spring/autumn, fixing towards a
zone behind/ahead), plain-offset fix and set semantics, automatic DST
resolution in set, and the guess (fix-assuming-real-time) extremes at
even and quarter-hour offsets.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from axosyslog_ray.stages.timezones import (fix_time_zone, guess_time_zone,
                                            set_time_zone)


def _batch(sec: int, gmtoff: int):
    ts = np.array([sec * 1_000_000_000], dtype="datetime64[ns]")
    return pa.table({
        "ts_stamp": pa.Array.from_pandas(pd.Series(ts)),
        "ts_stamp_gmtoff": pa.array([gmtoff], type=pa.int64()),
    })


def _result(out: pa.Table):
    sec = out.column("ts_stamp").to_pandas().astype("int64").iloc[0]
    return sec // 1_000_000_000, int(
        out.column("ts_stamp_gmtoff").to_pandas().iloc[0])


def fix(base_sec, add, zone, gmtoff=3600):
    return _result(fix_time_zone(_batch(base_sec + add, gmtoff), zone))


def test_fix_timezone_adjusts_timestamp_with_plain_offset():
    # Jan 19 2019 18:58:48 +01:00 -> fixed to -05:00 keeps the wall clock
    base = 1547920728  # 17:58:48 UTC == 18:58:48 CET
    sec, off = fix(base, 0, "Etc/GMT+5")
    assert off == -5 * 3600
    # ut_sec -= (new - implied): the instant moves by 6 hours, and the
    # wall clock in the new zone is still 18:58:48
    assert sec == base + 6 * 3600
    assert sec + off == base + 3600


def test_fix_to_zone_backwards_during_spring_dst_hour():
    # base: Mar 10 2019 02:00:00 CET assumed, fixed to EST5EDT
    base, dst = 1552179600, 1552201200
    assert fix(base, -1, "EST5EDT") == (dst - 1, -5 * 3600)
    assert fix(base, 0, "EST5EDT") == (dst, -4 * 3600)
    assert fix(base, 1800, "EST5EDT") == (dst + 1800, -4 * 3600)
    # 03:00:00 collapses onto the DST start (the skipped hour)
    assert fix(base, 3600, "EST5EDT") == (dst, -4 * 3600)
    assert fix(base, 7200, "EST5EDT") == (dst + 3600, -4 * 3600)


def test_fix_to_zone_forwards_during_spring_dst_hour():
    # base: Mar 31 2019 02:00:00 EST5EDT assumed, fixed to CET
    base, dst = 1554012000, 1553994000
    g = -4 * 3600
    assert fix(base, -1, "CET", g) == (dst - 1, 3600)
    assert fix(base, 0, "CET", g) == (dst, 2 * 3600)
    assert fix(base, 1800, "CET", g) == (dst + 1800, 2 * 3600)
    assert fix(base, 3600, "CET", g) == (dst, 2 * 3600)
    assert fix(base, 7200, "CET", g) == (dst + 3600, 2 * 3600)


def test_fix_to_zone_backwards_during_autumn_dst_hour():
    # base: Nov 3 2019 02:00:00 CET assumed, fixed to EST5EDT; past the
    # DST end the ambiguous hour resolves to the SECOND 02:00 (EST)
    base, dst = 1572742800, 1572760800
    assert fix(base, -1, "EST5EDT") == (dst - 1, -4 * 3600)
    assert fix(base, 0, "EST5EDT") == (dst + 3600, -5 * 3600)
    assert fix(base, 1800, "EST5EDT") == (dst + 3600 + 1800, -5 * 3600)
    assert fix(base, 3600, "EST5EDT") == (dst + 3600 + 3600, -5 * 3600)
    assert fix(base, 7200, "EST5EDT") == (dst + 3600 + 7200, -5 * 3600)


def test_fix_to_zone_forwards_during_autumn_dst_hour():
    # base: Oct 27 2019 02:00:00 EST5EDT assumed, fixed to CET
    base, dst = 1572156000, 1572134400
    g = -4 * 3600
    assert fix(base, -1, "CET", g) == (dst - 1, 2 * 3600)
    assert fix(base, 0, "CET", g) == (dst + 3600, 3600)
    assert fix(base, 1800, "CET", g) == (dst + 3600 + 1800, 3600)
    assert fix(base, 3600, "CET", g) == (dst + 3600 + 3600, 3600)
    assert fix(base, 7200, "CET", g) == (dst + 3600 + 7200, 3600)


def test_set_timezone_keeps_instant_changes_offset():
    base = 1547920728
    sec, off = _result(set_time_zone(_batch(base, 3600), "Etc/GMT+5"))
    assert sec == base  # the instant does not move
    assert off == -5 * 3600


def test_set_timezone_with_tzinfo_calculates_dst_automatically():
    # Mar 10 2019 01:59:59 EST -> EST; +1s -> EDT
    spring = 1552201199  # 01:59:59 EST == 06:59:59 UTC
    assert _result(set_time_zone(_batch(spring, -5 * 3600),
                                 "EST5EDT"))[1] == -5 * 3600
    assert _result(set_time_zone(_batch(spring + 1, -5 * 3600),
                                 "EST5EDT"))[1] == -4 * 3600
    # Nov 3 2019 01:59:59 EDT -> EDT; +1s -> EST
    autumn = 1572760799
    assert _result(set_time_zone(_batch(autumn, -4 * 3600),
                                 "EST5EDT"))[1] == -4 * 3600
    assert _result(set_time_zone(_batch(autumn + 1, -4 * 3600),
                                 "EST5EDT"))[1] == -5 * 3600


NOW = 1576790744  # Thu Dec 19 22:25:44 CET 2019


def _guess(sec: int, gmtoff: int = 3600):
    out = guess_time_zone(_batch(sec, gmtoff),
                          now=pd.Timestamp(NOW, unit="s"))
    return _result(out)


def test_guess_timezone_for_even_hour_differences():
    # one hour earlier than real time -> +00:00
    assert _guess(NOW - 3600) == (NOW, 0)
    # 13 hours earlier -> the -12:00 extreme
    assert _guess(NOW - 13 * 3600) == (NOW, -12 * 3600)
    # 13 hours later -> the +14:00 extreme
    assert _guess(NOW + 13 * 3600) == (NOW, 14 * 3600)


def test_guess_timezone_for_quarter_hour_differences():
    # a 5:45 earlier wall clock implies gmtoff 01:00 - 05:45 = -04:45
    # (quarter-hour offsets within [-12:00, +14:00] are accepted)
    assert _guess(NOW - 5 * 3600 - 45 * 60) == (NOW, 3600 - 5 * 3600 - 45 * 60)


def test_guess_timezone_rejects_out_of_range():
    # 15 hours later exceeds +14:00 -> timestamp kept as-is
    sec, off = _guess(NOW + 15 * 3600)
    assert sec == NOW + 15 * 3600
    assert off == 3600
