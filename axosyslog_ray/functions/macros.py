"""Built-in macros: virtual computed-on-read columns.

Mirrors the reference's macro table (reference lib/template/macros.c:50-231
and the LM_VF_MACRO dispatch lib/logmsg/logmsg.h:572-584): FACILITY /
SEVERITY / PRI derived from `pri`, the date macro family in sent
(`ts_stamp`) and received (`R_*` over `warc_ts`) flavors, and passthrough
name aliases for builtin columns. Each macro is a vectorized function
`pa.Table -> pd.Series[str]`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

FACILITY_NAMES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]
SEVERITY_NAMES = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]
FACILITY_NUM = {n: i for i, n in enumerate(FACILITY_NAMES)}
SEVERITY_NUM = {n: i for i, n in enumerate(SEVERITY_NAMES)}
# accepted aliases (reference lib/syslog-names.c)
SEVERITY_NUM.update({"panic": 0, "error": 3, "warn": 4})

BSD_MONTHS = np.array(["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])


def _col(table: pa.Table, name: str) -> pd.Series:
    return table.column(name).to_pandas()


def _str(series: pd.Series) -> pd.Series:
    return series.astype("string").fillna("").astype(object)


def facility_num(table: pa.Table) -> pd.Series:
    return _col(table, "pri") // 8


def severity_num(table: pa.Table) -> pd.Series:
    return _col(table, "pri") % 8


def facility_name(table: pa.Table) -> pd.Series:
    f = facility_num(table).to_numpy(dtype=np.int64)
    names = np.array(FACILITY_NAMES + ["unknown"], dtype=object)
    return pd.Series(names[np.clip(f, 0, len(FACILITY_NAMES))], dtype=object)


def severity_name(table: pa.Table) -> pd.Series:
    s = severity_num(table).to_numpy(dtype=np.int64)
    return pd.Series(np.array(SEVERITY_NAMES, dtype=object)[np.clip(s, 0, 7)], dtype=object)


def _ts(table: pa.Table, col: str) -> pd.Series:
    return _col(table, col)


def _date_macros(col: str, prefix: str = "") -> dict:
    def mk(fn):
        return lambda t: fn(_ts(t, col))

    return {
        prefix + "ISODATE": mk(lambda s: _str(s.dt.strftime("%Y-%m-%dT%H:%M:%S+00:00"))),
        prefix + "FULLDATE": mk(lambda s: _str(s.dt.strftime("%Y %b %d %H:%M:%S"))),
        prefix + "DATE": mk(
            lambda s: _str(
                pd.Series(BSD_MONTHS[s.dt.month.fillna(1).astype(int) - 1], index=s.index)
                + " " + s.dt.day.astype("Int64").astype(str).str.rjust(2)
                + " " + s.dt.strftime("%H:%M:%S")
            )
        ),
        prefix + "YEAR": mk(lambda s: _str(s.dt.strftime("%Y"))),
        prefix + "MONTH": mk(lambda s: _str(s.dt.strftime("%m"))),
        prefix + "DAY": mk(lambda s: _str(s.dt.strftime("%d"))),
        prefix + "HOUR": mk(lambda s: _str(s.dt.strftime("%H"))),
        prefix + "MIN": mk(lambda s: _str(s.dt.strftime("%M"))),
        prefix + "SEC": mk(lambda s: _str(s.dt.strftime("%S"))),
        prefix + "WEEKDAY": mk(lambda s: _str(s.dt.strftime("%a"))),
        # reference lib/template/macros.c:372: tm_wday + 1, Sunday=1..Saturday=7
        # (pandas dayofweek is Monday=0..Sunday=6)
        prefix + "WEEK_DAY": mk(lambda s: _str((((s.dt.dayofweek + 1) % 7) + 1).astype("Int64").astype(str))),
        prefix + "UNIXTIME": mk(
            lambda s: _str(
                pd.Series(s.to_numpy(dtype="datetime64[s]").astype("int64").astype(str), index=s.index).where(
                    s.notna(), ""
                )
            )
        ),
        prefix + "MSEC": mk(lambda s: _str((s.dt.microsecond // 1000).astype("Int64").astype(str).str.zfill(3))),
        prefix + "USEC": mk(lambda s: _str(s.dt.microsecond.astype("Int64").astype(str).str.zfill(6))),
        prefix + "STAMP": mk(lambda s: _str(s.dt.strftime("%Y-%m-%dT%H:%M:%S+00:00"))),
    }


def _passthrough(col: str):
    return lambda t: _str(_col(t, col)) if col in t.column_names else pd.Series([""] * t.num_rows, dtype=object)


MACROS: dict = {
    "HOST": _passthrough("host"),
    "HOST_FROM": _passthrough("host"),
    "PROGRAM": _passthrough("program"),
    "PID": _passthrough("pid"),
    "MSGID": _passthrough("msgid"),
    "MESSAGE": _passthrough("message"),
    "MSG": _passthrough("message"),
    "PRI": lambda t: _str(_col(t, "pri").astype("Int64").astype(str)),
    "FACILITY": facility_name,
    "FACILITY_NUM": lambda t: _str(facility_num(t).astype("Int64").astype(str)),
    "SEVERITY": severity_name,
    "LEVEL": severity_name,
    "SEVERITY_NUM": lambda t: _str(severity_num(t).astype("Int64").astype(str)),
    "LEVEL_NUM": lambda t: _str(severity_num(t).astype("Int64").astype(str)),
    "TAGS": lambda t: (
        _col(t, "tags").map(lambda v: ",".join(v) if isinstance(v, (list, np.ndarray)) else "")
        if "tags" in t.column_names
        else pd.Series([""] * t.num_rows, dtype=object)
    ),
}
MACROS.update(_date_macros("ts_stamp"))
MACROS.update(_date_macros("warc_ts", "R_"))


def eval_macro(name: str, table: pa.Table) -> pd.Series | None:
    fn = MACROS.get(name)
    return fn(table) if fn else None
