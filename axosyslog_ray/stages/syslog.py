"""Syslog header parsing: RFC3164 + RFC5424 with autodetect.

Semantics mirror the reference's initial message parse
(reference modules/syslogformat/syslog-format.c:1045-1239 — autodetect;
pri at :123; RFC5424 SDATA at :562-829; hostname :483; program :348;
RFC3164 year guessing :251-302), re-expressed as vectorized pandas/regex
over an Arrow string column. Parse failure does NOT drop the row here —
it yields `syslog_parsed == False` with the whole line as `message` and
`pri == DEFAULT_PRI`, the reference's no-parse fallback; routing layers
decide what to do with unparsed rows (the reference's parser-failure
drop, lib/parser/parser-expr.c:46-99, is applied by the pipeline).

Vectorization strategy: one compiled master regex per format applied via
`Series.str.extract` (C-driven loop), datetimes via `pd.to_datetime`;
only SDATA map construction touches Python per matching row (map columns
are row-wise by nature).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import DEFAULT_PRI

MONTHS = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"
MON_NUM = {m: i + 1 for i, m in enumerate(MONTHS.split("|"))}

RE_5424 = re.compile(
    r"^<(?P<pri>\d{1,3})>(?P<ver>\d) (?P<ts>\S+) (?P<host>\S+) (?P<app>\S+) "
    r"(?P<pid>\S+) (?P<msgid>\S+) (?P<rest>.*)$",
    re.S,
)
# SD block: one or more [sdid param="value"...] elements; values may contain
# escaped chars (\" \\ \]) per RFC5424 / reference syslog-format.c:562-829.
RE_SD_BLOCK = re.compile(r'^(?P<sd>-|(?:\[[^ \]"=]+(?: [^ \]"=]+="(?:[^"\\]|\\.)*")*\])+)(?: (?P<msg>.*))?$', re.S)
RE_SD_ELEM = re.compile(r'\[([^ \]"=]+)((?: [^ \]"=]+="(?:[^"\\]|\\.)*")*)\]')
RE_SD_PARAM = re.compile(r'([^ \]"=]+)="((?:[^"\\]|\\.)*)"')

RE_3164 = re.compile(
    # separators after the timestamp are ' '-runs (the reference skips
    # ALL spaces before the hostname and before the program name,
    # syslog-format.c:923,955 _skip_chars " " -1); a line ending right
    # after the hostname still parses (empty rest)
    r"^(?:<(?P<pri>\d{1,3})> ?)?(?P<mon>" + MONTHS + r") (?P<day>[ \d]\d) "
    r"(?P<time>\d{2}:\d{2}:\d{2}) +(?P<host>[^ ]+)(?: +(?P<rest>.*))?$",
    re.S,
)
RE_TAG = re.compile(r"^(?P<prog>[^:\[\s]+)(?:\[(?P<pid>[^\]]*)\])?: ?(?P<msg>.*)$", re.S)
# RFC3164 with an RFC5424-style ISO timestamp in the date position —
# accepted by the reference's legacy parser (scan-timestamp.c:213
# __parse_iso_stamp, reached from the 3164 date scan; 'T' separator,
# optional fraction and zone). loggen's default 3164 shape uses this.
RE_3164_ISO = re.compile(
    r"^(?:<(?P<pri>\d{1,3})> ?)?"
    r"(?P<ts>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?"
    r"(?:Z|[+-]\d{2}:?\d{2})?) +(?P<host>[^ ]+)(?: +(?P<rest>.*))?$",
    re.S,
)
# Reference-exact legacy program-name scan (syslog-format.c:348-407
# _syslog_format_parse_legacy_program_name): program = chars up to the
# FIRST ' ', '[' or ':' (may be empty; no colon required — "<189>65536"
# parses PROGRAM="65536"), pid = bracket chars up to ' ', ']' or ':'
# (closing ']' consumed if present), then ONE optional ':' and ONE
# optional ' ' are consumed; everything consumed is $LEGACY_MSGHDR.
# Always matches — the bracket groups are captured raw so an absent pid
# ("" group) is distinguishable from an empty "[]" one, and the consumed
# header can be reassembled byte-exactly.
RE_TAGX = re.compile(
    r"^(?P<prog>[^:\[ ]*)(?P<pidb>\[[^\] :]*\]?)?(?P<colon>:?)(?P<sp> ?)(?P<msg>.*)$",
    re.S,
)


def _extract_legacy_tag(rest: pd.Series) -> pd.DataFrame:
    """Vectorized reference program-name scan over the post-header text.
    Returns string-dtype columns prog / pid / legacy / msg; `pid` is NA
    where no '[' was present OR the scan ran off the end of the data
    (reference sets PID only `if (left)`, syslog-format.c:384-386)."""
    t = _arrow_extract(rest, RE_TAGX)
    prog = t["prog"].fillna("")
    pidb = t["pidb"].fillna("")
    colon = t["colon"].fillna("")
    sp = t["sp"].fillna("")
    msg = t["msg"].fillna("")
    legacy = prog + pidb + colon + sp
    has_pid = pidb != ""
    # scan hit end-of-data inside the brackets: nothing after the pid
    ran_off = has_pid & ~pidb.str.endswith("]") & (colon == "") & (sp == "") & (msg == "")
    core = pidb.str.slice(1)  # pid body may itself contain '[' — slice, don't strip
    core = core.where(~core.str.endswith("]"), core.str.slice(0, -1))
    pid = core.where(has_pid & ~ran_off)
    return pd.DataFrame({"prog": prog, "pid": pid, "legacy": legacy, "msg": msg})


def _arrow_extract(strings: pd.Series, pattern: re.Pattern) -> pd.DataFrame:
    """`pc.extract_regex` (RE2, one C pass) -> DataFrame of string-dtype
    columns; non-matching rows are NA in every column. Unmatched OPTIONAL
    groups inside a matching row come back as "" (RE2 semantics) — callers
    normalize where that matters."""
    arr = pa.array(strings.to_numpy(dtype=object), type=pa.string())
    st = pc.extract_regex(arr, pattern="(?s)" + pattern.pattern)
    return pd.DataFrame(
        {name: pc.struct_field(st, name).to_pandas().astype("string") for name in pattern.groupindex}
    )

_SD_UNESCAPE = re.compile(r'\\([\\"\]])')


def _unescape_sd(v: str) -> str:
    return _SD_UNESCAPE.sub(r"\1", v)


# single-pass scanner: one finditer per block instead of per-element +
# per-param engine invocations (flagship hot path, ~12% of the fused
# stage). Values may be quoted OR unquoted-until-space/']' — the
# reference accepts both (syslog-format.c:711-769 sd-param-value)
RE_SD_TOKEN = re.compile(
    r'\[([^ \]"=]+)|([^ \]"=]+)=(?:"((?:[^"\\]|\\.)*)"|([^ \]]*))')


def parse_sdata(sd: str) -> list[tuple[str, str]] | None:
    """Parse an RFC5424 STRUCTURED-DATA block into [('sdid.param', value)].

    Key layout matches the reference's `.SDATA.<sdid>.<param>` naming minus
    the fixed prefix (reference syslog-format.c:562-829)."""
    if sd == "-" or not sd:
        return None
    out: list[tuple[str, str]] = []
    sdid = ""
    for m in RE_SD_TOKEN.finditer(sd):
        if m.group(1) is not None:
            sdid = m.group(1)
        else:
            v = m.group(3)
            if v is not None:
                if "\\" in v:
                    v = _unescape_sd(v)
            else:
                v = m.group(4)  # unquoted value, verbatim
            out.append((f"{sdid}.{m.group(2)}", v))
    return out




def guess_year(mon_num: np.ndarray, recv: pd.Series) -> np.ndarray:
    """RFC3164 timestamps carry no year; guess the one nearest the receive
    time (reference syslog-format.c:251-302): receive-year, minus one when
    the stamp says December but we received in January, plus one for the
    mirror case."""
    year = recv.dt.year.to_numpy().copy()
    rmon = recv.dt.month.to_numpy()
    year[(mon_num == 12) & (rmon == 1)] -= 1
    year[(mon_num == 1) & (rmon == 12)] += 1
    return year


def _obj(series: pd.Series) -> np.ndarray:
    """pandas Series -> numpy object array with None (not pd.NA) for nulls."""
    arr = series.to_numpy(dtype=object, copy=True)
    na = series.isna().to_numpy()
    arr[na] = None
    return arr


def parse_syslog_table(
    table: pa.Table, col: str = "text", recv_ts_col: str = "warc_ts",
    check_program: bool = False
) -> pa.Table:
    """Append parsed header columns to an Arrow batch (the first map_batches
    stage of the flagship pipeline).

    check_program mirrors LP_CHECK_PROGRAM (syslog-format.c:332-373):
    an RFC3164 program name must be [A-Za-z0-9._-()/]+ with at least one
    letter; otherwise PROGRAM/PID stay unset, the whole tail stays in
    the message, and the row is tagged syslog.rfc3164_invalid_program
    (pins test_syslog_format.c rfc3164_check_program_*)."""
    n = table.num_rows
    s = table.column(col).to_pandas().astype("string").fillna("")
    recv = table.column(recv_ts_col).to_pandas() if recv_ts_col in table.column_names else pd.Series(
        np.full(n, np.datetime64("2026-01-01", "us"))
    )

    pri = np.full(n, DEFAULT_PRI, dtype=np.int64)
    ts = np.full(n, np.datetime64("NaT"), dtype="datetime64[us]")
    host = np.full(n, None, dtype=object)
    program = np.full(n, None, dtype=object)
    pid = np.full(n, None, dtype=object)
    msgid = np.full(n, None, dtype=object)
    message = s.to_numpy(dtype=object).copy()
    legacy = np.full(n, None, dtype=object)  # $LEGACY_MSGHDR raw header bytes
    sdata = np.full(n, None, dtype=object)
    parsed = np.zeros(n, dtype=bool)
    fmt = np.full(n, None, dtype=object)
    tags_col = np.full(n, None, dtype=object)

    arrow_text = table.column(col) if table.column(col).null_count == 0 else pa.array(
        s.to_numpy(dtype=object), type=pa.string()
    )

    # ---------- RFC5424 ----------
    # detection + master extraction via Arrow RE2 (2.6x pandas, no PyObject
    # churn on the unmatched rows; measured in BASELINE.md opt log)
    is5424 = pc.match_substring_regex(arrow_text, r"^<\d{1,3}>\d ").to_numpy(zero_copy_only=False)
    is5424 = np.asarray(is5424, dtype=bool)
    if is5424.any():
        # filter BEFORE extracting: the full regex runs only on candidate
        # rows, not the whole (mostly-3164) corpus
        sub_text = pc.cast(arrow_text, pa.string()).filter(pa.array(is5424))
        sub_struct = pc.extract_regex(sub_text, pattern="(?s)" + RE_5424.pattern)  # (?s): RE2 ignores Python re.S
        ex = pd.DataFrame(
            {name: pc.struct_field(sub_struct, name).to_pandas().astype("string") for name in RE_5424.groupindex}
        )
        ok = ex["pri"].notna().to_numpy()
        rows = np.flatnonzero(is5424)[ok]
        exo = ex[ok]
        pri[rows] = exo["pri"].astype(int).to_numpy()
        tss = exo["ts"].where(exo["ts"] != "-", None)
        with np.errstate(all="ignore"):
            tparsed = pd.to_datetime(tss, errors="coerce", utc=True, format="ISO8601")
        ts[rows] = tparsed.dt.tz_localize(None).to_numpy(dtype="datetime64[us]", na_value=np.datetime64("NaT"))
        # nil ('-') fields stay null, matching the reference's unset values
        for colname, arr in (("host", host), ("app", program), ("pid", pid), ("msgid", msgid)):
            arr[rows] = _obj(exo[colname].where(exo[colname] != "-"))
        rest = exo["rest"].astype("string")
        sd_ex = _arrow_extract(rest, RE_SD_BLOCK)
        sd_ok = sd_ex["sd"].notna().to_numpy()
        msg_vals = np.where(sd_ok, _obj(sd_ex["msg"].fillna("")), _obj(rest))
        message[rows] = msg_vals
        sd_strs = sd_ex["sd"].to_numpy(dtype=object)
        sdata[rows] = [parse_sdata(x) if isinstance(x, str) else None for x in sd_strs]
        parsed[rows] = True
        fmt[rows] = "rfc5424"

    # ---------- RFC3164 ----------
    cand = ~is5424
    if cand.any():
        sub_text3 = pc.cast(arrow_text, pa.string()).filter(pa.array(cand))
        sub3 = pc.extract_regex(sub_text3, pattern="(?s)" + RE_3164.pattern)
        ex = pd.DataFrame(
            {name: pc.struct_field(sub3, name).to_pandas().astype("string") for name in RE_3164.groupindex}
        )
        # RE2 yields "" (not null) for an unmatched optional group inside a
        # matching row — normalize the optional pri back to NA
        ex.loc[ex["pri"] == "", "pri"] = pd.NA
        ok = ex["mon"].notna().to_numpy()
        rows = np.flatnonzero(cand)[ok]
        if len(rows):
            exo = ex[ok]
            pv = exo["pri"]
            has_pri = pv.notna().to_numpy()
            pri[rows[has_pri]] = pv[pv.notna()].astype(int).to_numpy()
            mon_num = exo["mon"].map(MON_NUM).to_numpy(dtype=np.int64)
            day = exo["day"].str.strip().astype(int).to_numpy()
            year = guess_year(mon_num, recv.iloc[rows].reset_index(drop=True))
            hms = exo["time"].reset_index(drop=True).astype(str)
            with np.errstate(all="ignore"):
                # dict-form to_datetime: numeric assembly, no string concat
                tparsed = pd.to_datetime(
                    {
                        "year": year,
                        "month": mon_num,
                        "day": day,
                        "hour": hms.str.slice(0, 2).astype(int),
                        "minute": hms.str.slice(3, 5).astype(int),
                        "second": hms.str.slice(6, 8).astype(int),
                    },
                    errors="coerce",
                )
            ts[rows] = tparsed.to_numpy(dtype="datetime64[us]", na_value=np.datetime64("NaT"))
            host[rows] = _obj(exo["host"])
            rest = exo["rest"].fillna("").astype("string")
            tag = _extract_legacy_tag(rest)
            # the legacy scan always parses (no colon required); under
            # check_program an invalid name leaves PROGRAM/PID unset with
            # the full tail as the message (reference early return)
            tag_ok = np.ones(len(rows), dtype=bool)
            if check_program:
                progs = tag["prog"]
                okp = (progs.str.fullmatch(r"[A-Za-z0-9._\-()/]+").fillna(False)
                       & progs.str.contains("[A-Za-z]", regex=True).fillna(False)
                       ).to_numpy(dtype=bool)
                badp = tag_ok & ~okp
                if badp.any():
                    # reference: invalid program -> PROGRAM/PID unset, the
                    # full tail stays the message, tagged
                    tag_ok = tag_ok & okp
                    for i in rows[badp]:
                        tags_col[i] = ["syslog.rfc3164_invalid_program"]
            program[rows[tag_ok]] = _obj(tag["prog"])[tag_ok]
            pid[rows[tag_ok]] = _obj(tag["pid"])[tag_ok]
            message[rows] = np.where(tag_ok, _obj(tag["msg"]), _obj(rest))
            leg = _obj(tag["legacy"].where(tag["legacy"] != ""))
            legacy[rows[tag_ok]] = leg[tag_ok]
            parsed[rows] = True
            fmt[rows] = "rfc3164"

    # ---------- RFC3164 with ISO timestamp ----------
    # the legacy date scan also accepts an RFC5424-style ISO stamp
    # (scan-timestamp.c:213 __parse_iso_stamp); host/tag parse continues
    # exactly like the BSD-stamp branch
    cand_iso = ~is5424 & ~parsed
    if cand_iso.any():
        sub_i = pc.cast(arrow_text, pa.string()).filter(pa.array(cand_iso))
        exi = pd.DataFrame(
            {name: pc.struct_field(
                pc.extract_regex(sub_i, pattern="(?s)" + RE_3164_ISO.pattern),
                name).to_pandas().astype("string")
             for name in RE_3164_ISO.groupindex})
        exi.loc[exi["pri"] == "", "pri"] = pd.NA
        ok = exi["ts"].notna().to_numpy()
        rows = np.flatnonzero(cand_iso)[ok]
        if len(rows):
            exo = exi[ok]
            pv = exo["pri"]
            has_pri = pv.notna().to_numpy()
            pri[rows[has_pri]] = pv[pv.notna()].astype(int).to_numpy()
            with np.errstate(all="ignore"):
                tparsed = pd.to_datetime(exo["ts"], errors="coerce",
                                         utc=True, format="ISO8601")
            ts[rows] = tparsed.dt.tz_localize(None).to_numpy(
                dtype="datetime64[us]", na_value=np.datetime64("NaT"))
            host[rows] = _obj(exo["host"])
            rest = exo["rest"].fillna("").astype("string")
            tag = _extract_legacy_tag(rest)
            tag_ok = np.ones(len(rows), dtype=bool)
            if check_program:
                progs = tag["prog"]
                okp = (progs.str.fullmatch(r"[A-Za-z0-9._\-()/]+")
                       .fillna(False)
                       & progs.str.contains("[A-Za-z]", regex=True)
                       .fillna(False)).to_numpy(dtype=bool)
                badp = tag_ok & ~okp
                if badp.any():
                    tag_ok = tag_ok & okp
                    for i in rows[badp]:
                        tags_col[i] = ["syslog.rfc3164_invalid_program"]
            program[rows[tag_ok]] = _obj(tag["prog"])[tag_ok]
            pid[rows[tag_ok]] = _obj(tag["pid"])[tag_ok]
            message[rows] = np.where(tag_ok, _obj(tag["msg"]), _obj(rest))
            leg = _obj(tag["legacy"].where(tag["legacy"] != ""))
            legacy[rows[tag_ok]] = leg[tag_ok]
            parsed[rows] = True
            fmt[rows] = "rfc3164"

    # ---------- RFC3164 with PRI but missing timestamp ----------
    # `<189> program[pid]: message` parses TAG-only: no host, stamp=recv,
    # tags syslog.missing_timestamp + rfc3164_missing_header (reference
    # tests/test_syslog_format.c rfc3164_error_missing_timestamp)
    nots = ~parsed & s.str.match(r"^<\d{1,3}>", na=False).to_numpy()
    if nots.any():
        rest = s[nots].str.replace(r"^<\d{1,3}> *", "", regex=True).astype("string")
        pv = s[nots].str.extract(r"^<(\d{1,3})>")[0]
        tag = _extract_legacy_tag(rest)
        rows = np.flatnonzero(nots)
        # the legacy scan always runs here (reference parses the program
        # name even in the missing-header branch: "<189>65536" yields
        # PROGRAM="65536", syslog-format.c:978-981)
        tag_ok = np.ones(len(rows), dtype=bool)
        if check_program:
            progs = tag["prog"]
            okp = (progs.str.fullmatch(r"[A-Za-z0-9._\-()/]+").fillna(False)
                   & progs.str.contains("[A-Za-z]", regex=True).fillna(False)
                   ).to_numpy(dtype=bool)
            tag_ok = okp
        pri[rows] = pv.astype(int).to_numpy()
        program[rows[tag_ok]] = _obj(tag["prog"])[tag_ok]
        pid[rows[tag_ok]] = _obj(tag["pid"])[tag_ok]
        message[rows] = np.where(tag_ok, _obj(tag["msg"]), _obj(rest))
        leg = _obj(tag["legacy"].where(tag["legacy"] != ""))
        legacy[rows[tag_ok]] = leg[tag_ok]
        ts[rows] = recv.to_numpy(dtype="datetime64[us]")[rows]  # stamp = receive time
        parsed[rows] = True
        fmt[rows] = "rfc3164"
        for k, i in enumerate(rows):
            tags_col[i] = ["syslog.missing_timestamp", "syslog.rfc3164_missing_header"]
            if not tag_ok[k]:
                tags_col[i] = tags_col[i] + ["syslog.rfc3164_invalid_program"]

    # ---------- invalid PRI: a '<' prefix that never closes ----------
    # the reference accepts the line, shoves it whole into MSG and tags
    # syslog.invalid_pri (syslog-format.c:1076-1080,
    # test_syslog_format.c rfc3164_error_invalid_pri)
    ipri = (~parsed & s.str.startswith("<").to_numpy(dtype=bool)
            & ~s.str.match(r"^<\d{1,3}>", na=False).to_numpy(dtype=bool))
    if ipri.any():
        rows = np.flatnonzero(ipri)
        parsed[rows] = True
        fmt[rows] = "rfc3164"
        ts[rows] = recv.to_numpy(dtype="datetime64[us]")[rows]
        for i in rows:
            tags_col[i] = ["syslog.invalid_pri"]

    # unparsed rows: stamp falls back to receive time (reference no-parse path)
    unp = ~parsed
    ts[unp] = recv.to_numpy(dtype="datetime64[us]")[unp]

    out = table
    for name, arr, typ in (
        ("pri", pri, pa.uint16()),
        ("ts_stamp", ts, pa.timestamp("us")),
        ("host", host, pa.string()),
        ("program", program, pa.string()),
        ("pid", pid, pa.string()),
        ("msgid", msgid, pa.string()),
        ("message", message, pa.string()),
        ("legacy_msghdr", legacy, pa.string()),
        ("sdata", sdata, pa.map_(pa.string(), pa.string())),
        ("syslog_parsed", parsed, pa.bool_()),
        ("msgformat", fmt, pa.string()),
        ("tags", tags_col, pa.list_(pa.string())),
    ):
        col = pa.array(arr, type=typ)
        if name in out.column_names:  # re-parse overwrites (syslog-parser() on a field)
            out = out.set_column(out.column_names.index(name), name, col)
        else:
            out = out.append_column(name, col)
    return out


# ---------------------------------------------------------------------------
# Pure-Python scalar reference implementation (the §5 oracle for the
# vectorized path; SURVEY.md §7.3). Never used in pipelines.
# ---------------------------------------------------------------------------

def _scan_legacy_tag(rest: str) -> tuple[str, str | None, str | None, str]:
    """Scalar reference program-name scan -> (prog, pid, legacy, msg)."""
    m = RE_TAGX.match(rest)
    prog = m.group("prog") or ""
    pidb = m.group("pidb") or ""
    colon = m.group("colon") or ""
    sp = m.group("sp") or ""
    msg = m.group("msg") or ""
    pid = None
    if pidb:
        ran_off = not pidb.endswith("]") and not colon and not sp and not msg
        if not ran_off:
            core = pidb[1:]
            pid = core[:-1] if core.endswith("]") else core
    return prog, pid, (prog + pidb + colon + sp) or None, msg


def parse_syslog_line(line: str, recv_ts, check_program: bool = False) -> dict:
    recv = pd.Timestamp(recv_ts)
    out = {
        "pri": DEFAULT_PRI, "ts_stamp": None, "host": None, "program": None,
        "pid": None, "msgid": None, "message": line, "legacy_msghdr": None,
        "sdata": None, "syslog_parsed": False, "msgformat": None, "tags": None,
    }
    m = RE_5424.match(line)
    if m and re.match(r"^<\d{1,3}>\d ", line):
        out["pri"] = int(m.group("pri"))
        if m.group("ts") != "-":
            # format='ISO8601' mirrors the vectorized path: a non-RFC3339
            # string in the TIMESTAMP slot must coerce to null on BOTH
            t = pd.to_datetime(m.group("ts"), utc=True, errors="coerce", format="ISO8601")
            out["ts_stamp"] = None if pd.isna(t) else t.tz_localize(None)
        for k, g in (("host", "host"), ("program", "app"), ("pid", "pid"), ("msgid", "msgid")):
            v = m.group(g)
            out[k] = None if v == "-" else v
        sdm = RE_SD_BLOCK.match(m.group("rest"))
        if sdm:
            out["sdata"] = parse_sdata(sdm.group("sd"))
            out["message"] = sdm.group("msg") or ""
        else:
            out["message"] = m.group("rest")
        out["syslog_parsed"], out["msgformat"] = True, "rfc5424"
        return out
    m = RE_3164.match(line)
    if m:
        if m.group("pri") is not None:
            out["pri"] = int(m.group("pri"))
        mon = MON_NUM[m.group("mon")]
        year = recv.year
        if mon == 12 and recv.month == 1:
            year -= 1
        elif mon == 1 and recv.month == 12:
            year += 1
        # errors='coerce' semantics like the vectorized dict-form
        # to_datetime: a calendar-invalid date (Feb 30) -> null, not raise
        t = pd.to_datetime(f"{year}-{mon:02d}-{int(m.group('day')):02d} {m.group('time')}",
                           errors="coerce")
        out["ts_stamp"] = None if pd.isna(t) else t
        out["host"] = m.group("host")
        prog, pidv, legacyv, msgv = _scan_legacy_tag(m.group("rest") or "")
        if check_program and not (
                re.fullmatch(r"[A-Za-z0-9._\-()/]+", prog)
                and re.search("[A-Za-z]", prog)):
            out["message"] = m.group("rest") or ""
            out["tags"] = ["syslog.rfc3164_invalid_program"]
        else:
            out["program"], out["pid"], out["message"] = prog, pidv, msgv
            out["legacy_msghdr"] = legacyv
        out["syslog_parsed"], out["msgformat"] = True, "rfc3164"
        return out
    mp = re.match(r"^<(\d{1,3})> *(.*)$", line, re.S)
    if mp:
        out["pri"] = int(mp.group(1))
        out["ts_stamp"] = recv
        out["syslog_parsed"], out["msgformat"] = True, "rfc3164"
        out["tags"] = ["syslog.missing_timestamp", "syslog.rfc3164_missing_header"]
        prog, pidv, legacyv, msgv = _scan_legacy_tag(mp.group(2))
        if check_program and not (
                re.fullmatch(r"[A-Za-z0-9._\-()/]+", prog)
                and re.search("[A-Za-z]", prog)):
            out["message"] = mp.group(2)
            out["tags"] = out["tags"] + ["syslog.rfc3164_invalid_program"]
        else:
            out["program"], out["pid"], out["message"] = prog, pidv, msgv
            out["legacy_msghdr"] = legacyv
        return out
    if line.startswith("<") and not re.match(r"^<\d{1,3}>", line):
        out["syslog_parsed"], out["msgformat"] = True, "rfc3164"
        out["tags"] = ["syslog.invalid_pri"]
    out["ts_stamp"] = recv
    return out
