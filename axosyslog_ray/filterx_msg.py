"""FilterX message-context + network-object functions.

Completes the reference's builtin function surface (registered in
reference lib/filterx/filterx-globals.c) that needs either the whole
message row (sdata / timestamps / metrics) or a typed network object
(ip() / subnet(), reference lib/filterx/object-ip.c + object-subnet.c):

  ip(x) subnet(x)            typecasts; `ip in subnet` membership
  digest(x, alg)             generic digest (func-digest.c)
  has_sdata() get_sdata()    sdata map -> nested {sdid: {param: value}}
  is_sdata_from_enterprise("num")          (func-sdata.c)
  get_timestamp(stamp=) set_timestamp(dt, stamp=)   (func-timestamp.c;
      "stamp" -> ts_stamp column, "recvd" -> warc_ts column)
  get_timezone_source(dt)    tz-source tag carried on Series.attrs
      ("parsed"/"fixed"/"guessed"/"assumed", lib/timeutils/unixtime.c:428)
  format_syslog_5424(message, add_octet_count=, pri=, timestamp=,
      host=, program=, pid=, msgid=)       (modules/syslogformat/
      filterx-func-format-syslog.c:226-292 byte layout)
  metrics_labels(d) dedup_metrics_labels(l) update_metric(key, labels=,
      increment=, level=)    (lib/filterx/object-metrics-labels.c,
      modules/metrics-probe/filterx/func-update-metric.c) — counters
      accumulate per actor on the FilterX stage instance; a pipeline
      surfaces them with aggregate.pre_aggregated_count over the
      stage's snapshot (Ray-native: no global stats registry).
  failure_info_enable/clear/meta/failure_info      (func-failure-info.c)
      — function-eval exceptions under an enabled collector become
      per-program entries instead of raising.

All vectorized where the data is columnar; ip/subnet construction is
per-row over Python `ipaddress` (object column — these are boundary
casts, not hot-path string kernels).
"""

from __future__ import annotations

import ipaddress

import numpy as np
import pandas as pd


def _arg_scalar(b):
    if not isinstance(b, pd.Series):
        return b
    nn = b[~pd.isna(b)]
    return nn.iloc[0] if len(nn) else ""


def _null_series(n):
    return pd.Series([None] * n, dtype=object)


# ---------------------------------------------------------------------------
# digest (reference lib/filterx/func-digest.c: digest(input, alg="sha256"))
# ---------------------------------------------------------------------------

_DIGEST_ALGS = {"md5", "sha1", "sha256", "sha512"}


def digest(a: pd.Series, alg=None) -> pd.Series:
    import hashlib

    method = str(_arg_scalar(alg)) if alg is not None else "sha256"
    if method not in _DIGEST_ALGS:
        raise ValueError(f"digest(): unsupported algorithm {method!r}")
    h = getattr(hashlib, method)
    out = [
        None if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v))
        else h(v.encode() if isinstance(v, str) else v).hexdigest()
        for v in a
    ]
    return pd.Series(out, dtype=object)


# ---------------------------------------------------------------------------
# ip() / subnet() objects (object-ip.c / object-subnet.c)
# ---------------------------------------------------------------------------

class FxSubnet:
    """A parsed subnet: address (pre-masked) + netmask, v4 or v6.

    String form matches the reference's marshal (_subnet_to_string):
    "addr/netmask" with the netmask in dotted-quad (v4) or hex-group
    (v6) notation — NOT prefix notation. The v4 parser accepts plain
    address (/32), /prefix, and /dotted-mask (object-subnet.c:170-206);
    v6 accepts plain (/128) and /prefix. Truthy iff the address is not
    the all-zero address (v4 semantics; the reference's v6 branch
    inverts the test, a bug we do not reproduce)."""

    __slots__ = ("version", "addr", "mask")

    def __init__(self, version: int, addr: int, mask: int):
        self.version = version
        self.addr = addr & mask
        self.mask = mask

    @classmethod
    def parse(cls, cidr: str) -> "FxSubnet | None":
        cidr = cidr.strip()
        addr_part, _, mask_part = cidr.partition("/")
        try:
            base = ipaddress.ip_address(addr_part)
        except ValueError:
            return None
        bits = 32 if base.version == 4 else 128
        if not mask_part:
            mask = (1 << bits) - 1
        elif base.version == 4 and "." in mask_part:
            try:
                mask = int(ipaddress.IPv4Address(mask_part))
            except ValueError:
                return None
        else:
            try:
                prefix = int(mask_part)
            except ValueError:
                return None
            if not 0 <= prefix <= bits:
                return None
            mask = 0 if prefix == 0 else (((1 << prefix) - 1) << (bits - prefix))
        return cls(base.version, int(base), mask)

    def contains(self, member) -> bool:
        """Membership per _subnet_contains: a string member is parsed as
        an IP; family mismatch / parse failure -> false."""
        if isinstance(member, str):
            try:
                member = ipaddress.ip_address(member.strip())
            except ValueError:
                return False
        if not isinstance(member, (ipaddress.IPv4Address, ipaddress.IPv6Address)):
            return False
        if member.version != self.version:
            return False
        return (int(member) & self.mask) == self.addr

    def __str__(self):
        if self.version == 4:
            return f"{ipaddress.IPv4Address(self.addr)}/{ipaddress.IPv4Address(self.mask)}"
        return f"{ipaddress.IPv6Address(self.addr)}/{ipaddress.IPv6Address(self.mask)}"

    def __repr__(self):
        return f"subnet('{self}')"

    def __bool__(self):
        return self.addr != 0

    def __eq__(self, other):
        return (isinstance(other, FxSubnet) and self.version == other.version
                and self.addr == other.addr and self.mask == other.mask)

    def __hash__(self):
        return hash((self.version, self.addr, self.mask))


def ip_cast(a: pd.Series) -> pd.Series:
    """ip(x): typecast to an address object (str() renders the canonical
    form, e.g. IPv6 compression). Unparseable -> unset (the reference's
    eval error, which a filter treats as no-verdict)."""
    out = []
    for v in a:
        if isinstance(v, (ipaddress.IPv4Address, ipaddress.IPv6Address)):
            out.append(v)
            continue
        if not isinstance(v, str):
            out.append(None)
            continue
        try:
            out.append(ipaddress.ip_address(v.strip()))
        except ValueError:
            out.append(None)
    return pd.Series(out, dtype=object)


def subnet_cast(a: pd.Series) -> pd.Series:
    out = []
    for v in a:
        if isinstance(v, FxSubnet):
            out.append(v)
        elif isinstance(v, str):
            out.append(FxSubnet.parse(v))
        else:
            out.append(None)
    return pd.Series(out, dtype=object)


# ---------------------------------------------------------------------------
# sdata family (func-sdata.c) — ctx funcs over the `sdata` map column
# (keys "<sdid>.<param>", stages/syslog.py:79 layout)
# ---------------------------------------------------------------------------

def _sdata_pairs(ctx):
    if "sdata" in ctx.cols or "sdata" in ctx.table.column_names:
        return ctx.col("sdata")
    return _null_series(ctx.n)


def has_sdata(ctx) -> pd.Series:
    sd = _sdata_pairs(ctx)
    return pd.Series([isinstance(v, (list, dict)) and len(v) > 0 for v in sd], dtype=object)


def get_sdata(ctx) -> pd.Series:
    """Nested {sd_id: {param: value}}; the split is at the LAST dot of
    each key (func-sdata.c _extract_sd_components — sd_ids may contain
    dots, e.g. "meta@18372.4")."""
    sd = _sdata_pairs(ctx)
    out = []
    for v in sd:
        if isinstance(v, dict):
            v = list(v.items())
        if not isinstance(v, list):
            out.append(None)
            continue
        root: dict = {}
        for k, val in v:
            sdid, dot, param = k.rpartition(".")
            if not dot:
                sdid, param = k, ""
            root.setdefault(sdid, {})[param] = val
        out.append(root)
    return pd.Series(out, dtype=object)


def is_sdata_from_enterprise(ctx, num) -> pd.Series:
    """True when any SD-ID carries `@<enterprise-number-prefix>`
    (func-sdata.c:69-87: strncmp after the '@', i.e. prefix match)."""
    lit = str(_arg_scalar(num))
    sd = _sdata_pairs(ctx)
    out = []
    for v in sd:
        if isinstance(v, dict):
            v = list(v.items())
        hit = False
        if isinstance(v, list):
            for k, _val in v:
                at = k.find("@")
                if at >= 0 and k[at + 1:].startswith(lit):
                    hit = True
                    break
        out.append(hit)
    return pd.Series(out, dtype=object)


# ---------------------------------------------------------------------------
# timestamps (func-timestamp.c get_timestamp/set_timestamp)
# ---------------------------------------------------------------------------

_STAMP_COLS = {"stamp": "ts_stamp", "recvd": "warc_ts"}


def _stamp_col(stamp) -> str:
    name = str(_arg_scalar(stamp)) if stamp is not None else "stamp"
    try:
        return _STAMP_COLS[name]
    except KeyError:
        raise ValueError(f'get/set_timestamp: stamp must be "stamp" or "recvd", got {name!r}')


def get_timestamp(ctx, stamp=None) -> pd.Series:
    return ctx.col(_stamp_col(stamp))


def set_timestamp(ctx, dt: pd.Series, stamp=None) -> pd.Series:
    col = _stamp_col(stamp)
    vals = pd.to_datetime(dt, errors="coerce", utc=True).dt.tz_localize(None) \
        if not pd.api.types.is_datetime64_any_dtype(dt) else dt
    cur = pd.to_datetime(ctx.col(col), errors="coerce")
    cur = cur.copy()
    cur[ctx.mask] = vals[ctx.mask]
    ctx.cols[col] = cur
    ctx.assigned.add(col)
    return _null_series(ctx.n)


def get_timezone_source(a: pd.Series) -> pd.Series:
    """Per-row tz-source of a datetime expression. The engine's
    timestamps are UTC instants; the source tag rides on Series.attrs
    set by strptime (%z -> "parsed"), set_timezone/fix_timezone
    ("fixed") and guess_timezone ("guessed"); a bare column is
    "assumed" (unix_time_get_timezone_source_name names)."""
    src = a.attrs.get("tz_source", "assumed") if isinstance(a, pd.Series) else "assumed"
    nn = ~pd.isna(a).to_numpy()
    out = np.full(len(a), None, dtype=object)
    out[nn] = src
    return pd.Series(out, dtype=object)


# ---------------------------------------------------------------------------
# format_syslog_5424 (modules/syslogformat/filterx-func-format-syslog.c)
# ---------------------------------------------------------------------------

_SD_ESCAPE = str.maketrans({"\\": "\\\\", '"': '\\"', "]": "\\]"})


def _format_sdata_value(v) -> str:
    """[sdid param="value"...] serialization, escaping \\ " ] per
    RFC5424 PARAM-VALUE (lib/logmsg/logmsg.c log_msg_append_format_sdata)."""
    if isinstance(v, dict):
        v = list(v.items())
    if not isinstance(v, list) or not v:
        return "-"
    groups: dict[str, list[tuple[str, str]]] = {}
    for k, val in v:
        sdid, dot, param = k.rpartition(".")
        if not dot:
            sdid, param = k, ""
        groups.setdefault(sdid, []).append((param, val))
    parts = []
    for sdid, params in groups.items():
        body = "".join(
            f' {p}="{(val or "").translate(_SD_ESCAPE)}"' for p, val in params)
        parts.append(f"[{sdid}{body}]")
    return "".join(parts)


def _opt_str(arg, i, default="-"):
    if arg is None:
        return default
    v = arg.iloc[i] if isinstance(arg, pd.Series) else arg
    if v is None or (np.ndim(v) == 0 and pd.isna(v)):
        return default
    s = str(v)
    return s if s else default


def format_syslog_5424(ctx, message, add_octet_count=None, pri=None,
                       timestamp=None, host=None, program=None, pid=None,
                       msgid=None) -> pd.Series:
    """RFC5424 line per row: `<PRI>1 TS HOST PROG PID MSGID SDATA MSG\\n`
    (filterx-func-format-syslog.c:249-287). pri/timestamp default from
    the message columns; host/program/pid/msgid default to "-"; SDATA
    always renders from the message's sdata column; optional leading
    octet count (RFC6587 framing)."""
    n = ctx.n
    octet = bool(_arg_scalar(add_octet_count)) if add_octet_count is not None else False

    pri_s = pri if pri is not None else ctx.col("pri") if (
        "pri" in ctx.cols or "pri" in ctx.table.column_names) else None
    ts_s = timestamp if timestamp is not None else ctx.col("ts_stamp") if (
        "ts_stamp" in ctx.cols or "ts_stamp" in ctx.table.column_names) else None
    if ts_s is not None and not pd.api.types.is_datetime64_any_dtype(ts_s):
        ts_s = pd.to_datetime(ts_s, errors="coerce")
    ts_str = (ts_s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f+00:00")
              if ts_s is not None else None)
    sd = _sdata_pairs(ctx)

    msg_arr = message.to_numpy(dtype=object) if isinstance(message, pd.Series) \
        else np.full(n, message, dtype=object)
    out = []
    for i in range(n):
        m = msg_arr[i]
        if m is None or (np.ndim(m) == 0 and pd.isna(m)):
            out.append(None)
            continue
        p = _opt_str(pri_s, i, default="13")
        try:
            p = str(int(float(p)))
        except ValueError:
            pass  # a string pri passes through verbatim (line 254)
        t = ts_str.iloc[i] if ts_str is not None else None
        if t is None or (np.ndim(t) == 0 and pd.isna(t)):
            t = "-"
        line = (f"<{p}>1 {t} {_opt_str(host, i)} {_opt_str(program, i)} "
                f"{_opt_str(pid, i)} {_opt_str(msgid, i)} "
                f"{_format_sdata_value(sd.iloc[i])} {m}\n")
        if octet:
            line = f"{len(line.encode())} {line}"
        out.append(line)
    return pd.Series(out, dtype=object)


# ---------------------------------------------------------------------------
# metrics (object-metrics-labels.c + metrics-probe func-update-metric.c)
# ---------------------------------------------------------------------------

def metrics_labels(ctx, d=None) -> pd.Series:
    """metrics_labels() / metrics_labels({...}) -> ordered [name, value]
    pair list per row (pairs, not a dict: the reference's label array
    allows duplicate names until dedup)."""
    if d is None:
        return pd.Series([[] for _ in range(ctx.n)], dtype=object)
    out = []
    for v in d:
        if isinstance(v, dict):
            out.append([[str(k), "" if val is None else str(val)] for k, val in v.items()])
        elif isinstance(v, list):
            out.append([[str(k), "" if val is None else str(val)] for k, val in v])
        else:
            out.append(None)
    return pd.Series(out, dtype=object)


def dedup_metrics_labels(p: pd.Series) -> pd.Series:
    """Last value per label name wins (object-metrics-labels.c:288
    g_hash_table_replace); order = first occurrence of each name
    (deterministic stand-in for GHashTable iteration order)."""
    out = []
    for v in p:
        if not isinstance(v, list):
            out.append(None)
            continue
        d: dict[str, str] = {}
        for k, val in v:
            d[k] = val
        out.append([[k, val] for k, val in d.items()])
    return pd.Series(out, dtype=object)


def update_metric(ctx, key, labels=None, increment=None, level=None) -> pd.Series:
    """update_metric("key", labels=, increment=1, level=0): adds
    `increment` per active row to the per-actor counter keyed by
    (key, frozen labels). Counters live on the FilterX stage instance
    (ctx.metrics -> FilterX.metrics merged per batch); a pipeline
    publishes them by reading stage.metrics after/inside map_batches —
    the Ray-native replacement for the reference's global stats
    registry. `level` gates against the stage's stats_level
    (options { stats(level(N)); } — lib/filterx/filterx-metrics.c
    stats_check_level); null/empty-string label values are dropped,
    not failures (filterx-metrics-labels.c _is_value_empty)."""
    name = str(_arg_scalar(key))
    lvl = _arg_scalar(level) if level is not None else 0
    if int(lvl or 0) > getattr(ctx, "stats_level", 0):
        return _null_series(ctx.n)
    inc = pd.to_numeric(increment, errors="coerce") if increment is not None else None
    rows = np.nonzero(ctx.mask)[0]
    if labels is None:
        total = int(inc.iloc[rows].fillna(0).sum()) if isinstance(inc, pd.Series) \
            else (int(inc) if inc is not None else 1) * len(rows)
        ctx.metrics[(name, ())] = ctx.metrics.get((name, ()), 0) + total
        return _null_series(ctx.n)

    def _pairs(items):
        # drop null / empty-string label values, keep the label order
        return tuple((str(k), str(v)) for k, v in items
                     if not (v is None or (isinstance(v, float)
                                           and pd.isna(v)) or v == ""))

    larr = labels.to_numpy(dtype=object) if isinstance(labels, pd.Series) \
        else np.full(ctx.n, labels, dtype=object)
    for i in rows:
        lv = larr[i]
        if isinstance(lv, dict):
            lkey = _pairs(lv.items())
        elif isinstance(lv, list):
            lkey = _pairs(lv)
        else:
            lkey = ()
        step = 1
        if inc is not None:
            iv = inc.iloc[i] if isinstance(inc, pd.Series) else inc
            step = 0 if pd.isna(iv) else int(iv)
        ctx.metrics[(name, lkey)] = ctx.metrics.get((name, lkey), 0) + step
    return _null_series(ctx.n)


# ---------------------------------------------------------------------------
# failure_info (lib/filterx/func-failure-info.c)
# ---------------------------------------------------------------------------

def failure_info_enable(ctx, collect_falsy=None) -> pd.Series:
    ctx.failure_enabled = True
    ctx.failure_collect_falsy = bool(_arg_scalar(collect_falsy)) if collect_falsy is not None else False
    return _null_series(ctx.n)


def failure_info_clear(ctx) -> pd.Series:
    ctx.failure_info = []
    return _null_series(ctx.n)


def failure_info_meta(ctx, meta) -> pd.Series:
    ctx.failure_meta = _arg_scalar(meta)
    return _null_series(ctx.n)


def failure_info(ctx) -> pd.Series:
    """Collected entries (same list for every row): one dict per
    function-eval failure while enabled — {"meta":..., "error":...}."""
    entries = list(ctx.failure_info)
    return pd.Series([entries] * ctx.n, dtype=object)


MSG_FUNCS = {
    "digest": digest,
    "ip": ip_cast,
    "subnet": subnet_cast,
    "get_timezone_source": get_timezone_source,
    "dedup_metrics_labels": dedup_metrics_labels,
}

MSG_CTX_FUNCS = {
    "metrics_labels": metrics_labels,
    "has_sdata": has_sdata,
    "get_sdata": get_sdata,
    "is_sdata_from_enterprise": is_sdata_from_enterprise,
    "get_timestamp": get_timestamp,
    "set_timestamp": set_timestamp,
    "format_syslog_5424": format_syslog_5424,
    "update_metric": update_metric,
    "failure_info_enable": failure_info_enable,
    "failure_info_clear": failure_info_clear,
    "failure_info_meta": failure_info_meta,
    "failure_info": failure_info,
}
