"""Template function registry: $(fn args...) implementations.

Vectorized equivalents of the reference's built-in template functions
(reference modules/basicfuncs/basic-funcs.c:73-151 — str-funcs, numeric-
funcs, list-funcs, cond-funcs, fname-funcs; modules/cryptofuncs/ digests;
urlencode.c encodings). Every function takes (table, *arg_series) and
returns a pandas object Series of strings; numeric functions parse their
string args per the reference's everything-is-a-string model
(lib/logmsg/logmsg.h:199-205).

The reference's list values are comma-separated string-repr lists
(lib/str-repr/); the list functions here operate on that same encoding.
"""

from __future__ import annotations

import base64
import contextvars as _contextvars
import hashlib
import math
import urllib.parse
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa


def _s(x) -> pd.Series:
    return x.astype("string").fillna("").astype(object) if isinstance(x, pd.Series) else x


def _num(x: pd.Series) -> pd.Series:
    return pd.to_numeric(_s(x), errors="coerce")


def _fmt_num(v: pd.Series) -> pd.Series:
    out = v.map(lambda x: "" if pd.isna(x) else (str(int(x)) if float(x).is_integer() else repr(float(x))))
    return out.astype(object)


def _join(parts: list[pd.Series], sep: str = " ") -> pd.Series:
    out = parts[0].astype(str)
    for p in parts[1:]:
        out = out + sep + p.astype(str)
    return out.astype(object)


def bool_cast_first_char(v: str):
    """reference lib/logmsg/type-hinting.c type_cast_to_boolean: the
    FIRST character decides — T/t/1 true, F/f/0 false ("totaly true" is
    TRUE, "fatally false" is FALSE); anything else is a cast error,
    returned as None."""
    if not v:
        return None
    c = v[0]
    if c in "Tt1":
        return True
    if c in "Ff0":
        return False
    return None


def _flag(a) -> str:
    """Scalar view of an option-flag arg (flags are template literals —
    constant across rows; Series from the evaluator, str in direct calls)."""
    if isinstance(a, pd.Series):
        return str(a.iloc[0]) if len(a) else ""
    return str(a)


# ---- string funcs (basicfuncs/str-funcs.c) ----
# variadic semantics per the reference: each function applies to every
# arg; conformance pins from modules/basicfuncs/tests/test_basicfuncs.c

def tf_echo(t, *args):
    return _join(list(args)) if args else pd.Series([""] * t.num_rows, dtype=object)


def tf_length(t, *args):
    # one length per arg, space-joined (str-funcs.c tf_length)
    if not args:
        return pd.Series([""] * t.num_rows, dtype=object)
    return _join([_s(a).map(len).astype(str) for a in args])


def tf_lowercase(t, *args):
    a = _join([_s(x) for x in args]) if len(args) != 1 else _s(args[0])
    return a.str.lower().astype(object)


def tf_uppercase(t, *args):
    a = _join([_s(x) for x in args]) if len(args) != 1 else _s(args[0])
    return a.str.upper().astype(object)


def tf_strip(t, *args):
    # strip each arg; results joined with ' ', EMPTY results dropped
    # (test_basicfuncs.c:207-217)
    if not args:
        return pd.Series([""] * t.num_rows, dtype=object)
    cols = [_s(a).str.strip() for a in args]
    return pd.Series(
        [" ".join(v for v in vals if v) for vals in zip(*cols)], dtype=object
    )


def _substr_one(x: str, i: int, k) -> str:
    """reference str-funcs.c tf_substr: negative ofs counts from the end,
    negative len trims from the end (len = strlen - ofs + len)."""
    n = len(x)
    if i < 0:
        i = max(n + i, 0)
    elif i > n:
        return ""
    if k is None:
        k = n - i
    elif k < 0:
        k = n - i + k
    if k <= 0:
        return ""
    return x[i : i + k]


def tf_substr(t, a, off, ln=None):
    o = _num(off).fillna(0).astype(int)
    s = _s(a)
    if ln is None:
        return pd.Series([_substr_one(x, i, None) for x, i in zip(s, o)], dtype=object)
    l = _num(ln).fillna(0).astype(int)
    return pd.Series([_substr_one(x, i, k) for x, i, k in zip(s, o, l)], dtype=object)


def tf_sanitize(t, *args):
    """$(sanitize [-r CH] [-i CHARS] [-C] name...): replace invalid
    chars (default '/') and control chars with the replacement (default
    '_'); '-C'/'--no-ctrl-chars' keeps control chars, '-c'/'--ctrl-chars'
    restates the replace-them default (str-funcs.c:205-230 GOptionEntry
    table, '-C' is G_OPTION_FLAG_REVERSE); multiple names join with '/'
    (pins test_basicfuncs.c:219-226)."""
    repl, invalid, keep_ctrl = "_", "/", False
    rest = list(args)
    while rest:
        flag = _flag(rest[0])
        if flag in ("-r", "--replacement") and len(rest) >= 2:
            repl = _flag(rest[1])[:1] or "_"
            rest = rest[2:]
        elif flag in ("-i", "--invalid-chars") and len(rest) >= 2:
            invalid = _flag(rest[1])
            rest = rest[2:]
        elif flag in ("-C", "--no-ctrl-chars"):
            keep_ctrl = True
            rest = rest[1:]
        elif flag in ("-c", "--ctrl-chars"):
            keep_ctrl = False
            rest = rest[1:]
        else:
            break
    if not rest:
        return pd.Series([""] * t.num_rows, dtype=object)

    def clean(x: str) -> str:
        return "".join(
            repl if (ch in invalid or (not keep_ctrl and ord(ch) < 0x20)) else ch
            for ch in x
        )

    cols = [_s(a).map(clean) for a in rest]
    return _join(cols, "/")


def tf_replace_delimiter(t, old, new, a):
    reps = _s(old)
    news = _s(new)
    return pd.Series(
        [x.translate(str.maketrans({c: nw for c in od})) for x, od, nw in zip(_s(a), reps, news)], dtype=object
    )


def tf_padding(t, a, width, fill=None):
    w = _num(width).fillna(0).astype(int)
    f = _s(fill) if fill is not None else pd.Series([" "] * t.num_rows, dtype=object)
    out = []
    for x, wi, fi in zip(_s(a), w, f):
        fi = fi or " "
        pad_needed = max(0, wi - len(x))
        pad = (fi * (pad_needed // len(fi) + 1))[:pad_needed]
        out.append(pad + x)
    return pd.Series(out, dtype=object)


def tf_implode(t, sep, *args):
    # join the elements of the (parsed, concatenated) list args
    sepv = _s(sep)
    return pd.Series(
        [s.join(_parse_lists(vals)) for s, vals in zip(sepv, _rows(t, args))],
        dtype=object,
    )


def tf_explode(t, sep, *args):
    # split EACH arg by the separator, concatenating the results
    # (pins test_basicfuncs.c:494-497)
    sepv = _s(sep)

    def do(s, vals):
        out = []
        for v in vals:
            out.extend(v.split(s) if s else [v])
        return _ser_list([e for e in out if e != ""])

    return pd.Series([do(s, vals) for s, vals in zip(sepv, _rows(t, args))], dtype=object)


# ---- conditional (cond-funcs.c) ----

def _filter_cond_mask(t, cond_spec: str) -> np.ndarray | None:
    """Compile a template-function condition with the config FILTER
    grammar (cond-funcs.c builds a FilterExprNode); None when the
    grammar rejects it (caller falls back to truthy-string)."""
    try:
        from ..config import _FilterParser, _Stream, tokenize

        src = "{ %s; }" % cond_spec.strip()
        s = _Stream(tokenize(src), src)
        s.expect("{")
        expr = _FilterParser(s, {}).parse_block()
    except Exception:
        # Only PARSE failures fall back (the reference compiles the
        # FilterExprNode at config time and fails loudly at eval time):
        return None
    return np.asarray(expr.mask(t), dtype=bool)


def tf_if(t, cond_spec, then_spec, else_spec=""):
    """$(if (FILTER-EXPR) then else): the condition is a FILTER
    expression compiled with the config filter grammar and evaluated
    per row (modules/basicfuncs/cond-funcs.c tf_if_prepare builds a
    FilterExprNode; tf_if_call filter_expr_eval's it). A condition the
    grammar rejects falls back to truthy-string evaluation ('1'/'true'/
    'yes'), the shape $(if $(echo 1) a b) relies on."""
    from .templates import Template

    m = _filter_cond_mask(t, cond_spec)
    if m is None:
        c = Template(cond_spec).eval(t)
        m = c.isin(["1", "true", "TRUE", "True", "yes"]).to_numpy()
    thenv = Template(then_spec).eval(t).to_numpy(dtype=object)
    elsev = Template(else_spec).eval(t).to_numpy(dtype=object)
    return pd.Series(np.where(m, thenv, elsev), dtype=object)


tf_if._lazy_all = True  # type: ignore[attr-defined]


def _grep_like(t, raw_args, list_encode: bool):
    """Shared $(grep) / $(context-lookup) body (cond-funcs.c tf_grep_call,
    context-funcs.c tf_context_lookup_call): evaluate the filter per
    context message and append each value template's rendering,
    comma-joined. The batch engine's message context is ONE message
    (the reference's, too, outside a correlation trigger — its comment:
    "the message context is just one message"); grouping-by/correlate
    own the multi-message windows. context-lookup LIST-encodes elements
    (str_repr_encode), grep appends raw."""
    from .templates import Template

    args = list(raw_args)
    max_count = 0
    while args and (args[0] in ("-m", "--max-count")
                    or args[0].startswith("--max-count=")):
        if "=" in args[0]:
            max_count = int(args[0].split("=", 1)[1])
            args = args[1:]
        else:
            if len(args) < 2:
                raise ValueError("$(grep) requires at least two arguments")
            max_count = int(args[1])
            args = args[2:]
        if max_count <= 0:
            raise ValueError("$(grep) --max-count must be >= 1")
    if len(args) < 2:
        raise ValueError("$(grep) requires at least two arguments")
    cond, tmpls = args[0], args[1:]
    m = _filter_cond_mask(t, cond)
    if m is None:
        from .templates import Template as _T

        m = _T(cond).eval(t).isin(["1", "true", "TRUE", "True", "yes"]) \
            .to_numpy()
    # (max-count: with a 1-message context any positive cap is >= 1)
    vals = [Template(x).eval(t).to_numpy(dtype=object) for x in tmpls]
    out = np.empty(t.num_rows, dtype=object)
    for i in range(t.num_rows):
        if m[i]:
            elems = [str(v[i]) for v in vals]
            if list_encode:
                elems = [_ser_elem(e) for e in elems]
            out[i] = ",".join(elems)
        else:
            out[i] = ""
    return pd.Series(out, dtype=object)


def tf_grep(t, *raw_args):
    return _grep_like(t, raw_args, list_encode=False)


def tf_context_lookup(t, *raw_args):
    return _grep_like(t, raw_args, list_encode=True)


def tf_context_length(t, *raw_args):
    # number of messages in the evaluation context — 1 per row here
    # (context-funcs.c tf_context_length_call)
    return pd.Series(["1"] * t.num_rows, dtype=object)


def tf_context_values(t, *args):
    """$(context-values $nv...): LIST of the named values across the
    context's messages (context-funcs.c tf_context_values_call)."""
    if not args:
        return pd.Series([""] * t.num_rows, dtype=object)
    cols = [ _s(a).to_numpy(dtype=object) for a in args]
    out = np.empty(t.num_rows, dtype=object)
    for i in range(t.num_rows):
        out[i] = ",".join(_ser_elem(str(c[i])) for c in cols)
    return pd.Series(out, dtype=object)


tf_grep._lazy_all = True  # type: ignore[attr-defined]
tf_context_lookup._lazy_all = True  # type: ignore[attr-defined]


_GEOIP2_CACHE: dict = {}


def tf_geoip2(t, *raw_args):
    """$(geoip2 --database db.mmdb [--field path.child] ${HOST}):
    per-row mmdb lookup (modules/geoip2/tfgeoip.c; default field
    country.iso_code). The database loads once per process via the
    repo's from-spec mmdb reader and the vectorized searchsorted
    range-lookup kernel (enrich/geoip.GeoIP)."""
    from .templates import Template

    args = list(raw_args)
    db = field = None
    rest: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a in ("-d", "--database") and i + 1 < len(args):
            db, i = args[i + 1], i + 2
        elif a.startswith("--database="):
            db, i = a.split("=", 1)[1], i + 1
        elif a in ("-f", "--field") and i + 1 < len(args):
            field, i = args[i + 1], i + 2
        elif a.startswith("--field="):
            field, i = a.split("=", 1)[1], i + 1
        else:
            rest.append(a)
            i += 1
    if not db or not rest:
        raise ValueError("geoip2: format must be: $(geoip2 --database "
                         "<db.mmdb> [ --field path.child ] ${HOST})")
    field = field or "country.iso_code"
    stage = _GEOIP2_CACHE.get(db)
    if stage is None:
        from ..enrich.geoip import GeoIP

        stage = _GEOIP2_CACHE[db] = GeoIP(mmdb_path=db, source_col="__ip",
                                          prefix="")
    ips = Template(" ".join(rest)).eval(t)
    tbl = pa.table({"__ip": pa.array(ips.astype(object), type=pa.string())})
    out = stage(tbl)
    if field not in out.column_names:
        return pd.Series([""] * t.num_rows, dtype=object)
    col = out.column(field).to_pandas()
    return col.astype(object).where(col.notna(), "")


tf_geoip2._lazy_all = True  # type: ignore[attr-defined]


def tf_default(t, a, fallback):
    av = _s(a)
    return pd.Series(np.where(av == "", _s(fallback), av), dtype=object)


# ---- numeric funcs (numeric-funcs.c); sum/min/max/average fold a LIST arg ----

def _trunc_div(a: int, b: int) -> int:
    """C int64 division: truncated toward zero (numeric-funcs.c uses
    native C '/'), exact at any magnitude — no float round-trip."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _trunc_mod(a: int, b: int) -> int:
    """C int64 '%': result takes the DIVIDEND's sign (truncated
    division), unlike Python's floored modulo: $(% -7 3) is -1."""
    return a - b * _trunc_div(a, b)


def _binop(op, int_op=None):
    """C-conformant arithmetic (numeric-funcs.c + pins
    test_basicfuncs.c:268-292): unparsable operand or division by zero
    -> literal 'NaN'; both-integer operands use integer arithmetic via
    int_op (C truncated semantics, so $(/ 3 2) is 1, $(% -7 3) is -1,
    and 64-bit values stay exact); mixed -> float."""
    int_op = int_op or op

    def one(x: str, y: str) -> str:
        try:
            a, b = int(x), int(y)
            is_int = True
        except (TypeError, ValueError):
            try:
                a, b = float(x), float(y)
                is_int = False
            except (TypeError, ValueError):
                return "NaN"
        try:
            v = int_op(a, b) if is_int else op(a, b)
        except ZeroDivisionError:
            return "NaN"
        if is_int:
            return str(int(v))
        return str(int(v)) if float(v).is_integer() else repr(float(v))

    def f(t, a, b):
        return pd.Series([one(x, y) for x, y in zip(_s(a), _s(b))], dtype=object)

    return f


def _listfold(agg):
    def fold(x: str) -> str:
        # non-numeric elements are skipped; nothing numeric -> "" (every
        # template function degrades to "" on bad input, never raises —
        # one malformed line must not kill the batch task)
        nums = []
        for v in x.split(","):
            v = v.strip()
            if not v:
                continue
            try:
                nums.append(float(v))
            except ValueError:
                continue
        return _one(agg(nums)) if nums else ""

    def f(t, a):
        return pd.Series([fold(x) for x in _s(a)], dtype=object)

    def _one(v):
        return str(int(v)) if float(v).is_integer() else repr(float(v))

    return f


def tf_round(t, a, digits=None):
    # reference $(round) uses C round(): half away from zero — Python's
    # round() is banker's and would render $(round 2.5) as '2' (ADVICE r1).
    # digits outside 0..20 -> 'NaN'; rendered with %.*f like the C printf
    # ($(round 2 20) is '2.00000000000000000000'; test_basicfuncs.c:294-301)
    def _haz(v: float, k: int) -> float:
        f = 10.0 ** k
        return math.copysign(math.floor(abs(v) * f + 0.5), v) / f

    def one(v, k) -> str:
        if pd.isna(v):
            return ""
        if pd.isna(k) or not 0 <= int(k) <= 20:
            return "NaN"
        k = int(k)
        return str(int(_haz(v, 0))) if k == 0 else f"{_haz(v, k):.{k}f}"

    d = _num(digits) if digits is not None else pd.Series([0] * t.num_rows)
    return pd.Series([one(v, k) for v, k in zip(_num(a), d)], dtype=object)


# ---- filename funcs (fname-funcs.c) ----

def tf_dirname(t, a):
    # g_path_get_dirname returns '.' for a bare name (fname-funcs.c pin)
    import posixpath

    def one(x: str) -> str:
        if x.endswith("/") and x != "/":
            return x.rstrip("/")  # '/foo/bar/' -> '/foo/bar' (glib)
        return posixpath.dirname(x) or "."

    return _s(a).map(one).astype(object)


def tf_basename(t, a):
    import posixpath

    return _s(a).map(posixpath.basename).astype(object)


# ---- encodings (urlencode.c) ----

def tf_url_encode(t, *args):
    if not args:
        return pd.Series([""] * t.num_rows, dtype=object)
    a = _join([_s(x) for x in args], "") if len(args) > 1 else _s(args[0])
    return a.map(lambda x: urllib.parse.quote(x, safe="")).astype(object)


def tf_url_decode(t, *args):
    if not args:
        return pd.Series([""] * t.num_rows, dtype=object)
    a = _join([_s(x) for x in args], "") if len(args) > 1 else _s(args[0])
    return a.map(urllib.parse.unquote).astype(object)


def tf_base64_encode(t, *args):
    # args are CONCATENATED with no separator (urlencode.c shape;
    # pin test_basicfuncs.c:258); zero args -> ''
    if not args:
        return pd.Series([""] * t.num_rows, dtype=object)
    a = _join([_s(x) for x in args], "") if len(args) > 1 else _s(args[0])
    return a.map(lambda x: base64.b64encode(x.encode()).decode()).astype(object)


# ---- digests (modules/cryptofuncs/) ----

def _digest(name):
    def f(t, *args):
        """$(sha1 [--length N] arg...) — reference cryptofuncs
        (modules/cryptofuncs/cryptofuncs.c): optional --length flag
        truncates the hex digest; multiple args CONCATENATE before
        hashing. The legacy positional (value, length) form is kept."""
        args = list(args)
        length = None
        if args and len(args) >= 2 and _s(args[0]).iloc[0] == "--length":
            length = args[1]
            args = args[2:]
        elif len(args) == 2:
            # legacy positional (value, length) when 2nd arg is numeric
            maybe = _num(args[1])
            if maybe.notna().all():
                length = args[1]
                args = args[:1]
        if not args:
            return pd.Series([""] * t.num_rows, dtype=object)
        a = _join([_s(x) for x in args], "") if len(args) > 1 else _s(args[0])
        out = a.map(lambda x: hashlib.new(name, x.encode()).hexdigest())
        if length is not None:
            ln = _num(length).fillna(0).astype(int)
            out = pd.Series([h[:k] if k > 0 else h for h, k in zip(out, ln)], dtype=object)
        return out.astype(object)

    return f


def tf_hex_encode(t, *args):
    if not args:
        return pd.Series([""] * t.num_rows, dtype=object)
    a = _join([_s(x) for x in args], "") if len(args) > 1 else _s(args[0])
    return a.map(lambda x: x.encode().hex()).astype(object)


def tf_hex_decode(t, a):
    def dec(x):
        try:
            return bytes.fromhex(x).decode("utf-8", "replace")
        except ValueError:
            return ""

    return _s(a).map(dec).astype(object)


def tf_base64_decode(t, a):
    def dec(x):
        try:
            return base64.b64decode(x).decode("utf-8", "replace")
        except Exception:
            return ""

    return _s(a).map(dec).astype(object)


def tf_startswith(t, a, prefix):
    return pd.Series(["true" if x.startswith(p) else "false" for x, p in zip(_s(a), _s(prefix))], dtype=object)


def tf_endswith(t, a, suffix):
    return pd.Series(["true" if x.endswith(p) else "false" for x, p in zip(_s(a), _s(suffix))], dtype=object)


def tf_includes(t, a, needle):
    return pd.Series(["true" if p in x else "false" for x, p in zip(_s(a), _s(needle))], dtype=object)


def tf_str_replace(t, a, old, new):
    return pd.Series([x.replace(o, nw) for x, o, nw in zip(_s(a), _s(old), _s(new))], dtype=object)


def tf_utf8_sanitize(t, a):
    return _s(a).map(lambda x: x.encode("utf-8", "replace").decode("utf-8", "replace")).astype(object)


def tf_format_date(t, fmt, ts=None):
    """$(format-date fmt [ts]) (reference modules/timestamp/tf-format-date.c):
    strftime over a unix-seconds arg, or over $UNIXTIME-style input."""
    fmts = _s(fmt)
    if ts is None:
        return pd.Series([""] * t.num_rows, dtype=object)
    secs = _num(ts)
    stamps = pd.to_datetime(secs, unit="s", errors="coerce")
    return pd.Series(
        ["" if pd.isna(d) else d.strftime(f) for d, f in zip(stamps, fmts)], dtype=object
    )


def tf_stardate(t, *args):
    """$(stardate [--digits N] $UNIXTIME) (reference modules/stardate/
    stardate.c): year + elapsed-fraction-of-year, fraction FLOORED at N
    digits (default 2). UTC calendar (engine convention; the reference
    uses the daemon's local timezone)."""
    args = list(args)
    digits = 2
    if args and len(args[0]) and str(args[0].iloc[0]) == "--digits":
        digits = int(str(args[1].iloc[0]))
        args = args[2:]
    if not (0 <= digits <= 9):
        raise ValueError("stardate: digits must be between 0-9")
    secs = pd.to_numeric(_s(args[0]), errors="coerce")
    ts = pd.to_datetime(secs, unit="s", utc=True, errors="coerce")
    year = ts.dt.year
    soy = pd.to_datetime(year.map(lambda y: f"{int(y)}-01-01" if pd.notna(y) else None), utc=True, errors="coerce")
    elapsed = (ts - soy).dt.total_seconds()
    leap = ((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)
    ysecs = np.where(leap.fillna(False), 31622400.0, 31536000.0)
    p = 10.0 ** digits
    val = year + np.floor((elapsed / ysecs) * p) / p
    return pd.Series(["" if pd.isna(v) else f"{v:.{digits}f}" for v in val], dtype=object)


def _md4_hex(data: bytes) -> str:
    """Pure-Python MD4 (RFC 1320, public algorithm) — this container's
    OpenSSL 3 removed the md4 provider, so hashlib.new('md4') raises."""
    import struct

    M = 0xFFFFFFFF

    def lrot(x, n):
        return ((x << n) | (x >> (32 - n))) & M

    msg = bytearray(data)
    ml = (8 * len(data)) & 0xFFFFFFFFFFFFFFFF
    msg.append(0x80)
    while len(msg) % 64 != 56:
        msg.append(0)
    msg += struct.pack("<Q", ml)
    A, B, C, D = 0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476
    R3_ORDER = (0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15)
    for off in range(0, len(msg), 64):
        X = struct.unpack("<16I", bytes(msg[off : off + 64]))
        v = [A, B, C, D]
        for i in range(16):  # round 1: F = xy | ~x z
            j = (-i) % 4
            f = (v[(j + 1) % 4] & v[(j + 2) % 4]) | (~v[(j + 1) % 4] & v[(j + 3) % 4])
            v[j] = lrot((v[j] + f + X[i]) & M, (3, 7, 11, 19)[i % 4])
        for i in range(16):  # round 2: G = xy | xz | yz, +0x5A827999
            j = (-i) % 4
            x, y, z = v[(j + 1) % 4], v[(j + 2) % 4], v[(j + 3) % 4]
            g = (x & y) | (x & z) | (y & z)
            k = (i % 4) * 4 + i // 4
            v[j] = lrot((v[j] + g + X[k] + 0x5A827999) & M, (3, 5, 9, 13)[i % 4])
        for i in range(16):  # round 3: H = x^y^z, +0x6ED9EBA1
            j = (-i) % 4
            h = v[(j + 1) % 4] ^ v[(j + 2) % 4] ^ v[(j + 3) % 4]
            v[j] = lrot((v[j] + h + X[R3_ORDER[i]] + 0x6ED9EBA1) & M, (3, 9, 11, 15)[i % 4])
        A, B, C, D = (A + v[0]) & M, (B + v[1]) & M, (C + v[2]) & M, (D + v[3]) & M
    return struct.pack("<4I", A, B, C, D).hex()


def tf_md4(t, a):
    """$(md4) (reference modules/cryptofuncs/) via the RFC 1320 fallback."""
    return _s(a).map(lambda x: _md4_hex(x.encode()))


def tf_uuid(t, *args):
    # deterministic per-row UUID5 over row index (the reference's $(uuid) is
    # random; determinism is required for replayable batch lineage)
    return pd.Series([str(uuid.uuid5(uuid.NAMESPACE_URL, str(i))) for i in range(t.num_rows)], dtype=object)


# ---- list funcs (list-funcs.c) — syslog-ng serialized string lists ----
#
# The reference's list model (lib/scanner/list-scanner/list_scanner.c +
# lib/str-repr/encode.c): comma-separated, elements needing protection
# are double-quoted with backslash escapes, EMPTY UNQUOTED elements are
# skipped at parse ('foo,' is a 1-list), quoted "" is an explicit empty
# element, and every list function accepts MULTIPLE args, each parsed as
# a list fragment and concatenated. Conformance pinned to the
# reference's own test corpus (modules/basicfuncs/tests/
# test_basicfuncs.c:412-530) in tests/test_basicfuncs_conformance.py.

_LIST_ESCAPES = {"b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t", "\\": "\\"}


def _decode_elem(x: str, i: int) -> tuple[str, int, bool]:
    """Decode ONE element starting at i — a faithful port of the
    reference's str-repr decoder (lib/str-repr/decode.c _decode state
    machine, delimiter ','): single- OR double-quoted elements with
    backslash escapes (unknown escapes keep the backslash; \\<quote>
    drops it), junk after a closing quote or an unterminated quote
    fails the decode and the RAW slice (through any consumed delimiter)
    is the element — 'prefer incorrectly formatted data to no data'.
    Returns (value, next_index, is_quoted_empty_ok)."""
    n = len(x)
    start = i
    c = x[i]
    if c not in "\"'":
        j = x.find(",", i)
        if j == -1:
            return x[i:], n, False
        return x[i:j], j + 1, False
    quote = c
    buf: list[str] = []
    j = i + 1
    while j < n:
        c2 = x[j]
        if c2 == "\\" and quote == '"':
            if j + 1 >= n:
                break  # dangling backslash -> unterminated
            nxt = x[j + 1]
            if nxt in _LIST_ESCAPES:
                buf.append(_LIST_ESCAPES[nxt])
            elif nxt == quote:
                buf.append(quote)
            else:
                buf.append("\\" + nxt)
            j += 2
            continue
        if c2 == quote:
            # closing quote: next must be delimiter or end
            if j + 1 >= n:
                return "".join(buf), n, True
            if x[j + 1] == ",":
                return "".join(buf), j + 2, True
            # junk after closing quote -> failure: raw through delimiter
            k = x.find(",", j + 1)
            end = n if k == -1 else k + 1
            return x[start:end], end, False
        buf.append(c2)
        j += 1
    # unterminated quote -> raw rest of the input
    return x[start:], n, False


def _parse_list_one(x: str) -> list[str]:
    items: list[str] = []
    i, n = 0, len(x)
    while i < n:
        if x[i] == ",":  # unquoted empty element: skipped
            i += 1
            continue
        val, i, _quoted = _decode_elem(x, i)
        items.append(val)
    return items


def _parse_lists(row_vals) -> list[str]:
    out: list[str] = []
    for v in row_vals:
        out.extend(_parse_list_one(v))
    return out


def _ser_elem(e: str) -> str:
    """Quote one list element following str_repr_encode's quoting-needed
    rules (lib/str-repr/encode.c:29-84): empty, apostrophe, quote,
    space, comma, backslash or control chars force quoting; an element
    with a quote but no apostrophe wraps in single quotes, everything
    else double-quotes with backslash escapes (kept round-trippable
    through _decode_elem, whose escape processing is double-quote-only)."""
    if e == "":
        return '""'
    has_apos = "'" in e
    has_quote = '"' in e
    if not has_apos and not has_quote:
        if not any(ch in "\b\f\n\r\t\\ ," for ch in e) and not any(
                ord(ch) < 0x20 for ch in e):
            return e
    if (has_quote and not has_apos and "\\" not in e
            and not any(ord(ch) < 0x20 for ch in e)):
        return "'" + e + "'"
    esc = (e.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\b", "\\b").replace("\f", "\\f")
            .replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r"))
    return '"' + esc + '"'


def _ser_list(items: list[str]) -> str:
    return ",".join(_ser_elem(e) for e in items)


def _rows(t, args):
    """Iterate per-row tuples of the (already evaluated) arg Series."""
    cols = [_s(a) for a in args]
    if not cols:
        return [()] * t.num_rows
    return list(zip(*cols))


def tf_list_concat(t, *args):
    return pd.Series([_ser_list(_parse_lists(vals)) for vals in _rows(t, args)], dtype=object)


def tf_list_head(t, *args):
    def do(vals):
        l = _parse_lists(vals)
        return l[0] if l else ""

    return pd.Series([do(v) for v in _rows(t, args)], dtype=object)


def tf_list_tail(t, *args):
    return pd.Series([_ser_list(_parse_lists(vals)[1:]) for vals in _rows(t, args)], dtype=object)


def tf_list_nth(t, idx, *args):
    i = _num(idx).fillna(0).astype(int)

    def do(l, k):
        return l[k] if -len(l) <= k < len(l) else ""

    return pd.Series(
        [do(_parse_lists(vals), k) for vals, k in zip(_rows(t, args), i)], dtype=object
    )


def tf_list_count(t, *args):
    return pd.Series([str(len(_parse_lists(vals))) for vals in _rows(t, args)], dtype=object)


def tf_list_slice(t, spec, *args):
    sp = _s(spec)

    def do(vals, srange):
        l = _parse_lists(vals)
        a_, _, b_ = srange.partition(":")
        lo = int(a_) if a_ else 0
        hi = int(b_) if b_ else len(l)
        return _ser_list(l[lo:hi])

    return pd.Series([do(vals, s) for vals, s in zip(_rows(t, args), sp)], dtype=object)


def tf_list_append(t, a=None, *items):
    """Appends each item arg as ONE literal element (not parsed as a
    list) — reference list-funcs.c tf_list_append."""
    if a is None:
        return pd.Series([""] * t.num_rows, dtype=object)
    cols = [_s(x) for x in items]
    return pd.Series(
        [_ser_list(_parse_list_one(x) + list(vals)) for x, *vals in zip(_s(a), *cols)],
        dtype=object,
    )


def tf_list_search(t, *args):
    """$(list-search [--mode literal|prefix|substring|glob]
    [--start-index N] needle list...) -> first matching index or ''."""
    import fnmatch

    mode, start_idx = "literal", 0
    rest = list(args)
    while rest:
        flag = _flag(rest[0])
        if flag == "--mode" and len(rest) >= 2:
            mode = _flag(rest[1])
            rest = rest[2:]
        elif flag == "--start-index" and len(rest) >= 2:
            try:
                start_idx = int(_flag(rest[1]))
            except ValueError:
                start_idx = 0
            rest = rest[2:]
        else:
            break
    if not rest:
        return pd.Series([""] * t.num_rows, dtype=object)
    needle, lists = _s(rest[0]), rest[1:]

    def match(e: str, nd: str) -> bool:
        if mode == "prefix":
            return e.startswith(nd)
        if mode == "substring":
            return nd in e
        if mode == "glob":
            return fnmatch.fnmatchcase(e, nd)
        return e == nd

    def do(vals, nd):
        l = _parse_lists(vals)
        for k in range(max(start_idx, 0), len(l)):
            if match(l[k], nd):
                return str(k)
        return ""

    return pd.Series([do(vals, nd) for vals, nd in zip(_rows(t, lists), needle)], dtype=object)


# ---- ip (ip-funcs.c) ----

def tf_ipv4_to_int(t, a):
    def conv(x):
        try:
            p = x.split(".")
            return str((int(p[0]) << 24) | (int(p[1]) << 16) | (int(p[2]) << 8) | int(p[3]))
        except (ValueError, IndexError):
            return ""

    return _s(a).map(conv).astype(object)


# ---- getent / dns (modules/getent/tfgetent.c, basicfuncs/ip-funcs.c) ----
# File-backed lookups only: /etc/passwd, /etc/group, /etc/services,
# /etc/protocols and /etc/hosts — there is no network in this sandbox, so
# $(dns-resolve-ip) resolves exclusively from the hosts file (the
# reference's use-dns(no)+hosts-file path, lib/host-resolve.c); tables
# load lazily ONCE per process.

_GETENT_CACHE: dict = {}


def _getent_db(db: str) -> dict[str, str]:
    if db in _GETENT_CACHE:
        return _GETENT_CACHE[db]
    if db == "hosts":  # ip <-> first hostname, both directions
        fwd = _hosts_table()
        table = dict(fwd)
        for ip, name in fwd.items():
            table.setdefault(name, ip)
        _GETENT_CACHE[db] = table
        return table
    path = {"passwd": "/etc/passwd", "group": "/etc/group",
            "services": "/etc/services", "protocols": "/etc/protocols"}.get(db)
    table: dict[str, str] = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.split("#", 1)[0].strip()
                if not line:
                    continue
                parts = line.split(":") if db in ("passwd", "group") else line.split()
                if db in ("passwd", "group") and len(parts) >= 3:
                    table[parts[0]] = parts[2]       # name -> id
                    table[parts[2]] = parts[0]       # id -> name
                elif db in ("services", "protocols") and len(parts) >= 2:
                    num = parts[1].split("/")[0]
                    table[parts[0]] = num            # name -> number
                    table.setdefault(num, parts[0])  # number -> first name
    except (OSError, TypeError):
        pass
    _GETENT_CACHE[db] = table
    return table


def tf_getent(t, db, key):
    """$(getent passwd root) -> uid; numeric keys map back to names
    (reference modules/getent/tfgetent.c databases list)."""
    table = _getent_db(_one_str(db))
    return _s(key).map(lambda k: table.get(k, "")).astype(object)


def _hosts_table() -> dict[str, str]:
    # private cache key: "hosts" is a PUBLIC getent db name (would collide)
    if "_hosts_fwd" in _GETENT_CACHE:
        return _GETENT_CACHE["_hosts_fwd"]
    table: dict[str, str] = {}
    try:
        with open("/etc/hosts") as f:
            for line in f:
                line = line.split("#", 1)[0].strip()
                parts = line.split()
                if len(parts) >= 2:
                    table.setdefault(parts[0], parts[1])  # ip -> first hostname
    except OSError:
        pass
    _GETENT_CACHE["_hosts_fwd"] = table
    return table


def tf_dns_resolve_ip(t, a):
    """$(dns-resolve-ip): hosts-file-only reverse lookup (no network in
    the sandbox — documented divergence from the resolver path); unknown
    IPs yield the IP itself, matching use-dns(no) behavior."""
    table = _hosts_table()
    return _s(a).map(lambda ip: table.get(ip, ip)).astype(object)


def _one_str(v) -> str:
    if isinstance(v, pd.Series):
        return str(v.iloc[0]) if len(v) else ""
    return str(v)


# ---- cond/misc/tag funcs (cond-funcs.c, misc-funcs.c, tf-tag.c) ----

def tf_or(t, *args):
    """$(or a b c): first non-empty argument (cond-funcs.c:185-200)."""
    out = pd.Series([""] * t.num_rows, dtype=object)
    todo = np.ones(t.num_rows, dtype=bool)
    for a in args:
        vals = _s(a)
        pick = todo & (vals != "").to_numpy()
        out[pick] = vals[pick]
        todo &= ~pick
        if not todo.any():
            break
    return out


def tf_env(t, *args):
    """$(env NAME): environment of the EVALUATING process (misc-funcs.c)."""
    import os

    vals = "".join(os.environ.get(_one_str(a), "") for a in args)
    return pd.Series([vals] * t.num_rows, dtype=object)


def tf_indent_multi_line(t, *args):
    """$(indent-multi-line x): insert a TAB after every newline not already
    followed by one (str-funcs.c:307-326)."""
    joined = _s(args[0]) if len(args) == 1 else pd.Series(
        [" ".join(vs) for vs in zip(*(_s(a) for a in args))], dtype=object)
    return joined.str.replace(r"\n(?!\t)", "\n\t", regex=True).astype(object)


def tf_binary(t, *args):
    """$(binary 0x41 66 ...): bytes from numeric args (str-funcs.c:577)."""
    try:
        data = bytes(int(_one_str(a), 0) & 0xFF for a in args)
        s = data.decode("utf-8", "replace")
    except ValueError:
        s = ""
    return pd.Series([s] * t.num_rows, dtype=object)


def _tags_lists(t) -> pd.Series:
    if "tags" not in t.column_names:
        return pd.Series([[] for _ in range(t.num_rows)], dtype=object)
    return t.column("tags").to_pandas().map(lambda v: list(v) if v is not None else [])


def tf_tag(t, name, if_set=None, if_unset=None):
    """$(tag name [if-set [if-unset]]) (tf-tag.c:32-75; defaults 1/0)."""
    tag = _one_str(name)
    yes = _one_str(if_set) if if_set is not None else "1"
    no = _one_str(if_unset) if if_unset is not None else "0"
    return _tags_lists(t).map(lambda tags: yes if tag in tags else no).astype(object)


def tf_tags_head(t, *names):
    """$(tags-head t1 t2 ...): first listed tag the row carries (tf-tag.c)."""
    wanted = [_one_str(n) for n in names]
    return _tags_lists(t).map(
        lambda tags: next((w for w in wanted if w in tags), "")).astype(object)


def tf_names(t, *globs):
    """$(names glob): comma list of matching column names (value-pairs-
    driven in the reference; here the NV space is the Arrow schema)."""
    import fnmatch as _fn

    pats = [_one_str(g) for g in globs] or ["*"]
    names = sorted(c for c in t.column_names if any(_fn.fnmatch(c, p) for p in pats))
    return pd.Series([",".join(names)] * t.num_rows, dtype=object)


def tf_values(t, *globs):
    """$(values glob): comma list of the matching columns' values per row."""
    import fnmatch as _fn

    pats = [_one_str(g) for g in globs] or ["*"]
    names = sorted(c for c in t.column_names if any(_fn.fnmatch(c, p) for p in pats))
    if not names:
        return pd.Series([""] * t.num_rows, dtype=object)
    cols = [t.column(c).to_pandas().astype("string").fillna("") for c in names]
    return pd.Series([",".join(vals) for vals in zip(*cols)], dtype=object)


def tf_template(t, spec, *rest):
    """$(template 'TPL'): evaluate the argument as an inline template
    (the reference resolves named templates from the config; a batch
    engine has no config registry — inline form only, documented)."""
    from .templates import Template

    return Template(_one_str(spec)).eval(t)


# ---- higher-order over lists (tf-iterate.c, tf-map.c, tf-filter.c) ----
# the inner expression sees the current element as `$_` (the reference uses
# a template evaluated per element)

def _eval_elem_template(spec: str, elems: list[str]) -> list[str]:
    import pyarrow as _pa

    from .templates import Template

    t = _pa.table({"_": _pa.array(elems, type=_pa.string())})
    return list(Template(spec).eval(t))


def tf_list_map(t, expr, a):
    out = []
    for x in _s(a):
        elems = _parse_list_one(x)
        out.append(_ser_list(_eval_elem_template(expr, elems)) if elems else "")
    return pd.Series(out, dtype=object)


def tf_list_filter(t, expr, a):
    out = []
    for x in _s(a):
        elems = _parse_list_one(x)
        if not elems:
            out.append("")
            continue
        keep = _eval_elem_template(expr, elems)
        out.append(_ser_list([e for e, k in zip(elems, keep) if k in ("1", "true", "True", "yes")]))
    return pd.Series(out, dtype=object)


# ---- filterx-style casts (lib/filterx/filterx-globals.c constructors) ----

def tf_cast_int(t, a):
    return _num(a).map(lambda v: "" if pd.isna(v) else str(int(v))).astype(object)


def tf_cast_double(t, a):
    return _num(a).map(lambda v: "" if pd.isna(v) else repr(float(v))).astype(object)


def tf_cast_bool(t, a):
    truthy = {"1", "true", "True", "TRUE", "yes", "on"}
    return _s(a).map(lambda v: "true" if v in truthy else "false").astype(object)


def tf_cast_string(t, a):
    return _s(a)


tf_list_map._lazy_first = True  # type: ignore[attr-defined]
tf_list_filter._lazy_first = True  # type: ignore[attr-defined]


from .slog import tf_slog  # noqa: E402
from .valuepairs import tf_format_cef_extension  # noqa: E402
from .valuepairs import (tf_format_flat_json,  # noqa: E402 (template-function forms)
                         tf_format_json, tf_format_welf, tf_graphite_output)

tf_format_json._lazy_all = True
tf_format_flat_json._lazy_all = True
tf_format_welf._lazy_all = True
tf_graphite_output._lazy_all = True

TEMPLATE_FUNCS = {
    "echo": tf_echo,
    "format-json": tf_format_json,
    "format-flat-json": tf_format_flat_json,
    "format-welf": tf_format_welf,
    "graphite-output": tf_graphite_output,
    "length": tf_length,
    "lowercase": tf_lowercase,
    "uppercase": tf_uppercase,
    "strip": tf_strip,
    "substr": tf_substr,
    "sanitize": tf_sanitize,
    "replace-delimiter": tf_replace_delimiter,
    "padding": tf_padding,
    "implode": tf_implode,
    "explode": tf_explode,
    "if": tf_if,
    "grep": tf_grep,
    "context-lookup": tf_context_lookup,
    "context-length": tf_context_length,
    "context-values": tf_context_values,
    "geoip2": tf_geoip2,

    "default": tf_default,
    "+": _binop(lambda a, b: a + b),
    "-": _binop(lambda a, b: a - b),
    "*": _binop(lambda a, b: a * b),
    "/": _binop(lambda a, b: a / b, int_op=_trunc_div),
    "%": _binop(math.fmod, int_op=_trunc_mod),
    "sum": _listfold(sum),
    "min": _listfold(min),
    "max": _listfold(max),
    "average": _listfold(lambda v: sum(v) / len(v)),
    "round": tf_round,
    "ceil": lambda t, a: _fmt_num(np.ceil(_num(a))),
    "floor": lambda t, a: _fmt_num(np.floor(_num(a))),
    "dirname": tf_dirname,
    "basename": tf_basename,
    "url-encode": tf_url_encode,
    "url-decode": tf_url_decode,
    "base64-encode": tf_base64_encode,
    "sha1": _digest("sha1"),
    "sha256": _digest("sha256"),
    "sha512": _digest("sha512"),
    "md5": _digest("md5"),
    "md4": tf_md4,
    "hash": _digest("sha256"),
    "stardate": tf_stardate,
    "uuid": tf_uuid,
    "list-concat": tf_list_concat,
    "list-head": tf_list_head,
    "list-tail": tf_list_tail,
    "list-nth": tf_list_nth,
    "list-count": tf_list_count,
    "list-slice": tf_list_slice,
    "list-append": tf_list_append,
    "list-search": tf_list_search,
    "ipv4-to-int": tf_ipv4_to_int,
    "getent": tf_getent,
    "dns-resolve-ip": tf_dns_resolve_ip,
    "or": tf_or,
    "env": tf_env,
    "indent-multi-line": tf_indent_multi_line,
    "binary": tf_binary,
    "tag": tf_tag,
    "tags-head": tf_tags_head,
    "names": tf_names,
    "values": tf_values,
    "template": tf_template,
    # filterx-named string functions (lib/filterx/filterx-globals.c:97-200)
    "hex-encode": tf_hex_encode,
    "hex-decode": tf_hex_decode,
    "base64-decode": tf_base64_decode,
    "startswith": tf_startswith,
    "endswith": tf_endswith,
    "includes": tf_includes,
    "str-replace": tf_str_replace,
    "utf8-sanitize": tf_utf8_sanitize,
    "format-date": tf_format_date,
    "map": tf_list_map,
    "filter": tf_list_filter,
    "iterate": tf_list_map,
    "int": tf_cast_int,
    "double": tf_cast_double,
    "bool": tf_cast_bool,
    "string": tf_cast_string,
}

TEMPLATE_FUNCS["format-cef-extension"] = tf_format_cef_extension
TEMPLATE_FUNCS["slog"] = tf_slog


# Per-config user template functions (`template-function "name" "body";`
# in config.py): installed as a scoped OVERLAY while that config compiles
# and runs its templates, so one compile_config()'s user functions never
# leak into another config compiled in the same process, and can only
# shadow built-ins for templates belonging to that config (the reference
# scopes user functions to the GlobalConfig's plugin context,
# lib/template/user-function.c).
ACTIVE_USER_FUNCS = _contextvars.ContextVar("ACTIVE_USER_FUNCS",
                                            default=None)


def lookup_template_func(name: str):
    """Resolve a template function: the active config's user-function
    overlay first, then the engine-wide built-in table."""
    ov = ACTIVE_USER_FUNCS.get()
    if ov is not None and name in ov:
        return ov[name]
    return TEMPLATE_FUNCS.get(name)
