"""Number parsing — the reference's parse-number.h surface.

A from-scratch re-expression of lib/parse-number.c (strtoll-backed
int64 parsing with C base detection, size suffixes like 10Mb / 1KiB,
and GenericNumber string classification), conformance-pinned against
lib/tests/test_parse_number.c in tests/test_parse_number.py. Returns
None on parse failure instead of the C gboolean+outparam shape.

The config front end uses parse_int64_with_suffix for numeric driver
options, matching how the reference's config grammar reads sizes
(log-fifo-size(10Mb) and friends).
"""

from __future__ import annotations

_INT64_MIN = -(1 << 63)
_INT64_MAX = (1 << 63) - 1

_DIGITS = "0123456789abcdefghijklmnopqrstuvwxyz"


def _strtoll(s: str, base: int) -> tuple[int, int] | None:
    """C strtoll: returns (value, end_index) or None when no digits were
    consumed or the value overflows int64 (ERANGE -> failure, matching
    _int64_from_string's errno check)."""
    i, n = 0, len(s)
    while i < n and s[i].isspace():
        i += 1
    sign = 1
    if i < n and s[i] in "+-":
        sign = -1 if s[i] == "-" else 1
        i += 1
    if base == 0:
        if s[i:i + 2].lower() == "0x" and i + 2 < n and s[i + 2].lower() in _DIGITS[:16]:
            base = 16
            i += 2
        elif i < n and s[i] == "0":
            base = 8
        else:
            base = 10
    elif base == 16 and s[i:i + 2].lower() == "0x":
        i += 2
    allowed = _DIGITS[:base]
    start = i
    val = 0
    while i < n and s[i].lower() in allowed:
        val = val * base + _DIGITS.index(s[i].lower())
        i += 1
    if i == start:
        return None
    val *= sign
    if not (_INT64_MIN <= val <= _INT64_MAX):
        return None
    return val, i


def _full(s: str, base: int) -> int | None:
    r = _strtoll(s, base)
    if r is None or r[1] != len(s):
        return None
    return r[0]


def parse_int64(s: str) -> int | None:
    """Decimal only (lib/parse-number.c parse_int64)."""
    return _full(s, 10)


def parse_int64_base_any(s: str) -> int | None:
    """C base detection: 0x -> hex, leading 0 -> octal, else decimal."""
    return _full(s, 0)


def parse_int64_base16(s: str) -> int | None:
    return _full(s, 16)


def parse_int64_base8(s: str) -> int | None:
    return _full(s, 8)


_EXP = {"k": 1, "K": 1, "m": 2, "M": 2, "g": 3, "G": 3}


def parse_int64_with_suffix(s: str) -> int | None:
    """Decimal number + size suffix [kKmMgG][iI]?[bB]?
    (parse-number.c _process_suffix): 1K=1000, 1KiB=1024, 1b=1;
    anything else in the suffix fails."""
    r = _strtoll(s, 10)
    if r is None:
        return None
    val, end = r
    suffix = s[end:]
    if len(suffix) > 3:
        return None
    exponent = base_char = unit = ""
    if len(suffix) == 3:
        exponent, base_char, unit = suffix
    elif len(suffix) == 2:
        exponent = suffix[0]
        if suffix[1] in "bB":
            unit = suffix[1]
        else:
            base_char = suffix[1]
    elif len(suffix) == 1:
        if suffix in _EXP:
            exponent = suffix
        elif suffix in ("b", "B"):
            unit = suffix
        else:
            return None
    if base_char == "":
        multiplier = 1000
    elif base_char in ("i", "I"):
        multiplier = 1024
    else:
        return None
    if unit and unit not in "bB":
        return None
    if exponent:
        if exponent not in _EXP:
            return None
        val *= multiplier ** _EXP[exponent]
    if not (_INT64_MIN <= val <= _INT64_MAX):
        return None
    return val


def parse_double(s: str) -> tuple[float, int] | None:
    """(value, precision): precision is the digit count after the '.'
    (parse-number.c _parse_double)."""
    t = s.strip()
    try:
        val = float(t)
    except ValueError:
        return None
    if t.lower() in ("inf", "-inf", "+inf", "nan"):  # strtod accepts; keep
        pass
    prec = 0
    dot = s.find(".")
    if dot >= 0:
        i = dot + 1
        while i < len(s) and s[i].isdigit():
            prec += 1
            i += 1
    return val, prec


def parse_generic_number(s: str):
    """('int64', v) | ('double', v, precision) | ('nan',) | None —
    GenericNumber classification (parse-number.c:277-300)."""
    v = parse_int64(s)
    if v is not None:
        return ("int64", v)
    d = parse_double(s)
    if d is not None:
        return ("double", d[0], d[1])
    if s.strip().lower() == "nan":
        return ("nan",)
    return None
