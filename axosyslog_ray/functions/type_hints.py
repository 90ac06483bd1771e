"""Value type hints and type casts (reference lib/logmsg/type-hinting.c).

`type_hint_parse` maps hint names to canonical LogMessageValueType
names; the `type_cast_to_*` functions implement the reference's strict
cast semantics (strtoll endptr checks, hex detection, g_ascii_strtod
overflow handling, the fixed-point-with-ISO-timezone datetime grammar)
and raise InvalidCastError exactly where the reference sets
TYPE_HINTING_INVALID_CAST. Pinned by
tests/test_type_hints_conformance.py against
lib/logmsg/tests/test_type_hints.c.
"""

from __future__ import annotations

import re

from .numbers import _strtoll


class TypeHintError(ValueError):
    pass


class InvalidTypeError(TypeHintError):
    """TYPE_HINTING_INVALID_TYPE."""


class InvalidCastError(TypeHintError):
    """TYPE_HINTING_INVALID_CAST."""


# type_hint_parse's name table (type-hinting.c:42-90): aliases collapse
# to the canonical LM_VT_* type
TYPE_HINTS = {
    "string": "string",
    "literal": "json",
    "json": "json",
    "boolean": "boolean",
    "int": "integer",
    "int32": "integer",
    "int64": "integer",
    "float": "double",
    "double": "double",
    "datetime": "datetime",
    "list": "list",
    "null": "null",
    "bytes": "bytes",
    "protobuf": "protobuf",
}


def type_hint_parse(name: str) -> str:
    t = TYPE_HINTS.get(name)
    if t is None:
        raise InvalidTypeError(f"invalid-hint({name})")
    return t


def type_cast_to_boolean(value: str) -> bool:
    """First-character truth table (type-hinting.c type_cast_to_boolean)."""
    from .strings import bool_cast_first_char

    b = bool_cast_first_char(value)
    if b is None:
        raise InvalidCastError(f"boolean({value})")
    return b


def _is_value_hex(value: str) -> bool:
    v = value[1:] if value[:1] in "+-" else value
    return v[:1] == "0" and v[1:2] in ("x", "X")


def _cast_int(value: str) -> int:
    r = _strtoll(value, 16 if _is_value_hex(value) else 10)
    # strtoll must consume the whole string and the string must be
    # non-empty ("00111" is decimal 111, NOT octal — no base detection)
    if not value or r is None or r[1] != len(value):
        raise InvalidCastError(f"int64({value})")
    return r[0]


def type_cast_to_int64(value: str) -> int:
    return _cast_int(value)


def type_cast_to_int32(value: str) -> int:
    """strtol into a gint32: the reference truncates via the C cast."""
    v = _cast_int(value)
    v &= 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


_DOUBLE_RE = re.compile(
    r"[ \t\n\r\f\v]*[+-]?("
    r"\d+\.?\d*([eE][+-]?\d+)?"
    r"|\.\d+([eE][+-]?\d+)?"
    r"|0[xX][0-9a-fA-F]+(\.[0-9a-fA-F]*)?([pP][+-]?\d+)?"
    r"|[iI][nN][fF]([iI][nN][iI][tT][yY])?"
    r"|[nN][aA][nN])\Z")


def type_cast_to_double(value: str) -> float:
    """g_ascii_strtod semantics: whole string must parse; overflow
    (ERANGE with ±HUGE_VAL) fails, underflow quietly returns 0.0,
    literal INF/NaN succeed."""
    if not _DOUBLE_RE.match(value):
        raise InvalidCastError(f"double({value})")
    try:
        v = value.strip()
        out = float.fromhex(v) if _is_value_hex(v) else float(v)
    except (ValueError, OverflowError):
        raise InvalidCastError(f"double({value})") from None
    if out in (float("inf"), float("-inf")):
        stripped = value.strip().lstrip("+-").lower()
        if not stripped.startswith("inf"):
            raise InvalidCastError(f"double({value})")  # ERANGE overflow
    return out


_ISO_TZ_RE = re.compile(r"([+-])(\d\d):(\d\d)(?!\d)")


def type_cast_to_datetime_unixtime(value: str):
    """'<sec>[.frac][±HH:MM]' -> (sec, usec, gmtoff_seconds | None)
    (type-hinting.c type_cast_to_datetime_unixtime +
    _parse_fixed_point_timestamp_in_nsec + scan-timestamp.c
    scan_iso_timezone). At most 9 fractional digits; a bare '.' or a
    10+-digit fraction fails; 'Z' is not accepted here."""
    r = _strtoll(value, 10)
    if r is None:
        raise InvalidCastError(f"datetime({value})")
    sec, i = r
    nsec = 0
    if value[i:i + 1] == ".":
        frac_start = i + 1
        r2 = _strtoll(value[frac_start:], 10)
        if r2 is None:
            raise InvalidCastError(f"datetime({value})")
        nsec, consumed = r2
        if consumed == 0 or consumed > 9:
            raise InvalidCastError(f"datetime({value})")
        nsec *= 10 ** (9 - consumed)
        i = frac_start + consumed
    gmtoff = None
    if i < len(value):
        m = _ISO_TZ_RE.match(value, i)
        if not m:
            raise InvalidCastError(f"datetime({value})")
        sign = -1 if m.group(1) == "-" else 1
        gmtoff = sign * (int(m.group(2)) * 3600 + int(m.group(3)) * 60)
    return sec, nsec // 1000, gmtoff


def type_cast_to_datetime_msec(value: str) -> int:
    sec, usec, _ = type_cast_to_datetime_unixtime(value)
    return sec * 1000 + usec // 1000


def type_cast_validate(value: str, type_name: str) -> bool:
    """type_cast_validate (type-hinting.c:247-275): strings/json/null/
    bytes/protobuf/list always validate; typed values must cast."""
    try:
        if type_name == "boolean":
            type_cast_to_boolean(value)
        elif type_name == "integer":
            type_cast_to_int64(value)
        elif type_name == "double":
            type_cast_to_double(value)
        elif type_name == "datetime":
            type_cast_to_datetime_unixtime(value)
        return True
    except InvalidCastError:
        return False
