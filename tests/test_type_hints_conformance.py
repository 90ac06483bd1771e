"""Type hint / type cast conformance.

Pins lib/logmsg/tests/test_type_hints.c through
axosyslog_ray.functions.type_hints (the type-hinting.c port): the hint
name table, boolean/int/double casts with their exact failure cases,
and the fixed-point datetime grammar with ISO timezone suffixes.
"""

import math

import pytest

from axosyslog_ray.functions.type_hints import (InvalidCastError,
                                                InvalidTypeError,
                                                type_cast_to_boolean,
                                                type_cast_to_datetime_msec,
                                                type_cast_to_double,
                                                type_cast_to_int32,
                                                type_cast_to_int64,
                                                type_cast_validate,
                                                type_hint_parse)


@pytest.mark.parametrize("name,want", [
    ("string", "string"),
    ("literal", "json"),
    ("json", "json"),
    ("boolean", "boolean"),
    ("int", "integer"),
    ("int32", "integer"),
    ("int64", "integer"),
    ("float", "double"),
    ("double", "double"),
    ("datetime", "datetime"),
    ("list", "list"),
    ("null", "null"),
    ("bytes", "bytes"),
    ("protobuf", "protobuf"),
])
def test_type_hint_parse(name, want):
    assert type_hint_parse(name) == want


def test_invalid_type_hint_parse():
    with pytest.raises(InvalidTypeError):
        type_hint_parse("invalid-hint")


@pytest.mark.parametrize("s,want", [
    ("True", True), ("true", True), ("1", True), ("totally true", True),
    ("False", False), ("false", False), ("0", False),
    ("fatally false", False),
])
def test_bool_cast(s, want):
    assert type_cast_to_boolean(s) is want


def test_invalid_bool_cast():
    with pytest.raises(InvalidCastError):
        type_cast_to_boolean("booyah")


@pytest.mark.parametrize("cast", [type_cast_to_int32, type_cast_to_int64])
def test_int_casts(cast):
    assert cast("12345") == 12345
    assert cast("0x1000") == 0x1000
    assert cast("00111") == 111  # leading zeros are NOT octal
    with pytest.raises(InvalidCastError):
        cast("12345a")
    with pytest.raises(InvalidCastError):
        cast("")


def test_int32_truncates_like_the_c_cast():
    assert type_cast_to_int32("2147483647") == 2147483647
    assert type_cast_to_int32("2147483648") == -2147483648
    assert type_cast_to_int64("2147483648") == 2147483648


@pytest.mark.parametrize("s,want", [
    ("INF", float("inf")),
    ("1.0", 1.0),
    ("1e-100000000", 0.0),  # underflow succeeds as 0.0
])
def test_double_cast(s, want):
    got = type_cast_to_double(s)
    if math.isinf(want):
        assert math.isinf(got)
    else:
        assert got == pytest.approx(want, abs=5e-324)


@pytest.mark.parametrize("s", ["2.0bad", "bad", "", "1e1000000",
                               "-1e1000000"])
def test_invalid_double_cast(s):
    with pytest.raises(InvalidCastError):
        type_cast_to_double(s)


@pytest.mark.parametrize("s,msec", [
    ("12345", 12345000),
    ("12345.5", 12345500),
    ("12345.54", 12345540),
    ("12345.543", 12345543),
    ("12345.54321", 12345543),
    ("12345.987654", 12345987),
    ("12345.987654321", 12345987),
    ("12345+05:00", 12345000),
    ("12345-05:00", 12345000),
])
def test_datetime_cast(s, msec):
    assert type_cast_to_datetime_msec(s) == msec


@pytest.mark.parametrize("s", [
    "invalid", "12345T", "12345.", "12345.1234567890",
    "12345+XX:YY", "12345-05", "12345-XX:YY",
])
def test_invalid_datetime_cast(s):
    with pytest.raises(InvalidCastError):
        type_cast_to_datetime_msec(s)


def test_type_cast_validate():
    # strings/json/null/bytes/protobuf/list always validate
    for t in ("string", "json", "null", "bytes", "protobuf", "list"):
        assert type_cast_validate("anything at all", t)
    assert type_cast_validate("true", "boolean")
    assert not type_cast_validate("booyah", "boolean")
    assert type_cast_validate("42", "integer")
    assert not type_cast_validate("42a", "integer")
    assert type_cast_validate("4.2", "double")
    assert not type_cast_validate("4.2bad", "double")
    assert type_cast_validate("12345.5+05:00", "datetime")
    assert not type_cast_validate("12345T", "datetime")
