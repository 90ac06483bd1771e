"""parse-number conformance — pinned against the reference's own corpus
(lib/tests/test_parse_number.c)."""
import math

import pytest

from axosyslog_ray.functions.numbers import (parse_double, parse_generic_number,
                                             parse_int64, parse_int64_base8,
                                             parse_int64_base16,
                                             parse_int64_base_any,
                                             parse_int64_with_suffix)


class TestBaseAny:
    # test_parse_number.c:97-118
    def test_simple_numbers(self):
        assert parse_int64_base_any("1234") == 1234
        assert parse_int64_base_any("+1234") == 1234
        assert parse_int64_base_any("-1234") == -1234

    def test_c_like_prefixes_select_base(self):
        assert parse_int64_base_any("0x20") == 32
        assert parse_int64_base_any("0xFF") == 255
        assert parse_int64_base_any("-0x09") == -9
        assert parse_int64_base_any("020") == 16
        assert parse_int64_base_any("-010") == -8
        assert parse_int64_base_any("08") is None
        assert parse_int64_base_any("0A") is None
        assert parse_int64_base_any("20") == 20
        assert parse_int64_base_any("FF") is None
        assert parse_int64_base_any("1FF") is None


class TestDecimal:
    # test_parse_number.c:119-141
    def test_simple_numbers(self):
        assert parse_int64("1234") == 1234
        assert parse_int64("+1234") == 1234
        assert parse_int64("-1234") == -1234

    def test_prefixes_are_plain_decimal(self):
        assert parse_int64("1F20") is None
        assert parse_int64("0x20") is None
        assert parse_int64("0xFF") is None
        assert parse_int64("-0x09") is None
        assert parse_int64("020") == 20
        assert parse_int64("-010") == -10
        assert parse_int64("08") == 8
        assert parse_int64("20") == 20
        assert parse_int64("FF") is None


class TestSuffix:
    # test_parse_number.c:142-198
    def test_simple_numbers(self):
        assert parse_int64_with_suffix("1234") == 1234
        assert parse_int64_with_suffix("+1234") == 1234
        assert parse_int64_with_suffix("-1234") == -1234

    def test_c_like_prefixes_not_supported(self):
        assert parse_int64_with_suffix("0x20") is None
        assert parse_int64_with_suffix("020") == 20
        assert parse_int64_with_suffix("-010") == -10
        assert parse_int64_with_suffix("FF") is None

    def test_exponent_suffix(self):
        assert parse_int64_with_suffix("1K") == 1000
        assert parse_int64_with_suffix("1k") == 1000
        assert parse_int64_with_suffix("1m") == 1000 * 1000
        assert parse_int64_with_suffix("1M") == 1000 * 1000
        assert parse_int64_with_suffix("1G") == 1000 * 1000 * 1000
        assert parse_int64_with_suffix("1g") == 1000 * 1000 * 1000

    def test_byte_units(self):
        assert parse_int64_with_suffix("1b") == 1
        assert parse_int64_with_suffix("1B") == 1
        assert parse_int64_with_suffix("1Kb") == 1000
        assert parse_int64_with_suffix("1kB") == 1000
        assert parse_int64_with_suffix("1mb") == 1000 * 1000
        assert parse_int64_with_suffix("1MB") == 1000 * 1000
        assert parse_int64_with_suffix("1Gb") == 1000 * 1000 * 1000
        assert parse_int64_with_suffix("1gB") == 1000 * 1000 * 1000

    def test_base2_selected_by_i_modifier(self):
        assert parse_int64_with_suffix("1Kib") == 1024
        assert parse_int64_with_suffix("1kiB") == 1024
        assert parse_int64_with_suffix("1Ki") == 1024
        assert parse_int64_with_suffix("1kI") == 1024
        assert parse_int64_with_suffix("1mib") == 1024 * 1024
        assert parse_int64_with_suffix("1MiB") == 1024 * 1024
        assert parse_int64_with_suffix("1Gib") == 1024 * 1024 * 1024
        assert parse_int64_with_suffix("1giB") == 1024 * 1024 * 1024
        assert parse_int64_with_suffix("1024giB") == 1024 ** 4

    def test_invalid_formats(self):
        assert parse_int64_with_suffix("1234Z") is None
        assert parse_int64_with_suffix("1234kZ") is None
        assert parse_int64_with_suffix("1234kdZ") is None
        assert parse_int64_with_suffix("1234kiZ") is None
        assert parse_int64_base_any("1234kiZ") is None


class TestExplicitBases:
    def test_base16(self):
        assert parse_int64_base16("FF") == 255
        assert parse_int64_base16("0xFF") == 255
        assert parse_int64_base16("G") is None

    def test_base8(self):
        assert parse_int64_base8("20") == 16
        assert parse_int64_base8("8") is None


class TestGenericNumber:
    # test_parse_number.c:200-230 GenericNumber classification
    def test_int_and_double_classification(self):
        assert parse_generic_number("123") == ("int64", 123)
        assert parse_generic_number("-123") == ("int64", -123)
        t, v, p = parse_generic_number("-123.0")
        assert t == "double" and v == -123.0 and p == 1
        t, v, p = parse_generic_number("1.1")
        assert t == "double" and v == 1.1 and p == 1
        assert parse_generic_number("not-a-number") is None

    def test_precision_counts_fraction_digits(self):
        assert parse_double("3.14159")[1] == 5
        assert parse_double("2.")[1] == 0
        assert parse_double("7")[1] == 0


class TestOverflow:
    def test_int64_range_is_enforced(self):
        assert parse_int64(str(2 ** 63 - 1)) == 2 ** 63 - 1
        assert parse_int64(str(2 ** 63)) is None
        assert parse_int64(str(-(2 ** 63))) == -(2 ** 63)
        assert parse_int64_with_suffix("9999999999g") is None
