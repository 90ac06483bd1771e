"""Comparison-filter conformance pinned to the reference's own test
corpus (lib/filter/tests/test_filters_fop_cmp.c) — the 4.0 type-aware
decision procedure of route.Cmp over a sample message shaped like the
reference's _construct_sample_message (pri 15, typed values)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.route import Cmp

T = pa.table({
    "pri": pa.array([15], type=pa.int64()),
    "program": ["software"],
    "strvalue": ["string"],
    "truevalue": pa.array([True]),
    "falsevalue": pa.array([False]),
    "int32value": pa.array([32], type=pa.int64()),
    "int64value": pa.array([4294967296], type=pa.int64()),
    "nanvalue": pa.array([float("nan")], type=pa.float64()),
    "dblvalue": pa.array([3.1415], type=pa.float64()),
    "datevalue": ["1653246684.123"],
    "listvalue": ["foo,bar,baz"],
    "jsonvalue": ['{"foo":"foovalue"}'],
    "nullvalue": pa.array([None], type=pa.string()),
})


def ev(left, op, right, **kw):
    return bool(Cmp(left, op, right, **kw).mask(T)[0])


class TestNumericMode:
    # documented divergence: our numeric mode parses doubles, not atoi
    def test_num_ordering(self):
        assert ev("10", "==", "10", mode="numeric")
        assert ev("$SEVERITY_NUM", "==", "7", mode="numeric")
        assert not ev("10", "==", "11", mode="numeric")
        assert ev("10", "<", "11", mode="numeric")
        assert ev("$LEVEL_NUM", "<", "8", mode="numeric")
        assert not ev("11", "<", "11", mode="numeric")
        assert ev("11", ">=", "10", mode="numeric")


class TestStringMode:
    def test_string_ordering(self):
        assert ev("10", "==", "10", mode="string")
        assert not ev("10", "==", "11", mode="string")
        # string ordering: '10' < '7' lexicographically
        assert ev("10", "<", "7", mode="string")
        assert ev("alma", "<", "korte", mode="string")
        assert not ev("korte", "<", "alma", mode="string")
        assert ev("korte", ">=", "alma", mode="string")


class TestTypeAwareStrings:
    # test_type_aware_comparisons_strings_to_strings_are_compared_as_strings
    def test_literal_strings_compare_as_strings(self):
        assert ev("alma", "!=", "korte")
        assert not ev("alma", "==", "korte")
        assert ev("alma", "<", "korte")
        assert ev("korte", ">", "alma")
        # strings containing numbers STAY strings in 4.0
        assert ev("10", "!=", "11")
        assert not ev("10", "==", "11")
        assert ev("10", "<", "7")
        assert ev("7", ">", "10")

    def test_string_values(self):
        assert ev("$strvalue", "==", "string")
        assert ev("$strvalue", "==", "$strvalue")
        assert not ev("$strvalue", "!=", "$strvalue")
        assert ev("$strvalue", ">", "foo")
        assert ev("$strvalue", "<", "zabkasa")

    def test_objects_compare_as_strings_if_types_match(self):
        json_lit = '{"foo":"foovalue"}'
        assert ev("$jsonvalue", "==", json_lit, ltype="json", rtype="json")
        assert ev("$listvalue", "==", "foo,bar,baz", ltype="list", rtype="list")
        # mismatching types -> numeric -> both NaN -> False
        assert not ev("foo,bar,baz", "==", "foo,bar,baz", ltype="list", rtype="string")
        assert not ev("", "==", "", ltype="list", rtype="string")


class TestTypeAwareNull:
    def test_null_equals_null_only(self):
        assert ev("", "==", "", ltype="null", rtype="null")
        assert not ev("", "!=", "", ltype="null", rtype="null")
        assert ev("$nullvalue", "==", "", rtype="null")
        assert not ev("$nullvalue", "!=", "", rtype="null")
        assert ev("", "!=", "", ltype="string", rtype="null")
        assert ev("0", "!=", "", ltype="integer", rtype="null")
        assert ev("0.0", "!=", "", ltype="double", rtype="null")
        assert ev("", "!=", "", ltype="json", rtype="null")

    def test_non_existing_macro_is_null(self):
        assert ev("$doesnotexist", "==", "", rtype="null")
        assert not ev("$doesnotexist", "!=", "", rtype="null")

    def test_null_converts_to_zero_for_ordering(self):
        assert ev("$nullvalue", "<", "1")
        assert ev("$nullvalue", ">", "-1")


class TestTypeAwareNumeric:
    # test_type_aware_comparisons_mixed_types_or_numbers...
    def test_mixed_types_compare_as_numbers(self):
        assert ev("$int32value", "==", "32")
        assert ev("$int32value", "<", "321")
        assert ev("$int32value", ">", "7")
        assert ev("$truevalue", "==", "1", rtype="integer")
        assert ev("$falsevalue", "==", "0", rtype="integer")
        assert ev("$dblvalue", "<", "3.145", rtype="double")
        assert ev("$dblvalue", ">", "3.14", rtype="double")
        assert ev("$dblvalue", ">", "0.314e1", rtype="double")
        assert ev("$dblvalue", "<", "0.314e2", rtype="double")
        assert ev("$datevalue", "==", "1653246684123",
                  ltype="datetime", rtype="integer")

    def test_objects_are_nan(self):
        for op in ("<", ">", "=="):
            assert not ev("$listvalue", op, "1234", ltype="list", rtype="integer")
            assert not ev("$jsonvalue", op, "1234", ltype="json", rtype="integer")

    def test_nan_always_different(self):
        # test_type_aware_comparison_nan_is_always_different_from_anything
        assert ev("$nanvalue", "!=", "$nanvalue")
        assert not ev("$nanvalue", "<", "5", rtype="integer")
        assert not ev("$nanvalue", ">", "5", rtype="integer")
        assert not ev("$nanvalue", "==", "5", rtype="integer")
        assert ev("5", "!=", "$nanvalue", ltype="integer")
        assert not ev("$nanvalue", "==", "$nanvalue")
        assert not ev("$nanvalue", "<", "$nanvalue")
        assert not ev("$nanvalue", ">", "$nanvalue")


class TestTypeAndValue:
    # test_type_and_value_comparison_checks_whether_type_and_value_match
    def test_triple_eq(self):
        assert ev("$strvalue", "===", "$strvalue")
        assert ev("$strvalue", "===", "string")
        assert ev("64", "===", "64", ltype="string", rtype="string")
        assert not ev("64", "!==", "64", ltype="string", rtype="string")
        assert not ev("64", "===", "64", ltype="string", rtype="integer")
        assert ev("64", "!==", "64", ltype="string", rtype="integer")
        assert not ev("foo", "===", "bar")
        assert not ev("123", "===", "456", ltype="integer", rtype="integer")
        assert ev("1e1", "===", "10", ltype="double", rtype="double")


class TestAutoTypedTimestamps:
    """Auto-typed Arrow timestamp columns render as ISO strings through
    templates; the datetime numeric conversion must parse them (epoch
    ms) rather than coerce to NaN-then-0 (which made every ts-vs-ts
    ordering degenerate to 0 vs 0)."""

    TT = pa.table({
        "a": pa.array([pd.Timestamp("2026-08-17"), pd.Timestamp("2026-08-01")],
                      type=pa.timestamp("us")),
        "b": pa.array([pd.Timestamp("2026-08-10"), pd.Timestamp("2026-08-10")],
                      type=pa.timestamp("us")),
    })

    def test_ordering_uses_real_values(self):
        gt = Cmp("$a", ">", "$b").mask(self.TT)
        lt = Cmp("$a", "<", "$b").mask(self.TT)
        assert list(gt) == [True, False]
        assert list(lt) == [False, True]

    def test_equality_not_universally_true(self):
        eq = Cmp("$a", "==", "$b").mask(self.TT)
        assert list(eq) == [False, False]
        assert list(Cmp("$a", "==", "$a").mask(self.TT)) == [True, True]

    def test_ts_vs_unixtime_string(self):
        # 2026-08-17 00:00:00 UTC == 1786924800 epoch seconds
        assert bool(Cmp("$a", "==", "1786924800", rtype="datetime").mask(self.TT)[0])
        assert bool(Cmp("$a", ">", "1786924799", rtype="datetime").mask(self.TT)[0])
