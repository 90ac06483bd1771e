"""FilterX '+' operator conformance.

Pins lib/filterx/tests/test_expr_plus.c through the FilterX surface:
string concatenation, datetime + integer (usec) / double (seconds),
integer/double arithmetic, list concatenation, dict merge, and the
wrong-type combinations (the reference's NULL eval result surfaces as
a raised TypeError, or unset rows in the null-propagating string
path — a bare-statement failure drops the message either way).
"""

import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.filterx import FilterX


def _t(**cols):
    return pa.table(cols)


TEST_EPOCH_USEC = 1577836800000000  # 2020-01-01T00:00:00 in usec


def _epoch_table():
    ts = pd.Series(pd.to_datetime([TEST_EPOCH_USEC], unit="us"))
    return pa.table({"ts": pa.Array.from_pandas(ts)})


def test_string_add_string():
    out = FilterX('$r = "foo" + "bar";')(_t(x=[1]))
    assert out.column("r").to_pylist() == ["foobar"]


def test_string_add_null_yields_unset():
    # expr-plus: string + null is an eval error (NULL result); the
    # vectorized engine propagates unset, and a bare statement on the
    # result filters the row — the same observable drop
    out = FilterX('$r = "foo" + $nothing;')(_t(nothing=pa.array(
        [None], type=pa.string())))
    assert out.column("r").to_pylist() == [None]


def test_datetime_add_datetime_is_an_error():
    fx = FilterX("$r = strptime($s, \"%Y-%m-%d\") "
                 "+ strptime($s, \"%Y-%m-%d\");")
    with pytest.raises(TypeError, match="datetime"):
        fx(_t(s=["2020-01-01"]))


def test_datetime_add_integer_is_usec():
    # object-datetime.c _add: an integer operand is a usec duration
    out = FilterX("$r = strftime($ts + 3600000000, \"%Y-%m-%dT%H:%M:%S\");")(
        _epoch_table())
    assert out.column("r").to_pylist() == ["2020-01-01T01:00:00"]


def test_datetime_add_double_is_seconds():
    # a double operand is seconds (converted to usec internally)
    out = FilterX("$r = strftime($ts + 3600.5, \"%H:%M:%S\");")(
        _epoch_table())
    assert out.column("r").to_pylist() == ["01:00:00"]


def test_integer_add_integer():
    out = FilterX("$r = 33 + 66;")(_t(x=[1]))
    assert out.column("r").to_pylist() == [99]


def test_integer_add_double_is_double():
    out = FilterX("$r = 33 + 0.66;")(_t(x=[1]))
    assert out.column("r").to_pylist() == [pytest.approx(33.66)]


def test_double_add_double():
    out = FilterX("$r = 33.0 + 0.66;")(_t(x=[1]))
    assert out.column("r").to_pylist() == [pytest.approx(33.66)]


def test_double_add_integer():
    out = FilterX("$r = 0.66 + 33;")(_t(x=[1]))
    assert out.column("r").to_pylist() == [pytest.approx(33.66)]


def test_list_add_list():
    fx = FilterX("$r = $a + $b;")
    t = pa.table({
        "a": pa.array([["one", "two"]], type=pa.list_(pa.string())),
        "b": pa.array([["three"]], type=pa.list_(pa.string())),
    })
    out = fx(t)
    assert out.column("r").to_pylist() == [["one", "two", "three"]]


def test_list_add_wrong_type_is_an_error():
    fx = FilterX("$r = $a + $b;")
    t = pa.table({
        "a": pa.array([["one"]], type=pa.list_(pa.string())),
        "b": pa.array([{"k": "v"}], type=pa.struct([("k", pa.string())])),
    })
    with pytest.raises(TypeError, match="list"):
        fx(t)


def test_dict_add_dict_merges():
    fx = FilterX("$r = format_json($a + $b);")
    t = pa.table({
        "a": pa.array([{"k1": "v1"}], type=pa.struct([("k1", pa.string())])),
        "b": pa.array([{"k2": "v2"}], type=pa.struct([("k2", pa.string())])),
    })
    out = fx(t)
    assert out.column("r").to_pylist() == ['{"k1":"v1","k2":"v2"}']
