"""FilterX minimal evaluator tests (reference lib/filterx/ semantics)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.filterx import FilterX


def _t(**cols):
    return pa.table(cols)


def test_assign_and_arith():
    out = FilterX("$y = $x * 2 + 1;")(_t(x=[1, 2, 3]))
    assert out.column("y").to_pylist() == [3, 5, 7]


def test_if_elif_else():
    fx = FilterX("""
        if ($status >= 500) { $class = "err"; }
        elif ($status >= 400) { $class = "warn"; }
        else { $class = "ok"; };
    """)
    out = fx(_t(status=[200, 404, 503]))
    assert out.column("class").to_pylist() == ["ok", "warn", "err"]


def test_null_coalesce():
    out = FilterX('$name = $prog ?? "unknown";')(_t(prog=["a", None, "c"]))
    assert out.column("name").to_pylist() == ["a", "unknown", "c"]


def test_drop_and_done():
    fx = FilterX("""
        if ($v == 2) { drop; };
        if ($v == 3) { done; };
        $seen = "yes";
    """)
    out = fx(_t(v=[1, 2, 3, 4]))
    assert out.column("v").to_pylist() == [1, 3, 4]  # 2 dropped
    assert out.column("seen").to_pylist() == ["yes", None, "yes"]  # 3 was done


def test_switch_first_match_and_default():
    fx = FilterX("""
        switch ($sev) {
          case "err": $n = 3; break;
          case "warn": $n = 4; break;
          default: $n = 6;
        }
    """)
    out = fx(_t(sev=["err", "warn", "info", None]))
    assert out.column("n").to_pylist() == [3, 4, 6, 6]


def test_switch_fallthrough_without_break():
    # the reference's own functional pins (test_switch_fallthrough*):
    # without break, execution falls through into the next case body
    fx = FilterX("""
        switch ($sev) {
          case "err": $n = 3;
          case "warn": $n = 4; break;
          default: $n = 6;
        }
    """)
    out = fx(_t(sev=["err", "warn", "info"]))
    assert out.column("n").to_pylist() == [4, 4, 6]


def test_bool_ops_and_ternary():
    fx = FilterX('$r = ($a > 1 and $a < 4) ? "mid" : "edge";')
    out = fx(_t(a=[0, 2, 5]))
    assert out.column("r").to_pylist() == ["edge", "mid", "edge"]


def test_string_concat_and_funcs():
    fx = FilterX('$hdr = upper($prog) + ": " + string($pid);')
    out = fx(_t(prog=["sshd"], pid=[42]))
    assert out.column("hdr").to_pylist() == ["SSHD: 42"]


def test_isset_and_vars():
    fx = FilterX("""
        tmp = $x ?? 0;
        $has = isset($x) ? "y" : "n";
        $plus = tmp + 1;
    """)
    out = fx(_t(x=[5, None]))
    assert out.column("has").to_pylist() == ["y", "n"]
    assert out.column("plus").to_pylist() == [6, 1]


def test_null_comparison_is_false():
    out = FilterX('if ($x > 1) { $hit = "y"; };')(_t(x=[None, 2]))
    assert out.column("hit").to_pylist() == [None, "y"]


def test_syntax_error_reported():
    with pytest.raises(SyntaxError, match="filterx"):
        FilterX("if ($x { }")


def test_read_only_columns_keep_arrow_type():
    # a column only READ by the program must keep its original buffer/type
    t = pa.table({"status": pa.array([200, None, 503], type=pa.int64())})
    out = FilterX('if ($status >= 500) { $hit = "y"; };')(t)
    assert out.schema.field("status").type == pa.int64()
    assert out.column("status").to_pylist() == [200, None, 503]


def _run(src, table):
    from axosyslog_ray.filterx import FilterX

    return FilterX(src)(table)


def test_regex_match_operators():
    t = pa.table({"msg": ["error: disk full", "ok", None, "ERROR 42"]})
    out = _run('if ($msg =~ "(?i)error") { $is_err = "y"; } else { $is_err = "n"; };', t)
    assert out.column("is_err").to_pylist() == ["y", "n", "n", "y"]
    # !~ : null subject stays false (no-verdict), matching rows excluded
    out = _run('if ($msg !~ "error") { $clean = "y"; } else { $clean = "n"; };', t)
    assert out.column("clean").to_pylist() == ["n", "y", "n", "y"]


def test_regex_requires_literal_pattern():
    import pytest as _pytest

    from axosyslog_ray.filterx import FilterX

    with _pytest.raises(SyntaxError):
        FilterX("$a =~ $b;")


def test_in_membership_and_list_literal():
    t = pa.table({"status": ["a", "b", "c", None], "n": [1, 2, 3, 4]})
    out = _run('if ($status in ["a", "c"]) { $hit = 1; } else { $hit = 0; };', t)
    assert out.column("hit").to_pylist() == [1, 0, 1, 0]
    out = _run('if ($n in [1, 4]) { $hit = 1; } else { $hit = 0; };', t)
    assert out.column("hit").to_pylist() == [1, 0, 0, 1]


def test_unset_and_isset():
    t = pa.table({"a": ["x", "y"], "keep": [1, 0]})
    out = _run('if ($keep == 0) { unset($a); }; $has = isset($a) ? "t" : "f";', t)
    assert out.column("a").to_pylist() == ["x", None]
    assert out.column("has").to_pylist() == ["t", "f"]


def test_plus_assign():
    t = pa.table({"n": [1, 2], "s": ["a", "b"]})
    out = _run("$n += 10;", t)
    assert out.column("n").to_pylist() == [11, 12]
    out = _run('$s += "!";', t)
    assert out.column("s").to_pylist() == ["a!", "b!"]


def test_str_functions():
    t = pa.table({"p": ["/var/log/x", "/tmp/y", None]})
    out = _run('$v = startswith($p, "/var") ? 1 : 0; $i = includes($p, "log") ? 1 : 0;'
               '$e = endswith($p, "y") ? 1 : 0;', t)
    assert out.column("v").to_pylist() == [1, 0, 0]
    assert out.column("i").to_pylist() == [1, 0, 0]
    assert out.column("e").to_pylist() == [0, 1, 0]


def test_regexp_subst_first_vs_global():
    t = pa.table({"m": ["a1b2c3", "xyz", None]})
    out = _run(r'$first = regexp_subst($m, "[0-9]", "#");'
               r'$all = regexp_subst($m, "[0-9]", "#", true);', t)
    assert out.column("first").to_pylist() == ["a#b2c3", "xyz", None]
    assert out.column("all").to_pylist() == ["a#b#c#", "xyz", None]


def test_regexp_subst_group_refs():
    t = pa.table({"m": ["user=bob", "nope"]})
    out = _run(r'$m = regexp_subst($m, "user=(\w+)", "\1@corp");', t)
    assert out.column("m").to_pylist() == ["bob@corp", "nope"]


def test_regexp_search():
    # reference expr-regexp-search.c semantics (test_expr_regexp_search.c):
    # dict of groups by default; EMPTY dict on no match
    t = pa.table({"m": ["code=42 ok", "none here"]})
    out = _run(r'$g = regexp_search($m, "code=(\d+)");', t)
    # the no-match row is an EMPTY dict from the function; Arrow struct
    # unification renders it with the column's keys nulled
    assert out.column("g").to_pylist() == [{"1": "42"}, {"1": None}]


def test_regexp_search_reference_conformance():
    t = pa.table({"m": ["foobarbaz"]})

    def run(expr):
        return _run(expr, t).column("g").to_pylist()[0]

    # unnamed -> dict "1".."3", group 0 dropped
    assert run(r'$g = regexp_search($m, "(foo)(bar)(baz)");') == \
        {"1": "foo", "2": "bar", "3": "baz"}
    # keep_zero
    assert run(r'$g = regexp_search($m, "(foo)(bar)(baz)", keep_zero=true);') == \
        {"0": "foobarbaz", "1": "foo", "2": "bar", "3": "baz"}
    # list mode
    assert run(r'$g = regexp_search($m, "(foo)(bar)(baz)", keep_zero=true, list_mode=true);') == \
        ["foobarbaz", "foo", "bar", "baz"]
    # named + mixed
    assert run(r'$g = regexp_search($m, "(?<first>foo)(bar)(?<third>baz)");') == \
        {"first": "foo", "2": "bar", "third": "baz"}
    # no-capture pattern retains group zero as the sole entry
    assert run(r'$g = regexp_search($m, "foobarbaz");') == {"0": "foobarbaz"}
    # no match -> empty dict
    assert run(r'$g = regexp_search($m, "(almafa)");') == {}
    # optional unmatched group: absent in dict mode, null in list mode
    t2 = pa.table({"m": ["bar"]})
    out = _run(r'$g = regexp_search($m, "(foo)?(bar)?", list_mode=true);', t2)
    assert out.column("g").to_pylist()[0] == [None, "bar"]
    out = _run(r'$g = regexp_search($m, "(?<f>foo)?(?<b>bar)?");', t2)
    assert out.column("g").to_pylist()[0] == {"b": "bar"}


def test_str_transform_functions():
    t = pa.table({"s": ["  pad  ", "a-b", None]})
    out = _run('$t = str_strip($s); $l = str_lstrip($s); $r = str_rstrip($s);'
               '$x = str_replace($s, "-", "_");', t)
    assert out.column("t").to_pylist() == ["pad", "a-b", None]
    assert out.column("l").to_pylist() == ["pad  ", "a-b", None]
    assert out.column("r").to_pylist() == ["  pad", "a-b", None]
    assert out.column("x").to_pylist() == ["  pad  ", "a_b", None]


def test_glob_match():
    t = pa.table({"h": ["web-01", "db-02", None]})
    out = _run('$w = glob_match($h, "web-*") ? 1 : 0;', t)
    assert out.column("w").to_pylist() == [1, 0, 0]


def test_digests_match_hashlib():
    import hashlib

    t = pa.table({"s": ["abc", None]})
    out = _run("$m = md5($s); $a = sha1($s); $b = sha256($s); $c = sha512($s);", t)
    assert out.column("m").to_pylist() == [hashlib.md5(b"abc").hexdigest(), None]
    assert out.column("a").to_pylist() == [hashlib.sha1(b"abc").hexdigest(), None]
    assert out.column("b").to_pylist() == [hashlib.sha256(b"abc").hexdigest(), None]
    assert out.column("c").to_pylist() == [hashlib.sha512(b"abc").hexdigest(), None]


def test_encodings_roundtrip():
    t = pa.table({"s": ["hi there/x", None]})
    out = _run("$h = hex_decode(hex_encode($s));"
               "$b = base64_decode(base64_encode($s));"
               "$u = urldecode(urlencode($s));"
               "$he = hex_encode($s); $ue = urlencode($s);", t)
    # decode returns BYTES objects like the reference (func-encode.c)
    assert out.column("h").to_pylist() == [b"hi there/x", None]
    assert out.column("b").to_pylist() == [b"hi there/x", None]
    assert out.column("u").to_pylist() == ["hi there/x", None]
    assert out.column("he").to_pylist() == ["68692074686572652f78", None]
    assert out.column("ue").to_pylist() == ["hi%20there%2Fx", None]


def test_decode_error_yields_null():
    t = pa.table({"s": ["zz-not-hex", "6869"]})
    out = _run("$d = hex_decode($s); $b = base64_decode($s);", t)
    assert out.column("d").to_pylist() == [None, b"hi"]
    assert out.column("b").to_pylist()[0] is None


def test_parse_json_and_subscripts():
    t = pa.table({"props": ['{"k": 5, "u": {"name": "bob"}, "tags": ["a","b"]}',
                            '{"k": 12}', "not json", None]})
    out = _run('$p = parse_json($props); $k = $p["k"]; $uname = $p.u.name;'
               '$t0 = $p["tags"][0]; $nk = len(keys($p));'
               '$isd = istype($p, "dict") ? 1 : 0;', t)
    assert out.column("k").to_pylist() == [5, 12, None, None]
    assert out.column("uname").to_pylist() == ["bob", None, None, None]
    assert out.column("t0").to_pylist() == ["a", None, None, None]
    assert out.column("nk").to_pylist() == [3, 1, None, None]
    assert out.column("isd").to_pylist() == [1, 1, 0, 0]


def test_set_subscript_and_setattr():
    t = pa.table({"props": ['{"a": 1}', '{"a": 2, "b": 9}']})
    out = _run('$p = parse_json($props); $p["new"] = "x"; $p.a = 100;'
               '$j = format_json($p);', t)
    assert out.column("j").to_pylist() == ['{"a":100,"new":"x"}',
                                           '{"a":100,"b":9,"new":"x"}']


def test_set_subscript_respects_mask():
    t = pa.table({"props": ['{"a": 1}', '{"a": 2}'], "sel": [1, 0]})
    out = _run('$p = parse_json($props);'
               'if ($sel == 1) { $p["hit"] = true; };'
               '$j = format_json($p);', t)
    assert out.column("j").to_pylist() == ['{"a":1,"hit":true}', '{"a":2}']


def test_unset_empties():
    t = pa.table({"props": ['{"a": 1, "b": "", "c": null, "d": [], "e": {}}']})
    out = _run("$j = format_json(unset_empties(parse_json($props)));", t)
    assert out.column("j").to_pylist() == ['{"a":1}']


def test_format_json_roundtrip_invalid_is_null():
    t = pa.table({"props": ["nope", '{"x": [1, 2]}']})
    out = _run("$j = format_json(parse_json($props));", t)
    assert out.column("j").to_pylist() == [None, '{"x":[1,2]}']


def test_datetime_functions():
    import pandas as pd

    ts = pd.to_datetime(["2024-03-31 01:30:00", "2024-07-01 12:00:00", None])
    t = pa.table({"ts": pa.array(ts), "s": ["2024-01-02 03:04:05", "bad", None]})
    out = _run('$str = strftime($ts, "%Y-%m-%d %H:%M");'
               '$iso = format_isodate($ts);'
               '$p = format_isodate(strptime($s, "%Y-%m-%d %H:%M:%S"));'
               '$u = format_isodate(fix_timezone($ts, "Europe/Budapest"));', t)
    assert out.column("str").to_pylist() == ["2024-03-31 01:30", "2024-07-01 12:00", None]
    assert out.column("iso").to_pylist() == ["2024-03-31T01:30:00+00:00",
                                            "2024-07-01T12:00:00+00:00", None]
    assert out.column("p").to_pylist() == ["2024-01-02T03:04:05+00:00", None, None]
    # CET +1 before the 02:00 spring-forward, CEST +2 in July
    assert out.column("u").to_pylist() == ["2024-03-31T00:30:00+00:00",
                                          "2024-07-01T10:00:00+00:00", None]


def test_flatten_and_dict_to_pairs():
    t = pa.table({"props": ['{"a": {"b": 1, "c": {"d": 2}}, "e": 3}']})
    out = _run('$f = format_json(flatten(parse_json($props)));'
               '$f2 = format_json(flatten(parse_json($props), "_"));'
               '$p = format_json(dict_to_pairs(flatten(parse_json($props))));', t)
    assert out.column("f").to_pylist() == ['{"a.b":1,"a.c.d":2,"e":3}']
    assert out.column("f2").to_pylist() == ['{"a_b":1,"a_c_d":2,"e":3}']
    assert out.column("p").to_pylist() == [
        '[{"key":"a.b","value":1},{"key":"a.c.d","value":2},{"key":"e","value":3}]']


def test_dict_literal():
    t = pa.table({"host": ["h1", None], "n": [1, 2]})
    out = _run('$d = {"host": $host, "n": $n, "tag": "x"};'
               '$j = format_json($d); $h = $d["host"];', t)
    # a null VALUE stays as JSON null (drop members with unset_empties);
    # only a null KEY contributes no member
    assert out.column("j").to_pylist() == ['{"host":"h1","n":1,"tag":"x"}',
                                           '{"host":null,"n":2,"tag":"x"}']
    assert out.column("h").to_pylist() == ["h1", None]


def test_typed_comparison_reference_conformance():
    # lib/filterx/tests/test_expr_comparison.c type-aware / string-based /
    # type-and-value groups, run through the language surface
    t = pa.table({"x": [1]})

    def ev(expr):
        return FilterX(f"$out = ({expr});")(t).column("out").to_pylist()[0]

    cases = [
        # null cases (type-aware)
        ("null == null", True), ("null != null", False),
        ("null < null", False), ("null > null", False),
        ("null == 3", False), ("null < 3", True), ("null != 3", True),
        ('"foobar" == null', False), ('"foobar" != null', True),
        ('"foobar" < null', False), ('"foobar" > null', False),
        # string cases: numeric conversion on mixed types, NaN rules
        ('"3.14" == 3.14', True),
        ('"443" == 443', True), ('"443" != 443', False),
        ('"a443" == 443', False), ('"a443" != 443', True),
        ('"a443" < 443', False), ('"a443" > 443', False),
        # numerical fallback
        ("6 == 6.0", True), ('3 == "3"', True),
        ("7 == null", False), ("0 == false", True),
        # same-type strings compare as BYTES
        ('"10" < "7"', True), ('"foo" > "alma"', True),
        # string-based keywords marshal both sides (null "", bool lowercase)
        ('"3" eq 3', True), ('"3.0" eq 3.0', True),
        ('"3" lt 3.1', True), ('"false" lt true', True),
        ('"3" gt null', True), ('"3" ne null', True),
        # type-and-value (===): strict type gate first
        ("5 === 5", True), ("5 === 5.0", False), ('5 !== "5"', True),
        ("null === null", True), ("true === true", True),
    ]
    for expr, want in cases:
        assert ev(expr) == want, expr


class TestCmpNullFastPath:
    """Nulls in typed (non-object) columns must follow the per-row
    _fx_cmp_typed semantics on the vectorized fast path: null converts
    to 0 for ordering ops, ==/!= is type-equality (expr-comparison.c
    _evaluate_type_aware). An int64 column with nulls arrives as
    float64 NaN, which previously took NaN-comparison semantics."""

    def _mask(self, expr, **cols):
        out = FilterX(f"if ({expr}) {{ $hit = true; }};")(_t(**cols))
        return out.column("hit").to_pylist()

    def test_null_lt_one_is_true(self):
        # null -> 0 for ordering ops, so null < 1 holds
        assert self._mask("$x < 1", x=pa.array([None, 0, 5], type=pa.int64())) \
            == [True, True, None]

    def test_null_gt_neg_is_true(self):
        assert self._mask("$x > -1", x=pa.array([None, -5, 5], type=pa.int64())) \
            == [True, None, True]

    def test_null_eq_zero_is_false(self):
        # ==/!= on null is TYPE equality: null == 0 is false, null != 0 true
        assert self._mask("$x == 0", x=pa.array([None, 0], type=pa.int64())) \
            == [None, True]
        assert self._mask("$x != 0", x=pa.array([None, 0], type=pa.int64())) \
            == [True, None]

    def test_both_null_eq(self):
        assert self._mask("$x == $y",
                          x=pa.array([None, 1], type=pa.int64()),
                          y=pa.array([None, None], type=pa.int64())) \
            == [True, None]

    def test_fast_path_matches_per_row_semantics(self):
        from axosyslog_ray.filterx import _fx_cmp_typed
        xv = [None, 0, 5, -3, None]
        yv = [1, None, 5, -4, None]
        xs = pa.array(xv, type=pa.int64())
        ys = pa.array(yv, type=pa.int64())
        for op in ("==", "!=", "<", "<=", ">", ">="):
            fast = self._mask(f"$x {op} $y", x=xs, y=ys)
            expect = [_fx_cmp_typed(a, b, op) or None for a, b in zip(xv, yv)]
            assert fast == expect, op


class TestExpressionStatements:
    """Bare expression statements filter on falsey results — 'bailing
    out due to a falsy expr' (expr-compound.c:42-81; only assignments
    carry ignore_falsy_result)."""

    def test_comparison_statement_filters_rows(self):
        out = FilterX('$x == 1;\n$y = "kept";')(_t(x=[1, 2, 1]))
        assert out.column("x").to_pylist() == [1, 1]
        assert out.column("y").to_pylist() == ["kept", "kept"]

    def test_assignment_of_falsey_does_not_filter(self):
        # expr-assign.c:142 ignore_falsy_result
        out = FilterX("$y = 0; $z = false;")(_t(x=[1, 2]))
        assert out.num_rows == 2

    def test_boolean_chain_statement(self):
        out = FilterX('$a > 1 && $b == "k";')(_t(a=[0, 5, 7], b=["k", "k", "x"]))
        assert out.column("a").to_pylist() == [5]

    def test_subscript_comparison_statement(self):
        out = FilterX('$d["k"] == 2;')(
            _t(d=pd.Series([{"k": 1}, {"k": 2}], dtype=object)))
        assert out.column("d").to_pylist() == [{"k": 2}]

    def test_statement_after_drop_still_applies(self):
        out = FilterX('if ($x == 9) { drop; };\n$x < 3;')(_t(x=[1, 9, 5]))
        assert out.column("x").to_pylist() == [1]
