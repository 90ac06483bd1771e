"""Template-function conformance pinned to the reference's own test
corpus (modules/basicfuncs/tests/test_basicfuncs.c) — 112 cases across
str/list/numeric/fname/encoding funcs, run through the Template engine
over a reference-shaped message (host bzorp, program syslog-ng, pid
23323, test_basicfuncs.c fixture values)."""
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.functions.templates import Template
from axosyslog_ray.stages.syslog import parse_syslog_table


def _msg():
    return parse_syslog_table(pa.table({
        "url": ["u"],
        "warc_ts": pa.array(pd.Series([pd.Timestamp("2026-08-17 12:00:00")], dtype="datetime64[us]")),
        "text": ["<38>Aug 17 05:02:28 bzorp syslog-ng[23323]: message"],
    }))


CASES = [
    ("$(length $HOST $PID)", "5 5"),
    ("$(length $HOST)", "5"),
    ("$(length)", ""),
    ("$(substr $HOST 1 3)", "zor"),
    ("$(substr $HOST 1)", "zorp"),
    ("$(substr $HOST -1)", "p"),
    ("$(substr $HOST -2 1)", "r"),
    ("$(sanitize alma/bela)", "alma_bela"),
    ("$(sanitize -r @ alma/bela)", "alma@bela"),
    ("$(sanitize -i @ alma@bela)", "alma_bela"),
    ("$(sanitize $HOST $PROGRAM)", "bzorp/syslog-ng"),
    ("$(indent-multi-line 'foo\nbar')", "foo\n\tbar"),
    ("$(lowercase ŐRÜLT ÍRÓ)", "őrült író"),
    ("$(uppercase őrült író)", "ŐRÜLT ÍRÓ"),
    ("$(replace-delimiter \"\t\" \",\" \"hello\tworld\")", "hello,world"),
    ("$(padding foo 10)", "       foo"),
    ("$(padding foo 10 x)", "xxxxxxxfoo"),
    ("$(padding foo 10 abc)", "abcabcafoo"),
    ("$(padding foo 2)", "foo"),
    ("$(padding foo 3)", "foo"),
    ("$(padding foo 6 abc)", "abcfoo"),
    ("[$(base64-encode)]", "[]"),
    ("[$(base64-encode abc)]", "[YWJj]"),
    ("[$(base64-encode abcxyz)]", "[YWJjeHl6]"),
    ("[$(base64-encode abcd)]", "[YWJjZA==]"),
    ("[$(base64-encode abcd abcd abcd abcd)]", "[YWJjZGFiY2RhYmNkYWJjZA==]"),
    ("[$(base64-encode 'X X')]", "[WCBY]"),
    ("$(+ $FACILITY_NUM 1)", "5"),  # our facility is auth=4
    ("$(+ -1 -1)", "-2"),
    ("$(/ 19 0)", "NaN"),
    ("$(% 19 0)", "NaN"),
    ("$(+ foo bar)", "NaN"),
    ("$(/ 2147483648 1)", "2147483648"),
    ("$(+ 5000000000 5000000000)", "10000000000"),
    ("$(% 10000000000 5000000001)", "4999999999"),
    ("$(* 5000000000 2)", "10000000000"),
    ("$(- 10000000000 5000000000)", "5000000000"),
    ("$(+ 1.5 .25)", "1.75"),
    ("$(- -1.5 .25)", "-1.75"),
    ("$(/ 3 2)", "1"),
    ("$(/ 3.0 2)", "1.5"),
    ("$(/ 3 2.0)", "1.5"),
    ("$(* 1.5 2.0)", "3"),
    ("$(+ 5e-1 0)", "0.5"),
    ("$(round 2.0)", "2"),
    ("$(round 2.123456 3)", "2.123"),
    ("$(round 2.123456 4)", "2.1235"),
    ("$(round 0.5)", "1"),
    ("$(round 2 -1)", "NaN"),
    ("$(round 2 21)", "NaN"),
    ("$(round 2 0)", "2"),
    ("$(round 2 20)", "2.00000000000000000000"),
    ("$(floor 0.7)", "0"),
    ("$(ceil 0.2)", "1"),
    ("$(basename foo)", "foo"),
    ("$(basename /foo/bar)", "bar"),
    ("$(basename /foo/bar/baz)", "baz"),
    ("$(dirname foo)", "."),
    ("$(dirname /foo/bar)", "/foo"),
    ("$(dirname /foo/bar/)", "/foo/bar"),
    ("$(dirname /foo/bar/baz)", "/foo/bar"),
    ("$(list-concat)", ""),
    ("$(list-concat foo bar baz)", "foo,bar,baz"),
    ("$(list-concat foo bar baz '')", "foo,bar,baz"),
    ("$(list-concat foo $HOST $PROGRAM $PID bar)", "foo,bzorp,syslog-ng,23323,bar"),
    ("$(list-append)", ""),
    ("$(list-append '' foo)", "foo"),
    ("$(list-append '' foo bar)", "foo,bar"),
    ("$(list-append foo,bar,baz 'x')", "foo,bar,baz,x"),
    ("$(list-append foo,bar,baz '')", 'foo,bar,baz,""'),
    ("$(list-append foo,bar,baz 'xxx,')", 'foo,bar,baz,"xxx,"'),
    ("$(list-head)", ""),
    ("$(list-head '')", ""),
    ("$(list-head foo)", "foo"),
    ("$(list-head foo,)", "foo"),
    ("$(list-head foo,bar)", "foo"),
    ("$(list-head ,bar,baz)", "bar"),
    ("$(list-head foo bar)", "foo"),
    ("$(list-head '' bar baz)", "bar"),
    ("$(list-nth 0 '\"foo,\",\"bar\",\"baz\"')", "foo,"),
    ("$(list-nth 1 '\"foo,\",\"bar\",\"baz\"')", "bar"),
    ("$(list-nth 3 '\"foo,\",\"bar\",\"baz\"')", ""),
    ("$(list-nth -1 '\"foo,\",\"bar\",\"baz\"')", "baz"),
    ("$(list-nth -3 '\"foo,\",\"bar\",\"baz\"')", "foo,"),
    ("$(list-nth -4 '\"foo,\",\"bar\",\"baz\"')", ""),
    ("$(list-tail)", ""),
    ("$(list-tail foo)", ""),
    ("$(list-tail foo,bar)", "bar"),
    ("$(list-tail foo,)", ""),
    ("$(list-tail ,bar)", ""),
    ("$(list-tail foo,bar,baz)", "bar,baz"),
    ("$(list-tail foo bar baz)", "bar,baz"),
    ("$(list-tail foo,bar baz bad)", "bar,baz,bad"),
    ("$(list-slice 0:0 foo,bar,xxx,baz,bad)", ""),
    ("$(list-slice 0:1 foo,bar,xxx,baz,bad)", "foo"),
    ("$(list-slice 0:2 foo,bar,xxx,baz,bad)", "foo,bar"),
    ("$(list-slice 1:2 foo,bar,xxx,baz,bad)", "bar"),
    ("$(list-slice : foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz,bad"),
    ("$(list-slice 3: foo,bar,xxx,baz,bad)", "baz,bad"),
    ("$(list-slice :2 foo,bar,xxx,baz,bad)", "foo,bar"),
    ("$(list-slice -1: foo,bar,xxx,baz,bad)", "bad"),
    ("$(list-slice -3: foo,bar,xxx,baz,bad)", "xxx,baz,bad"),
    ("$(list-slice -100: foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz,bad"),
    ("$(list-slice :-1 foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz"),
    ("$(list-slice :-4 foo,bar,xxx,baz,bad)", "foo"),
    ("$(list-slice :-5 foo,bar,xxx,baz,bad)", ""),
    ("$(list-count foo,bar,xxx, baz bad)", "5"),
    ("$(explode ' ' foo bar xxx baz bad)", "foo,bar,xxx,baz,bad"),
    ("$(explode ';' foo;bar;xxx;baz;bad)", "foo,bar,xxx,baz,bad"),
    ("$(implode ' ' foo,bar,xxx,baz,bad)", "foo bar xxx baz bad"),
    ("$(implode ' ' $(list-slice :3 foo,bar,xxx,baz,bad))", "foo bar xxx"),
    ("$(ipv4-to-int 10.11.12.13)", "168496141"),
]


@pytest.mark.parametrize("tpl,want", CASES, ids=range(len(CASES)))
def test_basicfuncs_reference_conformance(tpl, want):
    assert Template(tpl).eval(_msg()).tolist()[0] == want


class TestAdviceR3Fixes:
    """Round-3 regressions pinned from ADVICE.md: sanitize flag
    polarity, C-truncated integer arithmetic, str_repr_encode-style
    list-element quoting."""

    def _ev(self, tpl):
        return Template(tpl).eval(_msg()).tolist()[0]

    def test_sanitize_keep_ctrl_is_capital_c(self):
        # str-funcs.c:205-230: -C/--no-ctrl-chars KEEPS control chars,
        # -c/--ctrl-chars restates the replace-them default
        assert self._ev("$(sanitize alma\x1b_bela)") == "alma__bela"
        assert self._ev("$(sanitize -C alma\x1b_bela)") == "alma\x1b_bela"
        assert self._ev("$(sanitize --no-ctrl-chars alma\x1b_bela)") == "alma\x1b_bela"
        assert self._ev("$(sanitize -c alma\x1b_bela)") == "alma__bela"
        assert self._ev("$(sanitize --ctrl-chars alma\x1b_bela)") == "alma__bela"

    def test_int_modulo_truncates_toward_zero(self):
        # C int64 %: $(% -7 3) is -1 (dividend's sign), not Python's 2
        assert self._ev("$(% -7 3)") == "-1"
        assert self._ev("$(% 7 -3)") == "1"
        assert self._ev("$(% 7 3)") == "1"
        assert self._ev("$(% -7 -3)") == "-1"

    def test_int_division_truncates_and_stays_exact(self):
        assert self._ev("$(/ -7 2)") == "-3"  # trunc, not floor (-4)
        assert self._ev("$(/ 7 2)") == "3"
        # above 2^53: float round-trip would lose the low bits
        assert self._ev("$(/ 36028797018963969 3)") == "12009599006321323"
        assert self._ev("$(% 36028797018963969 36028797018963968)") == "1"

    def test_list_element_quoting_round_trip(self):
        from axosyslog_ray.functions.strings import _parse_list_one, _ser_list
        for elems in (["'hi'"], ['say"hi'], ["a b"], ["it's"], [""],
                      ["a,b"], ["back\\slash"], ["tab\there"],
                      ["""both'"quotes"""], ["plain"]):
            assert _parse_list_one(_ser_list(elems)) == elems, elems

    def test_list_quoting_matches_str_repr_encode_shapes(self):
        from axosyslog_ray.functions.strings import _ser_elem
        # encode.c: bare only without specials; quote-no-apostrophe wraps
        # in single quotes; apostrophe wraps in double quotes
        assert _ser_elem("plain") == "plain"
        assert _ser_elem("") == '""'
        assert _ser_elem("a b") == '"a b"'
        assert _ser_elem("it's") == '"it\'s"'
        assert _ser_elem('say"hi') == "'say\"hi'"
