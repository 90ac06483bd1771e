"""regexp_subst conformance pinned to the reference's own test file
(lib/filterx/tests/test_expr_regexp_subst.c) — including the
zero-length-match quirks its tests pin deliberately."""
import re

import pytest

from axosyslog_ray.filterx import _subst_one


def sub(pattern, repl, s, glob=False, groups=True, ignorecase=False):
    flags = re.IGNORECASE if ignorecase else 0
    return _subst_one(re.compile(pattern, flags), repl, s, glob, groups)


CASES = [
    # (pattern, repl, subject, global, expected)
    ("oo", "X", "foobarbaz", False, "fXbarbaz"),
    ("oo", "X", "foobarbaz", True, "fXbarbaz"),
    ("a", "X", "foobarbaz", False, "foobXrbaz"),
    ("a", "X", "foobarbaz", True, "foobXrbXz"),
    ("u*", "X", "foobarbaz", False, "XfoobarbazX"),
    ("u*", "X", "foobarbaz", True, "XfXoXoXbXaXrXbXaXzX"),
    ("a*", "X", "foobarbaz", False, "XfoobarbazX"),
    ("a*", "X", "foobarbaz", True, "XfXoXoXbXXrXbXXzX"),
    ("fo", "X", "foobarbaz", False, "Xobarbaz"),
    ("fo", "X", "foobarbaz", True, "Xobarbaz"),
    ("az", "X", "foobarbaz", False, "foobarbX"),
    ("az", "X", "foobarbaz", True, "foobarbX"),
    ("(a|o)", "X", "foobarbaz", False, "fXobarbaz"),
    ("(a|o)", "X", "foobarbaz", True, "fXXbXrbXz"),
    ("ba.$", "X", "foobarbaz", False, "foobarX"),
    ("ba.$", "X", "foobarbaz", True, "foobarX"),
]


@pytest.mark.parametrize("pat,rep,s,g,want", CASES, ids=range(len(CASES)))
def test_subst_reference_cases(pat, rep, s, g, want):
    assert sub(pat, rep, s, glob=g) == want


def test_group_subst():
    # regexp_subst_group_subst: date reorder
    assert sub(r"(\d{2})-(\d{2})-(\d{4})", r"\3-\2-\1", "25-02-2022") == "2022-02-25"


def test_group_subst_without_ref():
    assert sub(r"(\d{2})-(\d{2})-(\d{4})", "group without ref", "25-02-2022") == \
        "group without ref"


def test_group_reference_with_multiple_digits():
    pat = r"(\d{2})" * 12
    rep = r"\12-\11-\10-\9\8\7\6\5\4\3\2\1"
    assert sub(pat, rep, "010203040506070809101112") == "12-11-10-090807060504030201"


def test_group_do_not_replace_unknown_ref():
    assert sub(r"(\d{2})(\d{2})(\d{2})", r"\3\20\1", "010203") == "03\\2001"


def test_group_limited_digits_and_zero_prefixes():
    assert sub(r"(\w+),(\w+),(\w+)", r"\3\02" + "\\001" + "3.14", "baz,bar,foo") == \
        "foobarbaz3.14"


def test_ignorecase():
    assert sub("BAR", "X", "foobarbaz", ignorecase=True) == "fooXbaz"
    assert sub("BAR", "X", "foobarbaz") == "foobarbaz"


def test_empty_subject_empty_match_pattern():
    assert sub(r"\s*", "", "") == ""


def test_groups_disabled_keeps_refs_literal():
    assert sub(r"(o+)", r"\1!", "foobar", groups=False) == "f\\1!bar"
