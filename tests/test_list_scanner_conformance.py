"""List codec conformance pinned to the reference's own scanner tests
(lib/scanner/list-scanner/tests/test_list_scanner.c) — the parse side of
every $(list-*) template function (functions/strings.py _parse_list_one /
_parse_lists)."""
import pytest

from axosyslog_ray.functions.strings import _parse_list_one, _parse_lists, _ser_list

CASES_ONE = [
    # individual_items_are_scanned / comma_delimiter_values_are_split
    ("foo", ["foo"]),
    ("foo,bar", ["foo", "bar"]),
    ("foo,bar,baz", ["foo", "bar", "baz"]),
    # unquoted_empty_items_are_skipped...
    ("", []),
    (",,,,", []),
    ("foo,", ["foo"]),
    (",foo,", ["foo"]),
    (",baz", ["baz"]),
    # quoted_empty_items_are_parsed_as_empty_values
    ("''", [""]),
    ('""', [""]),
    ("foo,'',bar", ["foo", "", "bar"]),
    # handles_single_quotes
    ("'foo'", ["foo"]),
    ("'foo','bar'", ["foo", "bar"]),
    ("'foo,bar'", ["foo,bar"]),
    ("'foo''bar'", ["'foo''bar'"]),
    ("'foo'bar", ["'foo'bar"]),
    # handles_double_quotes
    ('"foo"', ["foo"]),
    ('"\\"foo"', ['"foo']),
    ('"foo","bar"', ["foo", "bar"]),
    ('"foo,bar"', ["foo,bar"]),
    ('"foo""bar"', ['"foo""bar"']),
    ('"foo"bar', ['"foo"bar']),
    # malformed_quotes
    ("'foo", ["'foo"]),
    ("bar,'foo", ["bar", "'foo"]),
    ("bar,'foo,", ["bar", "'foo,"]),
    ('"foo', ['"foo']),
    ('bar,"foo', ["bar", '"foo']),
    ('bar,"foo,', ["bar", '"foo,']),
    # escape decoding inside double quotes (str-repr decode.c:41-71)
    ('"a\\tb"', ["a\tb"]),
    ('"a\\nb"', ["a\nb"]),
    ('"a\\\\b"', ["a\\b"]),
    ('"a\\xb"', ["a\\xb"]),  # unknown escape keeps the backslash
]


@pytest.mark.parametrize("inp,want", CASES_ONE, ids=range(len(CASES_ONE)))
def test_parse_one(inp, want):
    assert _parse_list_one(inp) == want


def test_multi_arg_concatenation():
    # list_scanner_input_va semantics: each arg parsed, empties skipped
    assert _parse_lists(["", "foo", "bar"]) == ["foo", "bar"]
    assert _parse_lists(["", "", "", ",,,,", "", "", "", "foo", "bar"]) == ["foo", "bar"]
    assert _parse_lists(["foo", "", "bar"]) == ["foo", "bar"]
    assert _parse_lists(["''", ",foo,", "bar,", ",baz", "foobar", '""']) == \
        ["", "foo", "bar", "baz", "foobar", ""]


def test_roundtrip_serialize_parse():
    for items in (["a", "b,c", "", 'x"y', "t\tb", "\\z"], [], [""], ["plain"]):
        assert _parse_list_one(_ser_list(items)) == items
