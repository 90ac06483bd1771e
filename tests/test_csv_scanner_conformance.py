"""CSV scanner conformance.

Pins lib/scanner/csv-scanner/tests/test_csv_scanner.c through
stages/csv_parser.CsvParser's scalar scanner (parse_tokens): the
dialect set including escape-backslash-with-sequences (\\a\\t\\v\\r\\n,
\\xHH, invalid-hex fallback) and escape-unquoted-delimiter (both the
default-comma and custom-delimiter code paths), strip-whitespace
interactions, greedy tails and null-value replacement. The engine maps
the scanner's null-value hit to None (unset) — normalized to "" here
to compare with the C expectations.
"""

import pytest

from axosyslog_ray.stages.csv_parser import CsvParser


def scan(text, ncols, *, delimiters=",", dialect="escape-none",
         strip=False, greedy=False, null=None, quotes=None):
    cols = [f"c{i}" for i in range(ncols)]
    kw = {}
    if quotes is not None:
        kw["quote_pairs"] = quotes
    p = CsvParser(columns=cols, delimiters=delimiters, dialect=dialect,
                  strip_whitespace=strip, greedy=greedy, null_value=null,
                  **kw)
    toks = p.parse_tokens(text)
    if toks is None:
        return None
    return ["" if t is None else t for t in toks]


def test_simple_comma_separated_values():
    assert scan("val1,val2,val3", 3) == ["val1", "val2", "val3"]


def test_null_value():
    assert scan("val1,null,val3", 3, null="null") == ["val1", "", "val3"]


def test_empty_input_with_expected_columns_fails():
    assert scan("", 3) is None


def test_empty_input_with_no_columns_completes():
    assert scan("", 0) == []


def test_partial_input_fails():
    assert scan("val1,val2", 3) is None


def test_strip_whitespace_does_not_strip_delimiters():
    assert scan("foo\t\tbaz", 3, delimiters="\t", strip=True) == \
        ["foo", "", "baz"]


def test_strip_whitespace_strips_spaces_not_delimiters():
    assert scan("  foo  \t  \t  baz  ", 3, delimiters="\t", strip=True) == \
        ["foo", "", "baz"]


def test_greedy_column():
    assert scan("foo,bar,baz", 2, greedy=True) == ["foo", "bar,baz"]


def test_greedy_column_strip_whitespace():
    assert scan("foo,  bar,baz  ", 2, greedy=True, strip=True) == \
        ["foo", "bar,baz"]


def test_greedy_column_null_value():
    # null match happens after stripping, on the joined greedy tail
    assert scan("foo,  bar,baz  ", 2, greedy=True, strip=True,
                null="bar,baz") == ["foo", ""]


def test_escape_double_char():
    assert scan('foo,"val""ue"', 2, dialect="escape-double-char") == \
        ["foo", 'val"ue']


def test_escape_backslash():
    assert scan('foo,"val\\"ue"', 2, dialect="escape-backslash") == \
        ["foo", 'val"ue']


def test_escape_backslash_sequences():
    got = scan('foo,"\\"\\a\\t\\v\\r\\n\\""', 2, strip=True,
               dialect="escape-backslash-with-sequences")
    assert got == ["foo", '"\a\t\v\r\n"']


def test_escape_backslash_x_sequences():
    got = scan('foo,"\\x41\\x00\\x40"', 2, strip=True,
               dialect="escape-backslash-with-sequences")
    assert got == ["foo", "A\x00@"]


def test_escape_backslash_invalid_x_sequence():
    got = scan('foo,"\\x4Q"', 2, strip=True,
               dialect="escape-backslash-with-sequences")
    assert got == ["foo", "x4Q"]


def test_escaped_unquoted_delimiter_custom():
    # custom '|' delimiter: backslash only escapes delimiter chars,
    # \z stays literal
    got = scan("first|foo\\|bar\\|ba\\z|last", 3, delimiters="|",
               strip=True, dialect="escape-unquoted-delimiter")
    assert got == ["first", "foo|bar|ba\\z", "last"]


def test_escaped_unquoted_default_comma_delimiter():
    got = scan("foo\\,bar,last", 2, strip=True,
               dialect="escape-unquoted-delimiter")
    assert got == ["foo,bar", "last"]


def test_escaped_unquoted_default_comma_multiple():
    got = scan("foo\\,bar\\,baz,last", 2, strip=True,
               dialect="escape-unquoted-delimiter")
    assert got == ["foo,bar,baz", "last"]


def test_escaped_unquoted_default_comma_backslash_in_value():
    # the default-comma path drops the backslash before ANY char
    got = scan("foo\\',bar,last", 3, strip=True,
               dialect="escape-unquoted-delimiter")
    assert got == ["foo'", "bar", "last"]


def test_escaped_unquoted_default_comma_backslash_outside():
    got = scan("foo,bar\\,last", 2, strip=True,
               dialect="escape-unquoted-delimiter")
    assert got == ["foo", "bar,last"]


def test_batch_path_matches_scalar_on_escape_dialects():
    import pyarrow as pa

    lines = ["first|foo\\|bar\\|ba\\z|last", "a|b|c", "x\\|y|z|w"]
    p = CsvParser(columns=["a", "b", "c"], delimiters="|",
                  dialect="escape-unquoted-delimiter",
                  source_col="m")
    out = p(pa.table({"m": lines}))
    want = [p.parse_tokens(ln) for ln in lines]
    got = [[out.column(c).to_pylist()[i] for c in ("a", "b", "c")]
           for i in range(len(lines))]
    assert got == want
