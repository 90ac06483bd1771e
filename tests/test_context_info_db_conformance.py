"""add-contextual-data database conformance.

Pins modules/add-contextual-data/tests/test_context_info_db.c through
parse_context_csv / AddContextualData: valid CSV import (including the
template value case), CRLF endings, RFC4180 doubled-quote escapes,
invalid-content rejection, name prefixes, and ignore-case selector
matching.
"""

import pyarrow as pa
import pytest

from axosyslog_ray.enrich.context import AddContextualData, parse_context_csv


def enrich(csv_text, rows, **kw):
    stage = AddContextualData(db=parse_context_csv(csv_text),
                              default_selector=None, selector="$HOST", **kw)
    return stage(pa.table({"host": rows,
                           "host_from": ["kismacska"] * len(rows)}))


def test_import_with_valid_csv():
    csv_text = ("selector1,name1,value1\n"
                "selector1,name1.1,value1.1\n"
                "selector2,name2,value2\n"
                "selector3,name3,value3\n"
                "selector3,name3.1,$(echo $HOST_FROM)")
    out = enrich(csv_text, ["selector1", "selector2", "selector3"])
    got = out.to_pylist()
    # selector1 rows get name1/name1.1; unmatched fields stay null
    assert got[0]["name1"] == "value1"
    assert got[0]["name1.1"] == "value1.1"
    assert got[0]["name2"] is None
    assert got[1]["name2"] == "value2"
    # db values are templates, evaluated against the matching row
    assert got[2]["name3"] == "value3"
    assert got[2]["name3.1"] == "kismacska"


def test_db_structure_matches_import():
    db = parse_context_csv("selector1,name1,value1\n"
                           "selector1,name1.1,value1.1\n"
                           "selector2,name2,value2\n")
    assert sorted(db) == ["selector1", "selector2"]  # ordered selectors
    assert len(db["selector1"]) == 2                 # records per selector
    assert "selector3" not in db                     # contains()


def test_import_from_csv_with_crlf_line_ending():
    out = enrich("selector1,name1,value1\r\nselector1,name1.1,value1.1",
                 ["selector1"])
    got = out.to_pylist()[0]
    assert got["name1"] == "value1" and got["name1.1"] == "value1.1"


def test_import_from_csv_with_escaped_double_quote():
    out = enrich('selector1,name1,"c""cc"', ["selector1"])
    assert out.to_pylist()[0]["name1"] == 'c"cc'


def test_import_with_invalid_csv_content():
    with pytest.raises(ValueError, match="malformed"):
        parse_context_csv("xxx")


@pytest.mark.parametrize("prefix,expected_name", [
    ("", "name1"),
    ("aaa", "aaaname1"),
    ("aaa.", "aaa.name1"),
    (".aaa.", ".aaa.name1"),
    (".", ".name1"),
    ("....", "....name1"),
])
def test_import_with_prefix(prefix, expected_name):
    out = enrich("selector1,name1,value1", ["selector1"], prefix=prefix)
    assert out.to_pylist()[0][expected_name] == "value1"


def test_ignore_case_on():
    for probe in ("Localhost", "localhost", "localhosT", "LOCALHOST",
                  "LoCaLhOsT"):
        out = enrich("LoCaLhOsT,tag1,value1", [probe], ignore_case=True)
        assert out.to_pylist()[0]["tag1"] == "value1", probe


def test_ignore_case_off():
    out = enrich("LoCaLhOsT,tag1,value1", ["LoCaLhOsT", "localhost"])
    got = out.to_pylist()
    assert got[0]["tag1"] == "value1"
    assert got[1]["tag1"] is None
