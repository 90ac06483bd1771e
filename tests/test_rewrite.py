"""Rewrite stage tests (reference lib/rewrite/ semantics)."""

import pandas as pd
import pyarrow as pa

from axosyslog_ray.route import host
from axosyslog_ray.stages import rewrite as rw
from axosyslog_ray.stages.syslog import parse_syslog_table


def _t():
    t = pa.table(
        {
            "url": ["u0", "u1"],
            "warc_ts": pa.array(pd.Series([pd.Timestamp("2026-08-17")] * 2, dtype="datetime64[us]")),
            "text": [
                "<38>Aug 17 05:02:28 h1 sshd[1]: login failed for bob",
                "<13>Aug 17 05:02:29 h2 app: all good",
            ],
        }
    )
    return parse_syslog_table(t)


def test_set_template_value():
    t = rw.set_value(_t(), "note", "$PROGRAM@$HOST")
    assert t.column("note").to_pylist() == ["sshd@h1", "app@h2"]


def test_set_conditional_keeps_old():
    t = rw.set_value(_t(), "message", "REDACTED", condition=host("h1"))
    assert t.column("message").to_pylist() == ["REDACTED", "all good"]


def test_unset_and_groupunset():
    t = rw.unset(_t(), "msgid", "nope")
    assert "msgid" not in t.column_names
    t2 = rw.groupunset(_t(), "p*")
    assert "pid" not in t2.column_names and "program" not in t2.column_names and "pri" not in t2.column_names


def test_rename():
    t = rw.rename(_t(), "program", "app_name")
    assert "app_name" in t.column_names and "program" not in t.column_names


def test_subst_global_and_backref():
    t = rw.subst(_t(), r"(\w+) failed", r"$1 FAILED", "message")
    assert t.column("message").to_pylist()[0] == "login FAILED for bob"
    t2 = pa.table({"message": ["a-a-a"]})
    assert rw.subst(t2, "-", "_", "message").column("message").to_pylist() == ["a_a_a"]
    assert rw.subst(t2, "-", "_", "message", global_=False).column("message").to_pylist() == ["a_a-a"]


def test_tags_set_clear():
    t = rw.set_tag(_t(), "auth", condition=host("h1"))
    t = rw.set_tag(t, "all")
    assert t.column("tags").to_pylist() == [["all", "auth"], ["all"]]
    t = rw.clear_tag(t, "auth")
    assert t.column("tags").to_pylist() == [["all"], ["all"]]


def test_set_severity_and_facility():
    t = rw.set_severity(_t(), "crit")
    assert t.column("pri").to_pylist() == [34, 10]  # facility kept, severity -> 2
    t2 = rw.set_facility(_t(), "local0")
    assert t2.column("pri").to_pylist() == [134, 133]  # 16*8 + old severity


def test_set_pri_template():
    t = rw.set_pri(_t(), "100")
    assert t.column("pri").to_pylist() == [100, 100]


def test_set_matches():
    t = rw.set_matches(_t(), "a,b,c")
    assert t.column("matches").to_pylist() == [["a", "b", "c"], ["a", "b", "c"]]
