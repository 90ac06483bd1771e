"""pdbtool conformance runner tests (reference pdbtool.c / pdb-example.c)."""

import json

from axosyslog_ray.pdbtool import (
    DEFAULT_EXAMPLES, PdbExample, load_ruleset, main, match_one, run_conformance,
)
from axosyslog_ray.stages.patterndb import PatternDB, PdbRule


def test_bundled_conformance_passes():
    assert run_conformance() == []


def test_conformance_reports_wrong_value():
    bad = [PdbExample("eth0: link up", program="kernel",
                      expected_rule="kernel-link-up", expected={"interface": "WRONG"})]
    fails = run_conformance(examples=bad)
    assert len(fails) == 1 and "interface" in fails[0]


def test_conformance_reports_wrong_rule():
    bad = [PdbExample("no match here", program="su", expected_rule="su-failed")]
    fails = run_conformance(examples=bad)
    assert len(fails) == 1 and "rule" in fails[0]


def test_load_ruleset_json(tmp_path):
    doc = {
        "rules": [
            {
                "rule_id": "r1", "pattern": "error code @NUMBER:code@", "program": "app",
                "tags": ["err"],
                "examples": [{"message": "error code 42", "expected": {"code": "42"}}],
            }
        ]
    }
    p = tmp_path / "rules.json"
    p.write_text(json.dumps(doc))
    rules, examples = load_ruleset(str(p))
    assert run_conformance(rules, examples) == []
    got = match_one(PatternDB(rules), "error code 7", "app")
    assert got["values"] == {"code": "7"} and got["tags"] == ["err"]


def test_cli_test_exit_codes(capsys):
    assert main(["test"]) == 0
    out = capsys.readouterr().out
    assert "4/4 examples passed" in out
