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


# ---- reference-format .pdb XML loading (modules/correlation/pdb-load.c) ----

PDB_XML = """
<patterndb version='6' pub_date='2026-08-17'>
 <ruleset name='auth' id='rs-1'>
  <patterns>
   <pattern>sshd</pattern>
  </patterns>
  <rules>
   <rule id='xml-sshd-accepted' provider='test' class='system'>
    <patterns>
     <pattern>Accepted @ESTRING:auth_method: @for @ESTRING:user: @from @IPv4:client_ip@ port @NUMBER:port@ ssh2</pattern>
    </patterns>
    <tags>
     <tag>auth</tag>
     <tag>ssh</tag>
    </tags>
    <values>
     <value name='secevt_verdict'>ACCEPT</value>
    </values>
    <examples>
     <example>
      <test_message program='sshd'>Accepted password for bob from 10.1.2.3 port 2222 ssh2</test_message>
      <test_values>
       <test_value name='auth_method'>password</test_value>
       <test_value name='user'>bob</test_value>
       <test_value name='client_ip'>10.1.2.3</test_value>
       <test_value name='port'>2222</test_value>
      </test_values>
     </example>
    </examples>
   </rule>
   <rule id='xml-qstring' provider='test' class='system'>
    <patterns>
     <pattern>session opened for @QSTRING:quoted_user:''@</pattern>
    </patterns>
    <examples>
     <example>
      <test_message program='sshd'>session opened for 'alice'</test_message>
      <test_values>
       <test_value name='quoted_user'>alice</test_value>
      </test_values>
     </example>
    </examples>
   </rule>
  </rules>
 </ruleset>
</patterndb>
"""


def test_load_pdb_xml_string_and_conformance():
    from axosyslog_ray.pdbtool import load_ruleset_xml, run_conformance

    rules, examples = load_ruleset_xml(PDB_XML)
    assert [r.rule_id for r in rules] == ["xml-sshd-accepted", "xml-qstring"]
    assert rules[0].program == "sshd" and rules[0].tags == ["auth", "ssh"]
    assert rules[0].values == {"secevt_verdict": "ACCEPT"}
    assert len(examples) == 2 and examples[0].expected["client_ip"] == "10.1.2.3"
    assert run_conformance(rules, examples) == []


def test_load_pdb_xml_file(tmp_path):
    from axosyslog_ray.pdbtool import load_ruleset, run_conformance

    p = tmp_path / "auth.pdb"
    p.write_text(PDB_XML)
    rules, examples = load_ruleset(str(p))
    assert len(rules) == 2
    assert run_conformance(rules, examples) == []


def test_load_pdb_xml_rejects_wrong_root():
    import pytest as _pytest

    from axosyslog_ray.pdbtool import load_ruleset_xml

    with _pytest.raises(ValueError, match="patterndb"):
        load_ruleset_xml("<notpdb/>")


def test_pdbtool_cli_missing_file_friendly():
    from axosyslog_ray.pdbtool import main

    assert main(["test", "/nonexistent/x.pdb"]) == 2


def test_radix_selection_longest_literal_prefix_wins():
    """Overlapping patterns: the radix trie picks the most specific
    literal prefix regardless of declaration order (radix.c); ordered
    mode keeps first-declared-wins (documented divergence default)."""
    import pyarrow as pa

    from axosyslog_ray.stages.patterndb import PatternDB, PdbRule

    rules = [
        PdbRule("generic", "Accepted @ANYSTRING:rest@", program="sshd"),
        PdbRule("specific", "Accepted password for @ESTRING:user: @", program="sshd"),
    ]
    t = pa.table({"message": ["Accepted password for bob "],
                  "program": pa.array(["sshd"], type=pa.string())})
    ordered = PatternDB(rules)(t).column("pdb_rule").to_pylist()
    radix = PatternDB(rules, selection="radix")(t).column("pdb_rule").to_pylist()
    assert ordered == ["generic"]       # first declared
    assert radix == ["specific"]        # longest literal prefix


def test_radix_trie_literal_beats_parser_mid_pattern():
    """radix.c _find_node_recursively: at every node a literal child is
    preferred over parser children — not just at the pattern start."""
    import pyarrow as pa

    from axosyslog_ray.stages.patterndb import PatternDB, PdbRule

    rules = [
        PdbRule("wild", "user @STRING:who@ logged in", program="app"),
        PdbRule("lit", "user admin logged in", program="app"),
    ]
    t = pa.table({
        "message": ["user admin logged in", "user bob logged in"],
        "program": pa.array(["app", "app"], type=pa.string()),
    })
    got = PatternDB(rules, selection="radix")(t).column("pdb_rule").to_pylist()
    assert got == ["lit", "wild"]


def test_radix_partial_prefix_fallback():
    """radix.c:1552 _find_node_with_state: when no rule matches the
    whole message, a rule whose complete pattern matches a PREFIX of
    the message wins (require_complete_match second pass)."""
    import pyarrow as pa

    from axosyslog_ray.stages.patterndb import PatternDB, PdbRule

    rules = [PdbRule("pfx", "session opened for @ESTRING:user: @", program="su")]
    t = pa.table({
        "message": ["session opened for root by (uid=0)",
                    "something else entirely"],
        "program": pa.array(["su", "su"], type=pa.string()),
    })
    out = PatternDB(rules, selection="radix")(t)
    assert out.column("pdb_rule").to_pylist() == ["pfx", None]
    # captures come from the trie walk for partial matches
    vals = out.column("pdb_values").to_pylist()
    assert dict(vals[0])["user"] == "root"
    # ordered mode (anchored regex) does NOT partial-match
    assert PatternDB(rules)(t).column("pdb_rule").to_pylist() == [None, None]


def test_radix_backtracking_across_parser_edges():
    """A greedy parser that dead-ends must backtrack to try the next
    parser edge (radix.c node-level backtracking)."""
    from axosyslog_ray.stages.radix import RadixTree

    tree = RadixTree()
    # NUMBER consumes greedily but 'x' after it only continues in rule B
    tree.insert("id @NUMBER:n@ end", "A")
    tree.insert("id @ESTRING:e:;@ end", "B")
    rule, caps = tree.lookup("id 123 end")
    assert rule == "A" and dict(caps)["n"] == "123"
    rule, caps = tree.lookup("id 123x7; end")
    assert rule == "B" and dict(caps)["e"] == "123x7"


def test_radix_qstring_estring_capture_conventions():
    """QSTRING strips quotes; ESTRING excludes the terminator
    (radix.c match->ofs/len conventions)."""
    from axosyslog_ray.stages.radix import RadixTree

    tree = RadixTree()
    tree.insert("said @QSTRING:q:\"@ to @ESTRING:who:!@", "R")
    rule, caps = tree.lookup('said "hi there" to bob!')
    assert rule == "R"
    d = dict(caps)
    assert d["q"] == "hi there" and d["who"] == "bob"


def test_radix_program_specificity():
    """A rule bound to the row's exact program shadows a match-any rule
    (the reference's program-level radix lookup)."""
    import pyarrow as pa

    from axosyslog_ray.stages.patterndb import PatternDB, PdbRule

    rules = [
        PdbRule("any", "start @ANYSTRING:r@", program=None),
        PdbRule("mine", "start @ANYSTRING:r@", program="svc"),
    ]
    t = pa.table({
        "message": ["start x", "start y"],
        "program": pa.array(["svc", "other"], type=pa.string()),
    })
    got = PatternDB(rules, selection="radix")(t).column("pdb_rule").to_pylist()
    assert got == ["mine", "any"]


class TestReferencePatternEdgeCases:
    """Pins from the reference's own corpus
    (modules/correlation/tests/test_patterndb.c:766-866 + .h fixtures)."""

    def _db(self, xml, selection="ordered"):
        from axosyslog_ray.pdbtool import load_ruleset_xml
        from axosyslog_ray.stages.patterndb import PatternDB

        rules, _ = load_ruleset_xml(xml)
        return PatternDB(rules, selection=selection)

    def _one(self, db, message, program):
        from axosyslog_ray.pdbtool import match_one

        return match_one(db, message, program)

    OPTSET_XML = """
<patterndb version='6' pub_date='2010-02-22'>
 <ruleset name='rails' id='8db0c6d8'>
  <patterns><pattern>prog1</pattern></patterns>
  <rules>
   <rule id='8e8384e8' provider='test' class='system'>
    <patterns><pattern>@QSTRING:id:[]@@OPTIONALSET:s: @</pattern></patterns>
   </rule>
  </rules>
 </ruleset>
</patterndb>"""

    def test_optionalset_at_end_of_pattern(self):
        # test_patterndb.c:817: OPTIONALSET as the LAST parser matches
        # zero chars at end-of-input; with a trailing space it consumes it
        uid = "dcef7d1c-6b79-48c6-a1ac-39cdc9bff966"
        for sel in ("ordered", "radix"):
            db = self._db(self.OPTSET_XML, selection=sel)
            r = self._one(db, f"[{uid}] ", "prog1")
            assert r["rule"] == "8e8384e8" and r["values"]["id"] == uid
            assert r["values"]["s"] == " ", sel
            r = self._one(db, f"[{uid}]", "prog1")
            assert r["rule"] == "8e8384e8" and r["values"]["s"] == "", sel

    def test_set_at_end_of_input_does_not_match_zero_chars(self):
        # test_patterndb.c:850: @SET@ needs >= 1 char
        xml = """
<patterndb version='6'><ruleset name='s' id='1'>
  <patterns><pattern>prog1</pattern></patterns>
  <rules><rule id='r1' provider='t' class='system'>
    <patterns><pattern>prefix@SET:s: @</pattern></patterns>
  </rule></rules>
</ruleset></patterndb>"""
        for sel in ("ordered", "radix"):
            db = self._db(xml, selection=sel)
            assert self._one(db, "prefix", "prog1")["rule"] is None, sel
            r = self._one(db, "prefix ", "prog1")
            assert r["rule"] == "r1" and r["values"]["s"] == " ", sel

    def test_match_in_program(self):
        # test_patterndb.c:766: the ruleset <pattern> matches the
        # PROGRAM through the pattern grammar; captures merge into values
        xml = """
<patterndb version='6'><ruleset name='p' id='2'>
  <patterns><pattern>sshd @NUMBER:num@</pattern></patterns>
  <rules><rule id='r2' provider='t' class='system'>
    <patterns><pattern>almafa</pattern></patterns>
  </rule></rules>
</ruleset></patterndb>"""
        for sel in ("ordered", "radix"):
            db = self._db(xml, selection=sel)
            r = self._one(db, "almafa", "sshd 5")
            assert r["rule"] == "r2" and r["values"]["num"] == "5", sel
            # non-matching program -> no classification
            assert self._one(db, "almafa", "crond 5")["rule"] is None, sel

    def test_program_template_style_extraction(self):
        # test_patterndb.c:780 test_program_template: program captures
        # AND message captures both land in values
        xml = """
<patterndb version='6'><ruleset name='p' id='3'>
  <patterns><pattern>sshd @NUMBER:num@</pattern></patterns>
  <rules><rule id='r3' provider='t' class='system'>
    <patterns><pattern>almafa @ESTRING:str:@</pattern></patterns>
  </rule></rules>
</ruleset></patterndb>"""
        db = self._db(xml)
        r = self._one(db, "almafa kortefa", "sshd 5")
        assert r["values"] == {"num": "5", "str": "kortefa"}


class TestDumpDictionaryMerge:
    """pdbtool dump / dictionary / merge modes (pdbtool.c:1282-1287)."""

    def _xml(self, tmp_path, name="a.pdb"):
        p = tmp_path / name
        p.write_text("""<?xml version='1.0'?>
<patterndb version='4' pub_date='2024-01-01'>
 <ruleset name='ssh' id='r1'>
  <patterns><pattern>sshd</pattern></patterns>
  <rules>
   <rule id='sshd-acc' class='system'>
    <patterns><pattern>Accepted @ESTRING:auth_method: @for @ESTRING:user: @</pattern></patterns>
    <tags><tag>auth</tag></tags>
    <values><value name='secure'>yes</value></values>
    <examples><example>
      <test_message program='sshd'>Accepted password for bob </test_message>
      <test_values><test_value name='user'>bob</test_value></test_values>
    </example></examples>
   </rule>
  </rules>
 </ruleset>
</patterndb>""")
        return str(p)

    def test_dump_shows_parsers_and_rule(self, tmp_path, capsys):
        from axosyslog_ray.pdbtool import main
        assert main(["dump", "--pdb", self._xml(tmp_path)]) == 0
        out = capsys.readouterr().out
        assert "program 'sshd'" in out
        assert "@ESTRING:auth_method@" in out
        assert "rule_id='sshd-acc'" in out

    def test_dictionary_names_and_tags(self, tmp_path, capsys):
        from axosyslog_ray.pdbtool import main
        assert main(["dictionary", self._xml(tmp_path)]) == 0
        out = capsys.readouterr().out.split()
        assert out == ["auth_method", "user", "secure"]
        assert main(["dictionary", "--dump-tags",
                     self._xml(tmp_path)]) == 0
        assert capsys.readouterr().out.split() == ["auth"]

    def test_merge_roundtrip_and_test_mode(self, tmp_path, capsys):
        from axosyslog_ray.pdbtool import load_ruleset, main
        a = self._xml(tmp_path, "a.pdb")
        b = tmp_path / "b.pdb"
        b.write_text("""<patterndb version='4'>
 <ruleset name='su' id='r2'>
  <patterns><pattern>su</pattern></patterns>
  <rules><rule id='su-f' class='violation'>
    <patterns><pattern>failed for @ESTRING:user:@</pattern></patterns>
  </rule></rules>
 </ruleset>
</patterndb>""")
        out = tmp_path / "merged.pdb"
        rc = main(["merge", "--pdb", str(out), a, str(b)])
        assert rc == 0
        rules, examples = load_ruleset(str(out))
        assert {r.rule_id for r in rules} == {"sshd-acc", "su-f"}
        assert {r.pattern for r in rules} == {
            "Accepted @ESTRING:auth_method: @for @ESTRING:user: @",
            "failed for @ESTRING:user:@"}
        assert len(examples) == 1 and examples[0].expected == {"user": "bob"}
        # the merged file passes its own embedded conformance corpus
        capsys.readouterr()
        assert main(["test", str(out)]) == 0
