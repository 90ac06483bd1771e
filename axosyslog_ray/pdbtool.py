"""pdbtool analogue: PatternDB rule conformance runner + one-shot matcher.

Mirrors the reference's offline PatternDB tooling (reference
modules/correlation/pdbtool/pdbtool.c): `match` parses one message
against the ruleset and prints extracted values; `test` runs every
rule's embedded example corpus asserting the extracted values — the
conformance pattern of pdb-example.c / `pdbtool test`.

Rulesets load from JSON (the engine's stand-in for .pdb XML,
FIXTURES.md §3):

    {"rules": [{"rule_id": ..., "pattern": ..., "program": ...,
                "class": ..., "tags": [...], "values": {...},
                "examples": [{"message": ..., "program": ...,
                               "expected": {name: value, ...}}]}]}

CLI:  python -m axosyslog_ray.pdbtool test [ruleset.json]
      python -m axosyslog_ray.pdbtool match -p PROGRAM MESSAGE
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass, field

import pyarrow as pa

from .stages.patterndb import DEFAULT_RULES, PatternDB, PdbRule


@dataclass
class PdbExample:
    message: str
    program: str | None = None
    expected_rule: str | None = None
    expected: dict[str, str] = field(default_factory=dict)


# examples for the bundled ruleset (the pdb-example.c conformance pattern)
DEFAULT_EXAMPLES = [
    PdbExample(
        "'su root' failed for alice on /dev/pts/8", program="su",
        expected_rule="su-failed", expected={"user": "alice", "tty": "/dev/pts/8"},
    ),
    PdbExample(
        "Accepted password for bob from 10.1.2.3 port 2222 ssh2", program="sshd",
        expected_rule="sshd-accepted",
        expected={"auth_method": "password", "user": "bob", "client_ip": "10.1.2.3", "port": "2222"},
    ),
    PdbExample("eth0: link up", program="kernel",
               expected_rule="kernel-link-up", expected={"interface": "eth0"}),
    PdbExample("something unmatched", program="su", expected_rule=None),
]


def load_ruleset_xml(source: str) -> tuple[list[PdbRule], list[PdbExample]]:
    """Load a reference-format .pdb XML ruleset (the real thing, not the
    JSON stand-in): <patterndb><ruleset><patterns><pattern>PROG</pattern>
    ... <rules><rule id= class=><patterns><pattern>MSG_PATTERN</pattern>
    <tags><tag>, <values><value name=>, <examples><example>
    <test_message program=>, <test_values><test_value name=>.

    Schema per reference modules/correlation/pdb-load.c (element grammar)
    and the embedded corpora in modules/correlation/tests/test_patterndb.h.
    `source` is a filesystem path or a literal XML string.

    Divergences (documented): a rule is expanded to one PdbRule per
    (program pattern x message pattern). Program patterns containing
    @PARSER@ syntax match through the pattern grammar with their
    captures merged into the rule values (reference test_patterndb.c
    match_in_program / test_program_template)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(source) if source.lstrip().startswith("<") else ET.parse(source).getroot()
    if root.tag != "patterndb":
        raise ValueError(f"expected <patterndb> root, got <{root.tag}>")
    rules: list[PdbRule] = []
    examples: list[PdbExample] = []
    for ruleset in root.findall("ruleset"):
        programs = [p.text or "" for p in ruleset.findall("./patterns/pattern")]
        programs += [p.text or "" for p in ruleset.findall("./pattern")]  # bare form
        programs = programs or [None]
        for rule in ruleset.findall("./rules/rule"):
            rule_id = rule.get("id") or rule.get("name") or f"rule{len(rules)}"
            rule_class = rule.get("class", "system")
            tags = [t.text or "" for t in rule.findall("./tags/tag")]
            values = {v.get("name"): (v.text or "") for v in rule.findall("./values/value")}
            patterns = [p.text or "" for p in rule.findall("./patterns/pattern")]
            patterns += [p.text or "" for p in rule.findall("./pattern")]
            for prog in dict.fromkeys(programs):
                is_pat = prog is not None and "@" in prog
                for pat in patterns:
                    rules.append(PdbRule(
                        rule_id=rule_id, pattern=pat,
                        program=None if is_pat else prog,
                        program_pattern=prog if is_pat else None,
                        rule_class=rule_class, tags=tags, values=values))
            for ex in rule.findall("./examples/example"):
                tm = ex.find("test_message")
                if tm is None:
                    continue
                expected = {
                    tv.get("name"): (tv.text or "")
                    for tv in ex.findall("./test_values/test_value")
                }
                examples.append(PdbExample(
                    message=tm.text or "", program=tm.get("program") or (programs[0] if programs else None),
                    expected_rule=rule_id, expected=expected,
                ))
    return rules, examples


def load_ruleset(path: str) -> tuple[list[PdbRule], list[PdbExample]]:
    if path.endswith((".pdb", ".xml")) or path.lstrip().startswith("<"):
        return load_ruleset_xml(path)
    with open(path) as f:
        doc = json.load(f)
    rules, examples = [], []
    for r in doc.get("rules", []):
        rules.append(
            PdbRule(
                rule_id=r["rule_id"], pattern=r["pattern"], program=r.get("program"),
                rule_class=r.get("class", "system"), tags=r.get("tags", []),
                values=r.get("values", {}),
            )
        )
        for ex in r.get("examples", []):
            examples.append(
                PdbExample(
                    message=ex["message"], program=ex.get("program", r.get("program")),
                    expected_rule=r["rule_id"], expected=ex.get("expected", {}),
                )
            )
    return rules, examples


def match_one(pdb: PatternDB, message: str, program: str | None = None) -> dict:
    t = pa.table({"message": [message], "program": pa.array([program], type=pa.string())})
    row = pdb(t).to_pylist()[0]
    return {
        "rule": row["pdb_rule"],
        "class": row["pdb_class"],
        "values": dict(row["pdb_values"]) if row["pdb_values"] else {},
        "tags": list(row["tags"]) if row["tags"] else [],
    }


def run_conformance(rules: list[PdbRule] | None = None, examples: list[PdbExample] | None = None) -> list[str]:
    """Run every example, return a list of failure descriptions (empty = pass)."""
    pdb = PatternDB(rules)
    failures = []
    for ex in examples if examples is not None else DEFAULT_EXAMPLES:
        got = match_one(pdb, ex.message, ex.program)
        if got["rule"] != ex.expected_rule:
            failures.append(f"{ex.message!r}: rule {got['rule']!r} != expected {ex.expected_rule!r}")
            continue
        for name, want in ex.expected.items():
            have = got["values"].get(name)
            if have != want:
                failures.append(f"{ex.message!r}: value {name}={have!r} != expected {want!r}")
    return failures


def main(argv: list[str]) -> int:
    if not argv or argv[0] not in ("test", "match", "patternize"):
        print(__doc__)
        return 2
    if argv[0] == "patternize":
        # pdbtool patternize --support N FILE... : frequent-word
        # skeleton mining (pdbtool.c patternize mode; stages/patternize)
        import ray
        import ray.data as rd

        from .stages.patternize import patternize

        support, files = 10, []
        args = argv[1:]
        while args:
            if args[0] in ("-S", "--support") and len(args) > 1:
                support = int(args[1])
                args = args[2:]
            else:
                files.append(args[0])
                args = args[1:]
        if not files:
            print("pdbtool patternize: no input files", file=sys.stderr)
            return 2
        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        lines: list[str] = []
        for f in files:
            with open(f) as fh:
                lines.extend(ln.rstrip("\n") for ln in fh)
        ds = rd.from_items([{"message": ln} for ln in lines])
        out = patternize(ds, support=support).to_pandas() \
            .sort_values(["support", "pattern"], ascending=[False, True])
        for _, r in out.iterrows():
            print(f"{int(r['support'])}\t{r['pattern']}")
        return 0
    if argv[0] == "test":
        if len(argv) > 1:
            try:
                rules, examples = load_ruleset(argv[1])
            except FileNotFoundError:
                print(f"pdbtool: ruleset file not found: {argv[1]}", file=sys.stderr)
                return 2
            except (ValueError, json.JSONDecodeError) as e:
                print(f"pdbtool: cannot parse ruleset {argv[1]}: {e}", file=sys.stderr)
                return 2
            except Exception as e:  # ET.ParseError subclasses SyntaxError
                import xml.etree.ElementTree as ET

                if isinstance(e, ET.ParseError):
                    print(f"pdbtool: cannot parse ruleset {argv[1]}: {e}", file=sys.stderr)
                    return 2
                raise
        else:
            rules, examples = None, None
        failures = run_conformance(rules, examples)
        for f in failures:
            print("FAIL", f)
        n = len(examples if examples is not None else DEFAULT_EXAMPLES)
        print(f"{n - len(failures)}/{n} examples passed")
        return 1 if failures else 0
    # match
    program = None
    args = argv[1:]
    if args and args[0] == "-p":
        program = args[1]
        args = args[2:]
    result = match_one(PatternDB(), " ".join(args), program)
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
