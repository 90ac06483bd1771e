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


def dump_tree(rules: list[PdbRule]) -> list[str]:
    """pdbtool dump: render the program-level radix of a ruleset
    (pdbtool.c pdbtool_walk_tree format: `[level]\\t<indent>` then
    `@TYPE:name@` for parser edges / `'key'` literals / rule ids).
    Deterministic: literal children sort by first char, parser children
    keep declaration order (the radix match order)."""
    from .stages.radix import RadixTree

    trees: dict = {}
    for idx, r in enumerate(rules):
        key = r.program if r.program_pattern is None else r.program_pattern
        trees.setdefault(key, RadixTree()).insert(r.pattern, idx)
    out: list[str] = []

    def walk(node, level: int, spec=None) -> None:
        line = f"[{level}]\t" + "  " * level
        if spec is not None:
            line += f"@{spec.ptype}:{spec.name}@ "
        line += f"'{node.key or ''}' "
        if node.rule is not None:
            line += f"rule_id='{rules[node.rule].rule_id}'"
        out.append(line.rstrip())
        for _, child in sorted(node.children.items()):
            walk(child, level + 1)
        for sp, child in node.pchildren:
            walk(child, level + 1, sp)

    for prog in sorted(trees, key=lambda p: (p is None, str(p))):
        out.append(f"program '{prog if prog is not None else ''}'")
        walk(trees[prog].root, 0)
    return out


def dictionary_names(rules: list[PdbRule], program: str | None = None,
                     dump_tags: bool = False) -> list[str]:
    """pdbtool dictionary: the value names a ruleset can set — wildcard
    capture names from every pattern plus each rule's static value
    names; with dump_tags the tag names instead
    (pdbtool.c pdbtool_dictionary_walk). Tree walk order approximated
    by rule declaration order; duplicates kept like the reference."""
    from .stages.radix import parse_segments

    out: list[str] = []
    for r in rules:
        if program is not None and r.program != program:
            continue
        if dump_tags:
            out.extend(r.tags)
            continue
        for kind, seg in parse_segments(r.pattern):
            if kind == "p" and seg.name:
                out.append(seg.name)
        out.extend(r.values.keys())
    return out


def merge_rulesets(paths: list[str], out_path: str) -> int:
    """pdbtool merge: combine .pdb/.json rulesets into ONE .pdb XML
    (pdbtool.c pdbtool_merge over a directory). Rules group into one
    <ruleset> per (source file, program); examples re-attach to their
    rules. Returns the number of rules written; the merged file loads
    back through load_ruleset with identical rule ids/patterns."""
    import os
    import xml.etree.ElementTree as ET

    root = ET.Element("patterndb", version="4", pub_date="1970-01-01")
    n = 0
    for path in paths:
        rules, examples = load_ruleset(path)
        by_rule: dict[str, list] = {}
        for ex in examples:
            if ex.expected_rule:
                by_rule.setdefault(ex.expected_rule, []).append(ex)
        groups: dict = {}
        for r in rules:
            groups.setdefault(r.program, []).append(r)
        base = os.path.splitext(os.path.basename(path))[0]
        for gi, (prog, rs) in enumerate(sorted(
                groups.items(), key=lambda kv: (kv[0] is None,
                                                str(kv[0])))):
            ruleset = ET.SubElement(root, "ruleset",
                                    name=f"{base}-{gi}",
                                    id=f"{base}-{gi}")
            if prog is not None:
                pats = ET.SubElement(ruleset, "patterns")
                ET.SubElement(pats, "pattern").text = prog
            rules_el = ET.SubElement(ruleset, "rules")
            for r in rs:
                rule_el = ET.SubElement(rules_el, "rule", id=r.rule_id)
                rule_el.set("class", r.rule_class)
                rule_el.set("provider", "pdbtool-merge")
                rp = ET.SubElement(rule_el, "patterns")
                ET.SubElement(rp, "pattern").text = r.pattern
                if r.tags:
                    te = ET.SubElement(rule_el, "tags")
                    for t in r.tags:
                        ET.SubElement(te, "tag").text = t
                if r.values:
                    ve = ET.SubElement(rule_el, "values")
                    for k, v in r.values.items():
                        ET.SubElement(ve, "value", name=k).text = v
                exs = by_rule.get(r.rule_id, [])
                if exs:
                    ee = ET.SubElement(rule_el, "examples")
                    for ex in exs:
                        x = ET.SubElement(ee, "example")
                        tm = ET.SubElement(x, "test_message")
                        if ex.program is not None:
                            tm.set("program", ex.program)
                        tm.text = ex.message
                        if ex.expected:
                            tv = ET.SubElement(x, "test_values")
                            for k, v in ex.expected.items():
                                ET.SubElement(tv, "test_value",
                                              name=k).text = v
                n += 1
    ET.indent(root)
    ET.ElementTree(root).write(out_path, encoding="unicode",
                               xml_declaration=True)
    return n


def main(argv: list[str]) -> int:
    if not argv or argv[0] not in ("test", "match", "patternize", "dump",
                                   "merge", "dictionary"):
        print(__doc__)
        return 2
    if argv[0] == "dump":
        rest = [a for a in argv[1:] if a != "--pdb"]
        if not rest:
            print("pdbtool dump: no ruleset file", file=sys.stderr)
            return 2
        path = rest[0]
        rules, _ = load_ruleset(path)
        for line in dump_tree(rules):
            print(line)
        return 0
    if argv[0] == "dictionary":
        args = argv[1:]
        program, tags, path = None, False, None
        while args:
            if args[0] in ("-P", "--program") and len(args) > 1:
                program, args = args[1], args[2:]
            elif args[0] in ("-T", "--dump-tags"):
                tags, args = True, args[1:]
            elif args[0] in ("-p", "--pdb") and len(args) > 1:
                path, args = args[1], args[2:]
            else:
                path, args = args[0], args[1:]
        if path is None:
            print("pdbtool dictionary: no ruleset file", file=sys.stderr)
            return 2
        rules, _ = load_ruleset(path)
        for name in dictionary_names(rules, program, tags):
            print(name)
        return 0
    if argv[0] == "merge":
        import glob as _glob
        import os

        args = argv[1:]
        out_path, directory, pat, paths = None, None, "*.pdb", []
        while args:
            if args[0] in ("-p", "--pdb") and len(args) > 1:
                out_path, args = args[1], args[2:]
            elif args[0] in ("-D", "--directory") and len(args) > 1:
                directory, args = args[1], args[2:]
            elif args[0] in ("-G", "--glob") and len(args) > 1:
                pat, args = args[1], args[2:]
            else:
                paths.append(args[0])
                args = args[1:]
        if directory:
            paths.extend(sorted(_glob.glob(os.path.join(directory, pat))))
        if not out_path or not paths:
            print("pdbtool merge: need --pdb OUT and input files",
                  file=sys.stderr)
            return 2
        n = merge_rulesets(paths, out_path)
        print(f"merged {n} rules from {len(paths)} files into {out_path}")
        return 0
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
