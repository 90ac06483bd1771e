"""PatternDB: typed-wildcard pattern matching with rule metadata.

Mirrors the reference's db-parser()/PatternDB match+extract semantics
(reference modules/correlation/patterndb.c:591-623 process, :513-570
matching-rule path; parser types modules/correlation/radix.h:33-52;
ruleset load modules/correlation/pdb-load.c) — NOT its radix-trie
implementation. Rules are declared with the reference's wildcard syntax
(@ESTRING:name:term@, @NUMBER:name@, @IPv4:name@, @QSTRING:name:q@,
@STRING:name@, @FLOAT:name@, @ANYSTRING:name@, @SET:name:chars@,
@EMAIL:name@, @HOSTNAME:name@, @MACADDR:name@), compiled once per actor
into anchored regexes with named groups.

Rule selection: `selection="ordered"` (default) is first-match-wins in
declaration order; `selection="radix"` reproduces the reference's radix
lookup (stages/radix.py models radix.c's literal-over-parser preference
with backtracking AND the partial-prefix fallback) — the vectorized
regex pass stays the bulk matcher, the trie resolves only ambiguous or
prefix-only rows.

A matched rule writes: `pdb_rule` (rule id), `pdb_class` (rule class,
default 'system'), extracted values into promoted string columns
`pdb_values` map, and appends the rule's tags. Unmatched rows keep
nulls (`pdb_rule is null` ≙ the reference's 'unknown' classification).

Scale shape: stateful actor-pool stage — compile rules once per actor
(__init__), per batch each rule's regex runs vectorized on the subset of
rows whose `program` matches the rule's program glob.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WILDCARD = re.compile(r"@([A-Za-z0-9]+)(?::([^:@]*)(?::([^@]*))?)?@")

_TYPE_PATTERNS = {
    "STRING": r"\S+",
    "NUMBER": r"\d+",
    "FLOAT": r"\d+(?:\.\d+)?",
    "IPv4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPv6": r"[0-9A-Fa-f:]+",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}|[0-9A-Fa-f:]+",
    "ANYSTRING": r".*",
    "EMAIL": r"[^\s@]+@[^\s@]+",
    "HOSTNAME": r"[A-Za-z0-9._-]+",
    "MACADDR": r"(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}",
    "NLSTRING": r"[^\n]*",
}


def _enc_name(name: str) -> str:
    """Regex group names must be identifiers; PatternDB value names may
    be dotted (.win.TargetUserName, .dict.string — pdb v4/v5 rulesets).
    Non-identifier names encode reversibly as px_<hex>."""
    return name if name.isidentifier() else "px_" + name.encode().hex()


def _dec_name(name: str) -> str:
    if name.startswith("px_"):
        try:
            return bytes.fromhex(name[3:]).decode()
        except ValueError:
            return name
    return name


def compile_pattern(pattern: str) -> re.Pattern:
    """Compile a PatternDB pattern string into an anchored regex."""
    out, pos = [], 0
    for m in _WILDCARD.finditer(pattern):
        out.append(re.escape(pattern[pos : m.start()]))
        ptype, name, param = m.group(1), m.group(2) or "", m.group(3)
        grp = f"(?P<{_enc_name(name)}>" if name else "(?:"
        if ptype == "ESTRING":
            # match up to the terminator string; empty terminator -> to end
            if param:
                out.append(grp + r".*?" + ")" + re.escape(param))
            else:
                out.append(grp + r".*" + ")")
        elif ptype == "QSTRING":
            q = param or "'"
            qo, qc = (q[0], q[1]) if len(q) >= 2 else (q[0], q[0])
            out.append(re.escape(qo) + grp + f"[^{re.escape(qc)}]*" + ")" + re.escape(qc))
        elif ptype == "SET":
            chars = re.escape(param or " ")
            out.append(grp + f"[{chars}]+" + ")")
        elif ptype in ("OPTIONALSET",):
            chars = re.escape(param or " ")
            out.append(grp + f"[{chars}]*" + ")")
        elif ptype == "PCRE":
            out.append(grp + (param or r".*") + ")")
        elif ptype in _TYPE_PATTERNS:
            out.append(grp + _TYPE_PATTERNS[ptype] + ")")
        else:
            raise ValueError(f"unknown pattern parser @{ptype}@")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    return re.compile("^" + "".join(out) + "$", re.S)


@dataclass
class PdbRule:
    rule_id: str
    pattern: str
    program: str | None = None  # exact program this rule applies to (None = any)
    rule_class: str = "system"
    tags: list[str] = field(default_factory=list)
    values: dict[str, str] = field(default_factory=dict)  # static extra values
    # ruleset <pattern> with @PARSER@ syntax: the PROGRAM is matched
    # through the radix grammar and its captures merge into the values
    # (reference test_patterndb.c match_in_program) — exclusive with
    # `program`
    program_pattern: str | None = None


# a small bundled ruleset matching the synthetic corpus (FIXTURES.md §3);
# shapes follow the reference's own example rules (pdb-example.c corpus)
DEFAULT_RULES = [
    PdbRule(
        "su-failed", "'su root' failed for @ESTRING:user: @on @ANYSTRING:tty@",
        program="su", rule_class="violation", tags=["auth", "su"],
    ),
    PdbRule(
        "sshd-accepted",
        "Accepted @ESTRING:auth_method: @for @ESTRING:user: @from @IPv4:client_ip@ port @NUMBER:port@ ssh2",
        program="sshd", rule_class="system", tags=["auth", "ssh"],
    ),
    PdbRule(
        "kernel-link-up", "@ESTRING:interface::@ link up",
        program="kernel", rule_class="system", tags=["network"],
    ),
]


class PatternDB:
    """Actor-pool stage: `ds.map_batches(PatternDB, concurrency=N)`.

    `selection="ordered"` (default) keeps declaration order —
    first-match-wins. `selection="radix"` reproduces the reference's
    radix-trie lookup exactly (modules/correlation/radix.c): literal
    edges beat parser edges at every position with backtracking, and a
    rule whose whole pattern matches a PREFIX of the message wins when
    no complete match exists (the two-pass partial fallback,
    radix.c:1552). The bulk matching stays vectorized — the per-row
    trie walk (stages/radix.py) runs ONLY for rows the vectorized pass
    flags as ambiguous (2+ full matches) or prefix-only."""

    def __init__(self, rules: list[PdbRule] | None = None, rules_ref=None,
                 source_col: str = "message", program_col: str = "program",
                 selection: str = "ordered"):
        if rules_ref is not None:
            import ray

            rules = ray.get(rules_ref)
        if selection not in ("ordered", "radix"):
            raise ValueError("selection must be ordered|radix")
        self.selection = selection
        self.rules = rules if rules is not None else DEFAULT_RULES
        self.compiled = [(r, compile_pattern(r.pattern)) for r in self.rules]
        self.source_col = source_col
        self.program_col = program_col
        self._prog_rx = {
            r.program_pattern: compile_pattern(r.program_pattern)
            for r in self.rules if r.program_pattern is not None
        }
        self._prog_memo: dict = {}
        self.value_names = sorted(
            {_dec_name(n) for _, rx in self.compiled for n in rx.groupindex}
            | {n for r in self.rules for n in r.values}
            | {_dec_name(n) for rx in self._prog_rx.values()
               for n in rx.groupindex}
        )
        if selection == "radix":
            from .radix import RadixTree

            # one tree per exact program (program specificity shadows the
            # match-any tree, like the reference's program-level radix);
            # prefix regexes (no $ anchor) flag partial-fallback candidates
            self.trees: dict = {}
            for idx, (r, _rx) in enumerate(self.compiled):
                self.trees.setdefault(r.program, RadixTree()).insert(r.pattern, idx)
            self.prefix_compiled = [
                re.compile(rx.pattern[: -1], re.S) if rx.pattern.endswith("$") else rx
                for _, rx in self.compiled
            ]


    def _prog_gate(self, rule: PdbRule, prog: pd.Series):
        """Per-rule program candidacy: (bool mask, program-extracted
        pairs per row or None). Program-pattern matching is memoized per
        DISTINCT program value in the batch (tiny cardinality)."""
        n = len(prog)
        if rule.program_pattern is None:
            if rule.program is not None:
                return (prog == rule.program).fillna(False).to_numpy(), None
            return np.ones(n, dtype=bool), None
        rx = self._prog_rx[rule.program_pattern]
        key = rule.program_pattern
        codes, uniq = pd.factorize(prog.to_numpy(dtype=object))
        per_uniq = []
        for u in uniq:
            m = rx.match(u) if isinstance(u, str) else None
            per_uniq.append(
                [(_dec_name(k), v) for k, v in m.groupdict().items()
                 if v is not None]
                if m else None)
        mask = np.array([c >= 0 and per_uniq[c] is not None for c in codes],
                        dtype=bool)
        return mask, (codes, per_uniq)

    def _prog_pairs(self, gate_vals, i: int) -> list:
        if gate_vals is None:
            return []
        codes, per_uniq = gate_vals
        v = per_uniq[codes[int(i)]]
        return list(v) if v else []

    def _rule_extract(self, rule_idx: int, rx: re.Pattern, sub_arrow: pa.Array):
        """Match+extract one rule over the candidate rows: Arrow RE2 (one C
        pass, no pandas string churn) with a per-rule pandas fallback for
        non-RE2 patterns (@PCRE@ with lookarounds etc). Returns (hit bool
        ndarray, {group: list-of-values for hit rows})."""
        import pyarrow.compute as pc

        names = list(rx.groupindex.keys())
        if not hasattr(self, "_re2_ok"):
            self._re2_ok = {}
        if self._re2_ok.get(rule_idx, True):
            try:
                if names:
                    st = pc.extract_regex(sub_arrow, pattern="(?s)" + rx.pattern)
                    hit = np.asarray(pc.is_valid(st).to_numpy(zero_copy_only=False), dtype=bool)
                    hit_arr = pa.array(hit)
                    cols = {nm: pc.struct_field(st, nm).filter(hit_arr).to_pylist() for nm in names}
                else:
                    m = pc.fill_null(pc.match_substring_regex(sub_arrow, "(?s)" + rx.pattern), False)
                    hit = np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool)
                    cols = {}
                self._re2_ok[rule_idx] = True
                return hit, cols
            except pa.ArrowInvalid:
                self._re2_ok[rule_idx] = False
        sub = pd.Series(sub_arrow.to_pandas()).astype("string")
        ex = sub.str.extract(rx)
        if ex.shape[1] == 0:
            hit = sub.str.match(rx, na=False).to_numpy()
            return hit, {}
        hit = ex.notna().any(axis=1).to_numpy()
        cols = {}
        for nm in names:
            sub_col = ex[nm][hit]
            cols[nm] = sub_col.astype(object).where(sub_col.notna(), None).tolist()
        return hit, cols

    def _msg_prog_valid(self, table: pa.Table):
        n = table.num_rows
        col = table.column(self.source_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        arrow_msg = pc.fill_null(pc.cast(col, pa.string()), "")
        prog = (
            table.column(self.program_col).to_pandas().astype("string")
            if self.program_col in table.column_names
            else pd.Series([None] * n, dtype="string")
        )
        msg_valid = ~np.asarray(col.is_null().to_numpy(zero_copy_only=False), dtype=bool)
        return arrow_msg, prog, msg_valid

    def _assemble(self, table: pa.Table, rule_col, class_col, vmaps) -> pa.Table:
        n = table.num_rows
        tag_lists = (
            table.column("tags").to_pandas().map(lambda v: list(v) if v is not None else []).tolist()
            if "tags" in table.column_names
            else [[] for _ in range(n)]
        )
        by_id = {r.rule_id: r for r in self.rules}
        for i in range(n):
            rid = rule_col[i]
            if rid is None:
                continue
            rtags = by_id[rid].tags
            if rtags:
                rt = sorted(set(rtags))
                tag_lists[i] = sorted(set(tag_lists[i]) | set(rt)) if tag_lists[i] else rt
        out = table
        for name, arr, typ in (
            ("pdb_rule", rule_col, pa.string()),
            ("pdb_class", class_col, pa.string()),
            ("pdb_values", vmaps, pa.map_(pa.string(), pa.string())),
        ):
            out = out.append_column(name, pa.array(arr, type=typ))
        tags_arr = pa.array(tag_lists, type=pa.list_(pa.string()))
        if "tags" in out.column_names:
            out = out.set_column(out.column_names.index("tags"), "tags", tags_arr)
        else:
            out = out.append_column("tags", tags_arr)
        return out

    def _call_radix(self, table: pa.Table) -> pa.Table:
        """Radix selection: one vectorized full-match pass per rule with
        NO short-circuit, then winners resolved per row — single-hit
        rows directly, 2+-hit rows by trie walk (literal-preference
        shadowing), zero-hit rows with a vectorized prefix hit by the
        trie's partial fallback. Python-loop cost is bounded by the
        ambiguous/prefix rows, not the batch."""
        n = table.num_rows
        arrow_msg, prog, msg_valid = self._msg_prog_valid(table)
        hit_count = np.zeros(n, dtype=np.int16)
        first_hit = np.full(n, -1, dtype=np.int32)
        infos: list = []
        gates: list = []
        for rule_idx, (rule, rx) in enumerate(self.compiled):
            gate_mask, gate_vals = self._prog_gate(rule, prog)
            gates.append(gate_vals)
            cand = msg_valid & gate_mask
            if not cand.any():
                infos.append(None)
                continue
            cand_idx = np.flatnonzero(cand)
            hit, cols = self._rule_extract(rule_idx, rx, arrow_msg.take(pa.array(cand_idx, type=pa.int64())))
            rows = cand_idx[hit]
            hit_count[rows] += 1
            first_hit[rows[first_hit[rows] < 0]] = rule_idx
            infos.append((rows, cols))
        winner = np.full(n, -1, dtype=np.int32)
        single = hit_count == 1
        winner[single] = first_hit[single]

        prog_arr = prog.to_numpy(dtype=object)

        def _trie_lookup(i, msg, valid=None):
            """Program-specific tree first (program specificity shadows
            match-any, like the reference's program-level radix), then
            the match-any tree; a `valid` rule set filters results so a
            partial match in one tree cannot shadow a full match known
            to exist in the other."""
            p = prog_arr[i]
            p = None if p is None or (np.ndim(p) == 0 and pd.isna(p)) else p
            trees = [self.trees[p]] if p in self.trees else []
            if None in self.trees:
                trees.append(self.trees[None])
            for t in trees:
                res = t.lookup(msg)
                if res is not None and (valid is None or res[0] in valid):
                    return res
            return None

        walk_caps: dict[int, list] = {}
        amb = np.flatnonzero(hit_count >= 2)
        if len(amb):
            amb_rules: dict[int, set] = {int(i): set() for i in amb}
            for rule_idx, info in enumerate(infos):
                if info is None:
                    continue
                for r in info[0]:
                    ri = int(r)
                    if ri in amb_rules:
                        amb_rules[ri].add(rule_idx)
            msgs = arrow_msg.take(pa.array(amb, type=pa.int64())).to_pylist()
            for j, i in enumerate(amb):
                res = _trie_lookup(i, msgs[j], valid=amb_rules[int(i)])
                winner[i] = res[0] if res is not None else first_hit[i]
        # prefix-only (partial fallback) candidates among zero-hit rows
        zero = msg_valid & (hit_count == 0)
        if zero.any():
            partial_cand = np.zeros(n, dtype=bool)
            for rule_idx, (rule, _rx) in enumerate(self.compiled):
                gate_mask, _gv = self._prog_gate(rule, prog)
                cand = zero & gate_mask
                if not cand.any():
                    continue
                cand_idx = np.flatnonzero(cand & ~partial_cand)
                if not len(cand_idx):
                    continue
                try:
                    m = pc.fill_null(pc.match_substring_regex(
                        arrow_msg.take(pa.array(cand_idx, type=pa.int64())),
                        "(?s)" + self.prefix_compiled[rule_idx].pattern), False)
                    hits = np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool)
                except pa.ArrowInvalid:
                    sub = pd.Series(arrow_msg.take(pa.array(cand_idx, type=pa.int64())).to_pandas()).astype("string")
                    hits = sub.str.match(self.prefix_compiled[rule_idx], na=False).to_numpy()
                partial_cand[cand_idx[hits]] = True
            prows = np.flatnonzero(partial_cand)
            if len(prows):
                msgs = arrow_msg.take(pa.array(prows, type=pa.int64())).to_pylist()
                for j, i in enumerate(prows):
                    res = _trie_lookup(i, msgs[j])
                    if res is not None:
                        winner[i] = res[0]
                        walk_caps[i] = res[1]

        rule_col = np.full(n, None, dtype=object)
        class_col = np.full(n, None, dtype=object)
        vmaps = np.full(n, None, dtype=object)
        for rule_idx, info in enumerate(infos):
            if info is None:
                continue
            rows, cols = info
            rule, rx = self.compiled[rule_idx]
            names = list(rx.groupindex.keys())
            static_items = list(rule.values.items())
            pos = {int(r): k for k, r in enumerate(rows)}
            won = rows[winner[rows] == rule_idx]
            for i in won:
                rule_col[i] = rule.rule_id
                class_col[i] = rule.rule_class
                pairs = list(static_items) + self._prog_pairs(gates[rule_idx], i)
                k = pos[int(i)]
                for nm in names:
                    v = cols[nm][k]
                    if v is not None:
                        pairs.append((_dec_name(nm), v))
                vmaps[i] = pairs
        # partial winners: values come from the trie walk's captures
        for i, caps in walk_caps.items():
            if winner[i] < 0:
                continue
            rule, _rx = self.compiled[winner[i]]
            rule_col[i] = rule.rule_id
            class_col[i] = rule.rule_class
            vmaps[i] = list(rule.values.items()) + [(nm, v) for nm, v in caps]
        return self._assemble(table, rule_col, class_col, vmaps)

    def __call__(self, table: pa.Table) -> pa.Table:
        if self.selection == "radix":
            return self._call_radix(table)
        n = table.num_rows
        arrow_msg = table.column(self.source_col)
        arrow_msg = pc.fill_null(pc.cast(
            arrow_msg.combine_chunks() if isinstance(arrow_msg, pa.ChunkedArray) else arrow_msg,
            pa.string()), "")
        prog = (
            table.column(self.program_col).to_pandas().astype("string")
            if self.program_col in table.column_names
            else pd.Series([None] * n, dtype="string")
        )
        rule_col = np.full(n, None, dtype=object)
        class_col = np.full(n, None, dtype=object)
        vmaps = np.full(n, None, dtype=object)
        tag_lists = (
            table.column("tags").to_pandas().map(lambda v: list(v) if v is not None else []).tolist()
            if "tags" in table.column_names
            else [[] for _ in range(n)]
        )
        # null messages never match (the pandas NA semantics of the old path)
        msg_valid = ~np.asarray(
            table.column(self.source_col).is_null().to_numpy(zero_copy_only=False)
            if isinstance(table.column(self.source_col), pa.Array)
            else table.column(self.source_col).combine_chunks().is_null().to_numpy(zero_copy_only=False),
            dtype=bool,
        )
        unmatched = np.ones(n, dtype=bool)
        for rule_idx, (rule, rx) in enumerate(self.compiled):
            gate_mask, gate_vals = self._prog_gate(rule, prog)
            cand = unmatched & msg_valid & gate_mask
            if not cand.any():
                continue
            cand_idx = np.flatnonzero(cand)
            sub_arrow = arrow_msg.take(pa.array(cand_idx, type=pa.int64()))
            hit, cols = self._rule_extract(rule_idx, rx, sub_arrow)
            rows = cand_idx[hit]
            if not len(rows):
                continue
            unmatched[rows] = False
            rule_col[rows] = rule.rule_id
            class_col[rows] = rule.rule_class
            names = list(rx.groupindex.keys())
            static_items = list(rule.values.items())
            rule_tags = sorted(set(rule.tags)) if rule.tags else None
            for k, i in enumerate(rows):
                pairs = list(static_items) + self._prog_pairs(gate_vals, i)
                for nm in names:
                    v = cols[nm][k]
                    if v is not None:
                        pairs.append((_dec_name(nm), v))
                vmaps[i] = pairs
                if rule_tags:
                    tag_lists[i] = sorted(set(tag_lists[i]) | set(rule_tags)) if tag_lists[i] else rule_tags
        out = table
        for name, arr, typ in (
            ("pdb_rule", rule_col, pa.string()),
            ("pdb_class", class_col, pa.string()),
            ("pdb_values", vmaps, pa.map_(pa.string(), pa.string())),
        ):
            out = out.append_column(name, pa.array(arr, type=typ))
        if "tags" in out.column_names:
            out = out.set_column(out.column_names.index("tags"), "tags", pa.array(tag_lists, type=pa.list_(pa.string())))
        else:
            out = out.append_column("tags", pa.array(tag_lists, type=pa.list_(pa.string())))
        return out
