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

Divergences (documented): rule selection is ordered first-match-wins per
program instead of radix longest-prefix; patterns are anchored at both
ends (the reference requires the full message consumed too).

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


def compile_pattern(pattern: str) -> re.Pattern:
    """Compile a PatternDB pattern string into an anchored regex."""
    out, pos = [], 0
    for m in _WILDCARD.finditer(pattern):
        out.append(re.escape(pattern[pos : m.start()]))
        ptype, name, param = m.group(1), m.group(2) or "", m.group(3)
        grp = f"(?P<{name}>" if name else "(?:"
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


def _literal_prefix_len(pattern: str) -> int:
    """Length of the literal text before the first @WILDCARD@ — the radix
    trie's primary discriminator (reference modules/correlation/radix.c:
    literal chars are consumed greedily before parser nodes are tried)."""
    m = _WILDCARD.search(pattern)
    return len(pattern) if m is None else m.start()


class PatternDB:
    """Actor-pool stage: `ds.map_batches(PatternDB, concurrency=N)`.

    `selection="ordered"` (default) keeps declaration order —
    first-match-wins. `selection="radix"` tries rules in descending
    literal-prefix length (stable within ties), reproducing the radix
    trie's longest-literal-prefix shadowing for overlapping patterns;
    mid-pattern literal-vs-parser preference is NOT modeled (documented
    divergence from radix.c's per-node backtracking)."""

    def __init__(self, rules: list[PdbRule] | None = None, rules_ref=None,
                 source_col: str = "message", program_col: str = "program",
                 selection: str = "ordered"):
        if rules_ref is not None:
            import ray

            rules = ray.get(rules_ref)
        if selection not in ("ordered", "radix"):
            raise ValueError("selection must be ordered|radix")
        self.rules = rules if rules is not None else DEFAULT_RULES
        self.compiled = [(r, compile_pattern(r.pattern)) for r in self.rules]
        if selection == "radix":
            self.compiled.sort(key=lambda rc: -_literal_prefix_len(rc[0].pattern))
        self.source_col = source_col
        self.program_col = program_col
        self.value_names = sorted(
            {n for _, rx in self.compiled for n in rx.groupindex} | {n for r in self.rules for n in r.values}
        )

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

    def __call__(self, table: pa.Table) -> pa.Table:
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
            cand = unmatched & msg_valid
            if rule.program is not None:
                cand &= (prog == rule.program).fillna(False).to_numpy()
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
                pairs = list(static_items)
                for nm in names:
                    v = cols[nm][k]
                    if v is not None:
                        pairs.append((nm, v))
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
