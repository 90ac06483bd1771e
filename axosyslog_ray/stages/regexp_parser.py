"""regexp-parser(): PCRE named/numbered capture groups -> columns.

Semantics mirror the reference regexp parser
(reference modules/regexp-parser/regexp-parser.c, matcher
lib/logmatcher.c log_matcher_pcre_re_new): named groups become fields
(with `prefix()`), numbered groups become `$1..$n` — here a
`matches: list<string>` column, the reference's num_matches model
(lib/logmsg/logmsg.h:282-283), plus `match0` for `$0` (the whole
match, lib/logmsg/logmsg.c match 0). Non-matching rows get
`re_matched=False` (the pipeline applies the reference's
parser-failure drop where configured).

PCRE surface differences handled at compile time:
- `(?<name>...)` group syntax normalizes to Python's `(?P<name>...)`
  (lookbehind `(?<=` / `(?<!` untouched);
- `dupnames=True` (LMF_DUPNAMES, lib/logmatcher.h) allows repeated
  group names by uniquifying them internally; the emitted value is the
  LAST group of that name that participated in the match — the
  reference's store-matches behavior where later named groups
  overwrite earlier ones (pinned against the reference's own
  test_filters_regexp.c corpus in
  tests/test_regexp_match_conformance.py). Without the flag a
  duplicate name is a compile error, like PCRE's default.

One compiled-regex search per row builds match0 + numbered + named
columns together (pandas' str.extract/str.contains pair costs two
passes for the same work).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_GROUP_SYNTAX = re.compile(r"\(\?<(?![=!])")
_NAMED_GROUP = re.compile(r"\(\?P<([^>]*)>")


class RegexpParser:
    def __init__(
        self,
        pattern: str,
        prefix: str = "",
        source_col: str = "message",
        emit_matches: bool = False,
        flags: int = 0,
        dupnames: bool = False,
    ):
        pattern = _GROUP_SYNTAX.sub("(?P<", pattern)
        # output-name remapping (config mode maps hard-macro group names
        # like MESSAGE onto the engine's message columns)
        self.name_map: dict[str, str] = {}
        self._dup_groups: dict[str, list[str]] = {}
        if dupnames:
            seen: dict[str, list[str]] = {}

            def _rename(m: re.Match) -> str:
                name = m.group(1)
                bucket = seen.setdefault(name, [])
                uniq = name if not bucket else f"{name}_dUp{len(bucket)}_"
                bucket.append(uniq)
                return f"(?P<{uniq}>"

            pattern = _NAMED_GROUP.sub(_rename, pattern)
            self._dup_groups = {n: u for n, u in seen.items() if len(u) > 1}
        self.re = re.compile(pattern, flags)
        self.prefix = prefix
        self.source_col = source_col
        self.emit_matches = emit_matches
        uniq_to_orig = {u: n for n, us in self._dup_groups.items() for u in us}
        # output order: first appearance order of the ORIGINAL names
        self.named: list[str] = []
        for g in self.re.groupindex:
            orig = uniq_to_orig.get(g, g)
            if orig not in self.named:
                self.named.append(orig)

    def __call__(self, table: pa.Table) -> pa.Table:
        s = table.column(self.source_col).to_pandas()
        n = len(s)
        search = self.re.search
        mobjs = [search(v) if isinstance(v, str) else None
                 for v in s.to_numpy(dtype=object)]
        matched = np.array([m is not None for m in mobjs], dtype=bool)
        out = table
        if self.named:
            named_vals: dict[str, np.ndarray] = {
                name: np.full(n, None, dtype=object) for name in self.named}
            for i, m in enumerate(mobjs):
                if m is None:
                    continue
                gd = m.groupdict()
                for name in self.named:
                    alts = self._dup_groups.get(name, (name,))
                    # LAST participating duplicate wins (store-matches)
                    for u in reversed(alts):
                        if gd.get(u) is not None:
                            named_vals[name][i] = gd[u]
                            break
            for name in self.named:
                cn = self.prefix + self.name_map.get(name, name)
                arr = pa.array(named_vals[name], type=pa.string())
                if cn in out.column_names:
                    # named group re-writes a builtin (e.g. (?<MESSAGE>...))
                    # only where the row matched; unmatched rows keep theirs
                    old = out.column(cn)
                    arr = pa.compute.if_else(pa.array(matched),
                                             pa.compute.cast(arr, old.type
                                                             if pa.types.is_string(old.type)
                                                             else pa.string()),
                                             pa.compute.cast(old, pa.string()))
                    out = out.set_column(out.column_names.index(cn), cn, arr)
                else:
                    out = out.append_column(cn, arr)
        if self.emit_matches:
            # numbered groups -> $1..$n list column; $0 -> match0
            lists = np.full(n, None, dtype=object)
            m0 = np.full(n, None, dtype=object)
            for i, m in enumerate(mobjs):
                if m is None:
                    continue
                lists[i] = list(m.groups())
                m0[i] = m.group(0)
            out = out.append_column("matches", pa.array(lists, type=pa.list_(pa.string())))
            out = out.append_column("match0", pa.array(m0, type=pa.string()))
        out = out.append_column("re_matched", pa.array(matched))
        return out
