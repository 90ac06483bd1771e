"""kv-parser(): scan key=value pairs into a map column (+ promoted fields).

Semantics mirror the reference kv parser
(reference modules/kvformat/kv-parser.c:104-136; scanner
lib/scanner/kv-scanner/kv-scanner.c): configurable value-separator,
quoted values (single or double, backslash escapes), `prefix()` on the
emitted keys, and stray-word collection (text between pairs lands in a
`stray_words` value instead of being lost).

Vectorization: one compiled pair-regex via `Series.str.findall`; stray
words via the same pass with `re.finditer` span subtraction only when
`collect_stray` is on.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_KEY = r"[A-Za-z0-9][A-Za-z0-9._-]*"


class KvParser:
    def __init__(
        self,
        value_separator: str = "=",
        prefix: str = "",
        collect_stray: bool = False,
        promote: list[str] | None = None,
        source_col: str = "message",
        out_col: str = "kv",
        greedy_values: bool = False,
    ):
        vs = re.escape(value_separator)
        if greedy_values:
            # reference kv-scanner mode: an unquoted value runs until the
            # next `word=` boundary (values may contain spaces) —
            # lib/scanner/kv-scanner/kv-scanner.c value termination
            self.pair_re = re.compile(
                rf"({_KEY}){vs}(\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*'"
                rf"|.*?(?=[,\s]\s*{_KEY}{vs}|\s*$|,\s))"
            )
        else:
            self.pair_re = re.compile(
                rf"({_KEY}){vs}(\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*'|[^,\s]*)"
            )
        self.prefix = prefix
        self.collect_stray = collect_stray
        self.promote = promote or []
        self.source_col = source_col
        self.out_col = out_col

    @staticmethod
    def _unquote(v: str) -> str:
        if len(v) >= 2 and v[0] in "\"'" and v[-1] == v[0]:
            return re.sub(r"\\(.)", r"\1", v[1:-1])
        return v

    def _postprocess_value(self, value: str, was_quoted: bool) -> str:
        """Hook for kv variants (linux-audit hex decode); applied on BOTH
        the scalar and the vectorized batch path."""
        return value

    def parse_line(self, line: str) -> tuple[list[tuple[str, str]], str]:
        """Scalar path: returns ([(key, value)...], stray_words)."""
        pairs, spans = [], []
        for m in self.pair_re.finditer(line):
            raw = m.group(2)
            quoted = raw[:1] in ('"', "'")  # tuple: "" must NOT count as quoted
            pairs.append((self.prefix + m.group(1),
                          self._postprocess_value(self._unquote(raw), quoted)))
            spans.append(m.span())
        stray = ""
        if self.collect_stray:
            pos, chunks = 0, []
            for a, b in spans:
                chunks.append(line[pos:a])
                pos = b
            chunks.append(line[pos:])
            words = " ".join(c.strip(" ,") for c in chunks).split()
            stray = " ".join(words)
        return pairs, stray

    def __call__(self, table: pa.Table) -> pa.Table:
        s = table.column(self.source_col).to_pandas().astype("string").fillna("")
        n = len(s)
        maps = np.full(n, None, dtype=object)
        strays = np.full(n, "", dtype=object)
        promoted = {k: np.full(n, None, dtype=object) for k in self.promote}
        if self.collect_stray:
            # stray collection needs match spans — scalar path
            for i, line in enumerate(s.to_numpy()):
                pairs, stray = self.parse_line(line)
                maps[i] = pairs
                strays[i] = stray
                if self.promote and pairs:
                    d = dict(pairs)
                    for k in self.promote:
                        promoted[k][i] = d.get(self.prefix + k)
        else:
            # vectorized: ONE C findall pass for the whole batch; the rest
            # is tuple assembly (no per-row regex engine invocations)
            pair_lists = s.str.findall(self.pair_re).to_numpy()
            prefix, unquote, post = self.prefix, self._unquote, self._postprocess_value
            qchars = ('"', "'")
            for i, lst in enumerate(pair_lists):
                maps[i] = [
                    (prefix + k,
                     post(unquote(v), True) if v[:1] in qchars else post(v, False))
                    for k, v in lst
                ]
                if self.promote and lst:
                    d = dict(maps[i])
                    for k in self.promote:
                        promoted[k][i] = d.get(prefix + k)
        out = table.append_column(self.out_col, pa.array(maps, type=pa.map_(pa.string(), pa.string())))
        if self.collect_stray:
            out = out.append_column("stray_words", pa.array(strays, type=pa.string()))
        for k in self.promote:
            out = out.append_column(self.prefix + k, pa.array(promoted[k], type=pa.string()))
        return out
