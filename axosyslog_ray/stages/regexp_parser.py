"""regexp-parser(): PCRE named/numbered capture groups -> columns.

Semantics mirror the reference regexp parser
(reference modules/regexp-parser/regexp-parser.c, matcher
lib/logmatcher.c log_matcher_pcre_re_new): named groups become fields
(with `prefix()`), numbered groups become `$1..$n` — here a
`matches: list<string>` column, the reference's num_matches model
(lib/logmsg/logmsg.h:282-283). Non-matching rows get `re_matched=False`
(the pipeline applies the reference's parser-failure drop where
configured).

Vectorization: `Series.str.extract` runs the compiled regex in a single
C-driven pass; no Python-per-row loop.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


class RegexpParser:
    def __init__(
        self,
        pattern: str,
        prefix: str = "",
        source_col: str = "message",
        emit_matches: bool = False,
        flags: int = 0,
    ):
        self.re = re.compile(pattern, flags)
        self.prefix = prefix
        self.source_col = source_col
        self.emit_matches = emit_matches
        self.named = list(self.re.groupindex.keys())

    def __call__(self, table: pa.Table) -> pa.Table:
        s = table.column(self.source_col).to_pandas().astype("string")
        ex = s.str.extract(self.re)  # one row per input, NaN where unmatched
        out = table
        # match success is the PATTERN matching, not any group capturing —
        # a match where every (optional) group is empty still succeeds,
        # like the reference's matcher (logmatcher.c)
        matched = s.str.contains(self.re, na=False)
        if self.named:
            for name in self.named:
                col = ex[name]
                arr = col.to_numpy(dtype=object, copy=True)
                arr[col.isna().to_numpy()] = None
                out = out.append_column(self.prefix + name, pa.array(arr, type=pa.string()))
        if self.emit_matches:
            # numbered groups -> $1..$n list column (transient between stages)
            lists = np.full(len(s), None, dtype=object)
            m_np = matched.to_numpy()
            vals = ex.to_numpy(dtype=object)
            for i in np.flatnonzero(m_np):
                lists[i] = [None if pd.isna(v) else v for v in vals[i]]
            out = out.append_column("matches", pa.array(lists, type=pa.list_(pa.string())))
        out = out.append_column("re_matched", pa.array(matched.to_numpy()))
        return out
