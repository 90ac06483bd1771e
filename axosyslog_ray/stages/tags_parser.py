"""tags-parser(): parse a $TAGS-formatted string back into the tags set.

Mirrors the reference tags parser (reference
modules/tagsparser/tags-parser.c:34-55 — a list-scanner pass over the
input, each element set as a tag; list syntax
lib/scanner/list-scanner/list-scanner.c: comma-separated elements,
double-quoted elements may contain commas and backslash escapes).

Vectorization: one compiled findall per batch extracts elements
(quoted-or-bare alternation); empty elements are skipped (an empty tag
name is meaningless in the reference's tag bitset too). Parsed tags are
UNIONED into the existing `tags` list column, matching
log_msg_set_tag_by_name semantics (set, not replace).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_ELEM_RE = re.compile(r'"(?:[^"\\]|\\.)*"|[^,]+')


def _parse_list(s: str) -> list[str]:
    out = []
    for tok in _ELEM_RE.findall(s):
        if len(tok) >= 2 and tok[0] == '"' and tok[-1] == '"':
            tok = re.sub(r"\\(.)", r"\1", tok[1:-1])
        tok = tok.strip()
        if tok:
            out.append(tok)
    return out


class TagsParser:
    def __init__(self, source_col: str = "message", tags_col: str = "tags"):
        self.source_col = source_col
        self.tags_col = tags_col

    def __call__(self, table: pa.Table) -> pa.Table:
        if self.source_col not in table.column_names:
            return table  # nothing to parse (no row carried the field)
        s = table.column(self.source_col).to_pandas().astype("string").fillna("")
        parsed = s.map(_parse_list)
        if self.tags_col in table.column_names:
            existing = table.column(self.tags_col).to_pandas().map(
                lambda v: list(v) if v is not None else [])
            merged = [sorted(set(e) | set(p)) for e, p in zip(existing, parsed)]
            idx = table.column_names.index(self.tags_col)
            return table.set_column(idx, self.tags_col,
                                    pa.array(merged, type=pa.list_(pa.string())))
        merged = [sorted(set(p)) for p in parsed]
        return table.append_column(self.tags_col, pa.array(merged, type=pa.list_(pa.string())))
