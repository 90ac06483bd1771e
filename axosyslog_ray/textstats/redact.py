"""PII redaction for web corpora: emails, IPv4s, phone numbers, SSNs.

The standard pre-training scrub (public web-corpus pipelines replace
PII spans with typed placeholder tokens so models don't memorize
contact data). Pure per-row regex substitution — shuffle-free,
reproducible at any partitioning, vectorized through pandas'
C-level str.replace.

Every pattern is RE2-safe (no backreferences or lookarounds) so the
DuckDB oracle runs the IDENTICAL sequence via regexp_replace(...,'g')
— the docs_redact_pii query's correctness gate is an independent
engine executing the same spec, like webtext.py's normalizer.

Order matters and is part of the spec: emails first (so the user part
of an address can't be half-matched as a phone number), then IPv4
(before phone — '10.0.0.1' contains digit runs), then phone, then SSN.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

# (name, pattern, replacement) — applied IN ORDER; patterns RE2-safe
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    # +1-555-123-4567 / (555) 123-4567 / 555.123.4567 — 10+ digit shapes
    ("phone", r"(?:\+?[0-9]{1,2}[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
]

_COMPILED = [(n, re.compile(p), r) for n, p, r in PII_PATTERNS]


def redact_text(s: pd.Series, kinds: list[str] | None = None) -> pd.Series:
    out = s.astype(object).fillna("").astype(str)
    for name, rx, repl in _COMPILED:
        if kinds is None or name in kinds:
            out = out.str.replace(rx, repl, regex=True)
    return out


def redact_pii(batch: pa.Table, text_col: str = "text", out_col: str | None = None,
               kinds: list[str] | None = None) -> pa.Table:
    """Batch stage: replace PII spans with typed placeholders. In-place
    on text_col unless out_col names a new column."""
    red = redact_text(batch.column(text_col).to_pandas(), kinds)
    arr = pa.array(red, type=pa.string())
    if out_col and out_col != text_col:
        return batch.append_column(out_col, arr)
    idx = batch.column_names.index(text_col)
    return batch.set_column(idx, text_col, arr)


def pii_sql_replacements(col: str = "text") -> str:
    """The identical redaction as a nested DuckDB regexp_replace chain —
    single source of truth for the oracle (same patterns, same order)."""
    expr = col
    for _name, pat, repl in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{repl}', 'g')"
    return expr
