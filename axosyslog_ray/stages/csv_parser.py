"""csv-parser(): delimiter/quote/dialect tokenization into named columns.

Semantics mirror the reference csv parser
(reference modules/csvparser/csvparser.c:279 process, :201 column store;
scanner lib/scanner/csv-scanner/csv-scanner.c): named target columns,
configurable delimiters, **quote pairs** (open->close, e.g. '""' and
'[]' so an apache `[10/Oct/2026:...]` field is one token), dialects
escape-none / escape-backslash / escape-double-char, null-value
replacement, strip-whitespace, greedy tail, drop-invalid.

Vectorization: the tokenizer is one compiled regex alternation
(quoted-token | bare-token) applied with `Series.str.findall` — a single
C-driven pass per batch; column assembly is a numpy object-matrix
reshape. Rows with fewer tokens than columns (or extra tokens when not
greedy) get `csv_valid=False`; the caller drops them when the reference's
drop-invalid is on (parser failure drops the row on that path,
reference lib/parser/parser-expr.c:46-99).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

DIALECTS = ("escape-none", "escape-backslash", "escape-double-char")


class CsvParser:
    def __init__(
        self,
        columns: list[str],
        delimiters: str = ",",
        quotes: str = '""',
        dialect: str = "escape-none",
        null_value: str | None = None,
        strip_whitespace: bool = False,
        greedy: bool = False,
        prefix: str = "",
        drop_invalid: bool = False,
        source_col: str = "message",
    ):
        if dialect not in DIALECTS:
            raise ValueError(f"dialect must be one of {DIALECTS}")
        self.columns = list(columns)
        self.delimiters = delimiters
        # quotes come as open/close pairs: '""' -> {'"': '"'}; '""[]' -> also '[' -> ']'
        self.quote_pairs = {quotes[i]: quotes[i + 1] for i in range(0, len(quotes) - 1, 2)}
        self.dialect = dialect
        self.null_value = null_value
        self.strip_whitespace = strip_whitespace
        self.greedy = greedy
        self.prefix = prefix
        self.drop_invalid = drop_invalid
        self.source_col = source_col
        self.token_re = self._build_token_re()

    def _build_token_re(self) -> re.Pattern:
        d = re.escape(self.delimiters)
        alts = []
        for qo, qc in self.quote_pairs.items():
            o, c = re.escape(qo), re.escape(qc)
            if self.dialect == "escape-backslash":
                alts.append(f"{o}(?:\\\\.|[^{c}\\\\])*{c}")
            elif self.dialect == "escape-double-char":
                alts.append(f"{o}(?:{c}{c}|[^{c}])*{c}")
            else:  # escape-none
                alts.append(f"{o}[^{c}]*{c}")
        alts.append(f"[^{d}]+")
        return re.compile("|".join(alts))

    def _unquote(self, tok: str) -> str:
        if len(tok) >= 2 and tok[0] in self.quote_pairs and tok[-1] == self.quote_pairs[tok[0]]:
            body, qc = tok[1:-1], tok[-1]
            if self.dialect == "escape-backslash":
                body = re.sub(r"\\(.)", r"\1", body)
            elif self.dialect == "escape-double-char":
                body = body.replace(qc + qc, qc)
            return body
        return tok

    def parse_tokens(self, line: str) -> list[str] | None:
        """Scalar reference path (oracle for tests)."""
        toks = [self._unquote(t) for t in self.token_re.findall(line)]
        return self._assemble(toks)

    def _assemble(self, toks: list[str]) -> list[str] | None:
        ncol = len(self.columns)
        if len(toks) < ncol:
            return None
        if len(toks) > ncol:
            if not self.greedy:
                return None
            # greedy: the tail column swallows the remaining tokens, re-joined
            # with the primary delimiter (documented divergence: original
            # inter-token delimiter runs are not preserved)
            toks = toks[: ncol - 1] + [self.delimiters[0].join(toks[ncol - 1 :])]
        if self.strip_whitespace:
            toks = [t.strip() for t in toks]
        if self.null_value is not None:
            toks = [None if t == self.null_value else t for t in toks]
        return toks

    def __call__(self, table: pa.Table) -> pa.Table:
        s = table.column(self.source_col).to_pandas().astype("string").fillna("")
        tok_lists = s.str.findall(self.token_re)
        n = len(s)
        ncol = len(self.columns)
        out_cols = [np.full(n, None, dtype=object) for _ in range(ncol)]
        valid = np.zeros(n, dtype=bool)
        for i, toks in enumerate(tok_lists.to_numpy()):
            row = self._assemble([self._unquote(t) for t in toks])
            if row is not None:
                valid[i] = True
                for j in range(ncol):
                    out_cols[j][i] = row[j]
        out = table
        for j, name in enumerate(self.columns):
            out = out.append_column(self.prefix + name, pa.array(out_cols[j], type=pa.string()))
        out = out.append_column("csv_valid", pa.array(valid))
        if self.drop_invalid:
            out = out.filter(pa.array(valid))
        return out


# canonical apache-access-log parser (reference perf fixture shape,
# modules/csvparser/tests/test_csvparser_perf.c:93-105)
APACHE_COLUMNS = [
    "clientip", "ident", "auth", "timestamp", "request",
    "status", "bytes", "referrer", "agent", "rt", "vhost",
]


def apache_parser(source_col: str = "message", prefix: str = "", drop_invalid: bool = False) -> CsvParser:
    return CsvParser(
        columns=APACHE_COLUMNS,
        delimiters=" ",
        quotes='""[]',
        dialect="escape-backslash",
        source_col=source_col,
        prefix=prefix,
        drop_invalid=drop_invalid,
    )
