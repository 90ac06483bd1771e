"""csv-parser(): delimiter/quote/dialect tokenization into named columns.

Semantics mirror the reference csv parser
(reference modules/csvparser/csvparser.c:279 process, :201 column store;
scanner lib/scanner/csv-scanner/csv-scanner.c): named target columns,
configurable delimiters, **quote pairs** (open->close, e.g. '""' and
'[]' so an apache `[10/Oct/2026:...]` field is one token), dialects
escape-none / escape-backslash / escape-double-char, null-value
replacement, strip-whitespace, greedy tail, drop-invalid. Fields are
POSITIONAL: consecutive delimiters yield empty fields ('a,,c' ->
['a','','c']), exactly like the reference scanner (ADVICE r1 fix — the
old findall tokenizer collapsed empty fields).

Vectorization (two-tier):
- rows containing NO quote-open character (the overwhelming majority of
  machine logs) take the Arrow fast path: `pc.split_pattern[_regex]`
  positional split, numpy offset indexing + `pc.take` for column
  assembly, `pc.list_slice` + `pc.binary_join` for the greedy tail —
  zero per-row Python;
- rows with quotes fall back to the scalar scanner (`scan_tokens`, the
  reference-shaped state machine that is also the test oracle).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DIALECTS = ("escape-none", "escape-backslash", "escape-double-char",
            "escape-backslash-with-sequences", "escape-unquoted-delimiter")

# escape-backslash-with-sequences decode table
# (lib/scanner/csv-scanner/csv-scanner.c:298-340): \a\n\r\t\v, \xHH,
# \<quote>; anything else drops the backslash; \b and \f are NOT decoded
_SEQ_ESCAPES = {"a": "\a", "n": "\n", "r": "\r", "t": "\t", "v": "\v"}


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
        # fast-path split pattern and quote-detection regex
        self._delim_set = set(delimiters)
        self._split_regex = "[" + re.escape(delimiters) + "]" if len(delimiters) > 1 else None
        self._quote_regex = "[" + re.escape("".join(self.quote_pairs)) + "]" if self.quote_pairs else None

    # ---- scalar scanner (reference-shaped oracle + quoted-row fallback) ----

    def scan_tokens(self, line: str) -> list[str]:
        """Positional field scan: one field per delimiter gap (empty fields
        preserved); a quote char opens a quoted section only at field
        start (reference csv-scanner behavior)."""
        toks: list[str] = []
        i, n = 0, len(line)
        while True:
            if i < n and line[i] in self.quote_pairs:
                qc = self.quote_pairs[line[i]]
                j = i + 1
                body: list[str] = []
                closed = False
                while j < n:
                    ch = line[j]
                    if self.dialect == "escape-backslash" and ch == "\\" and j + 1 < n:
                        body.append(line[j + 1])
                        j += 2
                        continue
                    if self.dialect == "escape-backslash-with-sequences" \
                            and ch == "\\" and j + 1 < n:
                        e = line[j + 1]
                        if e == qc:
                            body.append(qc)
                        elif e == "x" and j + 3 < n + 1:
                            hx = line[j + 2:j + 4]
                            try:
                                body.append(chr(int(hx, 16)))
                                j += 4
                                continue
                            except ValueError:
                                body.append("x")
                        else:
                            body.append(_SEQ_ESCAPES.get(e, e))
                        j += 2
                        continue
                    if ch == qc:
                        if self.dialect == "escape-double-char" and j + 1 < n and line[j + 1] == qc:
                            body.append(qc)
                            j += 2
                            continue
                        j += 1
                        closed = True
                        break
                    body.append(ch)
                    j += 1
                tok = "".join(body)
                if not closed:  # unterminated quote: rest of line is the field
                    pass
                # trailing junk after the close quote up to the delimiter
                while j < n and line[j] not in self._delim_set:
                    tok += line[j]
                    j += 1
                i = j
            elif self.dialect == "escape-unquoted-delimiter":
                # csv-scanner.c CSV_SCANNER_ESCAPE_UNQUOTED_DELIMITER has
                # two code paths: with the DEFAULT ',' delimiter a
                # backslash escapes ANY next char (foo\' -> foo'); with
                # custom delimiters it only escapes delimiter chars and
                # is otherwise literal (ba\z stays ba\z) —
                # csv-scanner.c:394-414 vs 445-470
                body: list[str] = []
                j = i
                default_path = self.delimiters == ","
                while j < n:
                    ch = line[j]
                    if ch == "\\" and j + 1 < n and (
                            default_path or line[j + 1] in self._delim_set):
                        body.append(line[j + 1])
                        j += 2
                        continue
                    if ch in self._delim_set:
                        break
                    body.append(ch)
                    j += 1
                tok = "".join(body)
                i = j
            else:
                j = i
                while j < n and line[j] not in self._delim_set:
                    j += 1
                tok = line[i:j]
                i = j
            toks.append(tok)
            if i < n and line[i] in self._delim_set:
                i += 1
                continue
            break
        return toks

    def parse_tokens(self, line: str) -> list[str] | None:
        """Scalar reference path (oracle for tests)."""
        return self._assemble(self.scan_tokens(line))

    def _assemble(self, toks: list[str]) -> list[str] | None:
        ncol = len(self.columns)
        if ncol == 0:
            # empty input with no expected columns is a complete scan
            # (csv-scanner test empty_input_with_no_columns)
            return [] if toks in ([], [""]) else None
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

    # ---- vectorized batch path ----

    def __call__(self, table: pa.Table) -> pa.Table:
        src = pc.fill_null(pc.cast(table.column(self.source_col), pa.string()), "")
        src = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
        n = len(src)
        ncol = len(self.columns)

        # positional split (Arrow C kernel) — empty fields preserved
        if self._split_regex:
            lists = pc.split_pattern_regex(src, self._split_regex)
        else:
            lists = pc.split_pattern(src, self.delimiters)
        lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offsets)
        flat = lists.values

        valid = lens >= ncol if self.greedy else lens == ncol
        # rows containing a quote char need the scalar scanner
        if self._quote_regex is not None:
            quoted = pc.match_substring_regex(src, self._quote_regex).to_numpy(zero_copy_only=False)
            quoted = np.asarray(quoted, dtype=bool)
        else:
            quoted = np.zeros(n, dtype=bool)
        if self.dialect in ("escape-backslash-with-sequences",
                            "escape-unquoted-delimiter"):
            # backslash escapes change tokenization -> scalar scanner
            bs = pc.match_substring(src, "\\").to_numpy(zero_copy_only=False)
            quoted = quoted | np.asarray(bs, dtype=bool)

        # PARTIAL persistence on incomplete scans (csvparser.c:293-307:
        # _iterate_columns sets each parsed column on the message even
        # when the scan ends incomplete; only drop-invalid(yes) discards
        # the row). Column j is populated whenever token j exists.
        out_cols: list[np.ndarray] = []
        starts = offsets[:-1]
        for j in range(ncol - 1 if self.greedy else ncol):
            has_j = (lens > j) & ~quoted
            idx = np.where(has_j, starts + j, 0)
            col = pc.take(flat, pa.array(idx, type=pa.int64()))
            col = col.to_numpy(zero_copy_only=False).astype(object)
            col[~has_j] = None
            out_cols.append(col)
        if self.greedy:
            tail = pc.binary_join(pc.list_slice(lists, ncol - 1), self.delimiters[0])
            tail = tail.to_numpy(zero_copy_only=False).astype(object)
            tail[lens < ncol] = None
            out_cols.append(tail)

        valid = valid.copy()
        if quoted.any():
            for i in np.nonzero(quoted)[0]:
                toks = self.scan_tokens(src[int(i)].as_py())
                row = self._assemble_raw(toks)
                if row is None:
                    valid[i] = False
                    # partial: first ncol tokens, missing stay unset
                    part = (toks[:ncol] + [None] * ncol)[:ncol]
                    if self.greedy and len(toks) >= ncol:
                        part = toks[: ncol - 1] + [
                            self.delimiters[0].join(toks[ncol - 1:])]
                    for j in range(ncol):
                        out_cols[j][i] = part[j]
                else:
                    valid[i] = True
                    for j in range(ncol):
                        out_cols[j][i] = row[j]

        out = table
        for j, name in enumerate(self.columns):
            arr = pa.array(out_cols[j], type=pa.string())
            if self.strip_whitespace:
                arr = pc.utf8_trim_whitespace(arr)
            if self.null_value is not None:
                arr = pc.if_else(pc.equal(arr, self.null_value), pa.scalar(None, pa.string()), arr)
            cn = self.prefix + name
            if cn in out.column_names:  # re-writing a builtin (HOST, MSG)
                out = out.set_column(out.column_names.index(cn), cn, arr)
            else:
                out = out.append_column(cn, arr)
        if "csv_valid" in out.column_names:  # chained csv-parsers: last wins
            out = out.set_column(out.column_names.index("csv_valid"),
                                 "csv_valid", pa.array(valid))
        else:
            out = out.append_column("csv_valid", pa.array(valid))
        if self.drop_invalid:
            out = out.filter(pa.array(valid))
        return out

    def _assemble_raw(self, toks: list[str]) -> list[str] | None:
        """Like _assemble but WITHOUT strip/null handling (applied
        vectorized afterwards for all rows uniformly)."""
        ncol = len(self.columns)
        if len(toks) < ncol:
            return None
        if len(toks) > ncol:
            if not self.greedy:
                return None
            toks = toks[: ncol - 1] + [self.delimiters[0].join(toks[ncol - 1 :])]
        return toks


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
