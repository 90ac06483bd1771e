"""Byte-level vectorized kv scanner.

The kv hot path (reference lib/scanner/kv-scanner/kv-scanner.c is a
char-level FSM) re-expressed as numpy passes over the batch's UTF-8
bytes: all rows of a batch are joined with '\n', quote regions are found
with ONE cumulative-parity scan, unquoted delimiters segment tokens, and
the output key/value Arrow string arrays are built directly from the
byte buffer with a single gather — no per-row regex invocation, no
per-pair Python tuples.

Structural chars (quote, separator, whitespace, comma, newline) are all
ASCII; UTF-8 continuation bytes are >= 0x80 and can never alias them, so
byte-level scanning is UTF-8-safe and multibyte values pass through
untouched.

The kernel only handles rows it can PROVE match the regex semantics of
stages.kv_parser (same pair shape, same pair order):

- no backslash in the row (quoted-value escapes -> scalar path)
- at most one quote TYPE per row (mixed '" -> scalar)
- quotes balanced, every opening quote immediately after the value
  separator, every closing quote followed by a delimiter or end of row
  ("simple" quoting — exactly the regex's quoted-value shape)
- no non-ASCII whitespace (the regex's \\s is Unicode-aware)
- a token whose first unquoted separator has no valid key left of it
  AND a second separator -> scalar (the regex may start a pair at the
  later separator)

Everything else — typically the overwhelming majority of machine-written
kv logs — is scanned vectorized; rejected rows are parsed by the scalar
oracle and merged back in row order, so output is byte-identical to the
regex path for every input (cross-diffed in tests/test_kv_fast.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# regex \s for str patterns: ASCII [ \t\n\r\f\v] + \x1c-\x1f (+ Unicode
# spaces, excluded by the row guard)
_WS_BYTES = (0x20, 0x09, 0x0A, 0x0D, 0x0C, 0x0B, 0x1C, 0x1D, 0x1E, 0x1F)
_COMMA = 0x2C

_ALLOWED = np.zeros(256, dtype=bool)   # [A-Za-z0-9._-]
_ALNUM = np.zeros(256, dtype=bool)     # [A-Za-z0-9]
for _c in range(256):
    ch = chr(_c)
    if ch.isascii() and (ch.isalnum()):
        _ALLOWED[_c] = True
        _ALNUM[_c] = True
for _c in b"._-":
    _ALLOWED[_c] = True

# rows containing these need Unicode-aware \s -> scalar path
UNICODE_WS_CHARS = ("\u0085\u00a0\u1680"
                    + "".join(chr(c) for c in range(0x2000, 0x200B))
                    + "\u2028\u2029\u202f\u205f\u3000")
UNICODE_WS_RE = "[" + UNICODE_WS_CHARS + "]"


class KvScanResult:
    """Flat scan output: pairs in (row, in-row) order + rejected rows."""

    __slots__ = ("pair_rows", "keys", "values", "reject_rows")

    def __init__(self, pair_rows: np.ndarray, keys: pa.Array, values: pa.Array,
                 reject_rows: np.ndarray):
        self.pair_rows = pair_rows
        self.keys = keys
        self.values = values
        self.reject_rows = reject_rows


def _spans_to_arrow(arr: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pa.Array:
    """Gather [starts, ends) byte spans out of `arr` into ONE Arrow string
    array (single C gather + zero-copy from_buffers)."""
    lens = (ends - starts).astype(np.int32)
    total = int(lens.sum())
    if total == 0 and len(lens) == 0:
        return pa.array([], type=pa.string())
    # dtype pinned: ufunc.accumulate upcasts int32 to int64, which would
    # corrupt the int32 offsets buffer below
    cum = np.add.accumulate(lens, dtype=np.int32)
    # ONE repeat + one arange: index i of the output maps to
    # starts[j] + (i - span_start_of_j); int32 halves memory traffic
    base = (starts.astype(np.int32) - cum + lens)
    idx = np.repeat(base, lens) + np.arange(total, dtype=np.int32)
    data = arr[idx]
    offsets = np.concatenate([np.zeros(1, np.int32), cum])
    return pa.Array.from_buffers(
        pa.utf8(), len(lens),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
    )


def scan_kv(rows: np.ndarray, quote: str, value_sep: str) -> KvScanResult:
    """Scan `rows` (object array of str) for key<sep>value pairs with the
    single quote char `quote`. Rows the kernel cannot prove safe come
    back in reject_rows (caller runs the scalar path on them)."""
    n = len(rows)
    empty = KvScanResult(np.array([], dtype=np.int64),
                         pa.array([], type=pa.string()),
                         pa.array([], type=pa.string()),
                         np.array([], dtype=np.int64))
    if n == 0:
        return empty
    qb = ord(quote)
    sb = ord(value_sep)

    def _join(idx: np.ndarray):
        joined = "\n".join([rows[i] for i in idx]) + "\n"
        return np.frombuffer(joined.encode("utf-8"), dtype=np.uint8)

    live = np.arange(n, dtype=np.int64)
    arr = _join(live)

    # ---- phase 1: quote-shape qualification on raw bytes -------------
    nl = np.flatnonzero(arr == 0x0A)
    qpos = np.flatnonzero(arr == qb)
    reject = np.zeros(n, dtype=bool)
    if len(qpos):
        rq = np.searchsorted(nl, qpos, side="left")  # row of each quote
        cnt = np.bincount(rq, minlength=n)
        reject |= (cnt % 2) == 1  # unbalanced
        # rank of each quote within its row -> even = open, odd = close
        first_of_row = np.concatenate([[0], np.add.accumulate(cnt)])[rq]
        rank = np.arange(len(qpos)) - first_of_row
        is_open = (rank % 2) == 0
        prev = np.where(qpos > 0, arr[np.maximum(qpos - 1, 0)], 0)
        bad_open = is_open & (prev != sb)
        nxt = arr[np.minimum(qpos + 1, len(arr) - 1)]
        delim_next = np.isin(nxt, _WS_BYTES) | (nxt == _COMMA)
        bad_close = (~is_open) & ~delim_next
        bad = bad_open | bad_close
        if bad.any():
            reject[np.unique(rq[bad])] = True
    p1_reject = np.flatnonzero(reject)
    if reject.all():
        return KvScanResult(np.array([], dtype=np.int64),
                            pa.array([], type=pa.string()),
                            pa.array([], type=pa.string()),
                            p1_reject)
    if reject.any():
        live = np.flatnonzero(~reject)
        arr = _join(live)
        nl = np.flatnonzero(arr == 0x0A)

    # ---- phase 2: the scan (all live rows have simple quoting) -------
    Q = arr == qb
    # np.add.accumulate: this numpy build's np.cumsum runs ~60x slower
    # (scalar pairwise path); parity survives uint8 wraparound (256 even)
    cs = np.add.accumulate(Q, dtype=np.uint8)
    inside = ((cs - Q) & 1) == 1  # bytes strictly after an opening quote
    ws = np.isin(arr, _WS_BYTES) | (arr == _COMMA)
    delim = ws & ~inside
    nd = ~delim
    tok_start = np.flatnonzero(nd & np.concatenate([[True], delim[:-1]]))
    tok_end = np.flatnonzero(nd & np.append(delim[1:], True)) + 1  # exclusive
    if len(tok_start) == 0:
        return KvScanResult(np.array([], dtype=np.int64),
                            pa.array([], type=pa.string()),
                            pa.array([], type=pa.string()),
                            p1_reject)
    tok_row = live[np.searchsorted(nl, tok_start, side="left")]

    # first unquoted separator inside each token
    eqpos = np.flatnonzero((arr == sb) & ~inside)
    if len(eqpos) == 0:
        # no separators anywhere -> no pairs in any live row (the regex
        # requires one); phase-1 rejects still go to the scalar path
        return KvScanResult(np.array([], dtype=np.int64),
                            pa.array([], type=pa.string()),
                            pa.array([], type=pa.string()),
                            p1_reject)
    ei = np.searchsorted(eqpos, tok_start, side="left")
    has_eq = (ei < len(eqpos))
    first_eq = np.where(has_eq, eqpos[np.minimum(ei, len(eqpos) - 1)], 0)
    has_eq &= first_eq < tok_end
    # number of unquoted separators in the token (for the reject rule)
    ej = np.searchsorted(eqpos, tok_end, side="left")
    n_eq = ej - ei

    # key = longest [A-Za-z0-9._-] run ending at the separator, trimmed
    # to start at the first [A-Za-z0-9]
    allowed = _ALLOWED[arr]
    bad_pos = np.flatnonzero(~allowed)  # always nonempty: '\n' present
    bi = np.searchsorted(bad_pos, first_eq, side="left") - 1
    run_start = np.where(bi >= 0, bad_pos[np.maximum(bi, 0)] + 1, 0)
    key_lo = np.maximum(run_start, tok_start)
    # first alnum at/after key_lo (all bytes in [key_lo, first_eq) are
    # allowed, i.e. alnum or ._-)
    alnum_pos = np.flatnonzero(_ALNUM[arr])
    if len(alnum_pos) == 0:
        # no alphanumeric byte anywhere -> no valid key can exist
        has_al = np.zeros(len(tok_start), dtype=bool)
        key_start = np.zeros(len(tok_start), dtype=np.int64)
    else:
        ai = np.searchsorted(alnum_pos, key_lo, side="left")
        has_al = ai < len(alnum_pos)
        key_start = np.where(has_al, alnum_pos[np.minimum(ai, len(alnum_pos) - 1)], 0)
    key_ok = has_eq & has_al & (key_start < first_eq)

    # a token with separators but no valid key may hide a later pair the
    # regex would find -> reject its row (rare, scalar handles it)
    tricky = has_eq & ~key_ok & (n_eq >= 2)

    # quotes inside a token are only regex-conformant as a FULLY quoted
    # value: exactly two, at sep+1 and token end (the regex's quoted
    # alternative only applies when the value STARTS with the quote —
    # e.g. 'k==\"a b\"' has an UNQUOTED value '=\"a' that stops at the
    # space). Any other quote-bearing token -> scalar row. Rejecting a
    # row here is safe: its quotes are balanced (phase 1), so global
    # parity still resets at the row boundary for the other rows.
    qpos2 = np.flatnonzero(Q)
    if len(qpos2):
        qs = np.searchsorted(qpos2, tok_start, side="left")
        qe = np.searchsorted(qpos2, tok_end, side="left")
        nq = qe - qs
        qi = np.minimum(qs, len(qpos2) - 1)
        q1 = qpos2[qi]
        q2 = qpos2[np.minimum(qi + 1, len(qpos2) - 1)]
        quoted_ok = (nq == 2) & key_ok & (q1 == first_eq + 1) & (q2 == tok_end - 1)
        tricky |= (nq > 0) & ~quoted_ok

    pair_mask = key_ok & ~tricky
    if tricky.any():
        bad_rows = np.unique(tok_row[tricky])
        pair_mask &= ~np.isin(tok_row, bad_rows)
        reject_rows = np.union1d(p1_reject, bad_rows)
    else:
        reject_rows = p1_reject

    p_row = tok_row[pair_mask]
    ks = key_start[pair_mask]
    ke = first_eq[pair_mask]
    vs = ke + 1
    ve = tok_end[pair_mask]
    # strip simple quotes: value starts with quote AND ends with quote
    vlen = ve - vs
    q_first = np.zeros(len(vs), dtype=bool)
    if len(vs):
        q_first = (arr[np.minimum(vs, len(arr) - 1)] == qb) & (vlen >= 2)
        q_last = arr[np.maximum(ve - 1, 0)] == qb
        stripq = q_first & q_last
        vs = vs + stripq
        ve = ve - stripq
    keys = _spans_to_arrow(arr, ks, ke)
    values = _spans_to_arrow(arr, vs, ve)
    return KvScanResult(p_row, keys, values, reject_rows)
