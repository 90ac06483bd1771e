"""Gopher repetition rules (Rae et al. 2021, table A1 — the other half
of the published web-corpus heuristics; gopher_quality covers the
format rules). All metrics are per-document, so the operator is
MAP-ONLY: no shuffle at any corpus size.

Per document:

- **dup_line_frac / dup_line_char_frac** — raw text split on newlines;
  occurrences beyond the first of any repeated line, as a fraction of
  line count / of line characters;
- **top_{2,3,4}gram_char_frac** — the most-repeated word n-gram's
  `count * chars(gram) / total_word_chars` (0 unless it occurs >= 2
  times); chars exclude the joining spaces so the metric is a pure
  function of the tokenization;
- **dup_5gram_char_frac** — fraction of word characters covered by ANY
  within-doc duplicated 5-gram (interval-coverage union, the same
  cumsum trick as dedup.substring).

Tokenization is the repo's single-source rule (lower + [a-z0-9]+), so
every metric is exactly reproducible by the DuckDB oracle; fractions
round half-away to 4 decimals on both sides.

Vectorization: the whole batch flattens to ONE token stream; n-gram
texts build by shifted vectorized string concat; per-(doc, gram) counts
are a pandas hash groupby; coverage is a flat cumsum — no per-row
Python in any hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .vocab import _flat_tokens


def _round4(x: np.ndarray) -> np.ndarray:
    return np.floor(np.asarray(x, dtype=np.float64) * 10_000 + 0.5) / 10_000


def _line_metrics(texts: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = len(texts)
    n_lines = np.zeros(n, dtype=np.int64)
    dup_frac = np.zeros(n, dtype=np.float64)
    dup_char_frac = np.zeros(n, dtype=np.float64)
    flat_lines: list = []
    doc_of: list = []
    for i, t in enumerate(texts):
        ls = (t or "").split("\n")
        n_lines[i] = len(ls)
        flat_lines.extend(ls)
        doc_of.append(np.full(len(ls), i, dtype=np.int64))
    if not flat_lines:
        return n_lines, dup_frac, dup_char_frac
    df = pd.DataFrame({"d": np.concatenate(doc_of),
                       "l": pd.Series(flat_lines, dtype=object)})
    df["chars"] = df["l"].str.len().to_numpy(np.int64)
    cnt = df.groupby(["d", "l"], sort=False).agg(
        c=("l", "size"), ch=("chars", "first")).reset_index()
    d = cnt["d"].to_numpy(np.int64)
    c = cnt["c"].to_numpy(np.int64)
    ch = cnt["ch"].to_numpy(np.int64)
    tot = np.zeros(n, dtype=np.int64)
    extra = np.zeros(n, dtype=np.int64)
    tot_ch = np.zeros(n, dtype=np.int64)
    ex_ch = np.zeros(n, dtype=np.int64)
    np.add.at(tot, d, c)
    np.add.at(extra, d, c - 1)
    np.add.at(tot_ch, d, c * ch)
    np.add.at(ex_ch, d, (c - 1) * ch)
    dup_frac = extra / np.maximum(tot, 1)
    dup_char_frac = ex_ch / np.maximum(tot_ch, 1)
    return n_lines, dup_frac, dup_char_frac


def _gram_frame(toks: np.ndarray, doc_of: np.ndarray, n: int) -> pd.DataFrame:
    """Flat (doc, gram text, gram chars, start pos) frame for every
    within-doc n-gram — shifted vectorized string concat, windows
    crossing doc boundaries masked."""
    total = len(toks)
    if total < n:
        return pd.DataFrame({"d": pd.Series([], dtype=np.int64),
                             "g": pd.Series([], dtype=object),
                             "chars": pd.Series([], dtype=np.int64),
                             "pos": pd.Series([], dtype=np.int64)})
    s = pd.Series(toks, dtype=object)
    g = s.str.cat([s.shift(-j) for j in range(1, n)], sep=" ", na_rep="")
    g = g.iloc[: total - n + 1]
    valid = doc_of[: total - n + 1] == doc_of[n - 1:]
    g = g[valid]
    chars = g.str.len().to_numpy(np.int64) - (n - 1)
    return pd.DataFrame({"d": doc_of[: total - n + 1][valid],
                         "g": g.to_numpy(dtype=object),
                         "chars": chars,
                         "pos": np.flatnonzero(valid).astype(np.int64)})


def gopher_repetition(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    texts = batch.column(text_col).to_pandas().fillna("").to_numpy(dtype=object)
    nd = len(texts)
    toks, seg = _flat_tokens(texts)
    total = len(toks)
    doc_of = np.repeat(np.arange(nd), np.diff(seg))
    wlen = (pd.Series(toks, dtype=object).str.len().to_numpy(np.int64)
            if total else np.empty(0, np.int64))
    tot_chars = np.zeros(nd, dtype=np.int64)
    np.add.at(tot_chars, doc_of, wlen)
    denom = np.maximum(tot_chars, 1).astype(np.float64)

    n_lines, dup_line_frac, dup_line_char_frac = _line_metrics(texts)

    top_fracs = {}
    for n in (2, 3, 4):
        gf = _gram_frame(toks, doc_of, n)
        top = np.zeros(nd, dtype=np.float64)
        if len(gf):
            cnt = gf.groupby(["d", "g"], sort=False).agg(
                c=("g", "size"), chars=("chars", "first")).reset_index()
            cnt = cnt[cnt["c"] >= 2]
            if len(cnt):
                val = cnt["c"].to_numpy(np.int64) * cnt["chars"].to_numpy(np.int64)
                best = pd.Series(val).groupby(cnt["d"].to_numpy()).max()
                top[best.index.to_numpy(np.int64)] = best.to_numpy(np.float64)
        top_fracs[n] = top / denom

    dup5 = np.zeros(nd, dtype=np.float64)
    gf = _gram_frame(toks, doc_of, 5)
    if len(gf):
        sizes = gf.groupby(["d", "g"], sort=False)["g"].transform("size")
        starts = gf.loc[sizes.to_numpy() >= 2, "pos"].to_numpy(np.int64)
        if len(starts):
            delta = np.zeros(total + 1, dtype=np.int64)
            np.add.at(delta, starts, 1)
            # clip each window at its own doc's end
            ends = np.minimum(starts + 5, seg[doc_of[starts] + 1])
            np.add.at(delta, ends, -1)
            cov = np.cumsum(delta[:total]) > 0
            cov_chars = np.zeros(nd, dtype=np.int64)
            np.add.at(cov_chars, doc_of[cov], wlen[cov])
            dup5 = cov_chars / denom

    out = batch.select([id_col])
    for name, arr, typ in (
        ("n_lines", n_lines, pa.int64()),
        ("dup_line_frac", _round4(dup_line_frac), pa.float64()),
        ("dup_line_char_frac", _round4(dup_line_char_frac), pa.float64()),
        ("top_2gram_char_frac", _round4(top_fracs[2]), pa.float64()),
        ("top_3gram_char_frac", _round4(top_fracs[3]), pa.float64()),
        ("top_4gram_char_frac", _round4(top_fracs[4]), pa.float64()),
        ("dup_5gram_char_frac", _round4(dup5), pa.float64()),
    ):
        out = out.append_column(name, pa.array(arr, type=typ))
    return out
