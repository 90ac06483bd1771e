"""C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning" §2.2 — the public C4 heuristics).

The classic web-corpus line/page filter set, as one map-only
vectorized stage (no reference analogue — axosyslog is a log engine;
this is the webtext half of the brief):

Line rules (applied to whitespace-trimmed lines):
  - keep only lines ending in a terminal punctuation mark (. ! ? ")
  - keep only lines with >= `min_words` whitespace tokens
  - drop lines containing the word "javascript" (case-insensitive)
  - drop lines containing a blocklisted boilerplate phrase
    ("cookie policy", "privacy policy", "terms of use", "uses cookies")

Page rules:
  - drop pages containing "lorem ipsum" (case-insensitive)
  - drop pages containing a curly brace "{"
  - drop pages with fewer than `min_lines` retained lines (C4 counts
    sentences; we count retained lines — documented deviation, same
    intent, deterministic)

Scale shape: embarrassingly parallel — every rule is a pure function
of one document, so the stage is a single `map_batches` with zero
shuffle; all predicates run as pandas/numpy C-level string kernels
over a flattened line table (np.repeat doc index + one str.split —
the same flat-line layout as curation._line_hash_table). The only
per-document Python is the final '\n'.join of kept lines, which is
O(total output bytes) — the unavoidable materialization cost.

Every rule is expressible in ANSI SQL (regexp_matches / contains /
list lateral unnest), which is what lets docs_c4_clean carry a full
DuckDB value-hash oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TERMINAL_PUNCT = ('.', '!', '?', '"')
BLOCKLIST_PHRASES = ("cookie policy", "privacy policy", "terms of use",
                     "uses cookies")
PAGE_DROP_PHRASES = ("lorem ipsum",)


def c4_line_mask(lines: pd.Series, min_words: int = 5) -> np.ndarray:
    """Vectorized C4 line-keep mask over already-trimmed lines."""
    low = lines.str.lower()
    keep = lines.str.endswith(TERMINAL_PUNCT).to_numpy(dtype=bool)
    keep &= (lines.str.count(r"\S+") >= min_words).to_numpy(dtype=bool)
    keep &= ~low.str.contains("javascript", regex=False).to_numpy(dtype=bool)
    for phrase in BLOCKLIST_PHRASES:
        keep &= ~low.str.contains(phrase, regex=False).to_numpy(dtype=bool)
    return keep


def c4_clean_batch(batch: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id", min_words: int = 5,
                   min_lines: int = 3) -> pa.Table:
    """One-batch C4 clean: returns (id_col, n_lines_kept, clean_text)
    for surviving pages only."""
    texts = batch.column(text_col).to_pandas().fillna("")
    ids = batch.column(id_col)

    low = texts.str.lower()
    page_ok = ~texts.str.contains("{", regex=False).to_numpy(dtype=bool)
    for phrase in PAGE_DROP_PHRASES:
        page_ok &= ~low.str.contains(phrase, regex=False).to_numpy(dtype=bool)

    # flat line table: one str.split + np.repeat index (no Python loop)
    parts = texts.str.split("\n")
    lens = parts.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = (np.concatenate([np.asarray(p, dtype=object) for p in parts])
            if len(parts) else np.empty(0, dtype=object))
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)

    fl = pd.Series(flat, dtype=object).str.strip()
    keep = c4_line_mask(fl, min_words=min_words) & page_ok[doc_idx]

    kept_idx = doc_idx[keep]
    kept_lines = fl.to_numpy()[keep]
    n_kept = np.bincount(kept_idx, minlength=len(texts)).astype(np.int64)
    doc_keep = page_ok & (n_kept >= min_lines)

    # per-doc join of kept lines (O(output bytes)); contiguous slices
    # because the flat table preserves (doc, line) order
    starts = np.searchsorted(kept_idx, np.arange(len(texts)))
    ends = np.searchsorted(kept_idx, np.arange(len(texts)), side="right")
    out_ids, out_n, out_text = [], [], []
    for i in np.flatnonzero(doc_keep):
        out_ids.append(i)
        out_n.append(int(n_kept[i]))
        out_text.append("\n".join(kept_lines[starts[i]:ends[i]]))
    return pa.table({
        id_col: ids.take(pa.array(out_ids, type=pa.int64()))
        if out_ids else pa.array([], type=ids.type),
        "n_lines_kept": pa.array(out_n, type=pa.int64()),
        "clean_text": pa.array(out_text, type=pa.string()),
    })


def c4_clean(ds, text_col: str = "text", id_col: str = "doc_id",
             min_words: int = 5, min_lines: int = 3):
    """Dataset-level C4 clean: one map-only stage, no shuffle."""
    return ds.map_batches(
        lambda b: c4_clean_batch(b, text_col=text_col, id_col=id_col,
                                 min_words=min_words, min_lines=min_lines),
        batch_format="pyarrow")
