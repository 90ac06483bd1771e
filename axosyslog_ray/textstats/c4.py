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
the same flat-line layout as curation._line_hash_table); the final
per-document reassembly is one Arrow `binary_join` over a ListArray
(C speed, O(total output bytes), no per-doc interpreter loop).

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


def _arrow_line_mask(trimmed: pa.Array, min_words: int) -> np.ndarray:
    """c4_line_mask, all-Arrow: same rules over an Arrow string array
    with zero object-dtype materialization."""
    import pyarrow.compute as pc

    low = pc.utf8_lower(trimmed)
    keep = pc.ends_with(trimmed, pattern=TERMINAL_PUNCT[0])
    for punct in TERMINAL_PUNCT[1:]:
        keep = pc.or_(keep, pc.ends_with(trimmed, pattern=punct))
    keep = pc.and_(keep, pc.greater_equal(
        pc.count_substring_regex(trimmed, pattern=r"\S+"), min_words))
    keep = pc.and_(keep, pc.invert(
        pc.match_substring(low, pattern="javascript")))
    for phrase in BLOCKLIST_PHRASES:
        keep = pc.and_(keep, pc.invert(
            pc.match_substring(low, pattern=phrase)))
    return keep.to_numpy(zero_copy_only=False)


def c4_clean_batch(batch: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id", min_words: int = 5,
                   min_lines: int = 3) -> pa.Table:
    """One-batch C4 clean: returns (id_col, n_lines_kept, clean_text)
    for surviving pages only. The entire kernel is Arrow compute —
    split_pattern/trim/predicates stay in the zero-copy string buffers
    and the per-doc reassembly is one `binary_join`; numpy only carries
    the boolean masks and offset arithmetic."""
    import pyarrow.compute as pc

    col = batch.column(text_col)
    texts = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    texts = pc.fill_null(texts, "")
    ids = batch.column(id_col)
    n = len(texts)

    low_full = pc.utf8_lower(texts)
    page_ok = pc.invert(pc.match_substring(texts, pattern="{"))
    for phrase in PAGE_DROP_PHRASES:
        page_ok = pc.and_(page_ok, pc.invert(
            pc.match_substring(low_full, pattern=phrase)))
    page_ok = page_ok.to_numpy(zero_copy_only=False)

    # flat line table: one Arrow split + np.repeat doc index
    split = pc.split_pattern(texts, pattern="\n")
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    trimmed = pc.utf8_trim_whitespace(split.flatten())
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)

    keep = _arrow_line_mask(trimmed, min_words) & page_ok[doc_idx]

    kept_idx = doc_idx[keep]
    n_kept = np.bincount(kept_idx, minlength=n).astype(np.int64)
    doc_keep = page_ok & (n_kept >= min_lines)

    # per-doc join of surviving lines via one Arrow binary_join over a
    # ListArray (C speed, zero per-doc interpreter iterations); the flat
    # table preserves (doc, line) order so offsets are just cumsum
    doc_sel = np.flatnonzero(doc_keep)
    final_mask = keep & doc_keep[doc_idx]
    final_lines = trimmed.filter(pa.array(final_mask))
    out_n = n_kept[doc_sel]
    offsets = np.zeros(len(doc_sel) + 1, dtype=np.int64)
    np.cumsum(out_n, out=offsets[1:])
    list_arr = pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), final_lines)
    joined = pc.binary_join(list_arr, "\n")
    return pa.table({
        id_col: ids.take(pa.array(doc_sel, type=pa.int64()))
        if len(doc_sel) else pa.array([], type=ids.type),
        "n_lines_kept": pa.array(out_n, type=pa.int64()),
        "clean_text": joined.cast(pa.string()),
    })


def c4_clean(ds, text_col: str = "text", id_col: str = "doc_id",
             min_words: int = 5, min_lines: int = 3):
    """Dataset-level C4 clean: one map-only stage, no shuffle."""
    return ds.map_batches(
        lambda b: c4_clean_batch(b, text_col=text_col, id_col=id_col,
                                 min_words=min_words, min_lines=min_lines),
        batch_format="pyarrow")
