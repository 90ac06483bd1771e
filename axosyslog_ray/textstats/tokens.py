"""Shared flat whitespace-token table: the one idiom chunking,
winnowing, BPE accounting and patternize all build on — one pandas
split, one object concat, np.repeat doc index. Kept in a single place
so the empty-corpus and null-row edge handling stays in sync."""

from __future__ import annotations

import numpy as np
import pandas as pd


def flat_tokens(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """texts (Series / object array) -> (flat, lens, doc):
    flat[i] is token i of the concatenated corpus, lens[d] the token
    count of document d, doc[i] the document index of token i."""
    s = texts if isinstance(texts, pd.Series) \
        else pd.Series(texts, dtype=object)
    parts = s.fillna("").str.split()
    lens = parts.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = (np.concatenate([np.asarray(p, dtype=object) for p in parts])
            if len(parts) else np.empty(0, dtype=object))
    doc = np.repeat(np.arange(len(s), dtype=np.int64), lens)
    return flat, lens, doc
