"""Log-template mining (`pdbtool patternize`): cluster messages into
PatternDB-style skeletons by frequent-word support.

Reference: modules/correlation/pdbtool/pdbtool.c patternize mode +
modules/correlation/patternize.c — the LogHash/SLCT family: words
occurring in at least `support` messages stay literal, everything else
becomes a wildcard, consecutive wildcards collapse, and messages
sharing a skeleton form one cluster whose size is the pattern's
support. The classic first step of building a .pdb ruleset from a raw
log corpus — and equally the webtext "template extraction" step
(boilerplate page-skeleton mining).

Scale shape:
1. word DOCUMENT frequencies via the vocab combiner: per-batch
   distinct (word) counts -> ONE narrow (word, n) tree aggregate; the
   frequent set (df >= support) broadcasts via ray.put — its size is
   bounded by total_distinct_words, and in practice by the support
   threshold (disclosed: a pathological corpus where millions of words
   pass support needs a two-pass hash-set variant).
2. map-only skeleton rendering over the flat token table (np.isin
   against the broadcast set, per-doc join with wildcard collapsing).
3. pre-aggregated pattern counts (combiner + one small groupby Sum).

Every step is SQL-expressible (explode + df filter + string_agg +
regexp collapse), which is what lets events_patternize carry a full
DuckDB value-hash oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

WILDCARD = "@ANYSTRING@"


def word_doc_frequencies(ds, text_col: str = "message"):
    """(word, df) Dataset: number of MESSAGES containing each word."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pandas().fillna("")
        parts = texts.str.split()
        lens = parts.str.len().fillna(0).astype(np.int64).to_numpy()
        flat = (np.concatenate([np.asarray(p, dtype=object) for p in parts])
                if len(parts) else np.empty(0, dtype=object))
        doc = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        # distinct (doc, word) then per-word counts — all C-level
        dd = pd.DataFrame({"d": doc, "w": flat}).drop_duplicates()
        vc = dd["w"].value_counts()
        return pa.table({"word": pa.array(vc.index.to_numpy(dtype=object),
                                          type=pa.string()),
                         "_df": pa.array(vc.to_numpy(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("_df", alias_name="df"))


def skeleton_series(texts: pd.Series, frequent: frozenset) -> pd.Series:
    """Vectorized skeleton render: frequent words literal, others one
    collapsed WILDCARD run (patternize.c cluster key)."""
    parts = texts.fillna("").str.split()
    lens = parts.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = (np.concatenate([np.asarray(p, dtype=object) for p in parts])
            if len(parts) else np.empty(0, dtype=object))
    keep = pd.Series(flat, dtype=object).isin(frequent).to_numpy() \
        if len(flat) else np.zeros(0, dtype=bool)
    # vectorized wildcard-run collapse: drop a wildcard token unless it
    # STARTS a run (previous token kept literal, or doc boundary)
    is_wild = ~keep
    doc = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    prev_wild = np.zeros(len(flat), dtype=bool)
    prev_wild[1:] = is_wild[:-1] & (doc[1:] == doc[:-1])
    keep_tok = keep | (is_wild & ~prev_wild)
    mapped = np.where(keep, flat, WILDCARD)[keep_tok]
    kept_doc = doc[keep_tok]
    # one Arrow binary_join over a ListArray (tokens stay (doc, pos)
    # ordered, so offsets are just the per-doc cumulative counts) —
    # zero per-doc interpreter iterations
    counts = np.bincount(kept_doc, minlength=len(texts))
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    list_arr = pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()),
        pa.array(mapped, type=pa.string()))
    joined = pa.compute.binary_join(list_arr, " ").cast(pa.string())
    return pd.Series(joined.to_pandas().to_numpy(dtype=object), dtype=object)


def patternize(ds, support: int, text_col: str = "message"):
    """(pattern, support) Dataset: clusters of messages whose frequent-
    word skeleton agrees; `support` is an absolute message count."""
    import ray

    from ..aggregate import pre_aggregated_count

    df = word_doc_frequencies(ds, text_col=text_col).to_pandas()
    frequent = frozenset(df.loc[df["df"] >= support, "word"])
    ref = ray.put(frequent)

    def render(b: pa.Table) -> pa.Table:
        fr = ray.get(ref)
        sk = skeleton_series(b.column(text_col).to_pandas(), fr)
        return pa.table({"pattern": pa.array(sk, type=pa.string())})

    patterns = ds.map_batches(render, batch_format="pyarrow")
    return pre_aggregated_count(patterns, ["pattern"], alias="support")
