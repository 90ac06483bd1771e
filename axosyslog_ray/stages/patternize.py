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
        texts = b.column(text_col).to_pandas().fillna("").to_numpy(dtype=object)
        seen: dict = {}
        for t in texts:
            for w in set(t.split()):
                seen[w] = seen.get(w, 0) + 1
        return pa.table({"word": pa.array(list(seen), type=pa.string()),
                         "_df": pa.array(list(seen.values()), type=pa.int64())})

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
    mapped = np.where(keep, flat, WILDCARD)
    out = np.empty(len(texts), dtype=object)
    pos = 0
    for i, n in enumerate(lens):
        toks = mapped[pos:pos + n]
        pos += n
        sk: list = []
        for w in toks:
            if w == WILDCARD and sk and sk[-1] == WILDCARD:
                continue
            sk.append(w)
        out[i] = " ".join(sk)
    return pd.Series(out, dtype=object)


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
