"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm). No reference analogue; the near-dup/provenance half of the
brief.

Semantics (pinned, SQL-replayable): word k-grams hashed with md5 (the
SQL-parity choice, same trade as docs_fingerprint vs
docs_fingerprint_fast — swap in hashutil's splitmix64 stack for the
64-bit fast path at scale); over every window of `w` consecutive gram
hashes the minimum hash is selected; the fingerprint set is the
DISTINCT selected minima per document. Guarantees: any shared run of
w + k - 1 words between two documents yields at least one shared
fingerprint, while storing ~2/(w+1) of the grams.

Scale shape: map-only — flat token table, vectorized gram assembly
(pandas str.cat over shifted slices), numpy sliding window minimum
(np.minimum.reduce over w shifted views of the fixed-width hash
array), doc-boundary masking exactly like curation._gram_hashes. The
only per-row Python is the md5 digest loop (the disclosed oracle-parity
cost)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def winnow_batch(batch: pa.Table, k: int = 3, w: int = 4,
                 text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    texts = batch.column(text_col).to_pandas()
    ids_np = batch.column(id_col).to_numpy(zero_copy_only=False)
    from .tokens import flat_tokens
    flat, lens, doc = flat_tokens(texts)
    nt = len(flat)
    empty = pa.table({
        id_col: pa.array([], type=batch.column(id_col).type),
        "fingerprint": pa.array([], type=pa.string()),
    })
    if nt < k:
        return empty
    # vectorized k-gram assembly over the flat token table
    s0 = pd.Series(flat[: nt - k + 1], dtype=object).astype("string")
    grams = s0.str.cat(
        [pd.Series(flat[i: nt - k + 1 + i], dtype=object).astype("string")
         for i in range(1, k)], sep=" ")
    # windows crossing document boundaries are invalid
    gdoc = doc[: nt - k + 1]
    gvalid = gdoc == doc[k - 1:]
    h = np.array([hashlib.md5(g.encode()).hexdigest() for g in grams],
                 dtype="U32")
    # per-window minimum over w consecutive gram hashes (numpy string
    # compare == lexicographic md5 order, which DuckDB min() replays)
    ng = len(h)
    if ng < w:
        wins = np.empty(0, dtype="U32")
        wdoc = np.empty(0, dtype=np.int64)
    else:
        m = h[: ng - w + 1].copy()
        for i in range(1, w):
            hs = h[i: ng - w + 1 + i]
            m = np.where(m <= hs, m, hs)  # np.minimum lacks a U32 loop
        wdoc = gdoc[: ng - w + 1]
        wvalid = (wdoc == gdoc[w - 1:]) & gvalid[: ng - w + 1] \
            & gvalid[w - 1:]
        wins, wdoc = m[wvalid], wdoc[wvalid]
    if not len(wins):
        return empty
    pairs = pd.DataFrame({"d": wdoc, "h": wins}).drop_duplicates()
    return pa.table({
        id_col: pa.array(ids_np[pairs["d"].to_numpy()]),
        "fingerprint": pa.array(pairs["h"].to_numpy(dtype=object),
                                type=pa.string()),
    })


def winnow_fingerprints(ds, k: int = 3, w: int = 4,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Dataset-level winnowing: one map-only stage, no shuffle; join the
    output against itself (groupby fingerprint) for provenance/overlap
    candidates downstream (`winnow_pairs`)."""
    return ds.map_batches(
        lambda b: winnow_batch(b, k, w, text_col, id_col),
        batch_format="pyarrow")


def winnow_pairs(ds, k: int = 3, w: int = 4, min_shared: int = 2,
                 max_df: int = 20, text_col: str = "text",
                 id_col: str = "doc_id", num_buckets: int | None = None):
    """Near-dup candidate pairs from winnowing fingerprints: documents
    sharing >= `min_shared` selected fingerprints, with fingerprints in
    more than `max_df` documents dropped first (boilerplate
    stop-fingerprints — the same hot-bucket cap every LSH stage here
    uses; disclosed: dropping them can only lose candidates that share
    ONLY ubiquitous text).

    Scale shape: fingerprint table is ~2/(w+1) of grams and NARROW
    (id + 32-byte hash — document text never shuffles); one bucketed
    exchange co-locates equal fingerprints, pairs form per group after
    the df cap (group size <= max_df bounds the quadratic), then one
    (doc_a, doc_b) pre-aggregated count. Returns
    (doc_a, doc_b, n_shared) with doc_a < doc_b."""
    from ..aggregate import pre_aggregated_count
    from ..shuffle import bucketed_map_groups

    fps = winnow_fingerprints(ds, k, w, text_col, id_col)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([id_col, "fingerprint"])
        df = g.groupby("fingerprint")[id_col].transform("size")
        g = g[df <= max_df]
        j = g.merge(g, on="fingerprint", suffixes=("_a", "_b"))
        j = j[j[f"{id_col}_a"] < j[f"{id_col}_b"]]
        return pd.DataFrame({
            "doc_a": j[f"{id_col}_a"].to_numpy(),
            "doc_b": j[f"{id_col}_b"].to_numpy(),
        })

    p = bucketed_map_groups(fps, "fingerprint", pairs,
                            num_buckets=num_buckets)
    counted = pre_aggregated_count(p, ["doc_a", "doc_b"],
                                   alias="n_shared")
    import pyarrow.compute as pc

    return counted.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n_shared"),
                                            min_shared)),
        batch_format="pyarrow")
