"""Exact duplicated-substring removal (ExactSubstr dedup).

The corpus-dedup step of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022): any span that appears more than
once in the corpus is removed from EVERY document (both copies — the
paper's ExactSubstr semantics), at word-window granularity here so the
semantics stay exactly SQL-expressible:

- tokenize lower + [a-z0-9]+ runs (the repo's single-source rule, same
  as curation.decontaminate / textstats.vocab);
- a k-word window is DUPLICATED iff its text occurs at >= 2 distinct
  (doc, pos) places corpus-wide (a doc repeating itself counts);
- a word is REMOVED iff any duplicated window covers it; the surviving
  words re-join with single spaces.

The reference paper builds one giant suffix array; the Ray-native shape
replaces it with a hash prepass so the wide exchange moves 16-byte rows
instead of k-word strings (a window-text shuffle is a k-times blowup of
corpus bytes — the trap this module exists to avoid):

1. **window hashes** (map-only): per batch, one flat rolling-polynomial
   hash over the token stream — (h: uint64, doc_id, pos), vectorized
   via sliding_window_view, no per-row Python;
2. **candidate positions**: ONE coarse-bucket shuffle on h; a bucket
   keeps the (doc_id, pos) rows whose h occurs >= 2 times. Hash
   collisions can only ADD candidates (no false negatives);
3. **verify** (default): candidate window TEXTS are re-extracted by
   cogrouping candidates with their documents on doc_id, then a
   candidate-sized shuffle on the window text keeps texts that truly
   occur >= 2 times — the result is exactly text-equality semantics,
   which is what lets an independent DuckDB oracle reproduce it
   (`verify=False` skips stages 3's exchanges and trusts the 64-bit
   hash: ~n^2/2^65 expected false-positive windows, the documented
   probabilistic scale path);
4. **cleanup**: cogroup verified covered positions with the documents
   on doc_id; per doc an interval-coverage cumsum marks removed words.

Exchange budget: one 16-byte-per-window shuffle, two doc-text
cogroups (extract + cleanup; one with verify=False), and one
candidate-proportional text shuffle — vs the naive window-text shuffle
at k x corpus bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle import bucketed_map_groups
from ..textstats.vocab import _flat_tokens

_A = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier, mod-2^64 polynomial


def _powers(k: int) -> np.ndarray:
    pw = np.empty(k, dtype=np.uint64)
    pw[k - 1] = np.uint64(1)
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the point
        for i in range(k - 2, -1, -1):
            pw[i] = pw[i + 1] * _A
    return pw


def _window_table(batch: pa.Table, k: int, text_col: str, id_col: str,
                  pw: np.ndarray) -> pa.Table:
    """(h, doc_id, pos) for every k-word window of every doc — flat
    token stream + sliding_window_view, windows crossing doc boundaries
    masked out (no per-doc loop)."""
    empty = pa.table({"h": pa.array([], type=pa.uint64()),
                      id_col: pa.array([], type=pa.int64()),
                      "pos": pa.array([], type=pa.int64())})
    if batch.num_rows == 0:
        return empty
    texts = batch.column(text_col).to_pandas().to_numpy(dtype=object)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    toks, seg = _flat_tokens(texts)
    n = len(toks)
    if n < k:
        return empty
    from ..hashutil import poly_window_hash

    wh = pd.util.hash_array(toks)
    h = poly_window_hash(wh.astype(np.uint64), k, pw)
    doc_of = np.repeat(np.arange(len(texts)), np.diff(seg))
    head = doc_of[: n - k + 1]
    valid = head == doc_of[k - 1:]
    pos = np.arange(n - k + 1, dtype=np.int64) - seg[head]
    return pa.table({"h": pa.array(h[valid]),
                     id_col: pa.array(ids[head[valid]]),
                     "pos": pa.array(pos[valid])})


def _cogroup_docs(docs, rows, id_col: str, text_col: str, fn,
                  num_buckets: int | None):
    """Bucket-cogroup a documents Dataset with a (id, pos) row Dataset
    on the id: fn(bucket_frame) sees columns (id, pos, text, _side)
    where _side 0 rows carry text (pos -1) and _side 1 rows carry pos.
    union() concatenates positionally, so both sides are projected to
    the exact same column order first."""

    def doc_side(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            "pos": pa.array(np.full(b.num_rows, -1, dtype=np.int64)),
            "text": b.column(text_col).cast(pa.string()),
            "_side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        })

    def row_side(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            "pos": b.column("pos").cast(pa.int64()),
            "text": pa.array([None] * b.num_rows, type=pa.string()),
            "_side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        })

    both = docs.map_batches(doc_side, batch_format="pyarrow").union(
        rows.map_batches(row_side, batch_format="pyarrow"))
    return bucketed_map_groups(both, id_col, fn, num_buckets=num_buckets)


def _sorted_pos_ref(df: pd.DataFrame, id_col: str):
    """ray.put a (sorted doc ids, positions) pair for broadcast
    searchsorted lookup inside map-only stages."""
    import ray

    order = np.lexsort((df["pos"].to_numpy(np.int64),
                        df[id_col].to_numpy(np.int64)))
    return ray.put((df[id_col].to_numpy(np.int64)[order],
                    df["pos"].to_numpy(np.int64)[order]))


def _doc_positions(ref, ids: np.ndarray):
    """Per-doc candidate positions from a broadcast sorted pair:
    {row_index: positions} for rows that have any."""
    import ray

    cd, cp = ray.get(ref)
    lo = np.searchsorted(cd, ids, side="left")
    hi = np.searchsorted(cd, ids, side="right")
    return {i: cp[lo[i]:hi[i]] for i in np.flatnonzero(hi > lo)}


def substring_dedup(docs, k: int = 10, text_col: str = "text",
                    id_col: str = "doc_id", num_buckets: int | None = None,
                    verify: bool = True, broadcast_limit: int = 2_000_000):
    """Remove every word covered by a corpus-duplicated k-word window.

    Returns a Dataset of (id_col, n_words, n_removed, text_clean) with
    one row per input document (docs whose every window is unique pass
    through with n_removed 0).

    When the candidate set is small (<= broadcast_limit (doc, pos)
    rows — the common case: candidates are duplication-proportional,
    not corpus-proportional), the verify/cleanup stages run MAP-ONLY
    against a broadcast position index instead of cogrouping the full
    corpus TEXT through two extra exchanges: 2 exchanges total instead
    of 4, and document bytes never shuffle at all (r4; measured 12.4 s
    -> ~5 s at sf0.1). Larger candidate sets fall back to the cogroup
    path automatically (the 100-TB-heavy-duplication shape)."""
    pw = _powers(k)
    windows = docs.map_batches(
        lambda b: _window_table(b, k, text_col, id_col, pw),
        batch_format="pyarrow")

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("h")["h"].transform("size")
        return g.loc[sizes >= 2, [id_col, "pos"]]

    cand = bucketed_map_groups(windows, "h", dup_positions,
                               num_buckets=num_buckets).materialize()
    if cand.count() <= broadcast_limit:
        return _dedup_broadcast(docs, cand, k, text_col, id_col,
                                num_buckets, verify)

    if verify:
        def extract_windows(g: pd.DataFrame) -> pd.DataFrame:
            d = g[g["_side"] == 0]
            c = g[g["_side"] == 1]
            if c.empty:
                return pd.DataFrame({"w": pd.Series([], dtype=object),
                                     id_col: pd.Series([], dtype="int64"),
                                     "pos": pd.Series([], dtype="int64")})
            texts = dict(zip(d[id_col], d["text"]))
            out_w: list = []
            out_id: list = []
            out_p: list = []
            for did, grp in c.groupby(id_col, sort=False):
                t, seg = _flat_tokens(np.array([texts[did]], dtype=object))
                ps = grp["pos"].to_numpy(np.int64)
                out_w.extend(" ".join(t[p:p + k]) for p in ps)
                out_id.append(np.full(len(ps), did, dtype=np.int64))
                out_p.append(ps)
            return pd.DataFrame({"w": pd.Series(out_w, dtype=object),
                                 id_col: np.concatenate(out_id),
                                 "pos": np.concatenate(out_p)})

        wtexts = _cogroup_docs(docs, cand, id_col, text_col,
                               extract_windows, num_buckets)

        def dup_texts(g: pd.DataFrame) -> pd.DataFrame:
            sizes = g.groupby("w")["w"].transform("size")
            return g.loc[sizes >= 2, [id_col, "pos"]]

        covered = bucketed_map_groups(wtexts, "w", dup_texts,
                                      num_buckets=num_buckets)
    else:
        covered = cand

    def clean(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["_side"] == 0]
        c = g[g["_side"] == 1]
        starts = {did: grp["pos"].to_numpy(np.int64)
                  for did, grp in c.groupby(id_col, sort=False)}
        ids = d[id_col].to_numpy(np.int64)
        texts_arr = d["text"].to_numpy(dtype=object)
        n_words = np.empty(len(d), dtype=np.int64)
        n_removed = np.empty(len(d), dtype=np.int64)
        cleaned: list = []
        for i in range(len(d)):
            t, _ = _flat_tokens(np.array([texts_arr[i]], dtype=object))
            n = len(t)
            n_words[i] = n
            ss = starts.get(ids[i])
            if ss is None or n == 0:
                n_removed[i] = 0
                cleaned.append(" ".join(t))
                continue
            # interval coverage: +1 at each dup-window start, -1 past
            # its end; covered where the running sum is positive
            delta = np.zeros(n + 1, dtype=np.int64)
            np.add.at(delta, ss, 1)
            np.add.at(delta, np.minimum(ss + k, n), -1)
            cov = np.cumsum(delta[:n]) > 0
            n_removed[i] = int(cov.sum())
            cleaned.append(" ".join(t[~cov]))
        return pd.DataFrame({id_col: ids, "n_words": n_words,
                             "n_removed": n_removed,
                             "text_clean": pd.Series(cleaned, dtype=object)})

    return _cogroup_docs(docs, covered, id_col, text_col, clean, num_buckets)


def _clean_rows(texts_arr: np.ndarray, ids: np.ndarray, pos_of: dict,
                k: int, id_col: str) -> pd.DataFrame:
    """Interval-coverage cleanup of a batch of docs given their covered
    window-start positions (shared by the cogroup and broadcast paths)."""
    n_words = np.empty(len(ids), dtype=np.int64)
    n_removed = np.empty(len(ids), dtype=np.int64)
    cleaned: list = []
    for i in range(len(ids)):
        t, _ = _flat_tokens(np.array([texts_arr[i]], dtype=object))
        n = len(t)
        n_words[i] = n
        ss = pos_of.get(i)
        if ss is None or n == 0:
            n_removed[i] = 0
            cleaned.append(" ".join(t))
            continue
        delta = np.zeros(n + 1, dtype=np.int64)
        np.add.at(delta, ss, 1)
        np.add.at(delta, np.minimum(ss + k, n), -1)
        cov = np.cumsum(delta[:n]) > 0
        n_removed[i] = int(cov.sum())
        cleaned.append(" ".join(t[~cov]))
    return pd.DataFrame({id_col: ids, "n_words": n_words,
                         "n_removed": n_removed,
                         "text_clean": pd.Series(cleaned, dtype=object)})


def _dedup_broadcast(docs, cand, k: int, text_col: str, id_col: str,
                     num_buckets: int | None, verify: bool):
    """Broadcast verify/cleanup: candidate (doc, pos) rows fit the
    driver, so document text never shuffles — extract and clean run
    map-only against ray.put position indexes; the only remaining
    exchange is the candidate-proportional window-TEXT groupby that
    turns hash-candidates into text-verified duplicates."""
    cdf = cand.to_pandas()
    if not len(cdf):
        def passthrough(b: pa.Table) -> pa.Table:
            texts_arr = b.column(text_col).to_pandas().fillna("").to_numpy(dtype=object)
            ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.Table.from_pandas(
                _clean_rows(texts_arr, ids, {}, k, id_col), preserve_index=False)

        return docs.map_batches(passthrough, batch_format="pyarrow")

    if verify:
        ref = _sorted_pos_ref(cdf, id_col)

        def extract(b: pa.Table) -> pa.Table:
            texts_arr = b.column(text_col).to_pandas().fillna("").to_numpy(dtype=object)
            ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            pos_of = _doc_positions(ref, ids)
            out_w: list = []
            out_id: list = []
            out_p: list = []
            for i, ps in pos_of.items():
                t, _ = _flat_tokens(np.array([texts_arr[i]], dtype=object))
                out_w.extend(" ".join(t[p:p + k]) for p in ps)
                out_id.append(np.full(len(ps), ids[i], dtype=np.int64))
                out_p.append(ps)
            if not out_w:
                return pa.table({"w": pa.array([], type=pa.string()),
                                 id_col: pa.array([], type=pa.int64()),
                                 "pos": pa.array([], type=pa.int64())})
            return pa.table({"w": pa.array(out_w, type=pa.string()),
                             id_col: pa.array(np.concatenate(out_id)),
                             "pos": pa.array(np.concatenate(out_p))})

        def dup_texts(g: pd.DataFrame) -> pd.DataFrame:
            sizes = g.groupby("w")["w"].transform("size")
            return g.loc[sizes >= 2, [id_col, "pos"]]

        covered_df = bucketed_map_groups(
            docs.map_batches(extract, batch_format="pyarrow"), "w", dup_texts,
            num_buckets=num_buckets).to_pandas()
    else:
        covered_df = cdf
    ref2 = _sorted_pos_ref(covered_df, id_col)

    def clean_map(b: pa.Table) -> pa.Table:
        texts_arr = b.column(text_col).to_pandas().fillna("").to_numpy(dtype=object)
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pos_of = _doc_positions(ref2, ids)
        return pa.Table.from_pandas(
            _clean_rows(texts_arr, ids, pos_of, k, id_col), preserve_index=False)

    return docs.map_batches(clean_map, batch_format="pyarrow")
