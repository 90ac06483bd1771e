"""Exact cosine top-k: broadcast query matrix × streamed corpus batches.

Scale shape: queries are the SMALL side (ray.put once; each actor reads
the ref in __init__); the corpus streams through map_batches, each batch
contributing its local top-k per query (one numpy matmul); the final
reduce merges per-batch candidate lists — a tiny shuffle of
(query_id, k) rows, never the embeddings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    if hasattr(col, "to_pylist"):  # Arrow array/chunked array
        lists = col.to_pylist()
    else:  # pandas Series of lists/ndarrays
        lists = list(col)
    return np.asarray(lists, dtype=np.float64)


def _norm(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class CosineTopK:
    """Actor-pool stage: per batch, local top-k for every query."""

    def __init__(self, queries: np.ndarray | None = None, queries_ref=None, k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        if queries_ref is not None:
            import ray

            queries = ray.get(queries_ref)
        self.q = _norm(np.asarray(queries, dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _norm(_to_matrix(batch.column(self.vec_col)))
        ids = batch.column(self.id_col).to_numpy()
        sims = self.q @ m.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], k - 1)[:k] if k < sims.shape[1] else np.arange(sims.shape[1])
            out_q.append(np.full(len(idx), qi, dtype=np.int64))
            out_id.append(ids[idx])
            out_sim.append(sims[qi][idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_id)),
                "sim": pa.array(np.concatenate(out_sim)),
            }
        )


def ann_topk(ds, queries: np.ndarray, k: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", concurrency=4) -> pd.DataFrame:
    """Exact global top-k per query: per-batch candidates -> driver merge of
    the tiny candidate table. Ties broken by (sim desc, id asc)."""
    cands = ds.map_batches(
        CosineTopK(queries=queries, k=k, vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency,
    ).to_pandas()
    cands = cands.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
    top = cands.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", id_col, "sim"]]


def near_dup_pairs(ds, threshold: float = 0.95, vec_col: str = "embedding",
                   id_col: str = "vec_id", block: int = 4096, concurrency=4):
    """Embedding-cosine near-dup: all (a < b) pairs with cosine >= threshold.

    Implementation: the corpus is broadcast once as the comparison side
    (valid while it fits memory — the baseline path; the LSH-bucketed
    variant in .lsh scales past that), batches stream against it."""
    import ray

    # ONE materialization for both columns — two executions could order
    # rows differently and misalign ids with vectors
    side = ds.select_columns([id_col, vec_col]).to_pandas()
    full = _norm(_to_matrix(side[vec_col]))
    all_ids = side[id_col].to_numpy()
    ref = ray.put((full, all_ids))

    class PairFinder:
        def __init__(self):
            self.m, self.ids = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bm = _norm(_to_matrix(batch.column(vec_col)))
            bids = batch.column(id_col).to_numpy()
            sims = bm @ self.m.T
            rows, cols = np.nonzero(sims >= threshold)
            a, b, s = bids[rows], self.ids[cols], sims[rows, cols]
            keep = a < b  # dedupe symmetric pairs and self-pairs
            return pa.table(
                {
                    "id_a": pa.array(a[keep].astype(np.int64)),
                    "id_b": pa.array(b[keep].astype(np.int64)),
                    "sim": pa.array(s[keep]),
                }
            )

    return ds.map_batches(PairFinder, batch_format="pyarrow", concurrency=concurrency)
