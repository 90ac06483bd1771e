"""LSH-bucketed ANN: random-hyperplane signatures bucket the corpus so a
query only scans matching buckets — the scale path when brute force
can't stream the whole corpus per query set.

Random hyperplane LSH (Charikar 2002, public): sign bits of
`X @ planes.T` form a b-bit bucket key; cosine-close vectors collide
with high probability. Recall is tuned with `n_tables` independent
plane sets. Exact rescoring happens inside each bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .brute import _norm, _to_matrix


def _bucket_keys(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0  # (n, n_bits)
    powers = 1 << np.arange(bits.shape[1], dtype=np.int64)
    return bits @ powers


class LshBucketer:
    def __init__(self, dim: int, n_bits: int = 8, n_tables: int = 4, seed: int = 11,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        rng = np.random.RandomState(seed)
        self.planes = [rng.normal(size=(n_bits, dim)) for _ in range(n_tables)]
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _norm(_to_matrix(batch.column(self.vec_col)))
        ids = batch.column(self.id_col).to_numpy()
        out_t, out_b, out_i = [], [], []
        for t, planes in enumerate(self.planes):
            keys = _bucket_keys(m, planes)
            out_t.append(np.full(len(ids), t, dtype=np.int32))
            out_b.append(keys)
            out_i.append(ids)
        rep = len(self.planes)
        emb = pa.concat_arrays([batch.column(self.vec_col).combine_chunks()] * rep)
        return pa.table(
            {
                "table_id": pa.array(np.concatenate(out_t), type=pa.int32()),
                "bucket": pa.array(np.concatenate(out_b), type=pa.int64()),
                self.id_col: pa.array(np.concatenate(out_i)),
                self.vec_col: emb,
            }
        )


def lsh_ann_topk(ds, queries: np.ndarray, k: int = 10, n_bits: int = 8, n_tables: int = 4,
                 vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 11,
                 concurrency=4) -> pd.DataFrame:
    """Approximate top-k: corpus bucketed once; each query scans only its
    own buckets (per table), exact cosine rescoring inside."""
    qm = _norm(np.asarray(queries, dtype=np.float64))
    dim = qm.shape[1]
    bucketer = LshBucketer(dim, n_bits, n_tables, seed, vec_col, id_col)
    q_keys = [
        _bucket_keys(qm, planes) for planes in bucketer.planes
    ]  # per table: (n_queries,) bucket of each query
    wanted = {(t, int(b)) for t, keys in enumerate(q_keys) for b in keys}

    bucketed = ds.map_batches(bucketer, batch_format="pyarrow", concurrency=concurrency)

    def scan(batch: pa.Table) -> pa.Table:
        tb = batch.column("table_id").to_numpy()
        bk = batch.column("bucket").to_numpy()
        mask = np.array([(int(t), int(b)) in wanted for t, b in zip(tb, bk)])
        if not mask.any():
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        sub = batch.filter(pa.array(mask))
        m = _norm(_to_matrix(sub.column(vec_col)))
        ids = sub.column(id_col).to_numpy()
        stb = sub.column("table_id").to_numpy()
        sbk = sub.column("bucket").to_numpy()
        out_q, out_i, out_s = [], [], []
        for qi in range(qm.shape[0]):
            sel = np.zeros(len(ids), dtype=bool)
            for t in range(n_tables):
                sel |= (stb == t) & (sbk == q_keys[t][qi])
            if not sel.any():
                continue
            sims = m[sel] @ qm[qi]
            out_q.append(np.full(sel.sum(), qi, dtype=np.int64))
            out_i.append(ids[sel])
            out_s.append(sims)
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_i)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    cands = bucketed.map_batches(scan, batch_format="pyarrow").to_pandas()
    cands = cands.drop_duplicates(["query_id", id_col])
    cands = cands.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
    top = cands.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", id_col, "sim"]]
