"""Product-quantization ANN: compressed codes + asymmetric distances.

The classic PQ construction (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", IEEE TPAMI 2011 — public):
split each L2-normalized vector into `m` subspaces, k-means each
subspace into `k` centroids (one uint8 code per subspace at k<=256),
and score queries against codes with per-query ADC lookup tables —
an m-byte code replaces a 4*d-byte vector, the memory/IO shape that
makes a 100-TB embedding corpus scannable.

Ray shape, like ann/brute and ann/ivf: codebooks train on a BOUNDED
driver-side sample, the scan is ONE streamed map_batches pass holding
only the codebooks + queries (per-batch work: encode + table gather,
all numpy), the driver merges the tiny per-batch candidate tables.
For cosine similarity the vectors are normalized so L2^2 = 2 - 2*cos
and PQ's L2 machinery ranks identically; reported sim = 1 - d2/2.

Oracle: committed golden parquet for the seeded query
(emb_pq_ann, scripts/gen_golden_oracles.py — disclosed regression pin)
plus behavioral tests: recall floor vs brute force, and EXACT
equality when every distinct sub-vector is a codeword (PQ distances
then equal true distances).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .brute import _norm, _to_matrix


def train_pq(sample: np.ndarray, m: int = 8, k: int = 256, iters: int = 10,
             seed: int = 23) -> np.ndarray:
    """Codebooks (m, k, d//m) from k-means per subspace over a sample of
    L2-NORMALIZED vectors. Deterministic given the seed."""
    x = _norm(np.asarray(sample, dtype=np.float64))
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)
    k_eff = min(k, n)
    books = np.empty((m, k_eff, sub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * sub:(j + 1) * sub]
        cents = xs[rng.choice(n, size=k_eff, replace=False)].copy()
        for _ in range(iters):
            # L2 assignment: argmin ||xs - c||^2 = argmax (xs.c - |c|^2/2)
            scores = xs @ cents.T - 0.5 * (cents * cents).sum(axis=1)
            assign = np.argmax(scores, axis=1)
            for c in range(k_eff):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
                else:
                    cents[c] = xs[rng.randint(n)]
        books[j] = cents
    return books


def encode_pq(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8/uint16 codes for L2-normalized vectors."""
    n = len(vecs)
    m, k, sub = books.shape
    codes = np.empty((n, m), dtype=np.uint16 if k > 256 else np.uint8)
    for j in range(m):
        xs = vecs[:, j * sub:(j + 1) * sub]
        scores = xs @ books[j].T - 0.5 * (books[j] * books[j]).sum(axis=1)
        codes[:, j] = np.argmax(scores, axis=1)
    return codes


class PqScanner:
    """Streamed ADC scan: encode the batch once, score every query via
    its (m, k) distance table — one fancy-gather + row-sum per query."""

    def __init__(self, queries: np.ndarray, books: np.ndarray,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 k_per_batch: int = 64):
        q = _norm(np.asarray(queries, dtype=np.float64))
        self.books = books
        m, k, sub = books.shape
        # per-query ADC tables: squared L2 from query sub-vector to each
        # codeword, built ONCE at actor/worker construction
        self.tables = np.empty((len(q), m, k), dtype=np.float64)
        for j in range(m):
            qs = q[:, j * sub:(j + 1) * sub]
            diff = qs[:, None, :] - books[j][None, :, :]
            self.tables[:, j, :] = (diff * diff).sum(axis=2)
        self.vec_col = vec_col
        self.id_col = id_col
        self.k_per_batch = k_per_batch
        self._m_idx = np.arange(m)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _norm(_to_matrix(batch.column(self.vec_col)))
        ids = batch.column(self.id_col).to_numpy()
        codes = encode_pq(vecs, self.books)
        out_q, out_id, out_sim = [], [], []
        kk = min(self.k_per_batch, len(ids))
        for qi in range(len(self.tables)):
            d2 = self.tables[qi][self._m_idx, codes].sum(axis=1)
            idx = np.argpartition(d2, kk - 1)[:kk] if kk < len(d2) else np.arange(len(d2))
            out_q.append(np.full(len(idx), qi, dtype=np.int64))
            out_id.append(ids[idx])
            out_sim.append(1.0 - d2[idx] / 2.0)  # L2^2 on unit vectors -> cos
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            self.id_col: pa.array(np.concatenate(out_id)),
            "sim": pa.array(np.concatenate(out_sim)),
        })


def pq_ann_topk(ds, queries: np.ndarray, k: int = 10, m: int = 8, n_codes: int = 256,
                train_sample: int = 4096, vec_col: str = "embedding",
                id_col: str = "vec_id", seed: int = 23,
                concurrency=None) -> pd.DataFrame:
    """Approximate top-k via PQ codes: bounded driver-side training, one
    streamed encode+scan pass, tiny candidate merge. Ties broken by
    (sim desc, id asc) like ann_topk."""
    sample_tbl = pa.concat_tables(
        ds.limit(train_sample).iter_batches(batch_size=train_sample,
                                            batch_format="pyarrow"),
        promote_options="permissive",
    )
    books = train_pq(_to_matrix(sample_tbl.column(vec_col)), m=m, k=n_codes,
                     seed=seed)
    scanner = PqScanner(queries, books, vec_col=vec_col, id_col=id_col)
    kwargs = {"concurrency": concurrency} if concurrency else {}
    cands = ds.map_batches(scanner, batch_format="pyarrow", **kwargs).to_pandas()
    cands = cands.sort_values(["query_id", "sim", id_col],
                              ascending=[True, False, True])
    top = cands.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", id_col, "sim"]]
