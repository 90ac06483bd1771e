"""Maximal Marginal Relevance diversified top-k.

MMR (Carbonell & Goldstein, SIGIR 1998 — public method) re-ranks a
retrieval candidate pool to trade off relevance against redundancy:

    next = argmax_{d in pool}  lam * sim(d, q)
                               - (1 - lam) * max_{s in selected} sim(d, s)

lam=1 is plain relevance top-k; smaller lam forces the selected set
apart — the standard fix for "my top-10 nearest neighbors are 10 copies
of the same document" in dedup-light corpora and RAG retrieval.

Ray-native shape: candidate generation is the DISTRIBUTED part
(ann.brute.ann_topk's per-batch scan + tiny driver merge, or the
LSH/IVF scanners for the sub-linear path — pool size C is a bounded
constant like k); the greedy re-rank is O(C^2) on C<=a few hundred
vectors and runs on the driver, which is the honest layout — the greedy
loop is inherently sequential (each pick depends on all prior picks),
and shipping a C-row pool is cheaper than any distributed protocol for
it. Deterministic: ties broken by (score desc, id asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def mmr_select(cand_vecs: np.ndarray, cand_ids: np.ndarray, rel: np.ndarray,
               k: int, lam: float = 0.7) -> pd.DataFrame:
    """Greedy MMR over an in-memory candidate pool.

    cand_vecs: (C, d) float array; rel: (C,) relevance scores (e.g.
    cosine sim to the query); returns (rank, id, sim, mmr_score) rows,
    rank 1..min(k, C). Vectors are L2-normalized here so the
    redundancy term is cosine similarity."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    C = len(cand_ids)
    if C == 0:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                             "id": pd.Series([], dtype=cand_ids.dtype if hasattr(cand_ids, "dtype") else "int64"),
                             "sim": pd.Series([], dtype="float64"),
                             "mmr_score": pd.Series([], dtype="float64")})
    v = np.asarray(cand_vecs, dtype=np.float64)
    norms = np.linalg.norm(v, axis=1)
    norms[norms == 0] = 1.0
    v = v / norms[:, None]
    rel = np.asarray(rel, dtype=np.float64)
    k = min(k, C)
    selected: list[int] = []
    max_red = np.full(C, -np.inf)  # max sim to any selected item
    picked = np.zeros(C, dtype=bool)
    ranks, scores = [], []
    for _ in range(k):
        red = np.where(np.isinf(max_red), 0.0, max_red)  # empty set -> 0
        score = lam * rel - (1.0 - lam) * red
        score[picked] = -np.inf
        # deterministic: highest score, then smallest id
        best = np.lexsort((cand_ids, -score))[0]
        picked[best] = True
        selected.append(best)
        scores.append(score[best])
        sims_to_best = v @ v[best]
        max_red = np.maximum(max_red, sims_to_best)
    sel = np.array(selected)
    return pd.DataFrame({
        "rank": np.arange(1, k + 1, dtype=np.int64),
        "id": cand_ids[sel],
        "sim": rel[sel],
        "mmr_score": np.array(scores),
    })


def mmr_topk(ds, query: np.ndarray, k: int = 10, pool: int = 50,
             lam: float = 0.7, vec_col: str = "embedding",
             id_col: str = "vec_id") -> pd.DataFrame:
    """Diversified top-k over a Dataset embedding column: distributed
    brute-force cosine top-`pool` candidate scan (ann.brute), then the
    driver-side greedy MMR re-rank over the bounded pool. Returns
    (rank, vec_id, sim, mmr_score); lam=1.0 reproduces ann_topk's
    ordering exactly (pinned in tests/test_mmr.py)."""
    from .brute import ann_topk

    q = np.asarray(query, dtype=np.float64).reshape(1, -1)
    cands = ann_topk(ds, q, k=pool, vec_col=vec_col, id_col=id_col)
    ids = cands[id_col].to_numpy()
    rel = cands["sim"].to_numpy()
    # bounded re-read of just the pool's vectors (is_in-pruned scan of
    # the id + vector columns, C surviving rows)
    import pyarrow as pa_
    import pyarrow.compute as pc_

    idset = pa_.array(sorted(ids.tolist()))

    def keep(b):
        t = b.select([id_col, vec_col])
        return t.filter(pc_.is_in(t.column(id_col), value_set=idset))

    pool_tbl = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    vec_by_id = dict(zip(pool_tbl[id_col], pool_tbl[vec_col]))
    vecs = np.stack([np.asarray(vec_by_id[i], dtype=np.float64) for i in ids])
    out = mmr_select(vecs, ids, rel, k=k, lam=lam)
    return out.rename(columns={"id": id_col})
