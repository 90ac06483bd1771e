"""Distributed connected components over an edge-list Dataset.

Near-dup dedup needs TRUE components: candidate pairs from MinHash /
SimHash / n-gram Jaccard form chains (A~B, B~C but not A~C), and the
cluster representative must be the min doc over the whole chain, not
over one LSH bucket. `dedup/minhash.py` ships one round of min-label
propagation (right for its bucket-local contract); this module iterates
to the fixpoint — the HashMin / label-propagation construction from the
public MapReduce-CC literature (Rastogi et al., "Finding Connected
Components in Map-Reduce in Logarithmic Rounds"; also MMDS ch.10).

Shape per iteration (all Ray Data primitives, no driver materialization
of anything graph-sized):

1. co-locate each node's incident edges with its current label —
   ONE coarse-bucket shuffle (shuffle.bucketed_map_groups by `node`;
   hash(node) % B bounds every group at any scale);
2. inside each bucket, vectorized pandas: forward `label(v)` to every
   neighbor, keep `(v, label(v))` itself, and PRE-COMBINE with a local
   groupby-min so the reduce shuffle carries at most one row per
   (bucket, target-node);
3. global `groupby(node).min(label)` — Ray-native aggregate over the
   pre-combined rows;
4. `materialize()` the new label table (one row per node — the ONLY
   thing kept between iterations; edges are materialized once).

Labels are monotonically non-increasing (a node's own label is always a
min candidate), so the label-sum strictly decreases until the fixpoint:
convergence is detected from per-block partial sums folded into a
Python bignum on the driver (int64-safe while block_rows × max_node_id
< 2^63 — at 10^12 ids that allows ~9M-row blocks; the fold itself
cannot overflow).

Iteration count = graph diameter. Near-dup similarity graphs are
clique-ish (tiny diameters); a pathological 10^6-long chain would need
10^6 rounds — raise `max_iters` deliberately for such graphs (the
logarithmic-round variants trade extra shuffles per round for O(log n)
rounds; not worth it for dedup workloads).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SIDE = "_cc_side"


def _label_sum(labels) -> int:
    """Exact sum of the label column: per-block int64 partial sums folded
    as Python ints on the driver (streams block partials, never rows)."""

    def part(b: pa.Table) -> pa.Table:
        s = pc.sum(b.column("label"))
        return pa.table({"s": pa.array([int(s.as_py() or 0)], type=pa.int64())})

    return sum(r["s"] for r in labels.map_batches(part, batch_format="pyarrow").take_all())


def _components_numpy(und_df: pd.DataFrame, node_col: str, comp_col: str):
    """Exact CC for a BOUNDED edge table on the driver: vectorized
    hash-min with pointer doubling (np.minimum.at + lab = lab[lab]),
    O(log n) fully-vectorized rounds — no Python per-edge loop."""
    src = und_df["node"].to_numpy(dtype=np.int64)
    dst = und_df["nbr"].to_numpy(dtype=np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    lab = np.arange(len(nodes))
    while True:
        prev = lab
        new = lab.copy()
        np.minimum.at(new, di, lab[si])   # neighbor min (edges are undirected-doubled)
        new = np.minimum(new, new[new])   # pointer jump: label of label
        while True:                        # compress to fixpoint of jumps
            jumped = new[new]
            if np.array_equal(jumped, new):
                break
            new = jumped
        lab = new
        if np.array_equal(lab, prev):
            break
    import ray.data as rd

    return rd.from_arrow(pa.table({node_col: pa.array(nodes, type=pa.int64()),
                                   comp_col: pa.array(nodes[lab], type=pa.int64())}))


def connected_components(edges, src: str = "id_a", dst: str = "id_b",
                         node_col: str = "node", comp_col: str = "component",
                         num_buckets: int | None = None, max_iters: int = 64,
                         driver_threshold: int = 5_000_000):
    """(node, component) for every node appearing in `edges`, where
    component = min node id of the node's connected component.

    `edges` is a Dataset with int-typed columns `src`, `dst` (undirected;
    duplicates and self-loops are harmless — min() absorbs them). Nodes
    with no edge don't appear; union a (node, node) base in the caller if
    isolated rows must be present.

    Raises RuntimeError when `max_iters` rounds don't reach the fixpoint
    (iterations = graph diameter — see module docstring) rather than
    returning silently-wrong components.
    """
    from ..shuffle import bucketed_map_groups, default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()

    def explode(b: pa.Table) -> pa.Table:
        a = np.asarray(b.column(src).to_pandas(), dtype=np.int64)
        d = np.asarray(b.column(dst).to_pandas(), dtype=np.int64)
        return pa.table({
            "node": pa.array(np.concatenate([a, d]), type=pa.int64()),
            "nbr": pa.array(np.concatenate([d, a]), type=pa.int64()),
        })

    und = edges.map_batches(explode, batch_format="pyarrow").materialize()
    n_und = und.count()
    if n_und == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({node_col: pa.array([], pa.int64()),
                                       comp_col: pa.array([], pa.int64())}))
    if n_und <= driver_threshold:
        # bounded edge table: one driver-side vectorized solve replaces
        # O(diameter) distributed rounds whose per-round fixed cost
        # (2 exchanges + materialize) dwarfs the work at this size — the
        # same bounded-final-step justification as aggregate's
        # final="driver". The edge LIST is bounded (candidate pairs),
        # never the corpus. Raise/lower driver_threshold to taste; the
        # distributed loop below is the unbounded path.
        return _components_numpy(und.to_pandas(), node_col, comp_col)

    # labels_0(v) = min(v, neighbors(v)) — the explode already co-lists
    # every neighbor, so iteration 0 is a plain groupby-min
    labels = und.groupby("node").min("nbr").map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "label": pc.min_element_wise(b.column("node"), b.column("min(nbr)")),
        }),
        batch_format="pyarrow",
    ).materialize()

    prev = _label_sum(labels)
    for _ in range(max_iters):
        # both union sides MUST share one column layout (node, nbr, label,
        # side) — union concatenates blocks, it does not align by name
        tagged = und.map_batches(
            lambda b: pa.table({
                "node": b.column("node"), "nbr": b.column("nbr"),
                "label": pa.nulls(b.num_rows, pa.int64()),
                _SIDE: pa.array(["e"] * b.num_rows),
            }),
            batch_format="pyarrow",
        ).union(labels.map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "nbr": pa.nulls(b.num_rows, pa.int64()),
                "label": b.column("label"),
                _SIDE: pa.array(["l"] * b.num_rows),
            }),
            batch_format="pyarrow",
        ))

        def propagate(g: pd.DataFrame) -> pd.DataFrame:
            lab = g.loc[g[_SIDE] == "l", ["node", "label"]]
            e = g.loc[g[_SIDE] == "e", ["node", "nbr"]]
            fwd = e.merge(lab, on="node", how="inner")[["nbr", "label"]]
            fwd.columns = ["node", "label"]
            cand = pd.concat([lab, fwd], ignore_index=True)
            # local combine: ≤ one row per target node leaves the bucket.
            # int64 restore: the union's null-padded columns turned pandas
            # dtypes float64 (NaN), but every surviving value is integral
            out = cand.groupby("node", as_index=False)["label"].min()
            return out.astype({"node": "int64", "label": "int64"})

        new_labels = bucketed_map_groups(
            tagged, "node", propagate, num_buckets=num_buckets
        ).groupby("node").min("label").map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "label": b.column("min(label)")}),
            batch_format="pyarrow",
        ).materialize()

        cur = _label_sum(new_labels)
        labels = new_labels
        if cur == prev:
            return labels.map_batches(
                lambda b: pa.table({node_col: b.column("node"),
                                    comp_col: b.column("label")}),
                batch_format="pyarrow",
            )
        prev = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "the graph's diameter exceeds max_iters; raise it for chain-shaped graphs")


def dedup_keep_best(docs, pairs, quality_col: str = "n_chars",
                    id_col: str = "doc_id", src: str = "id_a",
                    dst: str = "id_b"):
    """Quality-aware near-dup dedup: one SURVIVOR per duplicate cluster
    — the highest-`quality_col` document (ties: smallest id), instead
    of exact-dedup's arbitrary "first". The public "keep the best copy"
    recipe (quality-ranked MinHash dedup); clusters come from
    connected_components over any candidate pair set.

    Scale shape: components output is O(duplicated docs), joined back
    by a LEFT coarse-bucket hash join on the id (docs without an edge
    are their own singleton cluster), then ONE bucketed shuffle on the
    component id with a vectorized per-group argmax — no text moves,
    only (id, quality, component) triples.

    Returns (id_col, component, quality_col) for survivors only."""
    import pyarrow as pa

    from ..join import hash_join
    from ..shuffle import bucketed_map_groups

    comp = connected_components(pairs, src=src, dst=dst)
    id_type = pa.int64()
    # hash_join joins on a shared key column; rename comp's node -> id
    comp = comp.map_batches(
        lambda b: b.rename_columns([id_col, "component"]),
        batch_format="pyarrow")
    joined = hash_join(
        docs, comp, key=id_col, how="left",
        left_schema=pa.schema([(id_col, id_type), (quality_col, id_type)]),
        right_schema=pa.schema([(id_col, id_type), ("component", id_type)]))

    def fill_singleton(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        compv = b.column("component").to_pandas()
        filled = np.where(compv.isna().to_numpy(), ids,
                          compv.fillna(0).to_numpy(dtype=np.int64))
        return b.set_column(b.column_names.index("component"), "component",
                            pa.array(filled.astype(np.int64)))

    filled = joined.map_batches(fill_singleton, batch_format="pyarrow")

    def best(g):
        s = g.sort_values([quality_col, id_col], ascending=[False, True],
                          kind="mergesort")
        return s.drop_duplicates("component", keep="first")

    out = bucketed_map_groups(filled, "component", best)
    return out.map_batches(
        lambda b: b.select([id_col, "component", quality_col]),
        batch_format="pyarrow")
