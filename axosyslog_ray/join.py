"""Partitioned hash join for two LARGE datasets.

The reference only ever joins against broadcast-small sides
(add-contextual-data, geoip, in-list — SURVEY.md §2.7); this module adds
the big-big case a relational user expects, built portably on Ray Data
primitives: align schemas, tag each side, union, hash-shuffle by the key
ONCE (groupby), and merge each key group with a pandas join.

Scale shape: one all-to-all shuffle of both sides' projected columns —
project to needed columns BEFORE joining. A join must co-locate full
keys, so keys cannot be salted here; pre-aggregate or broadcast instead
when one side is small (pipelines/queries.customer_nation_join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SIDE_COL = "__join_side"


def _arrow_schema(ds) -> pa.Schema:
    """True Arrow schema of a Dataset — `ds.schema()` may wrap pandas
    dtypes; peeking one pyarrow batch is authoritative (streaming executor
    cancels after the first batch)."""
    for b in ds.iter_batches(batch_size=1, batch_format="pyarrow"):
        return b.schema
    # zero-row dataset: no batches stream — fall back to the declared schema
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(s.names, s.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
        else:
            try:
                fields.append(pa.field(name, pa.from_numpy_dtype(typ)))
            except (pa.ArrowNotImplementedError, TypeError):
                fields.append(pa.field(name, pa.string()))
    return pa.schema(fields)


def hash_join(left, right, key: str | list[str], how: str = "inner",
              suffixes: tuple[str, str] = ("_l", "_r")):
    """Join two Datasets on `key` (pandas merge semantics per key group)."""
    keys = [key] if isinstance(key, str) else list(key)
    lschema, rschema = _arrow_schema(left), _arrow_schema(right)
    lcols = [c for c in lschema.names if c not in keys]
    rcols = [c for c in rschema.names if c not in keys]
    overlap = set(lcols) & set(rcols)
    # output (renamed) value columns per side, with their Arrow types
    l_out = [(c + suffixes[0] if c in overlap else c, c, lschema.field(c).type) for c in lcols]
    r_out = [(c + suffixes[1] if c in overlap else c, c, rschema.field(c).type) for c in rcols]
    out_order = keys + [n for n, _, _ in l_out] + [n for n, _, _ in r_out]

    def prep(side: str):
        mine = l_out if side == "l" else r_out
        other = r_out if side == "l" else l_out

        def fn(b: pa.Table) -> pa.Table:
            cols = {k: b.column(k) for k in keys}
            for out_name, src, _typ in mine:
                cols[out_name] = b.column(src)
            for out_name, _src, typ in other:
                cols[out_name] = pa.nulls(b.num_rows, typ)
            arrays = [cols[n] for n in out_order]
            t = pa.Table.from_arrays(arrays, names=out_order)
            return t.append_column(_SIDE_COL, pa.array([side] * b.num_rows, type=pa.string()))

        return fn

    tagged = left.map_batches(prep("l"), batch_format="pyarrow").union(
        right.map_batches(prep("r"), batch_format="pyarrow")
    )
    l_names = [n for n, _, _ in l_out]
    r_names = [n for n, _, _ in r_out]

    out_types = {k: lschema.field(k).type for k in keys}
    out_types.update({n: t for n, _, t in l_out})
    out_types.update({n: t for n, _, t in r_out})

    def _to_arrow(df: pd.DataFrame) -> pa.Table:
        # the union NaN-pads the absent side, demoting ints to float —
        # rebuild each column at its declared Arrow type (NaN -> null)
        arrays = []
        for n in out_order:
            col = df[n]
            vals = col.astype(object).where(col.notna(), None).to_numpy(dtype=object)
            typ = out_types[n]
            if pa.types.is_integer(typ):
                vals = np.array([None if v is None else int(v) for v in vals], dtype=object)
            arrays.append(pa.array(vals, type=typ))
        return pa.Table.from_arrays(arrays, names=out_order)

    def merge(g: pd.DataFrame):
        lg = g[g[_SIDE_COL] == "l"][keys + l_names]
        rg = g[g[_SIDE_COL] == "r"][keys + r_names]
        if (how in ("inner", "left") and lg.empty) or (how in ("inner", "right") and rg.empty):
            return _to_arrow(pd.DataFrame({n: [] for n in out_order}))
        return _to_arrow(lg.merge(rg, on=keys, how=how))

    return tagged.groupby(keys if len(keys) > 1 else keys[0]).map_groups(merge, batch_format="pandas")
