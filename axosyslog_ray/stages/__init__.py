"""Per-record transform stages (stateless map_batches functions).

Each stage is a pure `pa.Table -> pa.Table` function — unit-testable
without Ray — wrapped into the pipeline with
`ds.map_batches(fn, batch_format="pyarrow")`.
"""
