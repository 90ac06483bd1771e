"""Config-driven job CLI: run a syslog-ng-style .conf over Parquet.

    python -m axosyslog_ray.run_config --config app.conf --source s_file \\
        --input /data/logs/*.parquet --output /tmp/out

Compiles the config (axosyslog_ray/config.py), streams the input
Dataset through its log paths (one map_batches stage; per-row
multiplexer semantics), writes delivered rows hive-partitioned by
destination, and prints per-destination counts as one JSON line — the
reference's destination stats counters, computed from the written
partitions' metadata rather than a driver collect.

With no --input, the config's own source drivers build the table
in-memory (the functional-test shape) — use --input for real corpora.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="path to the .conf file")
    ap.add_argument("--source", required=True, help="config source name to feed")
    ap.add_argument("--input", default=None,
                    help="parquet path/glob; omit to use the config's source drivers")
    ap.add_argument("--output", required=True, help="output dir (hive: dest=<name>/)")
    ap.add_argument("--text-col", default=None,
                    help="rename this input column to 'message' for the pipeline")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    import pyarrow as pa
    import ray.data as rd

    from .config import compile_config, run_config_on_dataset
    from .sinks import RoutedParquetDatasink

    cfg = compile_config(open(args.config).read())
    if args.input:
        ds = rd.read_parquet(args.input)
        if args.text_col and args.text_col != "message":
            src_col = args.text_col

            def rename(b: pa.Table) -> pa.Table:
                i = b.column_names.index(src_col)
                return b.set_column(i, "message", b.column(src_col))

            ds = ds.map_batches(rename, batch_format="pyarrow")
    else:
        tbl = cfg._source_table(args.source, {})
        ds = rd.from_arrow(tbl.drop_columns(
            [c for c in tbl.column_names if c.startswith("__cfg")]))

    out = run_config_on_dataset(cfg, ds, args.source)
    sink = RoutedParquetDatasink(args.output, partition_col="dest",
                                 count_cols=("dest",))
    out.write_datasink(sink)
    counts = {row["dest"]: int(row["n"]) for _, row in sink.counts.iterrows()}
    result = {"output": args.output, "processed": counts}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
