"""`ray job submit` entry point for the flagship parse -> enrich ->
route -> aggregate pipeline over Common-Crawl-style page parquet.

The north-star contract: the same code runs unchanged on an N-node or
4N-node cluster; a killed run resumes without reprocessing completed
partitions. Usage:

    ray job submit --working-dir . -- \
        python jobs/flagship_job.py \
        --input  s3://bucket/crawl/pages/ \
        --output s3://bucket/routed/v1 \
        --num-parts 256

Local smoke run (single node, the sandbox shape):

    python jobs/flagship_job.py --input /tmp/pages \
        --output /tmp/routed --num-parts 4

Resume semantics (the curate_corpus_job contract): partitions are a
deterministic size-balanced shard of the INPUT FILE LIST
(pipelines/curate_corpus.assign_files — each partition reads only its
own bytes, no read amplification); finished partitions record
`<output>/_manifest/<part>.done.json` with per-sink routed counts and
are skipped on re-submit. The per-partition output directory is
`<output>/part=<k>/<route>/...parquet`, so downstream consumers read
`<output>/part=*/<route>/` per route.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def _files_with_sizes(pattern: str) -> list[tuple[str, int]]:
    if os.path.isdir(pattern):
        pattern = os.path.join(pattern, "*.parquet")
    return [(f, os.path.getsize(f)) for f in sorted(glob.glob(pattern))]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--input", required=True,
                    help="pages parquet file / directory / glob")
    ap.add_argument("--output", required=True,
                    help="output root (per-partition routed parquet)")
    ap.add_argument("--num-parts", type=int, default=64)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False)
    import ray.data as rd

    from axosyslog_ray.pipelines.curate_corpus import assign_files
    from axosyslog_ray.pipelines.flagship import flagship_routed
    from axosyslog_ray.sinks import RoutedParquetDatasink

    files = _files_with_sizes(args.input)
    if not files:
        print(f"no input files match {args.input!r}", file=sys.stderr)
        return 2
    parts = assign_files(files, args.num_parts)
    manifest_dir = os.path.join(args.output, "_manifest")
    os.makedirs(manifest_dir, exist_ok=True)

    done = skipped = 0
    totals: dict[str, int] = {}
    for k, part_files in enumerate(parts):
        if not part_files:
            continue
        marker = os.path.join(manifest_dir, f"{k}.done.json")
        if os.path.exists(marker):
            skipped += 1
            with open(marker) as fh:
                for route, n in json.load(fh)["sink_counts"].items():
                    totals[route] = totals.get(route, 0) + n
            continue
        t0 = time.time()
        ds = rd.read_parquet(part_files,
                             columns=["url", "warc_ts", "text", "lang"])
        routed = flagship_routed(ds)
        sink = RoutedParquetDatasink(os.path.join(args.output, f"part={k}"),
                                     partition_col="route",
                                     count_cols=("route",))
        routed.write_datasink(sink)
        counts = ({r: int(n) for r, n in
                   sink.counts.groupby("route")["n"].sum().items()}
                  if sink.counts is not None else {})
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"part": k, "files": part_files,
                       "sink_counts": counts,
                       "sec": round(time.time() - t0, 3)}, fh)
        os.replace(tmp, marker)  # atomic: a kill mid-write never
        done += 1                # records a half-finished partition
        for route, n in counts.items():
            totals[route] = totals.get(route, 0) + n

    print(json.dumps({"partitions_run": done, "partitions_skipped": skipped,
                      "sink_counts": totals}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
