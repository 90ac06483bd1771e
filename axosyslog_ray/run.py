"""Resumable flagship job CLI — the `ray job submit` entry point.

Runs the flagship parse -> enrich -> route -> aggregate pipeline over a
deterministic pages corpus (or existing Parquet shards) in K checkpointed
partitions: each partition's sinks land atomically under
`out/part=<k>/route=<sink>/`, a `_manifest/<k>.done.json` marker records
rows + wall time + per-sink counts, and a killed run resumes skipping
completed partitions (reference analogue: persist-state + ack-tracker
bookmarks, lib/persist-state.c, lib/ack-tracker/).

    python -m axosyslog_ray.run --out /tmp/job --rows 600000 --partitions 8
    # kill it mid-run, re-run the same command: finished partitions skip
    python -m axosyslog_ray.run --out /tmp/job --input /data/pages --partitions 8

Standalone safety: initialises Ray only if not already initialised (the
driver owns the session when imported; this CLI owns it when run directly).
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def build_partition_from_rows(part: int, partitions: int, n_rows: int, seed: int):
    from .pipelines.flagship import flagship_routed
    from .synth import pages_dataset
    import ray.data as rd

    per = (n_rows + partitions - 1) // partitions
    lo, hi = part * per, min((part + 1) * per, n_rows)
    ds = rd.range(hi - lo).map_batches(
        _ShiftedGen(seed, lo), batch_format="pyarrow", batch_size=65536
    )
    return flagship_routed(ds)


class _ShiftedGen:
    """Deterministic generator for a global row-index range [offset, ...)."""

    def __init__(self, seed: int, offset: int):
        self.seed = seed
        self.offset = offset

    def __call__(self, batch):
        from .synth import gen_pages_batch

        idx = batch.column("id").to_numpy() + self.offset
        return gen_pages_batch(idx, self.seed)


def build_partition_from_files(part: int, files_per_part: list[list[str]]):
    from .pipelines.flagship import flagship_routed
    import ray.data as rd

    return flagship_routed(rd.read_parquet(files_per_part[part]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output root (sinks + _manifest)")
    ap.add_argument("--rows", type=int, default=60000, help="synthesize this many pages (ignored with --input)")
    ap.add_argument("--input", default=None, help="existing pages parquet dir instead of synthesis")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    owned = False
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False, logging_level="ERROR")
        owned = True
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    ray.data.DataContext.get_current().enable_tensor_extension_casting = False
    # Ray's sort-groupby emits empty-schema RefBundles for empty partitions
    # on small inputs — cosmetic internal warning, silenced
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from .state.checkpoint import resumable_run

    if args.input:
        files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        per = (len(files) + args.partitions - 1) // args.partitions
        buckets = [files[i * per : (i + 1) * per] for i in range(args.partitions)]
        buckets = [b for b in buckets if b]

        def build(pid: str):
            return build_partition_from_files(int(pid), buckets)

        part_ids = [str(i) for i in range(len(buckets))]
    else:

        def build(pid: str):
            return build_partition_from_rows(int(pid), args.partitions, args.rows, args.seed)

        part_ids = [str(i) for i in range(args.partitions)]

    results = resumable_run(part_ids, build, args.out, write_kwargs={"partition_cols": ["route"]})
    total = sum(m["rows"] for m in results.values())
    print(json.dumps({"partitions": len(results), "total_rows": total,
                      "out": args.out, "parts": results}, default=str))
    if owned:
        ray.shutdown()


if __name__ == "__main__":
    main()
