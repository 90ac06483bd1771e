"""`ray job submit` entry point for the resumable corpus-curation run.

The north-star contract: the pipeline runs unchanged on a multi-node
cluster via `ray job submit`, checkpoints per-partition lineage +
metrics, and a killed run resumes without reprocessing completed
partitions. This driver is that entry point:

    ray job submit --working-dir . -- \
        python jobs/curate_corpus_job.py \
        --input  s3://bucket/crawl/docs/   \
        --output s3://bucket/curated/v1    \
        --num-parts 256 --budget-tokens 5e9

Local smoke run (single node, the sandbox shape):

    python jobs/curate_corpus_job.py \
        --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/curated --num-parts 4

Resume semantics: partitions are a deterministic size-balanced shard of
the INPUT FILE LIST (each partition reads only its own bytes — no read
amplification; pipelines/curate_corpus.py:assign_files); finished
partitions are recorded in `<output>/_manifest/<part>.done.json` with
row counts + wall time and skipped on the next submit. Re-submitting
the SAME command after a kill is the resume.
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--input", required=True,
                    help="parquet file / directory / glob of the documents table")
    ap.add_argument("--output", required=True, help="output directory (partitioned parquet)")
    ap.add_argument("--num-parts", type=int, default=64,
                    help="resume granularity: partitions of the input file list")
    ap.add_argument("--budget-tokens", type=float, default=50_000,
                    help="per-source token budget")
    ap.add_argument("--min-words", type=int, default=10)
    ap.add_argument("--max-words", type=int, default=200_000)
    ap.add_argument("--no-dedup", action="store_true",
                    help="skip the MinHash fuzzy-dedup stage")
    args = ap.parse_args(argv)

    import ray

    # `ray job submit` provides the cluster; standalone runs auto-init
    if not ray.is_initialized():
        ray.init(address="auto" if "--address" in sys.argv else "local",
                 ignore_reinit_error=True)

    from axosyslog_ray.pipelines.curate_corpus import curate_to_parquet

    result = curate_to_parquet(
        args.input, args.output, num_parts=args.num_parts,
        dedup=not args.no_dedup, budget_tokens=args.budget_tokens,
        min_words=args.min_words, max_words=args.max_words)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
