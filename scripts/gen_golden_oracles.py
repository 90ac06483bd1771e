"""Regenerate the committed golden-parquet oracles for the seeded
non-SQL-expressible queries (docs_minhash_dedup, docs_simhash_clusters,
emb_lsh_ann, flagship_routes) at sf0.01 — the scale the driver's
correctness gate runs at.

These oracles are deterministic regression pins, disclosed as weaker
than an independent computation in each query's docstring; the
algorithms' semantics are independently tested in tests/ (planted-dup
recall, Jaccard verification, LSH/IVF recall vs brute force, route
logic golden fixtures).

Run after any intentional change to the seeded algorithms:
    python scripts/gen_golden_oracles.py
then re-run scripts/check_oracle.py to confirm.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = ["docs_minhash_dedup", "docs_simhash_clusters", "emb_lsh_ann", "flagship_routes",
          "docs_fingerprint_fast",
          "docs_fuzzy_dedup", "docs_hash_sample", "emb_pq_ann", "docs_cross_dedup", "emb_mmr_topk"]
SF = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    from axosyslog_ray.pipelines.queries import RAY_QUERIES

    for name in GOLDEN:
        df = RAY_QUERIES[name](SF)
        if not hasattr(df, "to_parquet"):
            df = df.to_pandas()
        path = os.path.join(OUT, f"{name}_sf001.parquet")
        df.to_parquet(path, index=False)
        print(f"wrote {path}: {len(df)} rows, cols={list(df.columns)}")


if __name__ == "__main__":
    main()
