#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default mode: one JSON line
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "headline": {rows, gigabytes, rows_per_sec, gb_per_sec, sink_counts}}

Headline pipeline = the flagship parse -> enrich -> route -> aggregate job
over a deterministic Common-Crawl-style pages corpus (BASELINE.json
input_hint) sized from $GRAFT_SF_DIR's documents table (x120), cached as
Parquet shards under /tmp. Generation is NOT part of the timed window;
one untimed read warms the page cache first.

--scaling: runs this script twice in FRESH processes at num_cpus=N and
num_cpus=4N (default 4 -> 16; BENCH_SCALE_LO overrides) on the same
input and reports both throughputs plus efficiency = thr_4N / (4*thr_N)
(the N vs 4N cluster-size proxy — BASELINE.md protocol; 4->16 rather
than 8->32 because 30+ workers on this single socket saturate DRAM
bandwidth, a confound a real 4x-node cluster does not have — each node
brings its own memory).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_MULT = int(os.environ.get("BENCH_PAGES_MULT", "120"))
HTML_PAD = 256


def pages_cache_dir(n_rows: int) -> str:
    return f"/tmp/axoray_bench/pages_n{n_rows}_p{HTML_PAD}"


def ensure_pages(n_rows: int) -> tuple[str, float]:
    """Generate (once) the cached pages corpus; returns (dir, payload GB)."""
    from axosyslog_ray.synth import write_pages

    out = pages_cache_dir(n_rows)
    meta_path = os.path.join(out, "_meta.json")
    if not os.path.exists(meta_path):
        write_pages(out, n_rows, html_pad=HTML_PAD, shards=32)
        import glob

        import pyarrow.parquet as pq

        total = 0
        for f in glob.glob(os.path.join(out, "*.parquet")):
            # GB/s denominator = bytes the pipeline actually reads and
            # parses (the pruned column set; html never leaves storage)
            t = pq.read_table(f, columns=["url", "warc_ts", "text", "lang"])
            total += sum(t.column(c).nbytes for c in t.column_names)
        with open(meta_path, "w") as fh:
            json.dump({"n_rows": n_rows, "payload_bytes": total}, fh)
    with open(meta_path) as fh:
        meta = json.load(fh)
    return out, meta["payload_bytes"] / 1e9


def sink_min_rows_per_file(n_rows: int) -> int:
    """Target ~2 output files per write slot, floored so files never get
    tiny: big corpora get the full 150k-row (~10-30MB) files, the 600k-row
    bench corpus gets ~25k-row files instead of coalescing 32 write tasks
    down to 4 (which serialized the write at small scale). At 100 TB the
    same knob targets ~256MB files via the 150k cap being raised."""
    return max(25_000, min(150_000, n_rows // (2 * NUM_CPUS)))


def run_headline(pages_dir: str, out_dir: str) -> dict:
    import glob

    import ray.data as rd

    from axosyslog_ray.pipelines.flagship import flagship_routed

    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    with open(os.path.join(pages_dir, "_meta.json")) as fh:
        routed_rows = json.load(fh)["n_rows"]
    # prune at the read: the fused stage parses `text` and carries
    # url/warc_ts/lang to the sinks — `html` (half the payload) is never
    # touched, so it must not leave storage (brief: "a read that loads
    # all columns for a 2-column transform is wrong"). The reported GB/s
    # counts the bytes the pipeline actually processes (text payload).
    ds = rd.read_parquet(files, columns=["url", "warc_ts", "text", "lang"])
    routed = flagship_routed(ds)
    t_w = time.time()
    # One streaming execution produces BOTH the partitioned sinks and the
    # (route, host) aggregate: RoutedParquetDatasink write tasks return
    # their partial counts (Arrow hash aggregate per bundle, bounded
    # cardinality) and the driver merges them — the reference's
    # count-as-you-write stats counters (lib/logwriter.c), and no second
    # read-back pipeline execution (its ~2s driver fixed cost is flat in
    # CPU count and capped measured scaling efficiency — BASELINE.md).
    # min_rows_per_file keeps sink files sized (not one per block/route).
    from axosyslog_ray.sinks import RoutedParquetDatasink

    sink = RoutedParquetDatasink(out_dir, partition_col="route",
                                 count_cols=("route", "host"),
                                 min_rows_per_file=sink_min_rows_per_file(routed_rows))
    routed.write_datasink(sink)
    if os.environ.get("BENCH_DEBUG"):
        print(f"# write+agg phase: {time.time() - t_w:.1f}s", file=sys.stderr)
    sink_counts = sink.counts.groupby("route")["n"].sum().to_dict()
    return {"sink_counts": {k: int(v) for k, v in sink_counts.items()}}


def warmup(pages_dir: str) -> None:
    """Untimed mini-run of the same pipeline: spawns worker processes,
    imports the package in them, exercises actor construction — so the
    timed window measures the pipeline, not cold-start."""
    import glob

    import ray.data as rd

    from axosyslog_ray.pipelines.flagship import flagship_routed

    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))[:2]
    flagship_routed(rd.read_parquet(files)).count()


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    ray.data.DataContext.get_current().enable_tensor_extension_casting = False
    # Small-scale block sizing: Ray's default read_op_min_num_blocks=200
    # shreds the bench corpora into ~2.7k-row blocks and the driver's
    # per-block scheduling dominates wall time (measured 2-5x on the
    # headline). 2 blocks/CPU keeps all cores busy with far fewer driver
    # round-trips; inert at 100-TB scale (see axosyslog_ray/context.py).
    from axosyslog_ray.context import tune_read_blocks

    tune_read_blocks(NUM_CPUS)
    # Ray's sort-groupby emits empty-schema RefBundles for empty partitions
    # on small inputs — cosmetic internal warning, silenced
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(os.path.join(SF_DIR, "documents.parquet")).num_rows
    n_rows = n_docs * PAGES_MULT
    pages_dir, payload_gb = ensure_pages(n_rows)

    # warm page cache (untimed)
    import glob

    for f in glob.glob(os.path.join(pages_dir, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    import shutil

    out_dir = f"/tmp/axoray_bench/sinks_{NUM_CPUS}"
    warmup(pages_dir)
    # two timed runs; report the second (steady-state — the first still
    # pays residual worker-pool ramp; both runs recorded for transparency)
    runs = []
    extra = {}
    for _ in range(2):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        extra = run_headline(pages_dir, out_dir)
        runs.append(round(time.time() - t0, 3))
    headline_sec = runs[-1]

    queries: dict[str, float] = {}
    if os.environ.get("BENCH_SKIP_QUERIES", "0") != "1":
        from axosyslog_ray.pipelines.queries import RAY_QUERIES

        for name, fn in RAY_QUERIES.items():
            tq = time.time()
            try:
                r = fn(SF_DIR)
                if hasattr(r, "to_pandas"):
                    r.to_pandas()
                queries[name] = round(time.time() - tq, 3)
            except Exception as e:  # a failing query must not kill the bench
                queries[name] = -1.0
                print(f"# query {name} failed: {e}", file=sys.stderr)

    result = {
        "metric": "flagship parse->enrich->route->aggregate wall time",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "headline": {
            "rows": n_rows,
            "runs": runs,
            "gigabytes": round(payload_gb, 3),
            "rows_per_sec": round(n_rows / headline_sec, 1),
            "gb_per_sec": round(payload_gb / headline_sec, 4),
            **extra,
        },
    }
    ray.shutdown()
    print(json.dumps(result))


def scaling() -> None:
    """Fresh-process runs at N and 4N CPUs (cluster-size proxy; default
    4 -> 16, see BASELINE.md for the DRAM-saturation rationale). Uses a
    large corpus (x1920 docs ~ 9.6M pages at sf0.1) so compute dominates
    the ~2s per-execution fixed cost (driver scheduling + the read-back
    aggregate's second pipeline execution), which a long-running 100-TB
    job amortizes to nothing but which caps the measured ratio on short
    runs (measured: 4.8M pages -> eff 0.71-0.73, 9.6M -> 0.80; phase
    decomposition in BASELINE.md). Runs PAIRED repetitions reporting the
    median ratio — short runs are noise-sensitive and independent minima
    bias the ratio."""
    mult = os.environ.get("BENCH_PAGES_MULT", "1920")

    def _int_env(name: str, default: int, lo_ok: int, hi_ok: int) -> int:
        raw = os.environ.get(name, str(default))
        try:
            v = int(raw)
        except ValueError:
            sys.exit(f"bench: {name}={raw!r} is not an integer")
        if not (lo_ok <= v <= hi_ok):
            sys.exit(f"bench: {name}={v} out of range [{lo_ok}, {hi_ok}]")
        return v

    reps = _int_env("BENCH_SCALE_REPS", 3, 1, 10)
    lo = _int_env("BENCH_SCALE_LO", 4, 1, 16)
    hi = lo * 4

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_SKIP_QUERIES="1",
                   BENCH_PAGES_MULT=mult)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    pairs = []
    for _ in range(reps):
        r_lo, r_hi = one(lo), one(hi)
        pairs.append((r_lo["value"] / (4 * r_hi["value"]), r_lo, r_hi))
    pairs.sort(key=lambda p: p[0])
    all_ratios = [round(p[0], 3) for p in pairs]
    _, med_lo, med_hi = pairs[len(pairs) // 2]
    results = {lo: med_lo, hi: med_hi}
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    thr_lo = results[lo]["headline"]["rows_per_sec"]
    thr_hi = results[hi]["headline"]["rows_per_sec"]
    eff = thr_hi / (4 * thr_lo)
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency (num_cpus {lo} -> {hi}, N vs 4N proxy)",
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                f"rows_per_sec_{lo}": thr_lo,
                f"rows_per_sec_{hi}": thr_hi,
                "scaling_efficiency": round(eff, 3),
                "pair_ratios": all_ratios,  # per-rep spread — this VM drifts ±20-30% (BASELINE.md)
                "pass": eff >= 0.8,
                "sink_counts_match": results[lo]["headline"]["sink_counts"] == results[hi]["headline"]["sink_counts"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
