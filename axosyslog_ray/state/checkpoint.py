"""Per-partition checkpoint manifest: resumable pipeline runs.

The reference tracks delivery with per-message ACKs feeding an
ack-tracker whose bookmark is saved in persist-state so a restart
resumes exactly (reference lib/persist-state.c, persist-state.h:92-118;
lib/ack-tracker/consecutive_ack_tracker.c, batched_ack_tracker.c).

The batch-engine equivalent (SURVEY.md §3.1, §7 step 9): the input is
split into deterministic partitions; each partition's output is written
to its own directory ATOMICALLY (write to `<part>.tmp-*`, fsync, rename)
and then a `_manifest/<part>.done.json` marker records row counts +
metrics. On restart, completed partitions are skipped before any read is
scheduled — no reprocessing, no duplicates. Output layout is
`out_dir/part=<id>/*.parquet`, never one giant file.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid


class CheckpointManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def _marker(self, part_id: str) -> str:
        return os.path.join(self.manifest_dir, f"{part_id}.done.json")

    def is_done(self, part_id: str) -> bool:
        return os.path.exists(self._marker(part_id))

    def done_parts(self) -> set[str]:
        return {
            f[: -len(".done.json")]
            for f in os.listdir(self.manifest_dir)
            if f.endswith(".done.json")
        }

    def meta(self, part_id: str) -> dict | None:
        if not self.is_done(part_id):
            return None
        with open(self._marker(part_id)) as f:
            return json.load(f)

    def part_dir(self, part_id: str) -> str:
        return os.path.join(self.out_dir, f"part={part_id}")

    def mark_done(self, part_id: str, meta: dict) -> None:
        tmp = self._marker(part_id) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._marker(part_id))

    def write_partition(self, part_id: str, ds, extra_meta: dict | None = None,
                        write_kwargs: dict | None = None) -> dict:
        """Execute `ds` into this partition's directory atomically and mark
        done. Returns the recorded metadata. Idempotent: an existing done
        partition is returned untouched."""
        existing = self.meta(part_id)
        if existing is not None:
            return existing
        final = self.part_dir(part_id)
        # clear orphaned tmp dirs from a previous killed attempt
        import glob as _glob

        for stale in _glob.glob(final + ".tmp-*"):
            shutil.rmtree(stale, ignore_errors=True)
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        t0 = time.time()
        ds.write_parquet(tmp, **(write_kwargs or {}))
        import pyarrow.parquet as pq

        rows = 0
        for root, _dirs, fnames in os.walk(tmp):
            for fname in fnames:
                if fname.endswith(".parquet"):
                    rows += pq.read_metadata(os.path.join(root, fname)).num_rows
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        meta = {
            "part_id": part_id,
            "rows": rows,
            "wall_sec": round(time.time() - t0, 3),
            "completed_at": time.time(),
            **(extra_meta or {}),
        }
        self.mark_done(part_id, meta)
        return meta


def resumable_run(partition_ids: list[str], build_fn, out_dir: str, metrics_fn=None,
                  write_kwargs: dict | None = None) -> dict:
    """Run `build_fn(part_id) -> Dataset` for every partition not already
    completed; returns {part_id: meta}. Each partition internally executes
    with full-cluster parallelism, so sequential partition order costs
    nothing while giving kill-safe resume granularity."""
    ckpt = CheckpointManifest(out_dir)
    results: dict[str, dict] = {}
    for pid in partition_ids:
        if ckpt.is_done(pid):
            results[pid] = ckpt.meta(pid)
            continue
        ds = build_fn(pid)
        extra = metrics_fn(pid) if metrics_fn else None
        results[pid] = ckpt.write_partition(pid, ds, extra, write_kwargs=write_kwargs)
    return results
