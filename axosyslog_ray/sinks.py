"""Concrete destination drivers (threaded-dest parity).

The reference's program()/http()/sql()/kafka() destinations are
threaded writer drivers (reference modules/afprog/afprog.c one child
process per writer, modules/http/http-worker.c batched POSTs with
retry, modules/afsql/afsql.c serialized INSERT writer thread,
modules/kafka/kafka-dest-worker.c partition-keyed producer batches).
Here each is a `ray.data.Datasink` — the idiomatic Ray Data write path:
one `write()` per task (the analogue of a writer thread, running with
streaming backpressure), plus a driver-side `on_write_complete`
finalize where the reference serializes (SQL transaction commit).

Sandbox honesty: there is no network and no JVM/kafka in this
container. The HTTP and Kafka sinks take an injectable transport /
producer factory — the default HTTP transport is a real urllib POST
(usable where a network exists), the default Kafka factory raises
NotImplementedError naming the missing dependency; batching, framing,
key partitioning and retry plumbing are real and tested with collector
transports.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from ray.data import Datasink


def _to_tables(blocks) -> list[pa.Table]:
    import pandas as pd

    out = []
    for b in blocks:
        if isinstance(b, pd.DataFrame):
            b = pa.Table.from_pandas(b, preserve_index=False)
        if b.num_rows:
            out.append(b)
    return out


def _format_lines(t: pa.Table, template) -> list[str]:
    if template is None:
        cols = t.column_names
        rows = t.to_pylist()
        return [json.dumps({c: r[c] for c in cols}, default=str) for r in rows]
    from .functions.templates import Template

    tpl = template if isinstance(template, Template) else Template(template)
    return tpl.eval(t).tolist()


class RoutedParquetDatasink(Datasink):
    """file() destination: hive-partitioned parquet fan-out with the
    per-sink counters FUSED into the write tasks.

    The reference keeps per-destination processed counters as it writes
    (lib/logwriter.c stats counters) rather than re-reading its sinks;
    same shape here: each write task writes root/<col>=<val>/*.parquet
    for its bundle and RETURNS its (count_cols) partial counts — bounded
    cardinality, an Arrow C++ hash aggregate per bundle — and
    `on_write_complete` merges the partials on the driver. One streaming
    execution produces both the sinks and the aggregate; the alternative
    (write, then a read-back aggregate pipeline) pays a second
    execution's driver-side fixed cost, which is flat in CPU count and
    caps measured scaling efficiency on short runs (BASELINE.md phase
    decomposition).

    `min_rows_per_write` makes Ray bundle at least that many rows per
    write() call, so output files stay sized (~one file per partition
    value per bundle) — never one tiny file per block."""

    def __init__(self, root: str, partition_col: str = "route",
                 count_cols: tuple[str, ...] = ("route", "host"),
                 min_rows_per_file: int = 100_000):
        self.root = root
        self.partition_col = partition_col
        self.count_cols = list(count_cols)
        self._min_rows = min_rows_per_file
        self.counts = None  # pandas (count_cols..., n) after on_write_complete

    @property
    def min_rows_per_write(self) -> int:
        return self._min_rows

    def on_write_start(self):
        os.makedirs(self.root, exist_ok=True)

    def write(self, blocks, ctx):
        import pyarrow.compute as pc

        tables = _to_tables(blocks)
        if not tables:
            return []
        t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        agg = t.select(self.count_cols).group_by(self.count_cols).aggregate([([], "count_all")])
        # deterministic filenames (task_idx + per-task write sequence, no
        # uuid): a retried write task regenerates the SAME names and
        # overwrites its failed attempt's partial files instead of
        # duplicating rows beside them (Ray's FilenameProvider contract)
        seq = self._write_seq = getattr(self, "_write_seq", -1) + 1
        # ONE sort + contiguous slices per partition value — O(n log n)
        # regardless of partition cardinality (a filter per distinct value
        # re-scans the whole bundle each time: quadratic-ish when a user
        # partitions by a high-cardinality column)
        import numpy as np
        import pandas as pd

        order = pc.sort_indices(t.column(self.partition_col))
        ts = t.take(order)
        kn = ts.column(self.partition_col).to_numpy(zero_copy_only=False)
        n = len(kn)
        isnull = pd.isna(kn)
        change = np.empty(n, dtype=bool)
        change[0] = True
        # nulls sort together; None != None would split them row-per-row
        change[1:] = (kn[1:] != kn[:-1]) & ~(isnull[1:] & isnull[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        body = ts.drop_columns([self.partition_col])
        for s, e in zip(starts, ends):
            if isnull[s]:
                # the hive null-dir name (read_parquet restores it as null)
                d = os.path.join(self.root, f"{self.partition_col}=__HIVE_DEFAULT_PARTITION__")
            else:
                d = os.path.join(self.root, f"{self.partition_col}={kn[s]}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                body.slice(s, e - s),
                os.path.join(d, f"part_{ctx.task_idx:05d}_{seq:04d}.parquet"),
            )
        cols = [agg.column(c).to_pylist() for c in (*self.count_cols, "count_all")]
        return list(zip(*cols))

    def on_write_complete(self, write_result):
        import pandas as pd

        rows = [r for ret in write_result.write_returns for r in (ret or [])]
        df = pd.DataFrame(rows, columns=[*self.count_cols, "n"])
        # dropna=False: null group keys are real sinks (e.g. messages with
        # no host) — pandas' default silently drops them, Arrow's doesn't
        self.counts = (
            df.groupby(self.count_cols, as_index=False, dropna=False)["n"].sum() if len(df) else df
        )

    def get_name(self):
        return f"RoutedParquet({self.root})"


class TemplatedTextDatasink(Datasink):
    """file() destination in its LITERAL form: rendered template lines
    appended to per-partition .log text files — byte-parity with the
    reference's file() output (template + "\n" per message,
    lib/logwriter.c write path), where RoutedParquetDatasink is the
    columnar-analytics form.

    Layout: root/<partition>=<val>/part_<task>_<seq>.log (or flat
    part_*.log files without a partition column) — many files per sink,
    never one giant file, deterministic names so a retried task
    overwrites its own partial output. Returns per-partition line
    counts merged on the driver like the parquet sink."""

    def __init__(self, root: str, template=None, partition_col: str | None = None):
        self.root = root
        self.template = template
        self.partition_col = partition_col
        self.counts = None

    def on_write_start(self):
        os.makedirs(self.root, exist_ok=True)

    def _write_lines(self, path: str, t: pa.Table):
        lines = _format_lines(t, self.template)
        with open(path, "w", encoding="utf-8", newline="") as f:
            for ln in lines:
                f.write(ln if ln.endswith("\n") else ln + "\n")
        return len(lines)

    def write(self, blocks, ctx):
        import numpy as np
        import pandas as pd
        import pyarrow.compute as pc

        tables = _to_tables(blocks)
        if not tables:
            return []
        t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        seq = self._write_seq = getattr(self, "_write_seq", -1) + 1
        if self.partition_col is None:
            n = self._write_lines(
                os.path.join(self.root, f"part_{ctx.task_idx:05d}_{seq:04d}.log"), t)
            return [(None, n)]
        order = pc.sort_indices(t.column(self.partition_col))
        ts = t.take(order)
        kn = ts.column(self.partition_col).to_numpy(zero_copy_only=False)
        n = len(kn)
        isnull = pd.isna(kn)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (kn[1:] != kn[:-1]) & ~(isnull[1:] & isnull[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        out = []
        for s, e in zip(starts, ends):
            val = "__NULL__" if isnull[s] else str(kn[s])
            d = os.path.join(self.root, f"{self.partition_col}={val}")
            os.makedirs(d, exist_ok=True)
            c = self._write_lines(
                os.path.join(d, f"part_{ctx.task_idx:05d}_{seq:04d}.log"),
                ts.slice(s, e - s))
            out.append((val, c))
        return out

    def on_write_complete(self, write_result):
        import pandas as pd

        rows = [r for ret in write_result.write_returns for r in (ret or [])]
        df = pd.DataFrame(rows, columns=["partition", "n"])
        self.counts = (df.groupby("partition", as_index=False, dropna=False)["n"].sum()
                       if len(df) else df)

    def get_name(self):
        return "TemplatedText"


class ProgramDatasink(Datasink):
    """program() destination: each write task spawns the child command
    ONCE (afprog.c keeps one child per writer) and streams formatted
    lines into its stdin. `argv` may contain '{shard}' which expands to a
    unique per-task id so concurrent writers don't collide."""

    def __init__(self, argv: list[str], template=None):
        self.argv = list(argv)
        self.template = template

    def write(self, blocks, ctx):
        import subprocess

        shard = f"{ctx.task_idx:05d}_{uuid.uuid4().hex[:6]}"
        argv = [a.replace("{shard}", shard) for a in self.argv]
        proc = subprocess.Popen(argv, stdin=subprocess.PIPE,
                                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        n = 0
        try:
            # A child that dies mid-stream surfaces as BrokenPipeError on
            # write/close — that IS the failure signal (afprog.c treats a
            # dead child as destination error); report its exit status
            # instead of the raw pipe error.
            try:
                for t in _to_tables(blocks):
                    payload = ("\n".join(_format_lines(t, self.template)) + "\n").encode()
                    proc.stdin.write(payload)
                    n += t.num_rows
                proc.stdin.close()
            except BrokenPipeError:
                pass
            rc = proc.wait(timeout=60)
        except Exception:
            proc.kill()
            raise
        if rc != 0:
            raise RuntimeError(f"program() child {argv!r} exited {rc}")
        return {"rows": n}

    def get_name(self):
        return f"Program({os.path.basename(self.argv[0])})"


class HttpDatasink(Datasink):
    """http() destination: body-batched POSTs with bounded retry
    (http-worker.c batch-lines + backoff). `transport(url, payload_bytes,
    headers)` is injectable; the default uses urllib (real network)."""

    def __init__(self, url: str, template=None, batch_lines: int = 512,
                 retries: int = 3, backoff_sec: float = 0.1, transport=None,
                 headers: dict | None = None):
        if retries < 1:
            raise ValueError("retries is the total attempt count; must be >= 1")
        self.url = url
        self.template = template
        self.batch_lines = batch_lines
        self.retries = retries
        self.backoff_sec = backoff_sec
        self.headers = headers or {"Content-Type": "application/x-ndjson"}
        self.transport = transport or _urllib_post

    def write(self, blocks, ctx):
        n_rows = n_posts = 0
        for t in _to_tables(blocks):
            lines = _format_lines(t, self.template)
            for i in range(0, len(lines), self.batch_lines):
                payload = ("\n".join(lines[i : i + self.batch_lines]) + "\n").encode()
                last_err = None
                for attempt in range(self.retries):
                    try:
                        self.transport(self.url, payload, self.headers)
                        last_err = None
                        break
                    except Exception as e:  # noqa: BLE001 — retry any transport error
                        last_err = e
                        if attempt + 1 < self.retries:  # no backoff after the final attempt
                            time.sleep(self.backoff_sec * (2**attempt))
                if last_err is not None:
                    raise RuntimeError(f"http() POST failed after {self.retries} tries: {last_err}")
                n_posts += 1
            n_rows += t.num_rows
        return {"rows": n_rows, "posts": n_posts}

    def get_name(self):
        return "Http"


def _urllib_post(url: str, payload: bytes, headers: dict) -> None:
    import urllib.request

    req = urllib.request.Request(url, data=payload, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        if resp.status >= 300:
            raise RuntimeError(f"HTTP {resp.status}")


class SqlDatasink(Datasink):
    """sql() destination via DuckDB. Write tasks stage their blocks as
    parquet shards (fully parallel, any node); `on_write_complete` loads
    every shard into the target table in ONE transaction on the driver —
    the same serialization point as the reference's single SQL writer
    thread (afsql.c), but the expensive formatting/IO stays distributed."""

    def __init__(self, db_path: str, table: str, staging_dir: str | None = None,
                 mode: str = "append"):
        if mode not in ("append", "overwrite"):
            raise ValueError("mode must be append|overwrite")
        self.db_path = db_path
        self.table = table
        self.staging_dir = staging_dir or (db_path + ".staging")
        self.mode = mode

    def on_write_start(self):
        os.makedirs(self.staging_dir, exist_ok=True)

    def write(self, blocks, ctx):
        paths, n = [], 0
        for t in _to_tables(blocks):
            p = os.path.join(self.staging_dir, f"stage_{ctx.task_idx:05d}_{uuid.uuid4().hex[:8]}.parquet")
            pq.write_table(t, p)
            paths.append(p)
            n += t.num_rows
        return {"rows": n, "paths": paths}

    def on_write_complete(self, write_result):
        import duckdb

        # ONLY the shards this run's write tasks returned — a glob would
        # also import stale shards left by a crashed earlier run or a
        # concurrent sink sharing the staging dir
        files = sorted(p for ret in write_result.write_returns for p in ret.get("paths", []))
        if not files:
            return
        con = duckdb.connect(self.db_path)
        try:
            con.execute("BEGIN")
            file_list = ", ".join(f"'{f}'" for f in files)
            if self.mode == "overwrite":
                con.execute(f"CREATE OR REPLACE TABLE {self.table} AS SELECT * FROM read_parquet([{file_list}])")
            else:
                con.execute(
                    f"CREATE TABLE IF NOT EXISTS {self.table} AS SELECT * FROM read_parquet([{file_list}]) LIMIT 0")
                con.execute(f"INSERT INTO {self.table} SELECT * FROM read_parquet([{file_list}])")
            con.execute("COMMIT")
        finally:
            con.close()
        for f in files:
            os.unlink(f)

    def get_name(self):
        return f"Sql({self.table})"


class KafkaDatasink(Datasink):
    """kafka() destination: partition-keyed batched produce
    (kafka-dest-worker.c). `producer_factory()` must return an object
    with `.produce(topic, key, value)` and `.flush()`; the default
    raises NotImplementedError (no kafka client in this container)."""

    def __init__(self, topic: str, key_template=None, template=None,
                 producer_factory=None, batch_lines: int = 1024):
        self.topic = topic
        self.key_template = key_template
        self.template = template
        self.producer_factory = producer_factory or _no_kafka
        self.batch_lines = batch_lines

    def write(self, blocks, ctx):
        producer = self.producer_factory()
        n = 0
        from .functions.templates import Template

        ktpl = None
        if self.key_template is not None:
            ktpl = self.key_template if isinstance(self.key_template, Template) else Template(self.key_template)
        for t in _to_tables(blocks):
            values = _format_lines(t, self.template)
            keys = ktpl.eval(t).tolist() if ktpl is not None else [None] * len(values)
            for i, (k, v) in enumerate(zip(keys, values)):
                producer.produce(self.topic, k, v)
                if (i + 1) % self.batch_lines == 0:
                    producer.flush()
            n += t.num_rows
        producer.flush()
        return {"rows": n}

    def get_name(self):
        return f"Kafka({self.topic})"


def _no_kafka():
    raise NotImplementedError(
        "kafka() needs a kafka client (confluent_kafka / kafka-python), which "
        "this container does not ship — pass producer_factory=..."
    )
