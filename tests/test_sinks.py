"""Concrete destination driver tests (program/http/sql/kafka Datasinks)."""

import glob
import json
import os

import pyarrow as pa
import pytest

from axosyslog_ray.sinks import HttpDatasink, KafkaDatasink, ProgramDatasink, SqlDatasink


@pytest.fixture
def ds100(ray_session):
    import ray.data as rd

    return rd.from_items([{"host": f"h{i%5}", "value": i} for i in range(100)]).repartition(4)


@pytest.mark.usefixtures("ray_session")
def test_program_sink_spawns_child_per_task(ds100, tmp_path):
    out = str(tmp_path / "prog_{shard}.txt")
    ds100.write_datasink(ProgramDatasink(["/bin/sh", "-c", f"cat > {out}"],
                                         template="$host $value"))
    files = glob.glob(str(tmp_path / "prog_*.txt"))
    assert len(files) >= 1
    lines = [l for f in files for l in open(f).read().splitlines()]
    assert len(lines) == 100 and lines[0].startswith("h")


@pytest.mark.usefixtures("ray_session")
def test_program_sink_nonzero_exit_raises(ds100):
    with pytest.raises(Exception, match="exited|RayTaskError|false"):
        ds100.write_datasink(ProgramDatasink(["/bin/false"]))


def test_http_sink_batches_and_retries():
    calls = []
    fails = {"n": 2}

    def transport(url, payload, headers):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise ConnectionError("flaky")
        calls.append((url, payload))

    sink = HttpDatasink("http://example.invalid/ingest", batch_lines=30,
                        transport=transport, backoff_sec=0.0)
    t = pa.table({"v": list(range(100))})

    class Ctx:
        task_idx = 0

    res = sink.write([t], Ctx())
    assert res == {"rows": 100, "posts": 4}  # 30+30+30+10
    assert len(calls) == 4
    body = calls[0][1].decode().splitlines()
    assert json.loads(body[0]) == {"v": 0}


def test_http_sink_gives_up_after_retries():
    def transport(url, payload, headers):
        raise ConnectionError("down")

    sink = HttpDatasink("http://x", retries=2, transport=transport, backoff_sec=0.0)

    class Ctx:
        task_idx = 0

    with pytest.raises(RuntimeError, match="after 2 tries"):
        sink.write([pa.table({"v": [1]})], Ctx())


@pytest.mark.usefixtures("ray_session")
def test_sql_sink_loads_one_transaction(ds100, tmp_path):
    import duckdb

    db = str(tmp_path / "out.duckdb")
    ds100.write_datasink(SqlDatasink(db, "events_out"))
    con = duckdb.connect(db)
    n, s = con.sql("SELECT COUNT(*), SUM(value) FROM events_out").fetchone()
    con.close()  # duckdb caches same-path connections per process
    assert (n, s) == (100, sum(range(100)))
    # append mode accumulates
    ds100.write_datasink(SqlDatasink(db, "events_out"))
    con2 = duckdb.connect(db)
    assert con2.sql("SELECT COUNT(*) FROM events_out").fetchone()[0] == 200
    con2.close()


def test_kafka_sink_partitions_by_key_template():
    produced = []

    class FakeProducer:
        def produce(self, topic, key, value):
            produced.append((topic, key, value))

        def flush(self):
            pass

    sink = KafkaDatasink("logs", key_template="$host", template="$value",
                         producer_factory=FakeProducer)

    class Ctx:
        task_idx = 0

    t = pa.table({"host": ["a", "b"], "value": [1, 2]})
    sink.write([t], Ctx())
    assert produced == [("logs", "a", "1"), ("logs", "b", "2")]


def test_kafka_default_factory_is_honest():
    with pytest.raises(NotImplementedError, match="kafka client"):
        KafkaDatasink("t").write([pa.table({"v": [1]})], type("C", (), {"task_idx": 0})())


@pytest.mark.usefixtures("ray_session")
def test_routed_parquet_sink_counts_match_readback(tmp_path):
    import ray.data as rd

    from axosyslog_ray.sinks import RoutedParquetDatasink

    # host=None for part of one route: null group keys are real sinks and
    # must survive the driver merge (pandas groupby drops NaN by default)
    rows = [{"route": ["web", "auth", "errors"][i % 3],
             "host": None if i % 3 == 0 else f"h{i % 7}",
             "value": i} for i in range(1000)]
    ds = rd.from_items(rows).repartition(6)
    sink = RoutedParquetDatasink(str(tmp_path / "sinks"), partition_col="route",
                                 count_cols=("route", "host"), min_rows_per_file=200)
    ds.write_datasink(sink)

    # fused counts == a read-back groupby over the written files
    back = rd.read_parquet(str(tmp_path / "sinks")).to_pandas()
    expect = back.groupby(["route", "host"], dropna=False).size().rename("n").reset_index()

    def canon(df):
        df = df.copy()
        df["host"] = df["host"].fillna("<null>")
        return df.sort_values(["route", "host"]).reset_index(drop=True).astype(str)

    assert canon(sink.counts).equals(canon(expect))
    assert int(sink.counts["n"].sum()) == 1000

    # hive layout: partition dirs, partition column restored on read
    dirs = sorted(os.path.basename(p) for p in glob.glob(str(tmp_path / "sinks" / "route=*")))
    assert dirs == ["route=auth", "route=errors", "route=web"]
    assert set(back.columns) >= {"route", "host", "value"}


@pytest.mark.usefixtures("ray_session")
def test_routed_parquet_sink_null_partition_rows_written(tmp_path):
    import ray.data as rd

    from axosyslog_ray.sinks import RoutedParquetDatasink

    rows = [{"route": None if i % 4 == 0 else "web", "host": f"h{i % 3}", "v": i}
            for i in range(400)]
    sink = RoutedParquetDatasink(str(tmp_path / "s"), partition_col="route",
                                 count_cols=("route",), min_rows_per_file=100)
    rd.from_items(rows).repartition(4).write_datasink(sink)
    assert int(sink.counts["n"].sum()) == 400
    back = rd.read_parquet(str(tmp_path / "s")).to_pandas()
    # null-route rows land in the hive null dir — no data loss (they used
    # to vanish: pc.equal(x, None) is never True). Readers see hive's
    # standard null sentinel (pyarrow only maps it back to null when the
    # reader passes an explicit null_fallback partitioning).
    assert len(back) == 400
    nulls = back["route"].isna() | (back["route"] == "__HIVE_DEFAULT_PARTITION__")
    assert int(nulls.sum()) == 100


@pytest.mark.usefixtures("ray_session")
def test_routed_parquet_sink_high_cardinality_partitions(tmp_path):
    """1k distinct partition values: one sort + contiguous slices per
    value (a filter per distinct value re-scans the bundle 1000x).
    Counts and read-back contents must survive the split."""
    import ray.data as rd

    from axosyslog_ray.sinks import RoutedParquetDatasink

    n = 5000
    rows = [{"route": f"r{i % 1000:04d}", "host": f"h{i % 7}", "v": i}
            for i in range(n)]
    sink = RoutedParquetDatasink(str(tmp_path / "s"), partition_col="route",
                                 count_cols=("route",), min_rows_per_file=2500)
    rd.from_items(rows).repartition(2).write_datasink(sink)
    assert int(sink.counts["n"].sum()) == n
    assert len(sink.counts) == 1000
    assert set(sink.counts["n"]) == {5}
    back = rd.read_parquet(str(tmp_path / "s")).to_pandas()
    assert len(back) == n
    assert sorted(back["v"]) == list(range(n))
    assert back.groupby("route")["v"].count().eq(5).all()


def test_templated_text_sink_byte_parity(ray_session, tmp_path):
    """file() literal form: rendered template lines, one line per
    message, partitioned by route."""
    import glob

    import ray.data as rd

    from axosyslog_ray.functions.templates import Template
    from axosyslog_ray.sinks import TemplatedTextDatasink

    t = pa.table({"host": ["a", "b", "a", "c"],
                  "message": ["m1", "m2", "m3", "m4"],
                  "route": ["web", "err", "web", "err"]})
    root = str(tmp_path / "logs")
    sink = TemplatedTextDatasink(root, template="${HOST} ${MESSAGE}",
                                 partition_col="route")
    rd.from_arrow(t).repartition(2).write_datasink(sink)
    got = {}
    for d in sorted(glob.glob(root + "/route=*")):
        lines = []
        for f in sorted(glob.glob(d + "/*.log")):
            lines.extend(open(f).read().splitlines())
        got[d.split("=")[-1]] = sorted(lines)
    assert got == {"err": ["b m2", "c m4"], "web": ["a m1", "a m3"]}
    assert dict(zip(sink.counts["partition"], sink.counts["n"])) == \
           {"err": 2, "web": 2}


def test_templated_text_sink_flat_json_lines(ray_session, tmp_path):
    import glob
    import json as _json

    import ray.data as rd

    from axosyslog_ray.sinks import TemplatedTextDatasink

    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    root = str(tmp_path / "flat")
    sink = TemplatedTextDatasink(root)  # no template -> JSONL
    rd.from_arrow(t).write_datasink(sink)
    lines = []
    for f in sorted(glob.glob(root + "/*.log")):
        lines.extend(open(f).read().splitlines())
    assert sorted(_json.loads(x)["a"] for x in lines) == [1, 2]
