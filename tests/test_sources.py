"""Text source + multi-line framing + parallelize tests."""

import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.sources.text import MultiLineJoiner


def test_multiline_indented():
    b = pa.table({"text": ["Traceback:", "  at foo", "  at bar", "next msg"]})
    out = MultiLineJoiner("indented")(b).to_pylist()
    assert [r["text"] for r in out] == ["Traceback:\n  at foo\n  at bar", "next msg"]
    assert [r["n_lines"] for r in out] == [3, 1]


def test_multiline_regexp_prefix():
    b = pa.table({"text": ["2026-01-01 start", "cont a", "2026-01-02 other", "cont b"]})
    out = MultiLineJoiner("regexp", prefix_re=r"^\d{4}-")(b).to_pylist()
    assert [r["text"] for r in out] == ["2026-01-01 start\ncont a", "2026-01-02 other\ncont b"]


def test_multiline_keeps_first_timestamp():
    b = pa.table(
        {
            "text": ["head", "  tail"],
            "warc_ts": pa.array(pd.Series(pd.to_datetime(["2026-01-01", "2026-01-02"]), dtype="datetime64[us]")),
        }
    )
    out = MultiLineJoiner("indented")(b).to_pylist()
    assert str(out[0]["warc_ts"]) == "2026-01-01 00:00:00"


@pytest.mark.usefixtures("ray_session")
def test_read_log_lines_and_parse(tmp_path):
    from axosyslog_ray.sources.text import read_log_lines
    from axosyslog_ray.stages.syslog import parse_syslog_table

    p = tmp_path / "log.txt"
    p.write_text("<38>Aug 17 05:02:28 h sshd[1]: hello\nplain line\n")
    ds = read_log_lines(str(p)).map_batches(parse_syslog_table, batch_format="pyarrow")
    rows = ds.to_pandas().sort_values("text").reset_index(drop=True)
    assert len(rows) == 2
    parsed = rows[rows["syslog_parsed"]]
    assert parsed["program"].iloc[0] == "sshd"


@pytest.mark.usefixtures("ray_session")
def test_parallelize_keyed_colocates():
    import ray.data as rd

    from axosyslog_ray.parallelize import add_partition_key, parallelize

    df = pd.DataFrame({"host": [f"h{i % 5}" for i in range(100)], "v": range(100)})
    ds = add_partition_key(rd.from_pandas(df), "$host", partitions=4)
    out = ds.to_pandas()
    # deterministic: same host -> same partition id
    assert out.groupby("host")["_partition"].nunique().max() == 1
    assert out["_partition"].between(0, 3).all()
    shuffled = parallelize(rd.from_pandas(df), partitions=4, partition_key="$host").to_pandas()
    assert len(shuffled) == 100


def test_indented_multiline_reference_conformance():
    # lib/logproto/tests/test-indented-multiline-server.c pins through
    # MultiLineJoiner("indented")
    def join(lines):
        out = MultiLineJoiner("indented")(pa.table({"text": lines}))
        return [r["text"] for r in out.to_pylist()]

    # test_proper_multiline ('newline' flushes the joined message)
    assert join(["0", " 1=2", " 3=4", "newline"]) == \
        ["0\n 1=2\n 3=4", "newline"]
    # test_line_without_continuation
    assert join(["01234567", "01234567", "newline"]) == \
        ["01234567", "01234567", "newline"]
    # test_input_starts_with_continuation: a leading continuation line
    # is its own message
    assert join([" 01234567", "01234567", "newline"]) == \
        [" 01234567", "01234567", "newline"]
    # test_multiline_at_eof: the trailing joined message flushes at EOF
    assert join(["01234567", " 01234567", " end"]) == \
        ["01234567\n 01234567\n end"]
