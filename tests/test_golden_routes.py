"""Routing + aggregate golden tests (FIXTURES.md §4: expected_routes /
expected_aggregates; the Light suite's per-sink content assertion style,
reference tests/light/functional_tests/logpath/test_conditionals.py:77-101)."""

import hashlib
import json
import os

from axosyslog_ray.pipelines.flagship import LogPipelineStage
from axosyslog_ray.state.sessions import GroupingBy
from axosyslog_ray.synth import gen_pages_table

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _routed():
    return LogPipelineStage()(gen_pages_table(5000)).to_pandas()


def test_per_sink_row_sets_match_golden():
    with open(os.path.join(GOLDEN_DIR, "expected_routes.json")) as f:
        golden = json.load(f)
    routed = _routed()
    assert set(routed["route"]) == set(golden)
    for sink, g in routed.groupby("route"):
        urls = sorted(g["url"])
        assert len(urls) == golden[sink]["count"], sink
        assert hashlib.sha256("\n".join(urls).encode()).hexdigest() == golden[sink]["urls_sha256"], sink
        assert urls[:3] == golden[sink]["first_urls"], sink


def test_session_aggregates_match_golden():
    with open(os.path.join(GOLDEN_DIR, "expected_aggregates.json")) as f:
        golden = json.load(f)
    routed = _routed()
    gb = GroupingBy("host", timeout=300, ts_col="warc_ts", having=lambda s: len(s) >= 3,
                    aggregates={"n": "count"})
    parts = [gb(g) for _, g in routed.groupby("host")]
    import pandas as pd

    sess = pd.concat([p for p in parts if not p.empty], ignore_index=True)
    assert len(sess) == golden["n_sessions"]
    assert int(sess["n"].sum()) == golden["total_rows_in_sessions"]
    top5 = {k: int(v) for k, v in sess.groupby("host")["n"].sum().sort_values(ascending=False).head(5).items()}
    assert top5 == golden["by_host_top5"]
