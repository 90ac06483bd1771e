"""metrics-probe() conformance.

Pins modules/metrics-probe/tests/test_metrics_probe.c through
aggregate.metrics_probe over a Ray Dataset: the default
classified_events_total probe with app/host/program/source labels,
custom key without labels (plain counter), labels-without-key init
failure, the increment template, and dynamic labels from value-pairs
glob patterns. Counter values accumulate per label set exactly like
the reference's per-message process() calls (rows ARE the calls).
"""

import pyarrow as pa
import pytest
import ray.data

from axosyslog_ray.aggregate import metrics_probe


def _ds(rows: dict):
    return ray.data.from_arrow(pa.table(rows))


def test_metrics_probe_defaults(ray_session):
    # two messages with label set 1, one with label set 2
    ds = _ds({
        "app": ["app_1", "app_1", "app_2"],
        "host": ["host_1", "host_1", "host_2"],
        "program": ["program_1", "program_1", "program_2"],
        "source": ["source_1", "source_1", "source_2"],
    })
    out = metrics_probe(ds).to_pandas().set_index("app")
    assert out.loc["app_1", "n"] == 2
    assert out.loc["app_2", "n"] == 1
    assert sorted(out.columns) == ["host", "n", "program", "source"]


def test_metrics_probe_custom_labels_only_fails():
    with pytest.raises(ValueError, match="key"):
        metrics_probe(None, {"test_label": "$x"}, alias="")


def test_metrics_probe_custom_key_only(ray_session):
    ds = _ds({"x": [1, 2, 3]})
    out = metrics_probe(ds, {}, key="custom_key", alias="n")
    # label-less probe counts every processed message
    assert out["n"] == 3


def test_metrics_probe_increment(ray_session):
    ds = _ds({"custom_increment": ["1337", "3", "not-a-number"]})
    out = metrics_probe(ds, {}, key="custom_key", alias="n",
                        increment="${custom_increment}")
    # unparsable increments count 0 (type_cast failure -> no bump)
    assert out["n"] == 1340


def test_metrics_probe_increment_with_labels(ray_session):
    ds = _ds({"lbl": ["a", "a", "b"], "w": ["2", "3", "10"]})
    out = metrics_probe(ds, {"l": "$lbl"}, key="custom_key", alias="n",
                        increment="$w").to_pandas().set_index("l")
    assert out.loc["a", "n"] == 5
    assert out.loc["b", "n"] == 10


def test_metrics_probe_dynamic_labels(ray_session):
    # _add_label(test_label, ${test_field}) + glob 'test_prefix.*'
    ds = _ds({
        "test_field": ["test_field_value", "test_field_value", "other"],
        "test_prefix.test_field_1": ["v1", "v1", "v1"],
        "test_prefix.test_field_2": ["v2", "v2", "v2"],
    })
    out = metrics_probe(
        ds, {"test_label": "${test_field}"}, key="custom_key", alias="n",
        vp_patterns=[("test_prefix.*", True)],
    ).to_pandas()
    out = out.set_index("test_label")
    assert out.loc["test_field_value", "n"] == 2
    assert out.loc["other", "n"] == 1
    labels = out.loc["test_field_value", "labels"]
    assert "test_prefix.test_field_1=v1" in labels
    assert "test_prefix.test_field_2=v2" in labels
