"""FilterX OTel object constructors — conformance pins mirroring
modules/grpc/otel/tests/test-otel-filterx.cpp over the from-spec OTLP
schema (functions/otel.py)."""
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.filterx import FilterX
from axosyslog_ray.functions.otel import (OtelArray, OtelKVList,
                                          OtelLogRecord, OtelResource,
                                          OtelScope)


def _t(**cols):
    return pa.table({k: pa.array(v) for k, v in cols.items()})


class TestLogRecord:
    def test_empty(self):
        # Test(otel_filterx, logrecord_empty)
        lr = OtelLogRecord()
        assert lr == {}
        assert lr.to_protobuf() == b""

    def test_from_protobuf_roundtrip(self):
        # Test(otel_filterx, logrecord_from_protobuf)
        lr = OtelLogRecord()
        lr["body"] = "foobar"
        lr["observed_time_unix_nano"] = 1234
        lr["attributes"] = {"attribute_key": 42}
        buf = lr.to_protobuf()
        lr2 = OtelLogRecord.from_protobuf(buf)
        assert lr2["body"] == "foobar"
        assert lr2["observed_time_unix_nano"] == 1234
        assert lr2["attributes"] == {"attribute_key": 42}
        assert lr2.to_protobuf() == buf

    def test_malformed_protobuf_rejected(self):
        # Test(otel_filterx, logrecord_from_protobuf_malformed_data)
        with pytest.raises(Exception):
            OtelLogRecord.from_protobuf(b"1234")

    def test_len_unset_is_key_set(self):
        # Test(otel_filterx, logrecord_len_and_unset_and_is_key_set)
        lr = OtelLogRecord()
        assert len(lr) == 0
        lr["body"] = "body_val"
        assert len(lr) == 1 and "body" in lr
        lr["time_unix_nano"] = 123
        assert len(lr) == 2 and "time_unix_nano" in lr
        del lr["body"]
        assert len(lr) == 1 and "body" not in lr
        del lr["time_unix_nano"]
        assert len(lr) == 0

    def test_unknown_field_rejected(self):
        lr = OtelLogRecord()
        with pytest.raises(KeyError):
            lr["no_such_field"] = 1

    def test_datetime_coerces_to_nanos(self):
        # otel-field-converter: datetimes land as unix nanos
        lr = OtelLogRecord()
        lr["observed_time_unix_nano"] = pd.Timestamp(
            "2024-04-10 07:29:10.001000+00:00")
        assert lr["observed_time_unix_nano"] == 1712734150001000000

    def test_typed_fields(self):
        lr = OtelLogRecord()
        lr["severity_number"] = 9
        lr["severity_text"] = "info"
        lr["trace_id"] = b"0123456789abcdef"
        lr["flags"] = 1
        out = OtelLogRecord.from_protobuf(lr.to_protobuf())
        assert out["severity_number"] == 9
        assert out["severity_text"] == "info"
        assert out["trace_id"] == b"0123456789abcdef"
        assert out["flags"] == 1


class TestResourceScopeKVListArray:
    def test_resource_roundtrip(self):
        # Test(otel_filterx, resource_from_protobuf / set_field)
        r = OtelResource()
        r["attributes"] = {"host.name": "localhost", "count": 3}
        out = OtelResource.from_protobuf(r.to_protobuf())
        assert out["attributes"] == {"host.name": "localhost", "count": 3}

    def test_scope_roundtrip(self):
        s = OtelScope()
        s["name"] = "my-lib"
        s["version"] = "1.2.3"
        out = OtelScope.from_protobuf(s.to_protobuf())
        assert out["name"] == "my-lib" and out["version"] == "1.2.3"

    def test_kvlist_nested_and_array(self):
        kv = OtelKVList({"s": "str", "i": 7, "d": 1.5, "b": True,
                         "nested": {"x": "y"}, "arr": [1, "two", False]})
        out = OtelKVList.from_protobuf(kv.to_protobuf())
        assert out == {"s": "str", "i": 7, "d": 1.5, "b": True,
                       "nested": {"x": "y"}, "arr": [1, "two", False]}
        a = OtelArray(["x", 2, {"k": "v"}])
        assert OtelArray.from_protobuf(a.to_protobuf()) == \
            ["x", 2, {"k": "v"}]


class TestThroughFilterX:
    def test_construct_and_serialize_in_filterx(self):
        t = _t(message=["m1", "m2"])
        fx = FilterX(
            'log = otel_logrecord();'
            'log.body = $message;'
            'log.severity_number = 9;'
            '$wire = otel_serialize(log);'
            '$body_back = otel_logrecord($wire).body;')
        out = fx(t)
        assert out.column("body_back").to_pylist() == ["m1", "m2"]
        wires = out.column("wire").to_pylist()
        assert all(isinstance(w, bytes) and len(w) > 0 for w in wires)
        assert wires[0] != wires[1]  # per-row bodies differ

    def test_zero_arg_ctor_is_per_row_fresh(self):
        t = _t(message=["a", "b", "c"])
        fx = FilterX('log = otel_logrecord();'
                     'log.severity_text = $message;'
                     '$sev = log.severity_text;')
        out = fx(t)
        assert out.column("sev").to_pylist() == ["a", "b", "c"]

    def test_invalid_ctor_arg_raises(self):
        t = _t(message=["x"])
        fx = FilterX('$y = otel_logrecord(3.14);')
        with pytest.raises(Exception):
            fx(t)
