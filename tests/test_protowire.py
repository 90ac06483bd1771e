"""functions/protowire + filterx protobuf_message() — Light
filterx/test_filterx_funcs.py::test_protobuf_message ported (decode
side uses the module's own from-spec decoder instead of protoc)."""
import math

import pandas as pd
import pytest

from axosyslog_ray.functions.protowire import (ProtoSchemaError,
                                               decode_message,
                                               encode_message, parse_proto)

SCHEMA = """
syntax = "proto3";

message TestMessage {
    message InnerMessage {
        string inner_field = 1;
        sint64 inner_sint64_field = 2;
    }

    string string_field = 1;
    bytes bytes_field = 2;
    fixed32 fixed32_field = 3;
    fixed64 fixed64_field = 4;
    sfixed32 sfixed32_field = 5;
    sfixed64 sfixed64_field = 6;
    sint32 sint32_field = 7;
    sint64 sint64_field = 8;
    uint32 uint32_field = 9;
    uint64 uint64_field = 10;
    double double_field = 11;
    float float_field = 12;
    bool bool_field = 13;
    map<string, string> map_string_string_field = 14;
    InnerMessage inner_message_field = 15;

    repeated string repeated_string_field = 16;
    repeated bytes repeated_bytes_field = 17;
    repeated fixed32 repeated_fixed32_field = 18;
    repeated fixed64 repeated_fixed64_field = 19;
    repeated sfixed32 repeated_sfixed32_field = 20;
    repeated sfixed64 repeated_sfixed64_field = 21;
    repeated sint32 repeated_sint32_field = 22;
    repeated sint64 repeated_sint64_field = 23;
    repeated uint32 repeated_uint32_field = 24;
    repeated uint64 repeated_uint64_field = 25;
    repeated double repeated_double_field = 26;
    repeated float repeated_float_field = 27;
    repeated bool repeated_bool_field = 28;
    repeated InnerMessage repeated_inner_message_field = 29;
}
"""

DATA = {
    "string_field": "foo",
    "bytes_field": b"\x01\x02\x03\x04\x05",
    "fixed32_field": 2147483647,
    "fixed64_field": 9223372036854775807,
    "sfixed32_field": -2147483648,
    "sfixed64_field": -9223372036854775808,
    "sint32_field": -2147483648,
    "sint64_field": -9223372036854775808,
    "uint32_field": 4294967295,
    "uint64_field": 9223372036854775807,
    "double_field": 17976931348623157.123456,
    "float_field": 123.456,
    "bool_field": True,
    "map_string_string_field": {"key1": "value1", "key2": "value2"},
    "inner_message_field": {
        "inner_field": "inner_value",
        "inner_sint64_field": -9223372036854775808,
    },
    "repeated_string_field": ["item1", "item2", "item3"],
    "repeated_bytes_field": [b"\x01\x02", b"\x03\x04"],
    "repeated_fixed32_field": [1, 2, 3],
    "repeated_fixed64_field": [4, 5, 6],
    "repeated_sfixed32_field": [-1, -2, -3],
    "repeated_sfixed64_field": [-4, -5, -6],
    "repeated_sint32_field": [-7, -8, -9],
    "repeated_sint64_field": [-10, -11, -12],
    "repeated_uint32_field": [7, 8, 9],
    "repeated_uint64_field": [10, 11, 12],
    "repeated_double_field": [1.1, 2.2, 3.3],
    "repeated_float_field": [4.4, 5.5, 6.6],
    "repeated_bool_field": [True, False, True],
    "repeated_inner_message_field": [
        {"inner_field": "a", "inner_sint64_field": 1},
        {"inner_field": "b", "inner_sint64_field": 2},
    ],
}


class TestCodecRoundTrip:
    def test_light_schema_roundtrip(self):
        msgs = parse_proto(SCHEMA)
        buf = encode_message(msgs, msgs["TestMessage"], DATA)
        got = decode_message(msgs, msgs["TestMessage"], buf)
        assert got["string_field"] == "foo"
        assert got["bytes_field"] == b"\x01\x02\x03\x04\x05"
        assert got["fixed32_field"] == 2147483647
        assert got["fixed64_field"] == 9223372036854775807
        assert got["sfixed32_field"] == -2147483648
        assert got["sfixed64_field"] == -9223372036854775808
        assert got["sint32_field"] == -2147483648
        assert got["sint64_field"] == -9223372036854775808
        assert got["uint32_field"] == 4294967295
        assert got["uint64_field"] == 9223372036854775807
        assert math.isclose(got["float_field"], 123.456, rel_tol=1e-6)
        assert math.isclose(got["double_field"], 17976931348623157.123456,
                            rel_tol=1e-6)
        assert got["bool_field"] is True
        assert got["map_string_string_field"] == {"key1": "value1",
                                                  "key2": "value2"}
        assert got["inner_message_field"]["inner_field"] == "inner_value"
        assert got["inner_message_field"]["inner_sint64_field"] == \
            -9223372036854775808
        assert got["repeated_string_field"] == ["item1", "item2", "item3"]
        assert got["repeated_bytes_field"] == [b"\x01\x02", b"\x03\x04"]
        assert got["repeated_fixed32_field"] == [1, 2, 3]
        assert got["repeated_sfixed64_field"] == [-4, -5, -6]
        assert got["repeated_sint32_field"] == [-7, -8, -9]
        assert got["repeated_uint64_field"] == [10, 11, 12]
        assert all(math.isclose(a, b, rel_tol=1e-6) for a, b in
                   zip(got["repeated_double_field"], [1.1, 2.2, 3.3]))
        assert all(math.isclose(a, b, rel_tol=1e-6) for a, b in
                   zip(got["repeated_float_field"], [4.4, 5.5, 6.6]))
        assert got["repeated_bool_field"] == [True, False, True]
        assert got["repeated_inner_message_field"] == [
            {"inner_field": "a", "inner_sint64_field": 1},
            {"inner_field": "b", "inner_sint64_field": 2}]

    def test_wire_bytes_pinned(self):
        # hand-computed wire fragments (public spec): field 1 (string,
        # tag 0x0a) "foo"; field 13 (bool, tag 0x68) 1; field 7 (sint32,
        # tag 0x38) zigzag(-2) = 3
        msgs = parse_proto("syntax = \"proto3\";\nmessage M { string a = 1;"
                           " sint32 s = 7; bool b = 13; }")
        assert encode_message(msgs, msgs["M"], {"a": "foo"}) == \
            b"\x0a\x03foo"
        assert encode_message(msgs, msgs["M"], {"s": -2}) == b"\x38\x03"
        assert encode_message(msgs, msgs["M"], {"b": True}) == b"\x68\x01"

    def test_proto3_default_omitted(self):
        msgs = parse_proto('syntax = "proto3";\nmessage M { int32 n = 1;'
                           ' string s = 2; }')
        assert encode_message(msgs, msgs["M"], {"n": 0, "s": ""}) == b""

    def test_packed_repeated(self):
        # repeated int32 [1, 2, 3] packs: tag(1, wire 2), len 3, 1 2 3
        msgs = parse_proto('syntax = "proto3";\nmessage M '
                           '{ repeated int32 v = 1; }')
        assert encode_message(msgs, msgs["M"], {"v": [1, 2, 3]}) == \
            b"\x0a\x03\x01\x02\x03"

    def test_unsupported_features_error(self):
        with pytest.raises(ProtoSchemaError):
            parse_proto('syntax = "proto2";\nmessage M { }')
        with pytest.raises(ProtoSchemaError):
            parse_proto('syntax = "proto3";\nmessage M '
                        '{ enum E { A = 0; } }')


class TestFilterXFunction:
    def test_protobuf_message_in_filterx(self, tmp_path):
        import pyarrow as pa

        from axosyslog_ray.filterx import FilterX
        from axosyslog_ray.functions.protowire import (decode_message,
                                                       load_schema)

        sf = tmp_path / "schema.proto"
        sf.write_text(SCHEMA)
        fx = FilterX("""
            d = {"string_field": $program,
                 "sint64_field": -3,
                 "repeated_string_field": ["x", "y"]};
            $pb = protobuf_message(d, schema_file="%s");
        """ % sf)
        t = pa.table({"message": ["m"], "pri": [13], "program": ["app"]})
        out = fx(t)
        buf = out.column("pb").to_pylist()[0]
        msgs = load_schema(str(sf))
        got = decode_message(msgs, msgs["TestMessage"], bytes(buf))
        assert got == {"string_field": "app", "sint64_field": -3,
                       "repeated_string_field": ["x", "y"]}


class TestWireEdgeCases:
    def test_uint64_above_2_63_round_trips_unsigned(self):
        # uint64 >= 2^63 must decode unsigned (no two's-complement wrap)
        msgs = parse_proto("syntax = \"proto3\";\n"
                           "message M { uint64 u = 1; int64 s = 2; }")
        data = {"u": (1 << 64) - 7, "s": -7}
        wire = encode_message(msgs, msgs["M"], data)
        assert decode_message(msgs, msgs["M"], wire) == data

    def test_unknown_fields_skipped_by_wire_type(self):
        # wire-format spec: unknown tags are skipped, not rejected —
        # encode with a WIDER schema, decode with a narrower one
        wide = parse_proto("syntax = \"proto3\";\n"
                           "message M { string a = 1; uint64 x = 2; "
                           "fixed64 y = 3; fixed32 z = 4; bytes w = 5; }")
        narrow = parse_proto("syntax = \"proto3\";\n"
                             "message M { string a = 1; }")
        wire = encode_message(wide, wide["M"], {
            "a": "keep", "x": 300, "y": 9, "z": 4, "w": b"\x00\x01"})
        assert decode_message(narrow, narrow["M"], wire) == {"a": "keep"}
