"""FilterX OTel object constructors over the from-spec proto3 codec.

Reference: modules/grpc/otel/filterx/object-otel-{logrecord,resource,
scope,kvlist,array}.cpp + otel-field-converter.cpp — dict/list-like
filterx objects backed by the OTLP protobuf messages, constructible
empty or from serialized protobuf bytes, with typed field coercion
(time fields accept datetimes and store unix nanos; attributes maps
coerce through AnyValue) and serialization back to wire bytes.

The message layout below is the PUBLIC OTLP schema
(opentelemetry-proto, Apache-2.0: logs/v1/logs.proto LogRecord,
common/v1/common.proto AnyValue/ArrayValue/KeyValue/KeyValueList/
InstrumentationScope, resource/v1/resource.proto Resource) re-declared
for the engine's protowire parser; AnyValue's oneof is declared as
plain optional fields — identical wire format, the at-most-one rule is
enforced by construction here.

The C++ objects live so otel destinations can serialize them; the
transports are out of scope in this batch engine, so the objects close
the CONSTRUCTOR/conversion surface: build, read, mutate, round-trip.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .protowire import decode_message, parse_proto

OTLP_PROTO = """
message AnyValue {
  optional string string_value = 1;
  optional bool bool_value = 2;
  optional int64 int_value = 3;
  optional double double_value = 4;
  ArrayValue array_value = 5;
  KeyValueList kvlist_value = 6;
  optional bytes bytes_value = 7;
}
message ArrayValue { repeated AnyValue values = 1; }
message KeyValue { string key = 1; AnyValue value = 2; }
message KeyValueList { repeated KeyValue values = 1; }
message InstrumentationScope {
  string name = 1;
  string version = 2;
  repeated KeyValue attributes = 3;
  uint32 dropped_attributes_count = 4;
}
message Resource {
  repeated KeyValue attributes = 1;
  uint32 dropped_attributes_count = 2;
}
message LogRecord {
  fixed64 time_unix_nano = 1;
  int32 severity_number = 2;
  string severity_text = 3;
  AnyValue body = 5;
  repeated KeyValue attributes = 6;
  uint32 dropped_attributes_count = 7;
  fixed32 flags = 8;
  bytes trace_id = 9;
  bytes span_id = 10;
  fixed64 observed_time_unix_nano = 11;
}
"""

_MSGS = parse_proto(OTLP_PROTO)


def _encode(msg_name: str, data: dict) -> bytes:
    from .protowire import encode_message

    return encode_message(_MSGS, _MSGS[msg_name], data)


# ------------------------------------------------------- AnyValue codec

def any_to_proto(v) -> dict:
    """Python value -> AnyValue message dict
    (otel-field-converter.cpp conversion table; bool before int — a
    Python bool IS an int)."""
    if v is None:
        return {}
    if isinstance(v, bool):
        return {"bool_value": v}
    if isinstance(v, str):
        return {"string_value": v}
    if isinstance(v, bytes):
        return {"bytes_value": v}
    if isinstance(v, (int, np.integer)):
        return {"int_value": int(v)}
    if isinstance(v, (float, np.floating)):
        return {"double_value": float(v)}
    if isinstance(v, (list, tuple)):
        return {"array_value": {"values": [any_to_proto(x) for x in v]}}
    if isinstance(v, dict):
        return {"kvlist_value": {"values": [
            {"key": str(k), "value": any_to_proto(x)}
            for k, x in v.items()]}}
    raise ValueError(f"otel: cannot convert {type(v).__name__} to AnyValue")


def any_from_proto(d: dict):
    """AnyValue message dict -> Python value (empty -> None)."""
    if not d:
        return None
    if "array_value" in d:
        return [any_from_proto(x)
                for x in d["array_value"].get("values", [])]
    if "kvlist_value" in d:
        return {kv.get("key", ""): any_from_proto(kv.get("value", {}))
                for kv in d["kvlist_value"].get("values", [])}
    for k in ("string_value", "bool_value", "int_value", "double_value",
              "bytes_value"):
        if k in d:
            return d[k]
    return None


def _attrs_to_proto(attrs) -> list[dict]:
    if isinstance(attrs, dict):
        items = attrs.items()
    else:  # already KeyValue-list shaped
        items = [(kv["key"], kv.get("value")) for kv in attrs]
    return [{"key": str(k), "value": any_to_proto(v)} for k, v in items]


def _attrs_from_proto(kvs: list[dict]) -> dict:
    return {kv.get("key", ""): any_from_proto(kv.get("value", {}))
            for kv in kvs}


def _nanos(v) -> int:
    """Datetime-ish -> unix nanos (otel-field-converter.cpp accepts
    datetimes and integers for *_time_unix_nano)."""
    if isinstance(v, (int, np.integer)):
        return int(v)
    ts = pd.Timestamp(v)
    if ts.tzinfo is None:
        ts = ts.tz_localize("UTC")
    return int(ts.value)


# --------------------------------------------------------- object types

class _OtelMessage(dict):
    """Dict-like OTel object: plain-dict reads compose with the engine's
    filterx subscript/len/unset machinery; __setitem__ validates field
    names against the schema and applies the reference coercions."""

    MSG = ""                      # protowire message name
    TIME_FIELDS: tuple = ()
    BYTES_FIELDS: tuple = ()
    INT_FIELDS: tuple = ()

    def __setitem__(self, key, value):
        key = str(key)
        if key not in _MSGS[self.MSG]:
            raise KeyError(f"{self.MSG} has no field {key!r}")
        if key in self.TIME_FIELDS:
            value = _nanos(value)
        elif key in self.INT_FIELDS:
            value = int(value)
        elif key in self.BYTES_FIELDS:
            value = value.encode() if isinstance(value, str) \
                else bytes(value)
        elif key == "attributes":
            value = dict(value) if isinstance(value, dict) \
                else _attrs_from_proto(value)
        super().__setitem__(key, value)

    # -- wire round-trip --

    def to_protobuf(self) -> bytes:
        data = {}
        for k, v in self.items():
            if k == "attributes":
                data[k] = _attrs_to_proto(v)
            elif k == "body":
                data[k] = any_to_proto(v)
            else:
                data[k] = v
        return _encode(self.MSG, data)

    @classmethod
    def from_protobuf(cls, buf: bytes):
        d = decode_message(_MSGS, _MSGS[cls.MSG], bytes(buf))
        obj = cls()
        for k, v in d.items():
            if k == "attributes":
                super(_OtelMessage, obj).__setitem__(
                    k, _attrs_from_proto(v))
            elif k == "body":
                super(_OtelMessage, obj).__setitem__(k, any_from_proto(v))
            else:
                super(_OtelMessage, obj).__setitem__(k, v)
        return obj


class OtelLogRecord(_OtelMessage):
    MSG = "LogRecord"
    TIME_FIELDS = ("time_unix_nano", "observed_time_unix_nano")
    BYTES_FIELDS = ("trace_id", "span_id")
    INT_FIELDS = ("severity_number", "dropped_attributes_count", "flags")


class OtelResource(_OtelMessage):
    MSG = "Resource"
    INT_FIELDS = ("dropped_attributes_count",)


class OtelScope(_OtelMessage):
    MSG = "InstrumentationScope"
    INT_FIELDS = ("dropped_attributes_count",)


class OtelKVList(dict):
    """otel_kvlist: free-form key -> AnyValue map."""

    def to_protobuf(self) -> bytes:
        return _encode("KeyValueList",
                       {"values": _attrs_to_proto(self)})

    @classmethod
    def from_protobuf(cls, buf: bytes):
        d = decode_message(_MSGS, _MSGS["KeyValueList"], bytes(buf))
        return cls(_attrs_from_proto(d.get("values", [])))


class OtelArray(list):
    """otel_array: list of AnyValues."""

    def to_protobuf(self) -> bytes:
        return _encode("ArrayValue",
                       {"values": [any_to_proto(x) for x in self]})

    @classmethod
    def from_protobuf(cls, buf: bytes):
        d = decode_message(_MSGS, _MSGS["ArrayValue"], bytes(buf))
        return cls(any_from_proto({"array_value": d}))


_CTORS = {"otel_logrecord": OtelLogRecord, "otel_resource": OtelResource,
          "otel_scope": OtelScope, "otel_kvlist": OtelKVList,
          "otel_array": OtelArray}
for _name, _cls in _CTORS.items():
    _cls.FX_NAME = _name


# ---------------------------------------------------- protobuf-JSON repr

def _camel(s: str) -> str:
    import re as _re

    return _re.sub(r"_(\w)", lambda m: m.group(1).upper(), s)


def _any_json(av: dict):
    """AnyValue proto dict -> protobuf-JSON mapping (camelCase keys,
    int64 as decimal strings — the repr shape the reference's otel
    objects marshal through MessageToJson; Light test_filterx_types
    otel pins)."""
    import base64 as _b64

    if not av:
        return {}
    k, v = next(iter(av.items()))
    ck = _camel(k)
    if k == "int_value":
        return {ck: str(int(v))}
    if k == "bool_value":
        return {ck: bool(v)}
    if k == "double_value":
        return {ck: float(v)}
    if k == "string_value":
        return {ck: v}
    if k == "bytes_value":
        return {ck: _b64.b64encode(bytes(v)).decode()}
    if k == "array_value":
        return {ck: {"values": [_any_json(x) for x in v["values"]]}}
    return {ck: {"values": [{"key": kv["key"],
                             "value": _any_json(kv["value"])}
                            for kv in v["values"]]}}


def proto_json(obj) -> str:
    """One otel object -> its protobuf-JSON body (compact separators,
    insertion order) for the `otel_x({...})` repr form."""
    import base64 as _b64
    import json as _json

    if isinstance(obj, OtelArray):
        d = {"values": [_any_json(any_to_proto(x)) for x in obj]}
    elif isinstance(obj, OtelKVList):
        d = {"values": [{"key": str(k), "value": _any_json(any_to_proto(v))}
                        for k, v in obj.items()]}
    else:
        d = {}
        for k, v in obj.items():
            ck = _camel(k)
            if k == "attributes":
                d[ck] = [{"key": str(ak),
                          "value": _any_json(any_to_proto(av))}
                         for ak, av in v.items()]
            elif k == "body":
                d[ck] = _any_json(any_to_proto(v))
            elif k in getattr(obj, "TIME_FIELDS", ()):
                d[ck] = str(int(v))     # fixed64 -> decimal string
            elif k in getattr(obj, "BYTES_FIELDS", ()):
                d[ck] = _b64.b64encode(bytes(v)).decode()
            else:
                d[ck] = v
        return _json.dumps(d, separators=(",", ":"), ensure_ascii=False)
    return _json.dumps(d, separators=(",", ":"), ensure_ascii=False)


def _make_ctor(cls):
    def ctor(ctx, a: pd.Series = None, *extra) -> pd.Series:
        """Zero args -> one fresh empty object PER ROW; one bytes arg ->
        decode; a non-bytes arg or extra args errors (the reference
        constructors return NULL there -> eval error here). Registered
        as a ctx function so the empty form knows the batch length."""
        if extra:
            raise ValueError(
                f"{cls.__name__}: too many arguments")
        if a is None:
            return pd.Series([cls() for _ in range(ctx.n)], dtype=object)
        out = []
        for v in a:
            if v is None or (not isinstance(v, (str, bytes, dict, list))
                             and pd.isna(v)):
                out.append(cls())
            elif isinstance(v, bytes):
                out.append(cls.from_protobuf(v))   # raises on malformed
            elif isinstance(v, dict) and issubclass(cls, dict):
                o = cls()
                for k, x in v.items():
                    o[k] = x
                out.append(o)
            elif isinstance(v, list) and issubclass(cls, list):
                out.append(cls(v))
            else:
                raise ValueError(
                    f"{cls.__name__}: invalid argument type "
                    f"{type(v).__name__}")
        return pd.Series(out, dtype=object)
    return ctor


def otel_serialize(a: pd.Series) -> pd.Series:
    """Serialize an otel object column to OTLP wire bytes (the
    destination-side marshal, exposed as a function because the gRPC
    transports are out of scope)."""
    out = []
    for v in a:
        if v is None or (not isinstance(v, (dict, list)) and pd.isna(v)):
            out.append(None)
        elif hasattr(v, "to_protobuf"):
            out.append(v.to_protobuf())
        elif isinstance(v, dict):
            out.append(OtelKVList(v).to_protobuf())
        elif isinstance(v, list):
            out.append(OtelArray(v).to_protobuf())
        else:
            out.append(None)
    return pd.Series(out, dtype=object)


OTEL_FUNCS = {name: _make_ctor(cls) for name, cls in _CTORS.items()}
OTEL_FUNCS["otel_serialize"] = otel_serialize
