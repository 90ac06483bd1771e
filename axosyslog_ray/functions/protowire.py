"""From-spec protobuf (proto3) wire-format codec + minimal .proto
schema parser — the engine's protobuf_message() FilterX function
(reference modules/grpc/filterx/func-protobuf-message.cpp builds the
message with libprotobuf; this is a pure-Python re-creation from the
PUBLIC wire-format spec, the same discipline as the mmdb codec in
enrich/mmdb*.py).

Supported surface (the reference Light test's schema exactly —
tests/light/functional_tests/filterx/test_filterx_funcs.py
test_protobuf_message): proto3 scalar types (string bytes bool
int32/64 uint32/64 sint32/64 fixed32/64 sfixed32/64 double float),
nested messages, repeated fields (numeric scalars packed, the proto3
default), map<K, V> fields (repeated synthetic entry messages with
key=1 value=2), field omission for proto3 default values (implicit
presence). Enums, oneof, imports, proto2 and extensions are rejected
with a clear error.

A matching decoder is included for round-trip verification (and the
parse side of tests) — decoding follows the same public spec: varint /
64-bit / length-delimited / 32-bit wire types, packed detection by
schema field type.
"""

from __future__ import annotations

import re
import struct

_SCALARS = {
    # name -> (wire_type, kind)
    "int32": (0, "varint"), "int64": (0, "varint"),
    "uint32": (0, "uvarint"), "uint64": (0, "uvarint"),
    "sint32": (0, "zigzag"), "sint64": (0, "zigzag"),
    "bool": (0, "bool"),
    "fixed64": (1, "f64"), "sfixed64": (1, "sf64"), "double": (1, "double"),
    "string": (2, "string"), "bytes": (2, "bytes"),
    "fixed32": (5, "f32"), "sfixed32": (5, "sf32"), "float": (5, "float"),
}


class ProtoSchemaError(ValueError):
    pass


class Field:
    __slots__ = ("name", "num", "type", "repeated", "map_kv", "explicit")

    def __init__(self, name, num, type_, repeated=False, map_kv=None,
                 explicit=False):
        self.name, self.num, self.type = name, num, type_
        self.repeated = repeated
        self.map_kv = map_kv  # (ktype, vtype) for map fields
        # proto3 explicit presence (`optional` / oneof members): encode
        # the field even when it holds the default value
        self.explicit = explicit


def parse_proto(text: str) -> dict[str, dict[str, Field]]:
    """Minimal proto3 parser -> {message_name: {field_name: Field}}.
    Nested messages register under 'Outer.Inner' AND their bare name
    (type references in the Light schema use the bare name)."""
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    toks = re.findall(r"\"[^\"]*\"|[A-Za-z_][\w.]*|\d+|[{}=;<>,]", text)
    msgs: dict[str, dict[str, Field]] = {}
    order: list[str] = []

    i = 0

    def expect(tok):
        nonlocal i
        if toks[i] != tok:
            raise ProtoSchemaError(f"expected {tok!r}, got {toks[i]!r}")
        i += 1

    def parse_message(prefix: str):
        nonlocal i
        name = toks[i]
        i += 1
        full = f"{prefix}{name}"
        fields: dict[str, Field] = {}
        msgs[full] = fields
        msgs.setdefault(name, fields)
        order.append(full)
        expect("{")
        while toks[i] != "}":
            t = toks[i]
            if t == "message":
                i += 1
                parse_message(full + ".")
                continue
            if t in ("enum", "oneof", "extend", "extensions", "reserved"):
                raise ProtoSchemaError(f"proto feature {t!r} not supported")
            repeated = False
            explicit = False
            if t == "repeated":
                repeated = True
                i += 1
                t = toks[i]
            elif t == "optional":
                explicit = True
                i += 1
                t = toks[i]
            if t == "map":
                i += 1
                expect("<")
                kt = toks[i]; i += 1
                expect(",")
                vt = toks[i]; i += 1
                expect(">")
                fname = toks[i]; i += 1
                expect("=")
                num = int(toks[i]); i += 1
                expect(";")
                fields[fname] = Field(fname, num, "map", map_kv=(kt, vt))
                continue
            ftype = t
            i += 1
            fname = toks[i]; i += 1
            expect("=")
            num = int(toks[i]); i += 1
            expect(";")
            fields[fname] = Field(fname, num, ftype, repeated=repeated,
                                  explicit=explicit)
        i += 1  # consume '}'

    while i < len(toks):
        t = toks[i]
        if t == "syntax":
            i += 1
            expect("=")
            if toks[i].strip('"') != "proto3":
                raise ProtoSchemaError("only proto3 is supported")
            i += 1
            expect(";")
        elif t in ("package", "option", "import"):
            while toks[i] != ";":
                i += 1
            i += 1
        elif t == "message":
            i += 1
            parse_message("")
        else:
            raise ProtoSchemaError(f"unexpected token {t!r}")
    if not order:
        raise ProtoSchemaError("no message in schema")
    msgs["__first__"] = msgs[order[0]]
    return msgs


# ------------------------------------------------------------ encoding

def _varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1  # negative int32/64: 64-bit two's complement
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _enc_scalar(kind: str, v) -> bytes:
    if kind in ("varint", "uvarint"):
        return _varint(int(v))
    if kind == "zigzag":
        n = int(v)
        return _varint(((n << 1) ^ (n >> 63)) & ((1 << 64) - 1))
    if kind == "bool":
        return _varint(1 if v else 0)
    if kind == "f64":
        return struct.pack("<Q", int(v))
    if kind == "sf64":
        return struct.pack("<q", int(v))
    if kind == "double":
        return struct.pack("<d", float(v))
    if kind == "f32":
        return struct.pack("<I", int(v))
    if kind == "sf32":
        return struct.pack("<i", int(v))
    if kind == "float":
        return struct.pack("<f", float(v))
    if kind == "string":
        b = str(v).encode()
        return _varint(len(b)) + b
    if kind == "bytes":
        b = bytes(v)
        return _varint(len(b)) + b
    raise ProtoSchemaError(f"unknown scalar kind {kind}")


def _is_default(kind: str, v) -> bool:
    if kind in ("string", "bytes"):
        return len(v) == 0
    if kind == "bool":
        return not v
    return float(v) == 0.0


def encode_message(msgs: dict, msg_fields: dict[str, Field],
                   data: dict) -> bytes:
    out = bytearray()
    for key, v in data.items():
        f = msg_fields.get(key)
        if f is None:
            raise ProtoSchemaError(f"unknown field {key!r}")
        if f.type == "map":
            kt, vt = f.map_kv
            for mk, mv in v.items():
                entry = (_tag(1, _SCALARS[kt][0])
                         + _enc_scalar(_SCALARS[kt][1], mk)
                         + _tag(2, _SCALARS[vt][0])
                         + _enc_scalar(_SCALARS[vt][1], mv))
                out += _tag(f.num, 2) + _varint(len(entry)) + entry
            continue
        if f.type in _SCALARS:
            wire, kind = _SCALARS[f.type]
            if f.repeated:
                vals = list(v)
                if not vals:
                    continue
                if wire in (0, 1, 5):
                    # proto3 packs repeated numeric scalars by default
                    payload = b"".join(_enc_scalar(kind, x) for x in vals)
                    out += _tag(f.num, 2) + _varint(len(payload)) + payload
                else:
                    for x in vals:
                        out += _tag(f.num, wire) + _enc_scalar(kind, x)
            else:
                if _is_default(kind, v) and not f.explicit:
                    continue  # proto3 implicit presence
                out += _tag(f.num, wire) + _enc_scalar(kind, v)
            continue
        # nested message type
        sub = msgs.get(f.type)
        if sub is None:
            raise ProtoSchemaError(f"unknown type {f.type!r} for {key!r}")
        items = list(v) if f.repeated else [v]
        for item in items:
            body = encode_message(msgs, sub, dict(item))
            out += _tag(f.num, 2) + _varint(len(body)) + body
    return bytes(out)


# ------------------------------------------------------------ decoding

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _dec_scalar(kind: str, wire: int, buf: bytes, i: int):
    if wire == 0:
        v, i = _read_varint(buf, i)
        if kind == "zigzag":
            return (v >> 1) ^ -(v & 1), i
        if kind == "bool":
            return bool(v), i
        if kind == "varint" and v >= 1 << 63:
            v -= 1 << 64  # two's complement only for SIGNED int32/64;
            # uint32/uint64 ("uvarint") stay unsigned so values >= 2^63
            # round-trip exactly
        return v, i
    if wire == 1:
        raw = buf[i:i + 8]
        i += 8
        if kind == "double":
            return struct.unpack("<d", raw)[0], i
        if kind == "sf64":
            return struct.unpack("<q", raw)[0], i
        return struct.unpack("<Q", raw)[0], i
    if wire == 5:
        raw = buf[i:i + 4]
        i += 4
        if kind == "float":
            return struct.unpack("<f", raw)[0], i
        if kind == "sf32":
            return struct.unpack("<i", raw)[0], i
        return struct.unpack("<I", raw)[0], i
    raise ProtoSchemaError(f"cannot decode wire {wire} as {kind}")


def decode_message(msgs: dict, msg_fields: dict[str, Field],
                   buf: bytes) -> dict:
    by_num = {f.num: f for f in msg_fields.values()}
    out: dict = {}
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        num, wire = key >> 3, key & 7
        f = by_num.get(num)
        if f is None:
            # Wire-format spec: unknown fields are skipped by wire type,
            # not rejected (forward compatibility).
            if wire == 0:
                _, i = _read_varint(buf, i)
            elif wire == 1:
                i += 8
            elif wire == 2:
                ln, i = _read_varint(buf, i)
                i += ln
            elif wire == 5:
                i += 4
            else:
                raise ProtoSchemaError(
                    f"unknown field {num} with unsupported wire type {wire}")
            continue
        if f.type == "map":
            ln, i = _read_varint(buf, i)
            entry = buf[i:i + ln]
            i += ln
            sub = {"key": Field("key", 1, f.map_kv[0]),
                   "value": Field("value", 2, f.map_kv[1])}
            kv = decode_message(msgs, sub, entry)
            out.setdefault(f.name, {})[kv.get("key")] = kv.get("value")
        elif f.type in _SCALARS:
            wire_t, kind = _SCALARS[f.type]
            if wire == 2 and wire_t != 2:
                ln, i = _read_varint(buf, i)  # packed
                end = i + ln
                vals = out.setdefault(f.name, [])
                while i < end:
                    v, i = _dec_scalar(kind, wire_t, buf, i)
                    vals.append(v)
            elif wire_t == 2:
                ln, i = _read_varint(buf, i)
                raw = buf[i:i + ln]
                i += ln
                v = raw.decode() if kind == "string" else raw
                if f.repeated:
                    out.setdefault(f.name, []).append(v)
                else:
                    out[f.name] = v
            else:
                v, i = _dec_scalar(kind, wire, buf, i)
                if f.repeated:
                    out.setdefault(f.name, []).append(v)
                else:
                    out[f.name] = v
        else:
            ln, i = _read_varint(buf, i)
            body = buf[i:i + ln]
            i += ln
            v = decode_message(msgs, msgs[f.type], body)
            if f.repeated:
                out.setdefault(f.name, []).append(v)
            else:
                out[f.name] = v
    return out


_SCHEMA_CACHE: dict[str, dict] = {}


def load_schema(path: str) -> dict:
    sch = _SCHEMA_CACHE.get(path)
    if sch is None:
        with open(path) as fh:
            sch = _SCHEMA_CACHE[path] = parse_proto(fh.read())
    return sch
