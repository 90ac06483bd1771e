"""MaxMind DB (.mmdb) file reader — pure Python, spec-based.

Implements the public MaxMind DB File Format Specification v2.0
(https://maxmind.github.io/MaxMind-DB/): binary-search-tree section
(24/28/32-bit records), data section (type-tagged values incl. pointers,
maps, arrays), and the metadata map after the
"\\xAB\\xCD\\xEFMaxMind.com" marker. This is what the reference's geoip2
parser opens via libmaxminddb (reference
modules/geoip2/maxminddb-helper.c); here the whole tree is enumerated
ONCE at load into (cidr, flattened-attrs) ranges, which feed the
existing vectorized searchsorted enricher (enrich/geoip.py) — per-batch
lookups stay numpy, the mmdb walk happens only in actor __init__.

Scope: IPv4 databases (ip_version=4) and the IPv4-mapped ::/96 subtree
of IPv6 databases — the enricher's lookup key is a packed IPv4 int.
Pure-IPv6 networks are skipped with a count exposed on the reader.

The attrs of each network are the data map FLATTENED with dotted paths
(country.iso_code, city.names.en, ...) and scalar-stringified — the
reference's geoip parser does the same path-flattening into name-value
pairs (modules/geoip2/maxminddb-helper.c:35-175).
"""

from __future__ import annotations

import struct

_MARKER = b"\xab\xcd\xefMaxMind.com"


class MmdbError(ValueError):
    pass


class _Decoder:
    """Data-section value decoder (spec 'Data Section' + 'Data Types')."""

    def __init__(self, buf: bytes, base: int):
        self.buf = buf
        self.base = base  # absolute offset of the data section

    def decode(self, offset: int):
        """Decode the value at data-section-relative `offset`;
        returns (value, next_offset)."""
        buf = self.buf
        pos = self.base + offset
        ctrl = buf[pos]
        pos += 1
        typ = ctrl >> 5
        if typ == 0:  # extended type
            typ = 7 + buf[pos]
            pos += 1
        size = ctrl & 0x1F
        if typ == 1:  # pointer — size bits encode width, not length
            ss = (ctrl >> 3) & 0x3
            v = ctrl & 0x7
            if ss == 0:
                ptr = (v << 8) | buf[pos]
                pos += 1
            elif ss == 1:
                ptr = ((v << 16) | (buf[pos] << 8) | buf[pos + 1]) + 2048
                pos += 2
            elif ss == 2:
                ptr = ((v << 24) | (buf[pos] << 16) | (buf[pos + 1] << 8)
                       | buf[pos + 2]) + 526336
                pos += 3
            else:
                ptr = struct.unpack_from(">I", buf, pos)[0]
                pos += 4
            val, _ = self.decode(ptr)
            return val, pos - self.base
        if size == 29:
            size = 29 + buf[pos]
            pos += 1
        elif size == 30:
            size = 285 + struct.unpack_from(">H", buf, pos)[0]
            pos += 2
        elif size == 31:
            size = 65821 + int.from_bytes(buf[pos:pos + 3], "big")
            pos += 3
        if typ == 2:  # utf8 string
            return buf[pos:pos + size].decode("utf-8"), pos + size - self.base
        if typ == 3:  # double
            return struct.unpack_from(">d", buf, pos)[0], pos + 8 - self.base
        if typ == 4:  # bytes
            return buf[pos:pos + size], pos + size - self.base
        if typ in (5, 6, 9, 10):  # uint16/32/64/128
            v = int.from_bytes(buf[pos:pos + size], "big") if size else 0
            return v, pos + size - self.base
        if typ == 8:  # int32
            v = int.from_bytes(buf[pos:pos + size], "big", signed=False) if size else 0
            if size and (buf[pos] & 0x80):
                v -= 1 << (8 * size)
            return v, pos + size - self.base
        if typ == 7:  # map
            out = {}
            off = pos - self.base
            for _ in range(size):
                k, off = self.decode(off)
                v, off = self.decode(off)
                out[k] = v
            return out, off
        if typ == 11:  # array
            out = []
            off = pos - self.base
            for _ in range(size):
                v, off = self.decode(off)
                out.append(v)
            return out, off
        if typ == 14:  # boolean (size IS the value)
            return bool(size), pos - self.base
        if typ == 15:  # float
            return struct.unpack_from(">f", buf, pos)[0], pos + 4 - self.base
        if typ == 12:  # data cache container — treated as empty
            return None, pos - self.base
        if typ == 13:  # end marker
            return None, pos - self.base
        raise MmdbError(f"unknown mmdb type {typ}")


def _flatten(value, prefix: str = "", out: dict | None = None) -> dict:
    """Dotted-path flattening of the record map, scalars stringified —
    the reference geoip parser's name-value shape
    (maxminddb-helper.c:35-175 dig_in_mmdb_entry)."""
    if out is None:
        out = {}
    if isinstance(value, dict):
        for k, v in value.items():
            _flatten(v, f"{prefix}{k}.", out)
    elif isinstance(value, list):
        for i, v in enumerate(value):
            _flatten(v, f"{prefix}{i}.", out)
    elif value is not None:
        key = prefix[:-1]  # drop trailing dot
        if isinstance(value, bool):
            out[key] = "true" if value else "false"
        elif isinstance(value, float):
            out[key] = repr(value)
        elif isinstance(value, bytes):
            out[key] = value.hex()
        else:
            out[key] = str(value)
    return out


class MmdbReader:
    def __init__(self, path: str):
        with open(path, "rb") as fh:
            self.buf = fh.read()
        midx = self.buf.rfind(_MARKER)
        if midx < 0:
            raise MmdbError("not an mmdb file: metadata marker missing")
        meta_dec = _Decoder(self.buf, midx + len(_MARKER))
        self.metadata, _ = meta_dec.decode(0)
        self.node_count = int(self.metadata["node_count"])
        self.record_size = int(self.metadata["record_size"])
        self.ip_version = int(self.metadata.get("ip_version", 4))
        if self.record_size not in (24, 28, 32):
            raise MmdbError(f"unsupported record_size {self.record_size}")
        self.node_bytes = self.record_size * 2 // 8
        tree_size = self.node_count * self.node_bytes
        # data section starts after the tree + 16 zero bytes
        self.data_base = tree_size + 16
        self.dec = _Decoder(self.buf, self.data_base)
        self.skipped_ipv6 = 0

    def _record(self, node: int, side: int) -> int:
        b = self.buf
        off = node * self.node_bytes
        if self.record_size == 24:
            o = off + 3 * side
            return (b[o] << 16) | (b[o + 1] << 8) | b[o + 2]
        if self.record_size == 28:
            if side == 0:
                return ((b[off + 3] & 0xF0) << 20) | (b[off] << 16) \
                    | (b[off + 1] << 8) | b[off + 2]
            return ((b[off + 3] & 0x0F) << 24) | (b[off + 4] << 16) \
                | (b[off + 5] << 8) | b[off + 6]
        o = off + 4 * side
        return struct.unpack_from(">I", self.buf, o)[0]

    def _data_at(self, record: int):
        # spec: data offset = (record - node_count) - 16 from data start
        return self.dec.decode(record - self.node_count - 16)[0]

    def lookup_v4(self, ip_int: int):
        """Single-IP longest-prefix lookup (the per-row oracle)."""
        node, depth0 = self._v4_root()
        if node is None:
            return None
        for bit_i in range(31, -1, -1):
            rec = self._record(node, (ip_int >> bit_i) & 1)
            if rec == self.node_count:
                return None
            if rec > self.node_count:
                return self._data_at(rec)
            node = rec
        return None

    def _v4_root(self):
        node = 0
        if self.ip_version == 6:
            # IPv4 lives under ::/96: follow 96 zero bits
            for _ in range(96):
                rec = self._record(node, 0)
                if rec >= self.node_count:
                    return None, 0
                node = rec
        return node, 0

    def networks_v4(self):
        """Enumerate (cidr_str, record_value) for every IPv4 network —
        one DFS over the tree at load time."""
        root, _ = self._v4_root()
        out = []
        if root is None:
            return out
        stack = [(root, 0, 0)]  # (node, ip_prefix, depth)
        while stack:
            node, prefix, depth = stack.pop()
            for side in (0, 1):
                rec = self._record(node, side)
                p = prefix | (side << (31 - depth))
                if rec == self.node_count:
                    continue  # no data
                if rec > self.node_count:
                    cidr = f"{(p >> 24) & 255}.{(p >> 16) & 255}." \
                           f"{(p >> 8) & 255}.{p & 255}/{depth + 1}"
                    out.append((cidr, self._data_at(rec)))
                elif depth + 1 >= 32:
                    raise MmdbError("tree deeper than 32 bits on the v4 path")
                else:
                    stack.append((rec, p, depth + 1))
        return out


def mmdb_to_ranges(path: str) -> list[tuple[str, dict[str, str]]]:
    """Load an .mmdb into the (cidr, flattened attrs) range list the
    GeoIP enricher consumes (enrich/geoip.GeoIP ranges=...)."""
    r = MmdbReader(path)
    return [(cidr, _flatten(data)) for cidr, data in r.networks_v4()]
