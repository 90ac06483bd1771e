"""geoip2()-style range lookup: IP -> attributes via sorted CIDR ranges.

Mirrors the reference geoip parser shape (reference
modules/geoip2/geoip-parser.c:90-110,195-199 — mmdb opened once, an IP
template resolved per message, results under `prefix()`): here the
database is a list of (cidr, attrs...) ranges; lookup is a vectorized
`np.searchsorted` over the sorted range starts — O(log n) per row, one
numpy pass per batch. The db is built once per actor (__init__), the
broadcast-small-side pattern.
"""

from __future__ import annotations

import ipaddress

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.strings import tf_ipv4_to_int


class GeoIP:
    def __init__(
        self,
        ranges: list[tuple[str, dict[str, str]]] | None = None,
        db_ref=None,
        source_col: str = "src_ip",
        prefix: str = "geoip_",
        mmdb_path: str | None = None,
    ):
        if db_ref is not None:
            import ray

            ranges = ray.get(db_ref)
        if mmdb_path is not None:
            # real MaxMind database: the reference's geoip2(database(..))
            # shape (modules/geoip2/geoip-parser.c) — the mmdb tree is
            # enumerated ONCE here (per actor), per-batch lookups stay
            # the vectorized searchsorted path below
            from .mmdb import mmdb_to_ranges

            ranges = list(ranges or []) + mmdb_to_ranges(mmdb_path)
        raw = []
        for cidr, attrs in ranges or []:
            net = ipaddress.ip_network(cidr, strict=False)
            raw.append((int(net.network_address), int(net.broadcast_address), net.prefixlen, attrs))
        # Flatten nested/overlapping CIDRs into DISJOINT intervals with
        # longest-prefix-wins attrs (mmdb semantics — ADVICE r1: a /16
        # inside a /8 must not shadow the outer range past its end).
        # Load-time-only sweep over elementary intervals; n ranges is the
        # broadcast-small side, so O(n * boundaries) is fine here.
        rows = []
        if raw:
            bounds = sorted({r[0] for r in raw} | {r[1] + 1 for r in raw})
            prev_key = None
            for lo, hi_excl in zip(bounds[:-1], bounds[1:]):
                active = [r for r in raw if r[0] <= lo and hi_excl - 1 <= r[1]]
                if not active:
                    prev_key = None
                    continue
                win = max(active, key=lambda r: r[2])  # longest prefix wins
                if rows and prev_key == id(win) and rows[-1][1] == lo - 1:
                    rows[-1] = (rows[-1][0], hi_excl - 1, win[3])  # merge adjacent
                else:
                    rows.append((lo, hi_excl - 1, win[3]))
                prev_key = id(win)
        rows.sort(key=lambda r: r[0])
        self.starts = np.array([r[0] for r in rows], dtype=np.int64)
        self.ends = np.array([r[1] for r in rows], dtype=np.int64)
        self.attr_names = sorted({k for _, _, a in rows for k in a})
        self.attrs = {
            name: np.array([a.get(name) for _, _, a in rows], dtype=object) for name in self.attr_names
        }
        self.source_col = source_col
        self.prefix = prefix

    @staticmethod
    def pack_ipv4(ips: pd.Series) -> pd.Series:
        """Vectorized dotted-quad -> int (NaN for non-IPv4), via Arrow RE2."""
        import pyarrow as _pa
        import pyarrow.compute as _pc

        arr = _pa.array(ips.astype(object).where(ips.notna(), None), type=_pa.string())
        st = _pc.extract_regex(arr, pattern=r"^(?P<a>\d{1,3})\.(?P<b>\d{1,3})\.(?P<c>\d{1,3})\.(?P<d>\d{1,3})$")
        octs = [
            _pc.cast(_pc.struct_field(st, f), _pa.int64()).to_pandas() for f in ("a", "b", "c", "d")
        ]
        ok = octs[0].notna()
        for o in octs[1:]:
            ok &= o.notna()
        for o in octs:
            ok &= o <= 255
        val = octs[0] * 16777216 + octs[1] * 65536 + octs[2] * 256 + octs[3]
        return val.where(ok.fillna(False))

    def __call__(self, table: pa.Table) -> pa.Table:
        n = table.num_rows
        out = table
        if self.source_col not in table.column_names or len(self.starts) == 0:
            for name in self.attr_names:
                out = out.append_column(self.prefix + name, pa.nulls(n, pa.string()))
            return out
        ips = table.column(self.source_col).to_pandas()
        ints = self.pack_ipv4(ips)
        valid = ints.notna().to_numpy()
        iv = ints.fillna(-1).astype(np.int64).to_numpy()
        pos = np.searchsorted(self.starts, iv, side="right") - 1
        in_range = valid & (pos >= 0)
        pos_c = np.clip(pos, 0, len(self.starts) - 1)
        in_range &= iv <= self.ends[pos_c]
        for name in self.attr_names:
            vals = np.full(n, None, dtype=object)
            vals[in_range] = self.attrs[name][pos_c[in_range]]
            out = out.append_column(self.prefix + name, pa.array(vals, type=pa.string()))
        return out
