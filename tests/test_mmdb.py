"""MaxMind DB reader/writer (enrich/mmdb.py, enrich/mmdb_write.py) —
spec-based round trips across record sizes, plus GeoIP integration (the
reference's geoip2(database(...)) shape)."""
import ipaddress

import pyarrow as pa
import pytest

from axosyslog_ray.enrich.geoip import GeoIP
from axosyslog_ray.enrich.mmdb import MmdbError, MmdbReader, mmdb_to_ranges
from axosyslog_ray.enrich.mmdb_write import write_mmdb

NETS = [
    ("10.0.0.0/8", {"country": {"iso_code": "US", "names": {"en": "United States"}},
                    "location": {"latitude": 37.5, "accuracy_radius": 100},
                    "is_anycast": True}),
    ("10.1.0.0/16", {"country": {"iso_code": "DE"}}),
    ("192.168.1.0/24", {"country": {"iso_code": "HU"}, "asn": 12345678901}),
]


def ip(s):
    return int(ipaddress.ip_address(s))


@pytest.fixture(params=[24, 28, 32])
def db_path(request, tmp_path):
    p = str(tmp_path / f"t{request.param}.mmdb")
    write_mmdb(p, NETS, record_size=request.param)
    return p


class TestReader:
    def test_metadata(self, db_path):
        r = MmdbReader(db_path)
        assert r.metadata["ip_version"] == 4
        assert r.metadata["binary_format_major_version"] == 2
        assert r.metadata["record_size"] in (24, 28, 32)
        assert r.metadata["description"]["en"] == "synthetic test db"

    def test_longest_prefix_lookup(self, db_path):
        r = MmdbReader(db_path)
        assert r.lookup_v4(ip("10.2.3.4"))["country"]["iso_code"] == "US"
        assert r.lookup_v4(ip("10.1.3.4"))["country"]["iso_code"] == "DE"
        assert r.lookup_v4(ip("192.168.1.77"))["country"]["iso_code"] == "HU"
        assert r.lookup_v4(ip("8.8.8.8")) is None

    def test_value_types_decode(self, db_path):
        r = MmdbReader(db_path)
        d = r.lookup_v4(ip("10.0.0.1"))
        assert d["location"]["latitude"] == 37.5          # double
        assert d["location"]["accuracy_radius"] == 100    # uint16
        assert d["is_anycast"] is True                    # boolean
        assert r.lookup_v4(ip("192.168.1.1"))["asn"] == 12345678901  # uint64

    def test_networks_enumeration_covers_tree(self, db_path):
        ranges = mmdb_to_ranges(db_path)
        # the /16 hole splits the /8: every listed network disjoint, and
        # a point lookup through the RANGES matches the tree walk
        r = MmdbReader(db_path)
        nets = [ipaddress.ip_network(c) for c, _ in ranges]
        for i, a in enumerate(nets):
            for b in nets[i + 1:]:
                assert not a.overlaps(b), (a, b)
        for probe in ("10.0.0.1", "10.1.2.3", "10.200.0.9", "192.168.1.55"):
            via_tree = r.lookup_v4(ip(probe))["country"]["iso_code"]
            via_ranges = next(a for c, a in ranges
                              if ipaddress.ip_address(probe) in ipaddress.ip_network(c))
            assert via_ranges["country.iso_code"] == via_tree

    def test_not_mmdb_raises(self, tmp_path):
        p = tmp_path / "x.bin"
        p.write_bytes(b"not a database")
        with pytest.raises(MmdbError):
            MmdbReader(str(p))


class TestGeoIPIntegration:
    def test_enrich_batch_from_mmdb(self, db_path):
        g = GeoIP(mmdb_path=db_path, source_col="src_ip",
                  prefix="geoip_")
        t = pa.table({"src_ip": ["10.1.9.9", "10.9.9.9", "192.168.1.3", "1.1.1.1"]})
        out = g(t)
        col = out.column("geoip_country.iso_code").to_pylist()
        assert col == ["DE", "US", "HU", None]

    def test_flattened_attr_paths(self, db_path):
        ranges = dict(mmdb_to_ranges(db_path))
        us = next(a for c, a in ranges.items() if a.get("country.iso_code") == "US")
        assert us["country.names.en"] == "United States"
        assert us["is_anycast"] == "true"
        assert us["location.latitude"] == "37.5"


class TestGeoipOracleFixture:
    def test_nested_25_longest_prefix_wins(self, ray_session):
        from axosyslog_ray.pipelines.queries import events_geoip

        out = events_geoip("/root/testdata/sf0.001")
        third = out["ip"].str.split(".").str[2].astype(int)
        last = out["ip"].str.split(".").str[3].astype(int)
        nested = (third == 3) & (last >= 128)
        if nested.any():
            assert (out.loc[nested, "country"] == "NL").all()
        outer = (third == 3) & (last < 128)
        if outer.any():
            assert (out.loc[outer, "country"] == "JP").all()
        assert out["country"].notna().all()
