"""URL parse / normalize / registrable-domain operators."""
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.webtext import (add_url_columns, registrable_domain,
                                   strip_tracking_params, url_normalize, url_parts)


class TestUrlParts:
    def test_full_url(self):
        p = url_parts(pd.Series(["https://Example.COM:8443/a/b?x=1&y=2#frag"]))
        row = p.iloc[0]
        assert row["scheme"] == "https"
        assert row["host"] == "Example.COM"
        assert row["port"] == "8443"
        assert row["path"] == "/a/b"
        assert row["query"] == "x=1&y=2"
        assert row["fragment"] == "frag"

    def test_no_match_is_all_null(self):
        p = url_parts(pd.Series(["not a url", None]))
        assert p["scheme"].isna().all()


class TestNormalize:
    def test_case_port_fragment(self):
        s = pd.Series([
            "HTTPS://WWW.Example.com:443/Path?a=1#sec",
            "http://host:8080/",
            "http://host:80/x",
        ])
        out = url_normalize(s).tolist()
        assert out == [
            "https://www.example.com/Path?a=1",   # default port + fragment gone, path case kept
            "http://host:8080/",                   # non-default port kept
            "http://host/x",
        ]

    def test_tracking_params(self):
        s = pd.Series([
            "https://h/p?utm_source=a&id=1",
            "https://h/p?id=1&utm_campaign=x&fbclid=z",
            "https://h/p?utm_source=a",
            "https://h/p?gclid=g#top",
        ])
        assert strip_tracking_params(s).tolist() == [
            "https://h/p?id=1",
            "https://h/p?id=1",
            "https://h/p",
            "https://h/p#top",
        ]

    def test_empty_path_becomes_slash(self):
        assert url_normalize(pd.Series(["http://h"])).iloc[0] == "http://h/"

    def test_non_url_passthrough(self):
        assert url_normalize(pd.Series(["plain text"])).iloc[0] == "plain text"


class TestRegistrableDomain:
    def test_suffixes(self):
        s = pd.Series([
            "www.example.co.uk", "a.b.example.com", "example.com",
            "deep.sub.site.com.au", "localhost", None, "co.uk",
        ])
        assert registrable_domain(s).tolist() == [
            "example.co.uk", "example.com", "example.com",
            "site.com.au", "localhost", None, "co.uk",
        ]


@pytest.mark.usefixtures("ray_session")
def test_add_url_columns_batch():
    import ray.data as rd

    t = pa.table({"url": ["https://A.co.uk:443/x?utm_source=s&q=1", "http://plain.org/"]})
    out = rd.from_arrow(t).map_batches(add_url_columns, batch_format="pyarrow").to_pandas()
    assert out["url_norm"].tolist() == ["https://a.co.uk/x?q=1", "http://plain.org/"]
    assert out["url_host"].tolist() == ["a.co.uk", "plain.org"]
    assert out["url_domain"].tolist() == ["a.co.uk", "plain.org"]
