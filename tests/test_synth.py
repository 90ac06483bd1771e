import numpy as np
import pyarrow as pa

from axosyslog_ray.schema import PAGES_SCHEMA
from axosyslog_ray.synth import gen_pages_batch, gen_pages_table


def test_schema_matches_input_hint():
    t = gen_pages_table(10)
    assert t.schema.equals(PAGES_SCHEMA)
    assert [f.name for f in t.schema] == ["url", "warc_ts", "html", "text", "lang"]


def test_deterministic_under_batching():
    whole = gen_pages_table(64)
    part = gen_pages_batch(np.arange(17, 41, dtype=np.uint64))
    assert part.equals(whole.slice(17, 24))


def test_urls_unique_and_families_cycle():
    t = gen_pages_table(600)
    urls = t.column("url").to_pylist()
    assert len(set(urls)) == 600
    texts = t.column("text").to_pylist()
    assert texts[4].startswith("{")  # json family at i%6==4
    assert texts[1].split(">")[1].startswith("1 ")  # rfc5424 at i%6==1


def test_html_embeds_text():
    t = gen_pages_table(30)
    for row in t.to_pylist():
        assert b"<pre>" + row["text"].encode() + b"</pre>" in row["html"]


def test_host_skew_is_zipfian():
    t = gen_pages_table(5000)
    import collections

    hosts = collections.Counter(u.split("/")[2] for u in t.column("url").to_pylist())
    top = hosts.most_common(1)[0][1]
    assert top > 5000 * 0.15  # rank-1 host dominates
    assert len(hosts) > 100
