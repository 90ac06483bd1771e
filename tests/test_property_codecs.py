"""Property-based invariants (hypothesis) for the session's codecs:
list serialize/parse roundtrip, URL normalization idempotency, PII
redaction idempotency, chunking coverage."""
import hypothesis.strategies as st
import pandas as pd
import pytest
from hypothesis import given, settings

from axosyslog_ray.functions.strings import _parse_list_one, _ser_list
from axosyslog_ray.textstats.redact import redact_text
from axosyslog_ray.webtext import url_normalize

elem = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(elem, max_size=8))
def test_list_codec_roundtrip(items):
    # serialize -> parse is the identity on ANY element set (quoting and
    # escapes must protect commas, quotes, backslashes, control chars)
    assert _parse_list_one(_ser_list(items)) == items


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_list_parse_is_total(s):
    # the parser never raises and always terminates on arbitrary input
    out = _parse_list_one(s)
    assert isinstance(out, list)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=80))
def test_url_normalize_total_and_idempotent_on_nonurls(s):
    out = url_normalize(pd.Series([s])).iloc[0]
    assert isinstance(out, str)
    if "://" not in s:
        assert out == s  # non-URLs pass through untouched


@settings(max_examples=100, deadline=None)
@given(st.from_regex(r"https?://[a-z]{1,8}(\.[a-z]{2,3}){1,2}(:[0-9]{1,4})?(/[a-z0-9]{0,6}){0,2}(\?[a-z]=[0-9])?", fullmatch=True))
def test_url_normalize_idempotent_on_urls(u):
    s1 = url_normalize(pd.Series([u])).iloc[0]
    s2 = url_normalize(pd.Series([s1])).iloc[0]
    assert s1 == s2


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=100))
def test_redact_total_and_idempotent(s):
    r1 = redact_text(pd.Series([s])).iloc[0]
    r2 = redact_text(pd.Series([r1])).iloc[0]
    assert r1 == r2  # placeholders contain no PII shapes


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=4), min_size=1, max_size=40),
       st.integers(min_value=2, max_value=8), st.integers(min_value=0, max_value=1))
def test_chunking_covers_all_tokens(tokens, max_tokens, ov):
    import pyarrow as pa

    from axosyslog_ray.curation import chunk_documents
    import ray.data as rd

    overlap = min(ov, max_tokens - 1)
    text = " ".join(tokens)
    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": [text]}))
    out = chunk_documents(ds, max_tokens=max_tokens, overlap=overlap).to_pandas()
    # every token position is covered and concatenating stride-prefixes
    # of chunks reconstructs the document
    stride = max_tokens - overlap
    rebuilt = []
    chunks = out.sort_values("chunk_id")["text"].tolist()
    for i, c in enumerate(chunks):
        toks = c.split()
        rebuilt.extend(toks if i == len(chunks) - 1 else toks[:stride])
    # the last chunk may re-cover earlier tokens; compare as full doc
    assert " ".join(rebuilt[:len(tokens)]) == text
    assert (out["n_tokens"] <= max_tokens).all()
