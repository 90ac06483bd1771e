"""Web-corpus URL operators: parse, normalize, registrable domain.

Common-Crawl-style curation needs URL hygiene before any per-domain
operator can work (quota caps, per-domain dedup, host aggregation —
the input_hint's `url` column is the document key):

- `url_parts`: one compiled regex pass (pandas .str.extract — C-level,
  no per-row Python) splitting scheme/host/port/path/query/fragment.
- `url_normalize`: the standard canonicalization for URL-level dedup —
  lowercase scheme+host, strip the default port, strip the fragment,
  strip tracking params (utm_*, gclid, fbclid), collapse a bare '?'.
  Pure per-row-value function of the string: shuffle-free, reproducible
  at any partitioning, and every step is a regex DuckDB can run too
  (the oracle applies the SAME patterns — no semantic drift between
  engine and oracle).
- `registrable_domain`: eTLD+1 via longest-known-suffix match. The
  container has no public-suffix list; _MULTI_SUFFIX ships the common
  two-label suffixes and a production deployment swaps in the full PSL
  (same mechanism: set lookup on the last two labels — broadcast the
  frozenset via ray.put when it grows to PSL size).

All functions take/return pandas Series so they compose inside any
map_batches stage; `add_url_columns` is the batch-level convenience.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/:?#]*)(?::(?P<port>\d+))?"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$"
)

# tracking-param scrub, applied to the FULL url string; DuckDB mirror:
# regexp_replace(url, TRACKING_PARAM_PATTERN, '', 'g')
TRACKING_PARAM_PATTERN = r"[?&](?:utm_[a-z]+|gclid|fbclid)=[^&#]*"
_TRACKING_RE = re.compile(TRACKING_PARAM_PATTERN)

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# common two-label public suffixes (full PSL is a drop-in broadcast set)
_MULTI_SUFFIX = frozenset({
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "co.nz", "net.nz", "org.nz", "co.za", "org.za", "com.cn", "net.cn",
    "org.cn", "com.mx", "com.ar", "com.tr", "com.sg", "com.hk",
})


def url_parts(urls: pd.Series) -> pd.DataFrame:
    """DataFrame(scheme, host, port, path, query, fragment) — one
    vectorized extract; non-matching rows yield all-null parts."""
    return urls.astype(object).fillna("").astype(str).str.extract(URL_RE)


def strip_tracking_params(urls: pd.Series) -> pd.Series:
    """Remove utm_*/gclid/fbclid params; fix the separator of the first
    surviving param and drop a dangling '?'. Identical regex sequence to
    the SQL oracle (see DOCS_URL_NORMALIZE_SQL)."""
    s = urls.str.replace(_TRACKING_RE, "", regex=True)
    # a removed FIRST param leaves "...path&k=v" (the '?' went with it):
    # restore '?' on the first remaining separator when none is left
    s = s.str.replace(r"^([^?#]*)&", r"\1?", regex=True)
    # dangling '?' (all params removed) — RE2-safe patterns, no lookahead,
    # so DuckDB regexp_replace can run the identical sequence
    s = s.str.replace(r"\?#", "#", regex=True)
    return s.str.replace(r"\?$", "", regex=True)


def url_normalize(urls: pd.Series) -> pd.Series:
    """Canonical URL string for URL-level dedup (module docstring)."""
    s = urls.astype(object).fillna("").astype(str)
    parts = s.str.extract(URL_RE)
    scheme = parts["scheme"].str.lower()
    host = parts["host"].str.lower()
    port = parts["port"]
    # drop the scheme's default port, keep explicit others
    default = scheme.map(_DEFAULT_PORTS)
    keep_port = port.notna() & (port != default)
    hostport = host.where(~keep_port, host + ":" + port.fillna(""))
    path = parts["path"].fillna("")
    path = path.where(path != "", "/")
    query = parts["query"]
    rebuilt = scheme + "://" + hostport + path + ("?" + query).where(query.notna(), "")
    rebuilt = strip_tracking_params(rebuilt)
    # rows that never matched URL_RE pass through untouched
    return rebuilt.where(parts["scheme"].notna(), s)


def registrable_domain(hosts: pd.Series) -> pd.Series:
    """eTLD+1: last 3 labels when the final two are a known multi-label
    suffix, else last 2; bare/1-label hosts pass through. Vectorized
    label slicing over a C-level rsplit."""
    h = hosts.astype(object).fillna("").astype(str).str.lower()
    labels = h.str.rsplit(".", n=3)
    n = labels.str.len()
    last2 = np.where(n >= 2, labels.str[-2].astype(str) + "." + labels.str[-1].astype(str), h)
    is_multi = pd.Series(last2, index=h.index).isin(_MULTI_SUFFIX)
    last3 = np.where(n >= 3, labels.str[-3].astype(str) + "." + last2, last2)
    out = pd.Series(np.where(is_multi & (n >= 3), last3, last2), index=h.index, dtype=object)
    return out.where(h != "", None)


def add_url_columns(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Batch stage: append url_norm, url_host, url_domain columns."""
    urls = batch.column(url_col).to_pandas()
    norm = url_normalize(urls)
    host = url_parts(urls)["host"].str.lower()
    dom = registrable_domain(host)
    return (batch.append_column("url_norm", pa.array(norm, type=pa.string()))
                 .append_column("url_host", pa.array(host, type=pa.string()))
                 .append_column("url_domain", pa.array(dom, type=pa.string())))
