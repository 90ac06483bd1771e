"""Deterministic synthetic `pages` table (FIXTURES.md §1-2).

Every value is a pure function of (seed, global row index) via splitmix64
(`hashutil`), so the same (seed, n_rows) produces byte-identical tables no
matter how rows are batched or which worker generates them — this is what
makes distributed generation with `ray.data.range(n).map_batches(PageGen)`
reproducible at any scale.

The `text` column carries one payload line per row, round-robin over six
families (i % 6) mirroring the reference's own test corpora:
  0 RFC3164 syslog   (reference modules/syslogformat/tests/test_syslog_format.c:63-172)
  1 RFC5424 syslog   (reference modules/syslogformat/syslog-format.c:562-829)
  2 CSV apache-access (reference modules/csvparser/tests/test_csvparser_perf.c:93-105)
  3 KV pairs          (reference modules/kvformat/kv-parser.c:104-136)
  4 JSON nested       (reference modules/json/json-parser.c:85-180)
  5 RFC3164-framed PatternDB-matchable (reference modules/correlation/radix.h:33-52)
`html` embeds the payload as `<pre>{payload}</pre>` plus deterministic padding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashutil import hash_idx, uniform01
from .schema import LANGS, LANG_WEIGHTS, N_HOSTS, PAGES_SCHEMA, ZIPF_EXPONENT

EPOCH_2026 = np.datetime64("2026-01-01T00:00:00", "us")

USERS = np.array(["alice", "bob", "carol", "dave", "eve", "mallory", "trent", "peggy"])
ACTIONS = np.array(["login", "logout", "read", "write", "delete", "update"])
ETYPES = np.array(["click", "view", "purchase", "signup", "error"])
METHODS = np.array(["GET", "GET", "GET", "POST", "PUT"])
STATUSES = np.array([200, 200, 200, 200, 301, 404, 500, 503])
UAS = np.array(["Mozilla/5.0", "curl/8.0", "Googlebot/2.1", "python-requests/2.31"])
PROGRAMS = np.array(["nginx", "cron", "systemd", "postfix", "app-server", "db"])
MONS = np.array(["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])

# Zipf(1.2) over N_HOSTS hosts — the skew fixture for salted aggregation.
_ranks = np.arange(1, N_HOSTS + 1, dtype=np.float64)
_zipf_w = 1.0 / _ranks**ZIPF_EXPONENT
ZIPF_CDF = np.cumsum(_zipf_w / _zipf_w.sum())
LANG_CDF = np.cumsum(np.asarray(LANG_WEIGHTS))
HOST_NAMES = np.array([f"host{r:03d}.example.com" for r in range(N_HOSTS)])


def _pick(pool: np.ndarray, h: np.ndarray) -> np.ndarray:
    return pool[(h % np.uint64(len(pool))).astype(np.int64)]


def _s(a) -> pd.Series:
    return pd.Series(a).astype(str)


def gen_pages_batch(idx: np.ndarray, seed: int = 42, html_pad: int = 256) -> pa.Table:
    """Generate pages rows for the given global row indices (vectorized)."""
    idx = np.asarray(idx, dtype=np.uint64)
    n = len(idx)
    h0 = hash_idx(idx, seed, 0)

    host_rank = np.searchsorted(ZIPF_CDF, uniform01(idx, seed, 1), side="right")
    host = HOST_NAMES[np.clip(host_rank, 0, N_HOSTS - 1)]
    lang = np.array(LANGS)[np.clip(np.searchsorted(LANG_CDF, uniform01(idx, seed, 2), side="right"), 0, len(LANGS) - 1)]

    jitter = (hash_idx(idx, seed, 3) % np.uint64(1201)).astype(np.int64) - 600
    ts_us = (idx.astype(np.int64) * 3 + jitter) * 1_000_000 + (h0 % np.uint64(1_000_000)).astype(np.int64)
    warc_ts = EPOCH_2026 + ts_us.astype("timedelta64[us]")

    url = ("https://" + _s(host) + "/p/" + _s(h0 % np.uint64(1000)) + "?id=" + _s(idx)).to_numpy(dtype=object)

    family = (idx % np.uint64(6)).astype(np.int64)
    text = np.empty(n, dtype=object)

    ts64 = pd.Series(warc_ts)
    mon = MONS[ts64.dt.month.to_numpy() - 1]
    day2 = _s(ts64.dt.day).str.rjust(2).to_numpy(dtype=object)  # RFC3164 space-padded day
    hms = ts64.dt.strftime("%H:%M:%S").to_numpy(dtype=object)
    bsd_ts = (_s(mon) + " " + _s(day2) + " " + _s(hms)).to_numpy(dtype=object)

    h1 = hash_idx(idx, seed, 4)
    h2 = hash_idx(idx, seed, 5)
    pri = (h1 % np.uint64(192)).astype(np.int64)
    pid = (h2 % np.uint64(30000) + np.uint64(100)).astype(np.int64)
    user = _pick(USERS, h1)
    nval = (h2 % np.uint64(1000)).astype(np.int64)
    ip = (
        "10." + _s(h1 % np.uint64(256)) + "." + _s(h2 % np.uint64(256)) + "." + _s((h1 >> np.uint64(8)) % np.uint64(256))
    ).to_numpy(dtype=object)

    # --- family 0: RFC3164, with edge-case variants (v = h1 % 20) ---
    m = family == 0
    if m.any():
        v = (h1[m] % np.uint64(20)).astype(np.int64)
        prog = _pick(PROGRAMS, h2[m]).astype(object)
        prog[v == 2] = "123"  # numeric program name edge case
        msg = (
            "action=" + _s(_pick(ACTIONS, h0[m])) + " user=" + _s(user[m]) + " n=" + _s(nval[m])
        ).to_numpy(dtype=object)
        head = ("<" + _s(pri[m]) + ">").to_numpy(dtype=object)
        head[v == 0] = ""  # missing PRI edge case
        tail = (_s(prog) + "[" + _s(pid[m]) + "]: ").to_numpy(dtype=object)
        nop = v == 1  # program without pid edge case
        tail[nop] = (_s(prog[nop]) + ": ").to_numpy(dtype=object)
        text[m] = (_s(head) + _s(bsd_ts[m]) + " " + _s(host[m]) + " " + _s(tail) + _s(msg)).to_numpy(dtype=object)

    # --- family 1: RFC5424 with SDATA (or '-' variant) ---
    m = family == 1
    if m.any():
        v = (h1[m] % np.uint64(10)).astype(np.int64)
        off_idx = (h2[m] % np.uint64(3)).astype(np.int64)
        off_us = np.array([0, 7200, -18000], dtype=np.int64)[off_idx] * 1_000_000
        local = pd.Series(pd.Series(warc_ts[m]).to_numpy() + off_us.astype("timedelta64[us]"))
        iso = local.dt.strftime("%Y-%m-%dT%H:%M:%S.%f").str[:-3].to_numpy(dtype=object)
        tz = np.array(["Z", "+02:00", "-05:00"], dtype=object)[off_idx]
        app = _pick(PROGRAMS, h2[m])
        sd = (
            '[ex@0 k="' + _s(_pick(ACTIONS, h0[m])) + '" q="v' + _s(nval[m]) + '"]'
        ).to_numpy(dtype=object)
        sd[v == 0] = "-"  # missing-SDATA variant
        msg = ("evt " + _s(_pick(ETYPES, h0[m])) + " count=" + _s(nval[m])).to_numpy(dtype=object)
        text[m] = (
            "<" + _s(pri[m]) + ">1 " + _s(iso) + _s(tz) + " " + _s(host[m]) + " " + _s(app)
            + " " + _s(pid[m]) + " ID" + _s(h0[m] % np.uint64(100)) + " " + _s(sd) + " " + _s(msg)
        ).to_numpy(dtype=object)

    # --- family 2: CSV apache access log ---
    m = family == 2
    if m.any():
        ats = pd.Series(warc_ts[m]).dt.strftime("%d/%b/%Y:%H:%M:%S +0000").to_numpy(dtype=object)
        status = _pick(STATUSES, h1[m])
        nbytes = (h2[m] % np.uint64(50000)).astype(np.int64)
        text[m] = (
            _s(ip[m]) + ' - - [' + _s(ats) + '] "' + _s(_pick(METHODS, h0[m])) + " /p/"
            + _s(h0[m] % np.uint64(1000)) + ' HTTP/1.1" ' + _s(status) + " " + _s(nbytes)
            + ' "-" "' + _s(_pick(UAS, h1[m])) + '" ' + _s(h2[m] % np.uint64(2000)) + " " + _s(host[m])
        ).to_numpy(dtype=object)

    # --- family 3: KV pairs (quoted value + stray-words variant) ---
    m = family == 3
    if m.any():
        v = (h1[m] % np.uint64(10)).astype(np.int64)
        stray = np.where(v == 0, "stray words here ", "")
        text[m] = (
            "key1=v" + _s(nval[m]) + ', key2="quoted v' + _s(h0[m] % np.uint64(100)) + '", '
            + _s(stray) + "status=" + _s(_pick(STATUSES, h1[m])) + ", src_ip=" + _s(ip[m])
        ).to_numpy(dtype=object)

    # --- family 4: nested JSON ---
    m = family == 4
    if m.any():
        text[m] = (
            '{"event":{"type":"' + _s(_pick(ETYPES, h0[m])) + '","count":' + _s(nval[m])
            + ',"ok":true,"tags":["a","b"],"meta":null},"user":"' + _s(user[m]) + '"}'
        ).to_numpy(dtype=object)

    # --- family 5: RFC3164-framed PatternDB-matchable messages ---
    m = family == 5
    if m.any():
        v = (h1[m] % np.uint64(3)).astype(np.int64)
        msg = np.empty(int(m.sum()), dtype=object)
        s0 = v == 0
        msg[s0] = ("su: 'su root' failed for " + _s(user[m][s0]) + " on /dev/pts/" + _s(nval[m][s0] % 10)).to_numpy(dtype=object)
        s1 = v == 1
        msg[s1] = (
            "sshd[" + _s(pid[m][s1]) + "]: Accepted password for " + _s(user[m][s1]) + " from "
            + _s(ip[m][s1]) + " port " + _s(nval[m][s1] + 1024) + " ssh2"
        ).to_numpy(dtype=object)
        s2 = v == 2
        msg[s2] = ("kernel: eth" + _s(nval[m][s2] % 4) + ": link up").to_numpy(dtype=object)
        text[m] = ("<" + _s(pri[m]) + ">" + _s(bsd_ts[m]) + " " + _s(host[m]) + " " + _s(msg)).to_numpy(dtype=object)

    # html wraps the payload; deterministic padding up to html_pad bytes
    padlen = (h2 % np.uint64(max(html_pad, 1))).astype(np.int64)
    pads = np.array(["x" * int(k) for k in padlen], dtype=object)
    html_s = ("<html><body><pre>" + pd.Series(text).astype(str) + "</pre><!--" + _s(pads) + "--></body></html>").to_numpy(dtype=object)
    html = np.array([s.encode() for s in html_s], dtype=object)

    return pa.Table.from_arrays(
        [
            pa.array(url, type=pa.string()),
            pa.array(warc_ts, type=pa.timestamp("us")),
            pa.array(html, type=pa.binary()),
            pa.array(text, type=pa.string()),
            pa.array(lang, type=pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


class PageGen:
    """Actor-pool generator: `ray.data.range(n).map_batches(PageGen(seed))`."""

    def __init__(self, seed: int = 42, html_pad: int = 256):
        self.seed = seed
        self.html_pad = html_pad

    def __call__(self, batch: pa.Table) -> pa.Table:
        return gen_pages_batch(batch.column("id").to_numpy(), self.seed, self.html_pad)


def pages_dataset(n_rows: int, seed: int = 42, html_pad: int = 256, blocks: int | None = None):
    """Distributed deterministic pages dataset (lazy).

    Default block count is 2 per cluster CPU — ray.data.range's own
    default (read_op_min_num_blocks=200) shreds small corpora into
    ~3k-row blocks whose per-task scheduling overhead dominates the
    fused parse (measured 5.7 s vs 1.5 s on the 600k-row headline)."""
    import ray.data as rd

    if blocks is None:
        from .context import cluster_cpus

        blocks = max(1, min(n_rows, 2 * cluster_cpus(default=8)))
    return rd.range(n_rows, override_num_blocks=blocks).map_batches(
        PageGen(seed, html_pad), batch_format="pyarrow", batch_size=65536)


def gen_pages_table(n_rows: int, seed: int = 42, html_pad: int = 256) -> pa.Table:
    """Small in-memory table for tests (no Ray needed)."""
    return gen_pages_batch(np.arange(n_rows, dtype=np.uint64), seed, html_pad)


def write_pages(out_dir: str, n_rows: int, seed: int = 42, html_pad: int = 256, shards: int = 16) -> str:
    """Materialize a deterministic pages corpus as partitioned Parquet shards.

    One file per shard with deterministic names → resumable/reusable input
    layout (never one giant file)."""
    import os

    import pyarrow.parquet as pq

    import json

    os.makedirs(out_dir, exist_ok=True)
    # resume is only valid for the SAME generation config — a dir built
    # with a different n_rows/seed/pad/shards would otherwise be silently
    # served with stale shards
    cfg = {"n_rows": n_rows, "seed": seed, "html_pad": html_pad, "shards": shards}
    cfg_path = os.path.join(out_dir, "_gen_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as fh:
            if json.load(fh) != cfg:
                for f in os.listdir(out_dir):
                    if f.startswith("pages-") and f.endswith(".parquet"):
                        os.unlink(os.path.join(out_dir, f))
                with open(cfg_path, "w") as fh:
                    json.dump(cfg, fh)
    else:
        with open(cfg_path, "w") as fh:
            json.dump(cfg, fh)
    per = (n_rows + shards - 1) // shards
    for s in range(shards):
        path = os.path.join(out_dir, f"pages-{s:05d}.parquet")
        if os.path.exists(path):
            continue
        lo, hi = s * per, min((s + 1) * per, n_rows)
        if lo >= hi:
            break
        tmp = path + ".tmp"
        pq.write_table(gen_pages_batch(np.arange(lo, hi, dtype=np.uint64), seed, html_pad), tmp)
        os.replace(tmp, path)
    return out_dir
