"""Canonical Arrow schemas.

The input table shape is fixed by BASELINE.json `input_hint`:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string) —
Common-Crawl-style pages whose `text` column carries one log/payload line.

The parsed message table mirrors the reference's LogMessage record
(reference lib/logmsg/logmsg.h:241-327): fixed builtin columns promoted to
real Arrow columns, the dynamic name-value tail as a map<string,string>
column `nv` (reference NVTable, lib/logmsg/nvtable.h:265+), tags as
list<string> (reference bitset, lib/logmsg/tags.c).
"""

from __future__ import annotations

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Parsed-message columns appended by the header-parse stage. `pri` defaults
# to 13 (user.notice) when the line carries no <PRI> — same default the
# reference applies (modules/syslogformat/syslog-format.c, default_pri).
MSG_FIELDS = [
    pa.field("pri", pa.uint16()),
    pa.field("ts_stamp", pa.timestamp("us")),
    pa.field("host", pa.string()),
    pa.field("program", pa.string()),
    pa.field("pid", pa.string()),
    pa.field("msgid", pa.string()),
    pa.field("message", pa.string()),
    pa.field("sdata", pa.map_(pa.string(), pa.string())),
]

DEFAULT_PRI = 13  # user.notice == facility 1 * 8 + severity 5

LANGS = ["en", "de", "fr", "es", "zh", "ja", "ru", "pt"]
# en-heavy skew per FIXTURES.md §1 (second skew key for salted aggregation)
LANG_WEIGHTS = [0.60, 0.08, 0.07, 0.07, 0.06, 0.05, 0.04, 0.03]

N_HOSTS = 1000
ZIPF_EXPONENT = 1.2

FAMILY_NAMES = ["rfc3164", "rfc5424", "csv", "kv", "json", "patterndb"]
