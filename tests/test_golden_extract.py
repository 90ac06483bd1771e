"""The §5 byte-identity invariant (SURVEY.md, FIXTURES.md §4): the
vectorized engine's extracted fields must match the committed golden
fixture — produced by the pure-Python scalar reference implementation —
byte-for-byte per url.

Regenerate (only when the reference semantics intentionally change):
see the generation snippet in the git history of tests/golden/.
"""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from axosyslog_ray.stages.syslog import parse_syslog_table
from axosyslog_ray.synth import gen_pages_table

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "expected_extract.parquet")


def test_vectorized_extraction_matches_golden_byte_for_byte():
    golden = pq.read_table(GOLDEN).to_pandas().set_index("url")
    out = parse_syslog_table(gen_pages_table(len(golden))).to_pandas().set_index("url")
    assert set(out.index) == set(golden.index)
    out = out.loc[golden.index]

    NULL = "\x00<NULL>\x00"
    for col in ("pri", "host", "program", "pid", "msgid", "message", "syslog_parsed", "msgformat"):
        # fillna sentinel: pandas treats None as missing, and missing != missing
        a = out[col].astype(object).fillna(NULL)
        b = golden[col].astype(object).fillna(NULL)
        mism = a[a != b]
        assert mism.empty, f"{col}: {len(mism)} mismatches, e.g. {mism.head(3)}"

    # timestamps: equality at microsecond precision
    a = pd.to_datetime(out["ts_stamp"])
    b = pd.to_datetime(golden["ts_stamp"])
    bad = a[(a != b) & ~(a.isna() & b.isna())]
    assert bad.empty, f"ts_stamp: {len(bad)} mismatches"

    # sdata maps serialized the same way the golden was
    ser = out["sdata"].map(lambda v: None if v is None else "|".join(f"{k}={x}" for k, x in v))
    mism = ser.astype(object).fillna(NULL)[ser.astype(object).fillna(NULL) != golden["sdata_json"].astype(object).fillna(NULL)]
    assert mism.empty, f"sdata: {len(mism)} mismatches"
