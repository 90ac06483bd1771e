"""value-pairs scope conformance.

Pins lib/value-pairs/tests/test_value_pairs.c through
value_pairs_foreach: the reference's own RFC5424 test message is parsed
by the engine's syslog parser, then each scope's emitted key set is
compared with the corpus expectation. Engine adaptations are noted
inline: MSGFORMAT is an engine nv too (value differs: 'rfc5424' vs the
reference's 'syslog'), and the all-macros sweep covers this engine's
175-name macro table rather than the C macro table (RAWMSG_SIZE,
HOSTID etc. have no batch equivalent).
"""

import pyarrow as pa
import pytest

from axosyslog_ray.functions.valuepairs import value_pairs_foreach
from axosyslog_ray.stages.syslog import parse_syslog_table

MESSAGE_TEXT = (
    '<134>1 2009-10-16T11:51:56+02:00 exchange.macartney.esbjerg '
    'MSExchange_ADAccess 20208 _MSGID_ '
    '[origin ip="exchange.macartney.esbjerg"]'
    '[meta sequenceId="191732" sysUpTime="68807696"]'
    '[EventData@18372.4 Data="MSEXCHANGEOWAAPPPOOL.CONFIG\\" -W \\"\\" -M 1 '
    '-AP \\"MSEXCHANGEOWAAPPPOOL5244fileserver.macartney.esbjerg CDG 1 7 7 1 '
    '0 1 1 7 1 mail.macartney.esbjerg CDG 1 7 7 1 0 1 1 7 1 '
    'maindc.macartney.esbjerg CD- 1 6 6 0 0 1 1 6 1 "]'
    '[Keywords@18372.4 Keyword="Classic"] '
    'ApplicationMSExchangeADAccess: message')

SDATA_KEYS = [
    ".SDATA.EventData@18372.4.Data",
    ".SDATA.Keywords@18372.4.Keyword",
    ".SDATA.meta.sequenceId",
    ".SDATA.meta.sysUpTime",
    ".SDATA.origin.ip",
]


@pytest.fixture(scope="module")
def msg():
    import pandas as pd

    t = parse_syslog_table(pa.table({"text": [MESSAGE_TEXT]}))
    # create_message() also tags the message; the eval options carry
    # seq_num=11 and the C_* macros read the current (processing) time —
    # in this engine both are columns
    t = t.set_column(
        t.column_names.index("tags"), "tags",
        pa.array([["almafa"]], type=pa.list_(pa.string())))
    t = t.append_column("seqnum", pa.array(["11"]))
    t = t.append_column("proc_ts", pa.Array.from_pandas(
        pd.Series(pd.to_datetime(["2009-10-16 12:00:00"]))))
    # received time (the R_* macros' source, warc_ts in this engine)
    return t.append_column("warc_ts", pa.Array.from_pandas(
        pd.Series(pd.to_datetime(["2009-10-16 11:52:00"]))))


def keys(msg, scope, patterns=None, pairs=None, transforms=None):
    rows = value_pairs_foreach(msg, scope, patterns=patterns, pairs=pairs,
                               transforms=transforms)
    return list(rows[0])  # sorted by construction


def _scope_case(msg, scope, exclude, expected):
    """The corpus's testcase(): scope + optional exclude pattern + an
    explicit test.key pair that must always survive."""
    patterns = [(exclude, False)] if exclude else None
    got = keys(msg, scope, patterns=patterns,
               pairs={"test.key": "$MESSAGE"})
    assert "test.key" in got, "explicit pairs must bypass excludes"
    got.remove("test.key")
    assert got == expected.split(","), f"scope={scope}"


RFC3164_EXPECTED = "DATE,FACILITY,HOST,MESSAGE,PID,PRIORITY,PROGRAM"
RFC5424_EXPECTED = (",".join(SDATA_KEYS)
                    + ",DATE,FACILITY,HOST,MESSAGE,MSGID,PID,PRIORITY,"
                      "PROGRAM")


def test_rfc3164_core_base(msg):
    for scope in ("rfc3164", "core", "base"):
        _scope_case(msg, scope, None, RFC3164_EXPECTED)


def test_rfc5424_and_syslog_proto(msg):
    for scope in ("rfc5424", "syslog-proto"):
        _scope_case(msg, scope, None, RFC5424_EXPECTED)


def test_selected_macros(msg):
    _scope_case(msg, "selected-macros", None,
             "DATE,FACILITY,HOST,MESSAGE,PID,PRIORITY,PROGRAM,SEQNUM,"
             "SOURCEIP,TAGS")


def test_nv_pairs(msg):
    _scope_case(msg, "nv-pairs", None,
             "HOST,MESSAGE,MSGFORMAT,MSGID,PID,PROGRAM")


def test_dot_nv_pairs_and_sdata(msg):
    _scope_case(msg, "dot-nv-pairs", None, ",".join(SDATA_KEYS))
    _scope_case(msg, "sdata", None, ",".join(SDATA_KEYS))


def test_all_nv_pairs(msg):
    _scope_case(msg, "all-nv-pairs", None,
             ",".join(SDATA_KEYS) + ",HOST,MESSAGE,MSGFORMAT,MSGID,PID,"
             "PROGRAM")


def test_nv_pairs_with_sdata_exclude(msg):
    # '.SDATA.*' exclusion cannot re-add anything to nv-pairs
    _scope_case(msg, "nv-pairs", ".SDATA.*",
             "HOST,MESSAGE,MSGFORMAT,MSGID,PID,PROGRAM")


def test_exclude_does_not_affect_explicit_pairs(msg):
    _scope_case(msg, "rfc3164", "test.*", RFC3164_EXPECTED)


def test_exclude_removes_default_set_member(msg):
    _scope_case(msg, "nv-pairs", "MESSAGE",
             "HOST,MSGFORMAT,MSGID,PID,PROGRAM")


def test_everything_superset_and_empty_skip(msg):
    got = keys(msg, "everything")
    for k in RFC5424_EXPECTED.split(","):
        assert k in got, k
    for k in ("TAGS", "SEQNUM", "SOURCEIP", "C_DATE", "S_DATE", "R_DATE",
              "MSGHDR", "BSDTAG"):
        assert k in got, k
    # empty macro values are skipped entirely (vp_merge_builtins)
    assert "CONTEXT_ID" not in got


def test_include_pattern_pulls_macros_in(msg):
    # vp_merge_macros: an include glob merges matching MACROS even
    # without a macro scope
    got = keys(msg, "nv-pairs", patterns=[("S_DATE", True)])
    assert "S_DATE" in got
    assert "HOST" in got


def test_values_come_from_the_message(msg):
    rows = value_pairs_foreach(msg, "rfc5424")
    r = rows[0]
    assert r["HOST"] == "exchange.macartney.esbjerg"
    assert r["PROGRAM"] == "MSExchange_ADAccess"
    assert r["PID"] == "20208"
    assert r["MSGID"] == "_MSGID_"
    assert r[".SDATA.meta.sequenceId"] == "191732"
    assert r[".SDATA.Keywords@18372.4.Keyword"] == "Classic"
    assert r["FACILITY"] == "local0"
    assert r["PRIORITY"] == "info"


def test_transformers(msg):
    # test_transformers: add-prefix('__') -> shift(2) -> replace-prefix
    # C_ -> CC_, applied in declaration order
    got = keys(msg, "everything", transforms=[
        ("add_prefix", "__"), ("shift", 2), ("replace_prefix", ("C_", "CC_"))])
    assert "CC_DATE" in got and "C_DATE" not in got
    assert "DATE" in got and "HOST" in got
    assert ".SDATA.meta.sequenceId" in got
