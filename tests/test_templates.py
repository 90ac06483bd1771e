"""Template engine + macro + template-function tests.

Shapes adapted from the reference's template tests
(reference lib/template/tests/test_template.c and
lib/template/tests/test_template_speed.c:42-56 template list).
"""

import pandas as pd
import pyarrow as pa

from axosyslog_ray.functions.templates import Template, template_hash
from axosyslog_ray.stages.syslog import parse_syslog_table


def _msg_table():
    t = pa.table(
        {
            "url": ["u1", "u2"],
            "warc_ts": pa.array(pd.Series([pd.Timestamp("2026-08-17 12:00:00")] * 2, dtype="datetime64[us]")),
            "text": [
                "<38>Aug 17 05:02:28 myhost sshd[1234]: Accepted publickey for joe",
                "<13>Aug 17 06:00:00 other nginx: GET /index",
            ],
        }
    )
    return parse_syslog_table(t)


def test_value_refs_and_literals():
    t = _msg_table()
    assert Template("$HOST ${PROGRAM}").eval(t).tolist() == ["myhost sshd", "other nginx"]
    assert Template("pfx $MESSAGE sfx").eval(t).tolist()[1] == "pfx GET /index sfx"


def test_pri_macros():
    t = _msg_table()
    assert Template("$FACILITY.$SEVERITY").eval(t).tolist() == ["auth.info", "user.notice"]
    assert Template("$PRI/$FACILITY_NUM/$SEVERITY_NUM").eval(t).tolist() == ["38/4/6", "13/1/5"]


def test_date_macros():
    t = _msg_table()
    assert Template("$YEAR-$MONTH-$DAY").eval(t).tolist() == ["2026-08-17", "2026-08-17"]
    assert Template("$DATE").eval(t).tolist()[0] == "Aug 17 05:02:28"
    assert Template("$ISODATE").eval(t).tolist()[0] == "2026-08-17T05:02:28+00:00"
    assert Template("$R_HOUR").eval(t).tolist() == ["12", "12"]


def test_unknown_value_is_empty():
    t = _msg_table()
    assert Template("[$NOPE]").eval(t).tolist() == ["[]", "[]"]


def test_dollar_escape():
    t = _msg_table()
    assert Template("$$HOST").eval(t).tolist() == ["$HOST", "$HOST"]


def test_function_calls_nested():
    t = _msg_table()
    assert Template("$(uppercase $PROGRAM)").eval(t).tolist() == ["SSHD", "NGINX"]
    assert Template("$(substr $(uppercase $HOST) 0 2)").eval(t).tolist() == ["MY", "OT"]
    assert Template("$(if $(echo 1) a b)").eval(t).tolist() == ["a", "a"]
    assert Template("$(+ $PRI 2)").eval(t).tolist() == ["40", "15"]
    assert Template("$(length $HOST)").eval(t).tolist() == ["6", "5"]


def test_list_functions():
    t = _msg_table()
    assert Template("$(list-concat a b c)").eval(t).tolist()[0] == "a,b,c"
    assert Template("$(list-head a,b,c)").eval(t).tolist()[0] == "a"
    assert Template("$(list-tail a,b,c)").eval(t).tolist()[0] == "b,c"
    assert Template("$(list-count a,b,c)").eval(t).tolist()[0] == "3"
    assert Template("$(list-slice 1:2 a,b,c)").eval(t).tolist()[0] == "b"


def test_numeric_fold_over_list_arg():
    t = _msg_table()
    assert Template("$(sum 1,2,3)").eval(t).tolist()[0] == "6"
    assert Template("$(average 2,4)").eval(t).tolist()[0] == "3"
    assert Template("$(max 5,1,9)").eval(t).tolist()[0] == "9"


def test_digests_and_encodings():
    import hashlib

    t = _msg_table()
    assert Template("$(sha256 $HOST)").eval(t).tolist()[0] == hashlib.sha256(b"myhost").hexdigest()
    assert Template("$(sha1 x 8)").eval(t).tolist()[0] == hashlib.sha1(b"x").hexdigest()[:8]
    assert Template("$(url-encode a b/c)").eval(t).tolist()[0] == "a%20b%2Fc"


def test_ipv4_to_int():
    t = _msg_table()
    assert Template("$(ipv4-to-int 1.2.3.4)").eval(t).tolist()[0] == str((1 << 24) + (2 << 16) + (3 << 8) + 4)


def test_template_hash_deterministic_partitions():
    t = _msg_table()
    h1 = template_hash("$HOST", t, 16)
    h2 = template_hash("$HOST", t, 16)
    assert (h1 == h2).all() and (h1 < 16).all()


def test_higher_order_list_functions():
    t = _msg_table()
    assert Template("$(map $(uppercase $_) a,b,c)").eval(t).tolist()[0] == "A,B,C"
    assert Template("$(filter $(startswith $_ h) host1,web2,host3)").eval(t).tolist()[0] == "host1,host3"


def test_filterx_casts():
    t = _msg_table()
    assert Template("$(int 3.7)").eval(t).tolist()[0] == "3"
    assert Template("$(bool yes)/$(bool nah)").eval(t).tolist()[0] == "true/false"


def test_week_day_sunday_is_one():
    # reference lib/template/macros.c:372: tm_wday+1 (Sunday=1..Saturday=7).
    # 2026-08-16 is a Sunday, 2026-08-17 a Monday.
    t = pa.table(
        {
            "text": [
                "<13>Aug 16 06:00:00 h p: sun",
                "<13>Aug 17 06:00:00 h p: mon",
                "<13>Aug 22 06:00:00 h p: sat",
            ]
        }
    )
    t = parse_syslog_table(t)
    assert Template("$WEEK_DAY").eval(t).tolist() == ["1", "2", "7"]


def test_round_half_away_from_zero():
    t = _msg_table()
    assert Template("$(round 2.5)").eval(t).tolist()[0] == "3"
    assert Template("$(round -2.5)").eval(t).tolist()[0] == "-3"
    assert Template("$(round 2.345 2)").eval(t).tolist()[0] == "2.35"


def test_extended_date_macros():
    t = _msg_table()
    # 2026-08-17 is a Monday, day-of-year 229, ISO week 34
    assert Template("$YEAR_DAY").eval(t).tolist()[0] == "229"
    assert Template("$MONTH_ABBREV/$MONTH_NAME").eval(t).tolist()[0] == "Aug/August"
    assert Template("$HOUR12 $AMPM").eval(t).tolist() == ["05 AM", "06 AM"]
    assert Template("$WEEK_DAY_ABBREV $WEEK_DAY_NAME").eval(t).tolist()[0] == "Mon Monday"
    assert Template("$ISOWEEK").eval(t).tolist()[0] == "34"
    # WEEK: (yday0 - (wday-1+7)%7 + 7)/7, Sunday-start; Aug 17 2026 -> 33
    assert Template("$WEEK").eval(t).tolist()[0] == "33"
    # MONTH_WEEK: mday=17 wday=1 -> 17//7 + (1>0 and 17%7>=1) = 2+1
    assert Template("$MONTH_WEEK").eval(t).tolist()[0] == "3"
    # S_* mirrors the unprefixed sent stamp
    assert Template("$S_HOUR").eval(t).tolist() == Template("$HOUR").eval(t).tolist()
    # C_*/P_* read proc_ts; absent -> empty (documented divergence)
    assert Template("[$C_HOUR]").eval(t).tolist() == ["[]", "[]"]


def test_bsdtag_msghdr_loghost():
    import socket

    t = _msg_table()
    # pri 38: facility auth(4) -> 'E', severity 6 -> "6E"
    assert Template("$BSDTAG").eval(t).tolist() == ["6E", "5B"]
    assert Template("$MSGHDR").eval(t).tolist()[0] == "sshd[1234]: "
    assert Template("$MSGHDR").eval(t).tolist()[1] == "nginx: "
    assert Template("$LOGHOST").eval(t).tolist()[0] == socket.gethostname()


def test_c_macros_with_proc_ts():
    t = _msg_table()
    t = t.append_column("proc_ts", pa.array(pd.Series([pd.Timestamp("2026-08-17 14:30:00")] * 2, dtype="datetime64[us]")))
    assert Template("$C_HOUR:$C_MIN").eval(t).tolist() == ["14:30", "14:30"]
    assert Template("$P_ISODATE").eval(t).tolist()[0] == "2026-08-17T14:30:00+00:00"


def test_getent_and_dns_resolve():
    t = _msg_table()
    # root is uid 0 in any sane /etc/passwd
    assert Template("$(getent passwd root)").eval(t).tolist()[0] == "0"
    assert Template("$(getent passwd 0)").eval(t).tolist()[0] == "root"
    # unknown ip resolves to itself (use-dns(no) semantics)
    assert Template("$(dns-resolve-ip 203.0.113.9)").eval(t).tolist()[0] == "203.0.113.9"
    # localhost should be in /etc/hosts
    out = Template("$(dns-resolve-ip 127.0.0.1)").eval(t).tolist()[0]
    assert out != "" and out != "127.0.0.1"


def test_getent_hosts_does_not_poison_dns_cache():
    t = _msg_table()
    # hosts via getent first, then dns-resolve-ip must still work
    via_getent = Template("$(getent hosts 127.0.0.1)").eval(t).tolist()[0]
    via_dns = Template("$(dns-resolve-ip 127.0.0.1)").eval(t).tolist()[0]
    assert via_getent == via_dns != "127.0.0.1"


def test_cond_misc_tag_functions():
    t = _msg_table()
    assert Template("$(or '' $HOST fallback)").eval(t).tolist() == ["myhost", "other"]
    assert Template("$(or '' '' zz)").eval(t).tolist()[0] == "zz"
    import os
    os.environ["AXOTEST_ENV"] = "e1"
    assert Template("$(env AXOTEST_ENV)").eval(t).tolist()[0] == "e1"
    assert Template("$(binary 0x41 0x42)").eval(t).tolist()[0] == "AB"
    assert Template("$(names pri)").eval(t).tolist()[0] == "pri"
    assert Template("$(values url)").eval(t).tolist() == ["u1", "u2"]


def test_indent_multi_line():
    import pyarrow as pa
    from axosyslog_ray.functions.templates import Template as T

    t = pa.table({"m": ["line1\nline2\n\tkept"]})
    assert T("$(indent-multi-line $m)").eval(t).tolist()[0] == "line1\n\tline2\n\tkept"


def test_tag_functions():
    import pyarrow as pa

    t = pa.table({
        "x": ["a", "b"],
        "tags": pa.array([["auth", "ssh"], []], type=pa.list_(pa.string())),
    })
    assert Template("$(tag auth)").eval(t).tolist() == ["1", "0"]
    assert Template("$(tag auth YES NO)").eval(t).tolist() == ["YES", "NO"]
    assert Template("$(tags-head web ssh auth)").eval(t).tolist() == ["ssh", ""]


def test_empty_quoted_arg_preserved():
    t = _msg_table()
    # an empty quoted argument is a REAL argument (was silently dropped,
    # making 3-arg functions crash with a missing positional)
    assert Template("$(if $(echo 1) '' fb)").eval(t).tolist() == ["", ""]
    assert Template("$(if $(echo '') yes '')").eval(t).tolist() == ["", ""]
    from axosyslog_ray.functions.templates import _split_args
    assert _split_args("default '' fallback") == ["default", "", "fallback"]
