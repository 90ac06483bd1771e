"""FilterX message-context + network-object function tests.

Semantics pinned against the reference:
- ip()/subnet(): lib/filterx/object-ip.c, object-subnet.c (+ their
  tests/test_object_ip.c, test_object_subnet.c forms)
- sdata family: lib/filterx/func-sdata.c
- get/set_timestamp: lib/filterx/func-timestamp.c
- get_timezone_source: lib/timeutils/unixtime.c:428 source names
- format_syslog_5424: modules/syslogformat/filterx-func-format-syslog.c
- metrics family: lib/filterx/object-metrics-labels.c +
  modules/metrics-probe/filterx/func-update-metric.c
- failure_info: lib/filterx/func-failure-info.c
"""

import pandas as pd
import pyarrow as pa

from axosyslog_ray.filterx import FilterX
from axosyslog_ray.filterx_msg import FxSubnet


def _t(**cols):
    return pa.table(cols)


def _run(src, table):
    return FilterX(src)(table)


# -- digest ------------------------------------------------------------------

def test_digest_generic():
    t = _t(m=["foobar", None])
    out = _run('$d = digest($m, "md5"); $s = digest($m);', t)
    import hashlib
    assert out.column("d").to_pylist() == [hashlib.md5(b"foobar").hexdigest(), None]
    assert out.column("s").to_pylist() == [hashlib.sha256(b"foobar").hexdigest(), None]


# -- ip() / subnet() ---------------------------------------------------------

def test_ip_cast_normalizes():
    t = _t(m=["192.168.1.1", "2001:db8:0:0:0:0:0:1", "not-an-ip"])
    out = _run('$i = string(ip($m)); $ok = isset(ip($m));', t)
    assert out.column("i").to_pylist() == ["192.168.1.1", "2001:db8::1", None]
    assert out.column("ok").to_pylist() == [True, True, False]


def test_subnet_cast_masks_and_renders():
    # v4: address is pre-masked; netmask renders dotted (object-subnet.c
    # _subnet_ipv4_to_string + _parse_ipv4_cidr address &= netmask)
    t = _t(m=["10.1.2.3/8", "192.168.1.0/255.255.255.0", "10.0.0.1"])
    out = _run("$s = string(subnet($m));", t)
    assert out.column("s").to_pylist() == [
        "10.0.0.0/255.0.0.0",
        "192.168.1.0/255.255.255.0",
        "10.0.0.1/255.255.255.255",
    ]


def test_subnet_v6_renders_hex_mask():
    t = _t(m=["2001:db8::/32"])
    out = _run("$s = string(subnet($m));", t)
    assert out.column("s").to_pylist() == ["2001:db8::/ffff:ffff::"]


def test_ip_in_subnet_membership():
    t = _t(ip=["10.1.2.3", "11.0.0.1", "2001:db8::5", None])
    out = _run('$v4 = $ip in subnet("10.0.0.0/8");'
               '$v6 = ip($ip) in subnet("2001:db8::/32");'
               '$any = $ip in [subnet("10.0.0.0/8"), subnet("11.0.0.0/8")];', t)
    assert out.column("v4").to_pylist() == [True, False, False, False]
    assert out.column("v6").to_pylist() == [False, False, True, False]
    assert out.column("any").to_pylist() == [True, True, False, False]


def test_subnet_parse_rejects_bad():
    assert FxSubnet.parse("10.0.0.0/33") is None
    assert FxSubnet.parse("10.0.0.0/x") is None
    assert FxSubnet.parse("banana") is None
    assert FxSubnet.parse("10.0.0.0/0").addr == 0


# -- sdata family ------------------------------------------------------------

_SD = [[("exampleSDID@32473.iut", "3"), ("exampleSDID@32473.eventID", "1011"),
        ("meta.seq", "7")], [], None]


def _sd_table():
    return pa.table({
        "m": ["a", "b", "c"],
        "sdata": pa.array(_SD, type=pa.map_(pa.string(), pa.string())),
    })


def test_has_sdata():
    out = _run("$h = has_sdata();", _sd_table())
    assert out.column("h").to_pylist() == [True, False, False]


def test_get_sdata_nested_dict():
    out = _run('$d = get_sdata(); $iut = $d["exampleSDID@32473"]["iut"];'
               '$seq = $d["meta"]["seq"];', _sd_table())
    assert out.column("iut").to_pylist() == ["3", None, None]
    assert out.column("seq").to_pylist() == ["7", None, None]


def test_is_sdata_from_enterprise():
    out = _run('$e = is_sdata_from_enterprise("32473");'
               '$x = is_sdata_from_enterprise("99");', _sd_table())
    assert out.column("e").to_pylist() == [True, False, False]
    assert out.column("x").to_pylist() == [False, False, False]


# -- timestamps --------------------------------------------------------------

def test_get_set_timestamp():
    t = pa.table({
        "m": ["a", "b"],
        "ts_stamp": pa.array([1700000000000000, 1700000060000000],
                             type=pa.timestamp("us")),
        "warc_ts": pa.array([1700003600000000, 1700003660000000],
                            type=pa.timestamp("us")),
    })
    out = _run('$s = format_isodate(get_timestamp());'
               '$r = format_isodate(get_timestamp(stamp="recvd"));'
               'set_timestamp(get_timestamp(stamp="recvd"));', t)
    assert out.column("s").to_pylist() == [
        "2023-11-14T22:13:20+00:00", "2023-11-14T22:14:20+00:00"]
    assert out.column("r").to_pylist() == [
        "2023-11-14T23:13:20+00:00", "2023-11-14T23:14:20+00:00"]
    # set_timestamp overwrote ts_stamp with recvd
    assert out.column("ts_stamp").to_pylist() == out.column("warc_ts").to_pylist()


def test_get_timezone_source():
    t = _t(m=["2023-01-01 10:00:00 +0200", "bad"])
    out = _run('$p = get_timezone_source(strptime($m, "%Y-%m-%d %H:%M:%S %z"));'
               '$f = get_timezone_source(fix_timezone(strptime($m, "%Y-%m-%d %H:%M:%S %z"), "Europe/Budapest"));',
               t)
    assert out.column("p").to_pylist() == ["parsed", None]
    assert out.column("f").to_pylist() == ["fixed", None]


# -- format_syslog_5424 ------------------------------------------------------

def test_format_syslog_5424_defaults():
    t = pa.table({
        "message": ["hello", "world"],
        "pri": pa.array([165, None], type=pa.uint16()),
        "ts_stamp": pa.array([1700000000000000, None], type=pa.timestamp("us")),
        "sdata": pa.array([[("exampleSDID@32473.iut", "3")], None],
                          type=pa.map_(pa.string(), pa.string())),
    })
    out = _run("$line = format_syslog_5424($message, host=$h, program='app');", t)
    lines = out.column("line").to_pylist()
    assert lines[0] == ('<165>1 2023-11-14T22:13:20.000000+00:00 - app - - '
                        '[exampleSDID@32473 iut="3"] hello\n')
    assert lines[1] == "<13>1 - - app - - - world\n"


def test_format_syslog_5424_octet_count():
    t = _t(message=["hi"])
    out = _run("$line = format_syslog_5424($message, add_octet_count=true,"
               " pri=34, timestamp=strptime('2023-11-14T22:13:20', '%Y-%m-%dT%H:%M:%S'));", t)
    line = out.column("line").to_pylist()[0]
    body = line.split(" ", 1)[1]
    assert line.startswith(f"{len(body.encode())} ")
    assert body == "<34>1 2023-11-14T22:13:20.000000+00:00 - - - - - hi\n"


def test_format_syslog_5424_sdata_escaping():
    t = pa.table({
        "message": ["x"],
        "sdata": pa.array([[('id.p', 'a"b\\c]d')]],
                          type=pa.map_(pa.string(), pa.string())),
    })
    out = _run("$line = format_syslog_5424($message, pri=13);", t)
    assert '[id p="a\\"b\\\\c\\]d"]' in out.column("line").to_pylist()[0]


# -- metrics -----------------------------------------------------------------

def test_metrics_labels_and_dedup():
    t = _t(m=["a"], svc=["web"])
    out = _run('$l = metrics_labels({"app": $svc, "tier": "fe"});'
               '$e = metrics_labels();'
               '$d = dedup_metrics_labels([["a","1"],["b","2"],["a","3"]]);', t)
    assert out.column("l").to_pylist() == [[["app", "web"], ["tier", "fe"]]]
    assert out.column("e").to_pylist() == [[]]
    # last value per name wins (object-metrics-labels.c _dedup)
    assert out.column("d").to_pylist() == [[["a", "3"], ["b", "2"]]]


def test_update_metric_counters():
    t = _t(sev=["err", "ok", "err"], n=[2, 1, 5])
    fx = FilterX('update_metric("events_total", labels={"sev": $sev}, increment=$n);'
                 'if ($sev == "err") { update_metric("errors_total"); };')
    fx(t)
    fx(t)  # two batches accumulate on the same stage instance
    assert fx.metrics[("events_total", (("sev", "err"),))] == 14
    assert fx.metrics[("events_total", (("sev", "ok"),))] == 2
    assert fx.metrics[("errors_total", ())] == 4


# -- failure_info ------------------------------------------------------------

def test_failure_info_collects_eval_errors():
    t = _t(m=["x"])
    out = _run('failure_info_enable();'
               'failure_info_meta("step-1");'
               '$bad = digest($m, "nope");'
               '$fi = failure_info(); $ok = isset($bad);', t)
    assert out.column("ok").to_pylist() == [False]
    fi = out.column("fi").to_pylist()[0]
    assert len(fi) == 1 and fi[0]["meta"] == "step-1" and "nope" in fi[0]["error"]


def test_failure_info_raises_when_disabled():
    import pytest
    with pytest.raises(ValueError):
        _run('$bad = digest($m, "nope");', _t(m=["x"]))


def test_failure_info_clear():
    out = _run('failure_info_enable(); $a = digest($m, "bad1");'
               'failure_info_clear(); $fi = failure_info();', _t(m=["x"]))
    assert out.column("fi").to_pylist() == [[]]


# -- move --------------------------------------------------------------------

def test_move_transfers_and_unsets():
    t = _t(a=["v1", "v2"], b=[None, None])
    out = _run("$b = move($a);", t)
    assert out.column("b").to_pylist() == ["v1", "v2"]
    assert out.column("a").to_pylist() == [None, None]


def test_move_respects_mask():
    t = _t(a=["v1", "v2"], k=[1, 2])
    out = _run('if ($k == 1) { $b = move($a); };', t)
    assert out.column("b").to_pylist() == ["v1", None]
    assert out.column("a").to_pylist() == [None, "v2"]


# -- format_xml conformance (reference functional tests ----------------------
# tests/light/functional_tests/filterx/test_filterx.py test_format_xml)

def test_format_xml_reference_pins():
    import pandas as pd
    from axosyslog_ray.filterx_ext import format_xml
    pins = [
        ({"a": ""}, "<a/>"),
        ({"a": {}}, "<a/>"),
        ({"a": {"b": ""}}, "<a><b/></a>"),
        ({"a": {"b": "foo"}}, "<a><b>foo</b></a>"),
        ({"a": {"b": "foo", "c": "bar"}}, "<a><b>foo</b><c>bar</c></a>"),
        ({"a": {"@attr": "attr_val", "#text": "foo"}}, "<a attr='attr_val'>foo</a>"),
        ({"a": {"@attr": "attr_val"}}, "<a attr='attr_val'/>"),
        ({"a": {"b": ["c", "d"]}}, "<a><b>c</b><b>d</b></a>"),
        ({"a": {"b": [{"@attr": "attr_val", "#text": "c"}, "e"]}},
         "<a><b attr='attr_val'>c</b><b>e</b></a>"),
        ({"a": {"b": ["c", "d", {"e": "f"}]}}, "<a><b>c</b><b>d</b><b><e>f</e></b></a>"),
        ({"a": {"b": [{"c": "d"}, {"g": "h"}], "e": "f"}},
         "<a><b><c>d</c></b><b><g>h</g></b><e>f</e></a>"),
        ({"a": {"#text": "b", "c": "d"}}, "<a>b<c>d</c></a>"),
        ({"a": {"#text": "bd", "c": ""}}, "<a>bd<c/></a>"),
        ({"a": ["b", "c"]}, "<a>b</a><a>c</a>"),
        ({"a": 100}, "<a>100</a>"),
        ({"a": 100.0}, "<a>100.0</a>"),
        ({"a": pd.Timestamp("2000-01-01T00:00:00+0200").tz_convert("UTC")},
         "<a>946677600.000000</a>"),
        ({"a": "<b>"}, "<a>&lt;b&gt;</a>"),
    ]
    got = format_xml(pd.Series([p[0] for p in pins], dtype=object)).tolist()
    for (_, want), g in zip(pins, got):
        assert g == want


_WIN_SYSTEM = {
    "Provider": {"@Name": "EventCreate"},
    "EventID": "999",
    "EventIDQualifiers": "0",
    "Version": "0",
    "Channel": "Application",
    "Correlation": "",
    "Execution": {"@ProcessID": "0", "@ThreadID": "0"},
}

_WIN_PREFIX = ("<Event xmlns='http://x'><System><Provider Name='EventCreate'/>"
               "<EventID Qualifiers='0'>999</EventID><Version>0</Version>"
               "<Channel>Application</Channel><Correlation/>"
               "<Execution ProcessID='0' ThreadID='0'/></System>")


def _win_event(eventdata):
    return {"Event": {"@xmlns": "http://x", "System": dict(_WIN_SYSTEM),
                      "EventData": eventdata}}


def test_format_windows_eventlog_xml_pins():
    import pandas as pd
    from axosyslog_ray.filterx_ext import format_windows_eventlog_xml
    pins = [
        ({"Data": {"param1": "foo"}},
         "<EventData><Data Name='param1'>foo</Data></EventData>"),
        ({"Data": {"param1": "foo", "param2": "bar"}},
         "<EventData><Data Name='param1'>foo</Data><Data Name='param2'>bar</Data></EventData>"),
        ({"Data": "foo"}, "<EventData><Data>foo</Data></EventData>"),
        ({"Data": ["foo", "bar"]},
         "<EventData><Data>foo</Data><Data>bar</Data></EventData>"),
        # the reference's literal space in the empty-value form
        ({"Data": {"param1": "foo", "param2": ""}},
         "<EventData><Data Name='param1'>foo</Data><Data Name='param2' /></EventData>"),
    ]
    rows = pd.Series([_win_event(p[0]) for p in pins], dtype=object)
    got = format_windows_eventlog_xml(rows).tolist()
    for (_, ev_want), g in zip(pins, got):
        assert g == _WIN_PREFIX + ev_want + "</Event>"


def test_parse_format_windows_eventlog_roundtrip():
    import pandas as pd
    from axosyslog_ray.filterx_ext import (
        format_windows_eventlog_xml, parse_windows_eventlog_xml)
    xml = (_WIN_PREFIX
           + "<EventData><Data Name='param1'>foo</Data>"
             "<Data Name='param2'>bar</Data></EventData></Event>")
    d = parse_windows_eventlog_xml(pd.Series([xml], dtype=object))
    # EventID attribute parses to @Qualifiers; the generic dict path
    # renders it back as an attribute, so the roundtrip is byte-stable
    out = format_windows_eventlog_xml(d).iloc[0]
    assert out == xml


def test_plus_concat_numeric_looking_strings():
    # expr-plus is type-directed: string operands concatenate even when
    # the text parses as a number ("10." + "11" must NOT be 21.0)
    t = _t(n=[11, 13])
    out = _run('$s = "10." + string($n) + ".0.9";', t)
    assert out.column("s").to_pylist() == ["10.11.0.9", "10.13.0.9"]


# -- grammar extensions ------------------------------------------------------
# (filterx-grammar.ym: slicing, case ranges, break, declare, string
#  comparisons, ===/!==, not in, =??, :??, ${...}, numeric literal forms)

def test_string_slicing_reference_pins():
    # functional pin test_string_slicing: str="example", idx=3
    t = _t(s=["example"], idx=[3])
    out = _run('$r = $s[$idx..5]; $p = $s[..$idx]; $u = $s[$idx..];'
               '$nr = $s[-3..-1]; $np = $s[..-2]; $ns = $s[-3..];', t)
    assert out.column("r").to_pylist() == ["mp"]
    assert out.column("p").to_pylist() == ["exa"]
    assert out.column("u").to_pylist() == ["mple"]
    assert out.column("nr").to_pylist() == ["pl"]
    assert out.column("np").to_pylist() == ["examp"]
    assert out.column("ns").to_pylist() == ["ple"]


def test_switch_case_range():
    t = _t(code=[102, 250, 404, 503, None])
    out = _run('switch ($code) {'
               ' case 100..300: $class = "ok"; break;'
               ' case 400..500: $class = "client"; break;'
               ' default: $class = "other"; }', t)
    assert out.column("class").to_pylist() == ["ok", "ok", "client", "other", "other"]


def test_switch_literal_beats_range_regardless_of_position():
    # the reference probes its literal cache before iterating
    # range/expr cases (expr-switch.c _find_matching_literal_case first)
    t = _t(code=[250])
    out = _run('switch ($code) {'
               ' case 100..300: $class = "range"; break;'
               ' case 250: $class = "exact"; break; }', t)
    assert out.column("class").to_pylist() == ["exact"]


def test_break_exits_innermost_block():
    t = _t(k=[1, 2])
    out = _run('$a = "pre";'
               'if ($k == 1) { $b = "set"; break; $c = "skipped"; };'
               '$d = "post";', t)
    # break skips the rest of the if-body only; the outer block continues
    assert out.column("b").to_pylist() == ["set", None]
    assert "c" not in out.column_names or out.column("c").to_pylist() == [None, None]
    assert out.column("d").to_pylist() == ["post", "post"]


def test_declare_variable():
    t = _t(n=[1, 2])
    out = _run('declare threshold = 2; $hi = $n >= threshold;', t)
    assert out.column("hi").to_pylist() == [False, True]


def test_string_comparison_keywords():
    t = _t(a=["10", "9", None], b=["9", "9", "x"])
    out = _run('$lt = $a lt $b; $eq = $a eq $b; $ge = $a ge $b;', t)
    # "10" < "9" lexicographically; a null side marshals to "" (the
    # reference's _evaluate_as_string — test_expr_comparison.c
    # string-to-null group), so null lt "x" is TRUE
    assert out.column("lt").to_pylist() == [True, False, True]
    assert out.column("eq").to_pylist() == [False, True, False]
    assert out.column("ge").to_pylist() == [False, True, False]


def test_type_and_value_comparison():
    t = _t(s=["1", "1"], n=[1, 2])
    out = _run('$a = $s === "1"; $b = $s === 1; $c = $n !== 1;'
               '$d = null === null;', t)
    assert out.column("a").to_pylist() == [True, True]
    assert out.column("b").to_pylist() == [False, False]  # type mismatch
    assert out.column("c").to_pylist() == [False, True]
    assert out.column("d").to_pylist() == [True, True]


def test_not_in_membership():
    t = _t(v=["a", "b", None])
    out = _run('$r = $v not in ["a", "c"];', t)
    # null subject: `in` is false, so `not in` is true (pure negation)
    assert out.column("r").to_pylist() == [False, True, True]


def test_nullv_assign():
    t = _t(cur=["keep", "keep"], src=["new", None])
    out = _run('$cur =?? $src;', t)
    assert out.column("cur").to_pylist() == ["new", "keep"]


def test_nullv_dict_elem():
    t = _t(v=["x", None])
    out = _run('$d = {"always": $v, "opt" :?? $v}; $k = keys($d);', t)
    assert out.column("k").to_pylist() == [["always", "opt"], ["always"]]


def test_braced_message_ref():
    t = pa.table({"a.b": ["v1", "v2"]})
    out = _run('$out = ${a.b};', t)
    assert out.column("out").to_pylist() == ["v1", "v2"]


def test_numeric_literal_forms():
    t = _t(x=[1])
    out = _run('$h = 0xff; $k = 2k; $ki = 2Kib; $m = 1M;', t)
    assert out.column("h").to_pylist() == [255]
    assert out.column("k").to_pylist() == [2000]
    assert out.column("ki").to_pylist() == [2048]
    assert out.column("m").to_pylist() == [1000000]
