"""$(format-json) template-function conformance pinned to the
reference's own test corpus (modules/json/tests/test_format_json.c) —
key nesting, initial-dot and @ handling, insertion order, option flags,
typed value hints."""
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.functions.templates import Template
from axosyslog_ray.stages.syslog import parse_syslog_table


def _msg():
    return parse_syslog_table(pa.table({
        "url": ["u"],
        "warc_ts": pa.array(pd.Series([pd.Timestamp("2026-08-17")], dtype="datetime64[us]")),
        "text": ["<38>Aug 17 05:02:28 bzorp syslog-ng[23323]: msg"],
    }))


CASES = [
    # nesting + insertion order (test_format_json.c:64-68)
    ('$(format-json msg.text=$MSG msg.id=42 host=bzorp)',
     '{"msg":{"text":"msg","id":"42"},"host":"bzorp"}'),
    ('$(format-json msg.text.str=$MSG msg.text.len=42 msg.id=42 host=bzorp)',
     '{"msg":{"text":{"str":"msg","len":"42"},"id":"42"},"host":"bzorp"}'),
    # initial-dot -> _ ; @ never splits on its own (:70, 86-91)
    ('$(format-json .foo=bar)', '{"_foo":"bar"}'),
    ('$(format-json @program=${PROGRAM})', '{"@program":"syslog-ng"}'),
    ('$(format-json @program.123=${PROGRAM})', '{"@program":{"123":"syslog-ng"}}'),
    ('$(format-json .@program.123=${PROGRAM})', '{"_@program":{"123":"syslog-ng"}}'),
    ('$(format-json @.program=${PROGRAM})', '{"@":{"program":"syslog-ng"}}'),
    # --key over macros (:107-110)
    ('$(format-json --key PID)', '{"PID":"23323"}'),
    ('$(format-json --key HOST)', '{"HOST":"bzorp"}'),
    ('$(format-json --key HOST --key MESSAGE)', '{"HOST":"bzorp","MESSAGE":"msg"}'),
    # --omit-empty-values (:129)
    ("$(format-json --omit-empty-values msg.set=value msg.unset='')",
     '{"msg":{"set":"value"}}'),
    # typed value hints (:140-157)
    ('$(format-json i32=int32(1234))', '{"i32":1234}'),
    ('$(format-json "i=ifoo(")', '{"i":"ifoo("}'),
    ('$(format-json b=boolean(TRUE))', '{"b":true}'),
    ('$(format-json null=null())', '{"null":null}'),
    ('$(format-json null=null(whatever))', '{"null":null}'),
    ('$(format-json b=literal(whatever))', '{"b":whatever}'),
    # rekey chain (:123) and --leave-initial-dot (:92)
    ('$(format-json .msg.text=dotted --rekey .* --shift 1 --add-prefix _)',
     '{"_msg":{"text":"dotted"}}'),
    ('$(format-json --leave-initial-dot .program.name=${PROGRAM})',
     '{".program":{"name":"syslog-ng"}}'),
]


@pytest.mark.parametrize("tpl,want", CASES, ids=range(len(CASES)))
def test_format_json_reference_conformance(tpl, want):
    assert Template(tpl).eval(_msg()).tolist()[0] == want


def test_list_hint_emits_array():
    # test_format_json.c:152: l=list($comma_value) -> JSON array via the
    # list codec; the reference sets comma_value to a raw (unquoted)
    # comma-separated value
    t = _msg().append_column(
        "comma_value", pa.array(["value,with,a,comma"]))
    got = Template('$(format-json l=list($comma_value))').eval(t).tolist()[0]
    assert got == '{"l":["value","with","a","comma"]}'
    # a QUOTED literal inside list() stays one quoted str-repr element
    # (compiler.c preserves quotes nested in parens)
    got = Template('$(format-json l=list("value,with,a,comma"))').eval(t).tolist()[0]
    assert got == '{"l":["value,with,a,comma"]}'


def test_format_welf_template_function():
    # modules/kvformat/tests/test_format_welf.c pins (key=template form,
    # quoting for spaces, alphabetical key order)
    t = _msg()
    assert Template("$(format-welf PROGRAM=$PROGRAM)").eval(t).tolist()[0] == \
        "PROGRAM=syslog-ng"
    assert Template("xxx$(format-welf PROGRAM=$PROGRAM)yyy").eval(t).tolist()[0] == \
        "xxxPROGRAM=syslog-ngyyy"
    assert Template("$(format-welf b=1 a=2)").eval(t).tolist()[0] == "a=2 b=1"
    assert Template("$(format-welf k='with space')").eval(t).tolist()[0] == \
        'k="with space"'


def test_format_flat_json_template_function():
    t = _msg()
    assert Template("$(format-flat-json msg.text=$PROGRAM msg.id=42)").eval(t).tolist()[0] == \
        '{"msg.text":"syslog-ng","msg.id":"42"}'
    assert Template("$(format-flat-json .foo=bar)").eval(t).tolist()[0] == '{"_foo":"bar"}'


def test_int_hint_hex_and_decimal_zeros():
    # type_cast_to_int32 pins: "0x1000" -> 4096, "0111" -> 111 (decimal,
    # not octal), "12345a" -> cast error (string kept)
    t = _msg()
    assert Template("$(format-json a=int32(0x1000))").eval(t).tolist()[0] == '{"a":4096}'
    assert Template("$(format-json a=int64(0111))").eval(t).tolist()[0] == '{"a":111}'
    assert Template("$(format-json a=int32(12345a))").eval(t).tolist()[0] == '{"a":"12345a"}'
