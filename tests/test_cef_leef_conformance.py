"""parse_cef/parse_leef conformance against the reference's own test
expectations (modules/cef/tests/test-filterx-function-parse-{cef,leef}.c
— inputs and expected JSON dicts transcribed verbatim)."""

import pandas as pd
import pytest

from axosyslog_ray.filterx_ext import parse_cef, parse_leef


def _cef(line, **kw):
    return parse_cef(pd.Series([line]), **{k: pd.Series([v]) for k, v in kw.items()})[0]


def _leef(line, **kw):
    return parse_leef(pd.Series([line]), **{k: pd.Series([v]) for k, v in kw.items()})[0]


KASP_EXT = {
    "rt": "1647626887000", "cs9": "site location Bldg", "cs9Label": "GroupName",
    "dhost": "WS6465", "dst": "10.55.203.12", "cs2": "KES",
    "cs2Label": "ProductName", "cs3": "11.0.0.0", "cs3Label": "ProductVersion",
    "cs10": "Uninstall EDR", "cs10Label": "TaskName", "cs4": "885",
    "cs4Label": "TaskId", "cn2": "4", "cn2Label": "TaskNewState",
    "cn1": "0", "cn1Label": "TaskOldState",
}
KASP_EXT_STR = ("rt=1647626887000 cs9=site location Bldg cs9Label=GroupName "
                "dhost=WS6465 dst=10.55.203.12 cs2=KES cs2Label=ProductName "
                "cs3=11.0.0.0 cs3Label=ProductVersion cs10=Uninstall EDR "
                "cs10Label=TaskName cs4=885 cs4Label=TaskId cn2=4 "
                "cn2Label=TaskNewState cn1=0 cn1Label=TaskOldState")


def _cef_head(**over):
    d = {"cef_version": "0", "device_vendor": "KasperskyLab",
         "device_product": "SecurityCenter", "device_version": "13.2.0.1511",
         "device_event_class_id": "KLPRCI_TaskState",
         "event_name": "Completed successfully", "agent_severity": "1"}
    d.update(over)
    return d


def test_cef_basic():
    got = _cef("CEF:0|KasperskyLab|SecurityCenter|13.2.0.1511|KLPRCI_TaskState|"
               "Completed successfully|1|" + KASP_EXT_STR)
    assert got == {**_cef_head(), **KASP_EXT}


def test_cef_line_breaks_become_spaces():
    got = _cef("CEF:0|KasperskyLab|Security\nCenter|13.2.0.1511|KLPRCI_TaskState|"
               "Completed\nsuccessfully|1|rt=1647626887000 cs2Label=ProductName\ncs3=11.0.0.0")
    assert got["device_product"] == "Security Center"
    assert got["event_name"] == "Completed successfully"
    assert got["cs2Label"] == "ProductName"
    assert got["cs3"] == "11.0.0.0"


def test_cef_separate_extensions():
    got = _cef("CEF:0|KasperskyLab|SecurityCenter|13.2.0.1511|KLPRCI_TaskState|"
               "Completed successfully|1|" + KASP_EXT_STR, separate_extensions=True)
    assert got == {**_cef_head(), "extensions": KASP_EXT}


def test_cef_empty_header_field():
    got = _cef("CEF:0|KasperskyLab||13.2.0.1511|KLPRCI_TaskState|"
               "Completed successfully|1|rt=1")
    assert got["device_product"] == ""


def test_cef_extensions_empty():
    got = _cef("CEF:0|KasperskyLab|SecurityCenter|13.2.0.1511|KLPRCI_TaskState|"
               "Completed successfully|1|")
    assert got == _cef_head()


def test_cef_header_escaped_delimiter():
    got = _cef("CEF:0|Kaspers\\|kyLab|SecurityCenter|13.2.0.1511|KLPRCI_TaskState|"
               "Completed successfully|1|rt=1647626887000")
    assert got["device_vendor"] == "Kaspers|kyLab"
    assert got["rt"] == "1647626887000"


def test_cef_extension_escaped_value_separator():
    got = _cef("CEF:0|KasperskyLab|SecurityCenter|13.2.0.1511|KLPRCI_TaskState|"
               "Completed successfully|1|escaped=foo\\=bar\\=baz")
    assert got["escaped"] == "foo=bar=baz"


def test_cef_header_whitespace_not_stripped():
    got = _cef("CEF:0| KasperskyLab |  SecurityCenter  |   13.2.0.1511   |"
               "    KLPRCI_TaskState    |     Completed successfully     |      1      |")
    assert got["device_vendor"] == " KasperskyLab "
    assert got["agent_severity"] == "      1      "


def test_cef_extensions_space_in_value():
    got = _cef("CEF:0|KasperskyLab|SecurityCenter|13.2.0.1511|KLPRCI_TaskState|"
               "Completed successfully|1|foo=bar baz tik=tak toe")
    assert got["foo"] == "bar baz"
    assert got["tik"] == "tak toe"


def test_cef_forced_pair_separator():
    got = _cef("CEF:0|KasperskyLab|SecurityCenter|13.2.0.1511|KLPRCI_TaskState|"
               "Completed successfully|1|foo=bar@bar=baz@baz=tik\\=tak",
               pair_separator="@")
    assert got["foo"] == "bar" and got["bar"] == "baz" and got["baz"] == "tik=tak"


def test_cef_forced_value_separator():
    got = _cef("CEF:0|KasperskyLab|SecurityCenter|13.2.0.1511|KLPRCI_TaskState|"
               "Completed successfully|1|foo#bar bar#baz baz#tik\\#tak",
               value_separator="#")
    assert got["foo"] == "bar" and got["bar"] == "baz" and got["baz"] == "tik#tak"


def test_cef_wrong_signature_and_incomplete_header():
    assert _cef("BAD_SIGN:0|a|b|c|d|e|f|x=1") is None
    assert _cef("CEF:0|Microsoft|MSExchange") is None


# --- LEEF ------------------------------------------------------------------

LEEF_EXT = {"src": "192.0.2.0", "dst": "172.50.123.1", "sev": "5",
            "cat": "anomaly", "srcPort": "81", "dstPort": "21",
            "usrName": "joe.black"}
LEEF_EXT_STR = ("src=192.0.2.0\tdst=172.50.123.1\tsev=5\tcat=anomaly\t"
                "srcPort=81\tdstPort=21\tusrName=joe.black")


def _leef_head(**over):
    d = {"leef_version": "1.0", "vendor_name": "Microsoft",
         "product_name": "MSExchange", "product_version": "4.0 SP1",
         "event_id": "15345"}
    d.update(over)
    return d


def test_leef_basic():
    got = _leef("LEEF:1.0|Microsoft|MSExchange|4.0 SP1|15345|" + LEEF_EXT_STR)
    assert got == {**_leef_head(), **LEEF_EXT}


def test_leef_separate_extensions():
    got = _leef("LEEF:1.0|Microsoft|MSExchange|4.0 SP1|15345|" + LEEF_EXT_STR,
                separate_extensions=True)
    assert got == {**_leef_head(), "extensions": LEEF_EXT}


def test_leef_empty_header_field():
    got = _leef("LEEF:1.0|Microsoft||4.0 SP1|15345|" + LEEF_EXT_STR)
    assert got["product_name"] == ""


def test_leef_extensions_empty():
    got = _leef("LEEF:1.0|Microsoft|MSExchange|4.0 SP1|15345|")
    assert got == _leef_head()


def test_leef_header_escaped_delimiter():
    got = _leef("LEEF:1.0|Micro\\|soft|MSExchange|4.0 SP1|15345|" + LEEF_EXT_STR)
    assert got["vendor_name"] == "Micro|soft"


def test_leef_extension_value_keeps_unescaped_value_separator():
    got = _leef("LEEF:1.0|Microsoft|MSExchange|4.0 SP1|15345|"
                "foo=foo=bar=baz\ttik=tik=tak=toe")
    assert got["foo"] == "foo=bar=baz"
    assert got["tik"] == "tik=tak=toe"


def test_leef_header_whitespace_not_stripped():
    got = _leef("LEEF:1.0| Microsoft |  MSExchange  |   4.0 SP1   |    15345    |")
    assert got["vendor_name"] == " Microsoft "
    assert got["event_id"] == "    15345    "


def test_leef_extensions_space_in_value():
    got = _leef("LEEF:1.0|Microsoft|MSExchange|4.0 SP1|15345|foo=bar baz\ttik=tak toe")
    assert got["foo"] == "bar baz" and got["tik"] == "tak toe"


def test_leef_v2_delimiter_field():
    got = _leef("LEEF:2.0|Microsoft|MSExchange|4.0 SP1|15345|^|foo=bar")
    assert got == _leef_head(leef_version="2.0", leef_delimiter="^", foo="bar")


def test_leef_v2_custom_delimiter():
    got = _leef("LEEF:2.0|Microsoft|MSExchange|4.0 SP1|15345|^|foo=bar^bar=baz^baz=tik=tak")
    assert got["foo"] == "bar" and got["bar"] == "baz" and got["baz"] == "tik=tak"


@pytest.mark.parametrize("delim", ["0x40", "x40"])
def test_leef_v2_hex_delimiter(delim):
    got = _leef(f"LEEF:2.0|Microsoft|MSExchange|4.0 SP1|15345|{delim}|"
                "foo=bar@bar=baz@baz=tik=tak")
    assert got["leef_delimiter"] == delim
    assert got["foo"] == "bar" and got["bar"] == "baz" and got["baz"] == "tik=tak"


def test_leef_v2_invalid_delimiter_field_not_consumed():
    got = _leef("LEEF:2.0|Microsoft|MSExchange|4.0 SP1|15345|INVALID|"
                "foo=bar\tbar=baz|\tbaz=tik=tak")
    assert "leef_delimiter" not in got
    assert got["foo"] == "bar" and got["bar"] == "baz|" and got["baz"] == "tik=tak"


def test_leef_v2_empty_delimiter_field():
    got = _leef("LEEF:2.0|Microsoft|MSExchange|4.0 SP1|15345||foo=bar\tbar=baz\tbaz=tik=tak")
    assert got["leef_delimiter"] == ""
    assert got["foo"] == "bar" and got["bar"] == "baz" and got["baz"] == "tik=tak"


def test_leef_v1_forced_pair_separator():
    got = _leef("LEEF:1.0|Microsoft|MSExchange|4.0 SP1|15345|foo=bar@bar=baz@baz=tik=tak",
                pair_separator="@")
    assert got["foo"] == "bar" and got["bar"] == "baz" and got["baz"] == "tik=tak"


def test_leef_v2_no_delimiter_field():
    got = _leef("LEEF:2.0|Microsoft|MSExchange|4.0 SP1|15345|foo=bar\tbar=baz|\tbaz=tik=tak")
    assert "leef_delimiter" not in got
    assert got["bar"] == "baz|"


def test_leef_v2_no_delimiter_field_empty_extensions():
    got = _leef("LEEF:2.0|Microsoft|MSExchange|4.0 SP1|15345|")
    assert got == _leef_head(leef_version="2.0")


def test_leef_v2_forced_pair_separator_with_delimiter_field():
    got = _leef("LEEF:2.0|Microsoft|MSExchange|4.0 SP1|15345|^|foo=bar@bar=baz@baz=tik=tak",
                pair_separator="@")
    assert got["leef_delimiter"] == "^"
    assert got["foo"] == "bar" and got["bar"] == "baz" and got["baz"] == "tik=tak"


def test_leef_v2_forced_pair_separator_with_empty_delimiter_field():
    got = _leef("LEEF:2.0|Microsoft|MSExchange|4.0 SP1|15345||foo=bar@bar=baz@baz=tik=tak",
                pair_separator="@")
    assert got["leef_delimiter"] == ""
    assert got["foo"] == "bar" and got["bar"] == "baz" and got["baz"] == "tik=tak"


def test_leef_forced_value_separator():
    got = _leef("LEEF:1.0|Microsoft|MSExchange|4.0 SP1|15345|foo#bar\tbar#baz\tbaz#tiktak",
                value_separator="#")
    assert got["foo"] == "bar" and got["bar"] == "baz" and got["baz"] == "tiktak"


def test_leef_empty_value_separator_errors():
    with pytest.raises(ValueError):
        _leef("LEEF:1.0|a|b|c|d|x=1", value_separator="")


def test_leef_wrong_signature_and_incomplete_header():
    assert _leef("BAD_SIGN:1.0|a|b|c|d|x=1") is None
    assert _leef("LEEF:1.0|Microsoft|MSExchange") is None
