"""PII redaction: emails, IPv4s, phones, SSNs -> typed placeholders."""
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.textstats.redact import redact_pii, redact_text


class TestRedactText:
    def test_email(self):
        s = pd.Series(["contact john.doe+spam@example.co.uk today"])
        assert redact_text(s).iloc[0] == "contact <EMAIL> today"

    def test_ipv4(self):
        s = pd.Series(["server at 192.168.001.1 and 8.8.8.8 up"])
        assert redact_text(s).iloc[0] == "server at <IP> and <IP> up"

    def test_phone_shapes(self):
        s = pd.Series([
            "call +1-555-123-4567 now",
            "call (555) 123-4567 now",
            "call 555.123.4567 now",
        ])
        assert redact_text(s).tolist() == ["call <PHONE> now"] * 3

    def test_ssn(self):
        s = pd.Series(["ssn 123-45-6789 on file"])
        assert redact_text(s).iloc[0] == "ssn <SSN> on file"

    def test_order_email_wins_over_phone(self):
        # the digits inside an address must not be half-matched later
        s = pd.Series(["mail 555.123.4567x@host.com end"])
        out = redact_text(s).iloc[0]
        assert out == "mail <EMAIL> end"

    def test_kinds_filter(self):
        s = pd.Series(["a@b.co at 1.2.3.4"])
        assert redact_text(s, kinds=["email"]).iloc[0] == "<EMAIL> at 1.2.3.4"

    def test_null_passthrough(self):
        assert redact_text(pd.Series([None])).iloc[0] == ""


def test_redact_pii_batch_inplace_and_newcol():
    t = pa.table({"doc_id": [1], "text": ["mail a@b.co"]})
    out = redact_pii(t)
    assert out.column("text").to_pylist() == ["mail <EMAIL>"]
    out2 = redact_pii(t, out_col="clean")
    assert out2.column("text").to_pylist() == ["mail a@b.co"]
    assert out2.column("clean").to_pylist() == ["mail <EMAIL>"]


def test_sql_parity_duckdb():
    # the oracle chain IS the same spec — verify on a corpus of shapes
    import duckdb

    from axosyslog_ray.textstats.redact import pii_sql_replacements

    texts = [
        "contact john.doe+spam@example.co.uk today",
        "server at 192.168.001.1 and 8.8.8.8 up",
        "call +1-555-123-4567 or (555) 123-4567 or 555.123.4567",
        "ssn 123-45-6789 on file",
        "mixed a@b.co 10.0.0.1 555-123-4567 123-45-6789",
        "clean text with no pii at all",
        "",
    ]
    df = pd.DataFrame({"text": texts})
    got = duckdb.sql(f"SELECT {pii_sql_replacements('text')} AS r FROM df").df()["r"].tolist()
    want = redact_text(pd.Series(texts)).tolist()
    assert got == want
