"""Conformance pins from the reference's own encode-function corpus
(lib/filterx/tests/test_func_encode.c) run through the FilterX engine:
base64/hex/url encode+decode values, bytes handling, wrong-arg-type and
decode-failure error behavior (the reference's eval error maps to this
engine's per-row null)."""
import pyarrow as pa
import pytest

from axosyslog_ray.filterx import FilterX


def _one(expr: str, **cols):
    arrays = {}
    for k, v in cols.items():
        arrays[k] = pa.array([v], type=pa.int64()) if isinstance(v, int) \
            else pa.array([v], type=pa.binary()) if isinstance(v, bytes) \
            else pa.array([v], type=pa.string())
    out = FilterX(expr)(pa.table(arrays))
    return out.column("r").to_pylist()[0]


# -- base64 (test_func_encode.c filterx_func_base64) --

def test_base64_encode_string():
    assert _one("$r = base64_encode($s);", s="foobar") == "Zm9vYmFy"


def test_base64_encode_bytes():
    assert _one("$r = base64_encode($s);", s=b"\x00\x01\x02\x03") == "AAECAw=="


def test_base64_encode_wrong_arg_type():
    assert _one("$r = base64_encode($s);", s=42) is None


def test_base64_decode_string_returns_bytes():
    assert _one("$r = base64_decode($s);", s="Zm9vYmFy") == b"foobar"


def test_base64_decode_wrong_arg_type():
    assert _one("$r = base64_decode($s);", s=42) is None


def test_base64_roundtrip():
    assert _one("$r = base64_decode(base64_encode($s));", s="szilvafa") == b"szilvafa"


# -- urlencode/urldecode (filterx_func_url) --

def test_urlencode_plain():
    assert _one("$r = urlencode($s);", s="foobar") == "foobar"


def test_urlencode_special_chars():
    assert _one("$r = urlencode($s);", s="korte fa/szilva?alma=1&korte=2") \
        == "korte%20fa%2Fszilva%3Falma%3D1%26korte%3D2"


def test_urlencode_wrong_arg_type():
    assert _one("$r = urlencode($s);", s=42) is None


def test_urldecode_plain():
    assert _one("$r = urldecode($s);", s="foobar") == "foobar"


def test_urldecode_percent_encoded():
    assert _one("$r = urldecode($s);",
                s="korte%20fa%2Fszilva%3Falma%3D1%26korte%3D2") \
        == "korte fa/szilva?alma=1&korte=2"


def test_urldecode_wrong_arg_type():
    assert _one("$r = urldecode($s);", s=42) is None


def test_url_roundtrip():
    assert _one("$r = urldecode(urlencode($s));",
                s="kortefa/szilvafa?alma=1&dio=2") == "kortefa/szilvafa?alma=1&dio=2"


# -- hex (filterx_func_hex) --

def test_hex_encode_string():
    assert _one("$r = hex_encode($s);", s="foo") == "666f6f"


def test_hex_encode_bytes_lowercase():
    assert _one("$r = hex_encode($s);", s=b"\x00\x01\x0f\xff") == "00010fff"


def test_hex_encode_wrong_arg_type():
    assert _one("$r = hex_encode($s);", s=42) is None


def test_hex_decode_lowercase():
    assert _one("$r = hex_decode($s);", s="666f6f") == b"foo"


def test_hex_decode_uppercase():
    assert _one("$r = hex_decode($s);", s="666F6F") == b"foo"


def test_hex_decode_odd_length_errors():
    assert _one("$r = hex_decode($s);", s="666f6") is None


def test_hex_decode_invalid_char_errors():
    assert _one("$r = hex_decode($s);", s="66zz6f") is None


def test_hex_decode_wrong_arg_type():
    assert _one("$r = hex_decode($s);", s=42) is None


def test_hex_roundtrip_binary():
    assert _one("$r = hex_decode(hex_encode($s));", s=b"\xde\xad\xbe\xef") \
        == b"\xde\xad\xbe\xef"
