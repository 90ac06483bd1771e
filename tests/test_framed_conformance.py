"""RFC6587 octet-counted framing conformance.

Pins lib/logproto/tests/test-framed-server.c through
sources/framed.extract_frames (and the Ray batch stage): simple
messages including embedded newlines/NULs and non-UTF8 payloads,
invalid frame headers, the too-long-frame error, and the
trim-large-messages variants.
"""

import pyarrow as pa
import pytest

from axosyslog_ray.sources.framed import (FramedExtractor, FramingError,
                                          extract_frames)


def test_simple_messages():
    data = (b"32 0123456789ABCDEF0123456789ABCDEF"
            b"10 01234567\n\n"
            b"10 01234567\0\0"
            b"30 \xc3\xa1rv\xc3\xadzt\xc5\xb1r\xc5\x91t\xc3\xbck"
            b"\xc3\xb6rf\xc3\xbar\xc3\xb3g\xc3\xa9p"
            b"21 \xe1\x72\x76\xed\x7a\x74\xfb\x72\xf5\x74\xfc\x6b\xf6\x72"
            b"\x66\xfa\x72\xf3\x67\xe9\x70"
            b"32 \x00\x00\x00\xe1\x00\x00\x00\x72\x00\x00\x00\x76\x00\x00"
            b"\x00\xed\x00\x00\x00\x7a\x00\x00\x00\x74\x00\x00\x01\x71"
            b"\x00\x00\x00\x72")
    frames = extract_frames(data, max_msg_size=32)
    assert frames[0] == b"0123456789ABCDEF0123456789ABCDEF"
    assert frames[1] == b"01234567\n\n"
    assert frames[2] == b"01234567\0\0"
    assert frames[3].decode("utf-8") == "árvíztűrőtükörfúrógép"
    assert frames[4] == (b"\xe1\x72\x76\xed\x7a\x74\xfb\x72\xf5\x74\xfc"
                         b"\x6b\xf6\x72\x66\xfa\x72\xf3\x67\xe9\x70")
    assert len(frames[5]) == 32
    assert len(frames) == 6


def test_invalid_header():
    with pytest.raises(FramingError, match="Invalid frame header"):
        extract_frames(b"1q we don't care")


def test_too_long_line():
    data = b"48 0123456789ABCDEF0123456789ABCDEF0123456789ABCDEF"
    with pytest.raises(FramingError,
                       match="larger than log_msg_size"):
        extract_frames(data, max_msg_size=32)


def test_too_long_line_trimmed():
    data = b"48 0123456789ABCDEF0123456789ABCDEF0123456789ABCDEF"
    assert extract_frames(data, max_msg_size=32, trim=True) == [
        b"0123456789ABCDEF0123456789ABCDEF"]


def test_too_long_line_trimmed_multiple_cycles():
    data = b"1 07 1abcdef1 2"
    assert extract_frames(data, max_msg_size=2, trim=True) == [
        b"0", b"1a", b"2"]


def test_too_long_line_trimmed_frame_at_the_end():
    data = b"3 01\n15 1abcdefg12345674 2abc"
    assert extract_frames(data, max_msg_size=8, trim=True) == [
        b"01\n", b"1abcdefg", b"2abc"]


def test_too_long_line_trimmed_one_big_message():
    data = b"2 ab16 0123456789ABCDEF"
    assert extract_frames(data, max_msg_size=10, trim=True) == [
        b"ab", b"0123456789"]


def test_partial_trailing_frame_is_dropped():
    # EOF mid-frame: the complete frames are delivered, the tail is not
    assert extract_frames(b"2 ab5 xx") == [b"ab"]
    assert extract_frames(b"12") == []


def test_frame_header_cannot_exceed_ten_digits():
    # an 11th digit is no longer treated as part of the length
    with pytest.raises(FramingError, match="Invalid frame header"):
        extract_frames(b"12345678901 x")


def test_batch_stage_explodes_files():
    batch = pa.table({
        "bytes": pa.array([b"2 ab3 cde", b"1 x"], type=pa.binary()),
        "path": ["f1.log", "f2.log"],
    })
    out = FramedExtractor()(batch)
    assert out.column("text").to_pylist() == ["ab", "cde", "x"]
    assert out.column("path").to_pylist() == ["f1.log", "f1.log", "f2.log"]
