"""RFC6587 octet-counted framing: '<LEN> <LEN bytes>' streams.

Mirrors the reference's framed server protocol
(lib/logproto/logproto-framed-server.c): a frame header is at most 10
decimal digits (lib/logproto/logproto.h RFC6587_MAX_FRAME_LEN_DIGITS)
terminated by a single space; any other byte in the header is an
'Invalid frame header' error. The counted payload is opaque — embedded
newlines and NULs stay in the message. A frame longer than
max_msg_size either errors ('Incoming frame larger than
log_msg_size()') or, with trim enabled, yields the first max_msg_size
bytes and skips the rest (LPFSS_TRIM_* states). Pinned by
tests/test_framed_conformance.py against
lib/logproto/tests/test-framed-server.c.

Ray shape: framing is stateful WITHIN a byte stream, so each file is
one unit — `read_framed_log` uses read_binary_files (one row per
file) and explodes frames inside map_batches. No cross-file state, so
files parallelize freely; a 100 TB ingest shards by file.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAX_FRAME_LEN_DIGITS = 10


class FramingError(ValueError):
    pass


def extract_frames(data: bytes, max_msg_size: int = 65536,
                   trim: bool = False) -> list[bytes]:
    """Decode one byte stream into its framed messages. An incomplete
    trailing frame is dropped the way the reference's EOF handling
    drops it (fetch returns EOF when no full frame remains)."""
    out: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        # frame-length header
        frame_len = 0
        i = pos
        header_ok = False
        while i < n:
            b = data[i]
            if 0x30 <= b <= 0x39 and (i - pos) < MAX_FRAME_LEN_DIGITS:
                frame_len = frame_len * 10 + (b - 0x30)
                i += 1
            elif b == 0x20:  # ' '
                header_ok = True
                i += 1
                break
            else:
                raise FramingError("Invalid frame header")
        if not header_ok:
            break  # partial header at EOF: need more data -> EOF
        if i + frame_len > n:
            break  # partial payload at EOF
        if frame_len > max_msg_size:
            if not trim:
                raise FramingError(
                    "Incoming frame larger than log_msg_size()")
            out.append(data[i:i + max_msg_size])
        else:
            out.append(data[i:i + frame_len])
        pos = i + frame_len
    return out


class FramedExtractor:
    """map_batches stage over read_binary_files rows: explode each
    file's byte stream into one row per framed message (columns:
    path if present, text)."""

    def __init__(self, max_msg_size: int = 65536, trim: bool = False,
                 encoding: str = "utf-8"):
        self.max_msg_size = max_msg_size
        self.trim = trim
        self.encoding = encoding

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        paths = (batch.column("path").to_pylist()
                 if "path" in batch.column_names else [None] * len(blobs))
        out_text: list[str] = []
        out_path: list[str] = []
        for blob, path in zip(blobs, paths):
            for frame in extract_frames(bytes(blob), self.max_msg_size,
                                        self.trim):
                out_text.append(frame.decode(self.encoding,
                                             errors="replace"))
                out_path.append(path)
        cols = {"text": pa.array(out_text, type=pa.string())}
        if "path" in batch.column_names:
            cols["path"] = pa.array(out_path, type=pa.string())
        return pa.table(cols)


def read_framed_log(paths, max_msg_size: int = 65536, trim: bool = False):
    """file() source with RFC6587 framing: one Dataset row per framed
    message. Each file is a framing unit (one read_binary_files row),
    so frames never straddle block boundaries."""
    import ray.data as rd

    plist = [paths] if isinstance(paths, str) else list(paths)
    ds = rd.read_binary_files(plist, include_paths=True)
    return ds.map_batches(
        FramedExtractor(max_msg_size=max_msg_size, trim=trim),
        batch_format="pyarrow")
