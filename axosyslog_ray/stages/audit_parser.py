"""linux-audit-parser(): kv variant with hex-encoded value decoding.

Mirrors the reference (reference modules/kvformat/linux-audit-parser.c):
audit records are key=value lines where certain values (proctitle, cmd,
data...) arrive hex-encoded when they contain spaces/special bytes; an
unquoted value consisting solely of an even number of hex digits (and
longer than a plain number would be) is decoded to its byte string.
Quoted values are never hex-decoded (the kernel only hex-encodes
unquotable values).
"""

from __future__ import annotations

import re

from .kv_parser import KvParser

_HEX = re.compile(r"^(?:[0-9A-F]{2})+$")


def _maybe_hex_decode(value: str) -> str:
    if len(value) >= 4 and _HEX.match(value):
        try:
            return bytes.fromhex(value).decode("utf-8", "replace")
        except ValueError:
            return value
    return value


class LinuxAuditParser(KvParser):
    def __init__(self, prefix: str = "", **kw):
        super().__init__(prefix=prefix, **kw)

    def _postprocess_value(self, value: str, was_quoted: bool) -> str:
        return value if was_quoted else _maybe_hex_decode(value)
