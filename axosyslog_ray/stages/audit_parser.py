"""linux-audit-parser(): kv variant with hex-encoded value decoding.

Mirrors the reference (reference modules/kvformat/linux-audit-parser.c):
the kernel hex-encodes a field value when it contains bytes < 0x21,
> 0x7e, or a double quote.  The decoder therefore only rewrites a value
when ALL of these hold (parse_linux_audit_style_hexdump,
linux-audit-parser.c:117-135):

- the field name is one of the known hex-coded fields (``name
  proctitle path dir comm ocomm data old new``) or an ``aN`` syscall
  argument (``a`` followed by a digit) — _is_field_hex_encoded;
- the value was NOT quoted and has an even number of hex digits;
- decoding yields at least one byte the kernel would have had to
  encode (control / DEL / quote) — otherwise the literal hex string is
  kept (test pin: ``proctitle=41607E`` stays as-is);
- the decoded bytes are valid UTF-8.

NUL bytes separate argv words in proctitle; the reference maps them to
TAB (linux-audit-parser.c:92-93), pinned by
tests/test_linux_audit_scanner.c hex_dump_is_decoded3.
"""

from __future__ import annotations

from .kv_parser import KvParser

_HEXCODED_FIELDS = frozenset(
    ["name", "proctitle", "path", "dir", "comm", "ocomm", "data",
     "old", "new"])

_HEXDIGITS = frozenset("0123456789abcdefABCDEF")


def _is_field_hex_encoded(field: str) -> bool:
    if len(field) >= 2 and field[0] == "a" and field[1].isdigit():
        return True
    return field in _HEXCODED_FIELDS


def _maybe_hex_decode(key: str, value: str) -> str:
    if (not value or len(value) % 2 or value[0] not in _HEXDIGITS
            or not _is_field_hex_encoded(key)):
        return value
    try:
        raw = bytes.fromhex(value)
    except ValueError:
        return value
    # kernel_would_have_encoded_this_as_hex: at least one byte outside
    # 0x21..0x7e or a '"' must be present, else keep the literal
    if not any(b < 0x21 or b > 0x7E or b == 0x22 for b in raw):
        return value
    decoded = raw.replace(b"\x00", b"\t")
    try:
        return decoded.decode("utf-8")
    except UnicodeDecodeError:
        return value


class LinuxAuditParser(KvParser):
    def __init__(self, prefix: str = "", **kw):
        super().__init__(prefix=prefix, **kw)

    def _postprocess_value(self, value: str, was_quoted: bool,
                           key: str = "") -> str:
        return value if was_quoted else _maybe_hex_decode(key, value)
