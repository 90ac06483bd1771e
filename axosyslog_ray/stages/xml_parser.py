"""xml-parser(): XML -> dotted-key fields.

Mirrors the reference xml parser (reference modules/xml/xml.c,
xml-parser.c): element text under dotted path keys, attributes as
`<path>._<attr>`, repeated elements list-appended (comma-joined string
repr, the reference's LIST encoding), `exclude_tags` glob list,
`strip_whitespaces`, `prefix()`. Windows-eventlog variant
(modules/xml/windows-eventlog-xml-parser.c) maps `<Data Name="X">v`
into `.X` keys via `windows_eventlog=True`.

Per-row work is inherently row-wise (ElementTree parse); batches stay
Arrow in/out.
"""

from __future__ import annotations

import fnmatch
import re
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa


class XmlParser:
    def __init__(
        self,
        prefix: str = "",
        exclude_tags: list[str] | None = None,
        strip_whitespaces: bool = False,
        windows_eventlog: bool = False,
        source_col: str = "message",
        out_col: str = "xv",
        max_input_len: int = 1_000_000,
    ):
        self.prefix = prefix
        self.exclude = [re.compile(fnmatch.translate(g)) for g in (exclude_tags or [])]
        self.strip = strip_whitespaces
        self.windows = windows_eventlog
        self.source_col = source_col
        self.out_col = out_col
        # entity-expansion / hostile-doc guard: stdlib ElementTree expands
        # internal DTD entities, so cap the raw input size per row
        self.max_input_len = max_input_len

    MAX_DEPTH = 256  # hostile deeply-nested docs must not blow the stack

    def _excluded(self, tag: str) -> bool:
        return any(rx.match(tag) for rx in self.exclude)

    def _walk(self, root, path: str, out: dict[str, str]):
        # iterative DFS (document order) — recursion would hit Python's
        # stack limit on hostile deeply-nested inputs and kill the batch.
        # Stack entries: ("elem", node, parent_path, depth) or a
        # ("text", key, value) emission for a child's TAIL text — mixed
        # content like <a>x<b/>y</a> must deliver 'y' to a's key too
        # (the reference's SAX text callback fires per text run).
        stack = [("elem", root, path, 0)]
        while stack:
            entry = stack.pop()
            if entry[0] == "text":
                _, key, value = entry
                if self.strip:
                    value = value.strip()
                if value.strip():
                    self._put(out, key, value)
                continue
            _, elem, parent_path, depth = entry
            if depth > self.MAX_DEPTH:
                continue
            tag = elem.tag.split("}")[-1]  # strip xml namespace
            if self._excluded(tag):
                continue
            if self.windows and tag == "Data" and "Name" in elem.attrib:
                key = f"{parent_path}.{elem.attrib['Name']}" if parent_path else elem.attrib["Name"]
                self._put(out, key, elem.text or "")
                continue
            key = f"{parent_path}.{tag}" if parent_path else tag
            for aname, aval in elem.attrib.items():
                self._put(out, f"{key}._{aname}", aval)
            text = elem.text or ""
            if self.strip:
                text = text.strip()
            if text.strip():
                self._put(out, key, text)
            for child in reversed(list(elem)):
                if child.tail and child.tail.strip():
                    stack.append(("text", key, child.tail))
                stack.append(("elem", child, key, depth + 1))

    def _put(self, out: dict[str, str], key: str, value: str):
        # repeated keys list-append with the reference's comma string-repr
        if key in out:
            out[key] = out[key] + "," + value
        else:
            out[key] = value

    def parse_line(self, line: str) -> list[tuple[str, str]] | None:
        if len(line) > self.max_input_len:
            return None
        # stdlib ElementTree EXPANDS internal DTD entities, so a tiny
        # billion-laughs doc (nested <!ENTITY>) blows up exponentially far
        # under any input-size cap — reject docs carrying a DTD outright
        # (the reference's GMarkup parser does not process DTDs either)
        if "<!DOCTYPE" in line or "<!ENTITY" in line:
            return None
        try:
            root = ET.fromstring(line)
        except ET.ParseError:
            return None
        out: dict[str, str] = {}
        self._walk(root, "", out)
        return [(self.prefix + k, v) for k, v in out.items()]

    def __call__(self, table: pa.Table) -> pa.Table:
        s = table.column(self.source_col).to_pandas().astype("string").fillna("")
        n = len(s)
        maps = np.full(n, None, dtype=object)
        valid = np.zeros(n, dtype=bool)
        for i, line in enumerate(s.to_numpy()):
            res = self.parse_line(line)
            if res is not None:
                maps[i], valid[i] = res, True
        out = table.append_column(self.out_col, pa.array(maps, type=pa.map_(pa.string(), pa.string())))
        return out.append_column("xml_valid", pa.array(valid))
