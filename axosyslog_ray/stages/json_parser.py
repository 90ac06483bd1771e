"""json-parser(): recursive flatten of a JSON column into dotted keys.

Semantics mirror the reference json parser
(reference modules/json/json-parser.c:329 process, :85-180 type
extraction): nested objects flatten into `prefix + key_delimiter`-joined
keys; `extract_prefix` selects a subtree as the new root; a non-object
root is a parse failure (`json_valid=False`); JSON types map to the
reference's LM_VT tags (string/int/double/boolean/null/list) recorded in
a parallel types map — the reference's string-repr + type-tag model
(lib/logmsg/logmsg.h:196-225).

Arrays are stored as their canonical JSON encoding with type tag
`list` (the reference stores a comma-separated string-repr list;
canonical-JSON is this engine's equivalent parseable form).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

try:  # optional fast path
    import orjson as _fastjson

    def _loads(s: str):
        return _fastjson.loads(s)
except ImportError:
    def _loads(s: str):
        return json.loads(s)


def _scalar_repr(v) -> tuple[str, str]:
    if v is None:
        return "", "null"
    if isinstance(v, bool):
        return ("true" if v else "false"), "boolean"
    if isinstance(v, int):
        return str(v), "integer"
    if isinstance(v, float):
        return json.dumps(v), "double"
    if isinstance(v, str):
        return v, "string"
    return json.dumps(v, separators=(",", ":")), "list"


def flatten_json(
    obj, prefix: str = "", key_delimiter: str = ".", out: list | None = None, types: list | None = None
):
    """prefix() is prepended LITERALLY (json-parser.c:94-98 store_value
    assigns prefix then appends the key with no separator); the
    key_delimiter joins NESTING levels only (json-parser.c:190-194)."""
    out = [] if out is None else out
    types = [] if types is None else types
    for k, v in obj.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flatten_json(v, key + key_delimiter, key_delimiter, out, types)
        else:
            r, t = _scalar_repr(v)
            out.append((key, r))
            types.append((key, t))
    return out, types


class JsonParser:
    def __init__(
        self,
        prefix: str = "",
        extract_prefix: str | None = None,
        key_delimiter: str = ".",
        promote: list[str] | None = None,
        source_col: str = "message",
        out_col: str = "jv",
        with_types: bool = False,
        marker: str | None = None,
    ):
        # marker('@cee:'): input must START with the marker; the marker
        # and following whitespace are stripped before tokenizing, a
        # missing marker fails the parse (json-parser.c:341-354)
        self.marker = marker
        self.prefix = prefix
        self.extract_prefix = extract_prefix
        self.key_delimiter = key_delimiter
        self.promote = promote or []
        self.source_col = source_col
        self.out_col = out_col
        self.with_types = with_types

    def parse_line(self, line: str):
        """Scalar path: (pairs, type_pairs) or None on failure."""
        if self.marker is not None:
            if not line.startswith(self.marker):
                return None
            line = line[len(self.marker):].lstrip()
        try:
            obj = _loads(line)
        except Exception:
            return None
        if self.extract_prefix:
            import re as _re

            for part in self.extract_prefix.split(self.key_delimiter):
                # "[N]" array indices (json-parser.c extract-prefix path
                # syntax, e.g. scl/nodejs extract-prefix("[1]")) compose
                # with plain keys: "key", "[1]", "key[2]" all valid
                m = _re.fullmatch(r"([^\[\]]*)((?:\[\d+\])*)", part)
                if m is None:
                    return None
                key, idxs = m.group(1), _re.findall(r"\[(\d+)\]",
                                                    m.group(2))
                if key:
                    if not isinstance(obj, dict) or key not in obj:
                        return None
                    obj = obj[key]
                for ix in idxs:
                    i = int(ix)
                    if not isinstance(obj, list) or i >= len(obj):
                        return None
                    obj = obj[i]
        if not isinstance(obj, dict):
            return None  # non-object root rejected (json-parser.c:329)
        pairs, types = flatten_json(obj, self.prefix, self.key_delimiter)
        return pairs, types

    def __call__(self, table: pa.Table) -> pa.Table:
        s = table.column(self.source_col).to_pandas().astype("string").fillna("")
        n = len(s)
        maps = np.full(n, None, dtype=object)
        tmaps = np.full(n, None, dtype=object)
        valid = np.zeros(n, dtype=bool)
        promoted = {k: np.full(n, None, dtype=object) for k in self.promote}
        for i, line in enumerate(s.to_numpy()):
            res = self.parse_line(line)
            if res is None:
                continue
            pairs, types = res
            maps[i], tmaps[i], valid[i] = pairs, types, True
            if self.promote:
                d = dict(pairs)
                for k in self.promote:
                    promoted[k][i] = d.get(k)
        out = table.append_column(self.out_col, pa.array(maps, type=pa.map_(pa.string(), pa.string())))
        if self.with_types:
            out = out.append_column(self.out_col + "_types", pa.array(tmaps, type=pa.map_(pa.string(), pa.string())))
        out = out.append_column("json_valid", pa.array(valid))
        for k in self.promote:
            out = out.append_column(k.replace(self.key_delimiter, "_"), pa.array(promoted[k], type=pa.string()))
        return out
