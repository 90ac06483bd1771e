"""Template engine: compile "$HOST ${PROGRAM} $(fn a b)" -> vectorized eval.

Mirrors the reference template compiler/evaluator
(reference lib/template/compiler.c, lib/template/eval.c): a template
compiles into a list of literal / value-ref / function-call elements;
evaluation walks the list once producing a string Series over the batch.
Trivial templates (`$HOST`, plain literal) short-circuit to a direct
column/macro read (reference lib/template/templates.h:79-82).

Value refs resolve in order: real table column -> macro (functions.macros)
-> empty string (the reference's unset-value semantics). `$(fn a b)`
calls a registered template function (functions.strings) with each arg
itself template-evaluated — args may be literals, $refs, or nested calls.

`template_hash` provides the deterministic partition key the reference
derives from a template (lib/template/eval.h:65) — used for
parallelize()-style keyed repartition.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashutil import hash_str_array
from .macros import eval_macro
from .strings import TEMPLATE_FUNCS

_NAME = r"[A-Za-z0-9_.@]+"
_TOKEN = re.compile(
    r"\$\((?P<fn>)"  # $( starts a function call (parsed by scanner)
    r"|\$\{(?P<braced>" + _NAME + r")(?::-(?P<default>[^}]*))?\}"
    r"|\$(?P<bare>[A-Za-z0-9_]+)"
)


class Literal:
    def __init__(self, text: str):
        self.text = text

    def eval(self, table: pa.Table) -> pd.Series:
        return pd.Series([self.text] * table.num_rows, dtype=object)


class ValueRef:
    """$NAME / ${NAME} / ${NAME:-default} — default applies when the
    value is UNSET (missing name, or per-row null), the reference's
    compiler.c default-value semantics; a set-but-empty value stays
    empty."""

    def __init__(self, name: str, default: str | None = None):
        self.name = name
        self.default = default

    def eval(self, table: pa.Table) -> pd.Series:
        if self.name in table.column_names:
            col = table.column(self.name).to_pandas()
            out = col.astype("string").astype(object)
            fill = self.default if self.default is not None else ""
            return out.where(col.notna(), fill)
        m = eval_macro(self.name, table)
        if m is not None:
            return m.astype(object)
        return pd.Series([self.default or ""] * table.num_rows, dtype=object)


class FuncCall:
    def __init__(self, name: str, args: list):
        self.name = name
        self.args = args  # list of compiled Templates

    def eval(self, table: pa.Table) -> pd.Series:
        fn = TEMPLATE_FUNCS.get(self.name)
        if fn is None:
            raise KeyError(f"unknown template function $({self.name} ...)")
        if getattr(fn, "_lazy_first", False):
            # higher-order functions ($(map expr list)): the first arg is a
            # per-element template SPEC, not a value to evaluate here
            return fn(table, self.args[0].spec, *[a.eval(table) for a in self.args[1:]])
        if getattr(fn, "_lazy_all", False):
            # declarative functions ($(format-json key=TPL --flag ...)):
            # every arg is a raw spec the function parses itself
            return fn(table, *[a.spec for a in self.args])
        return fn(table, *[a.eval(table) for a in self.args])


def _split_args(body: str) -> list[str]:
    """Split $(fn arg1 arg2...) body on spaces, honoring nested $() and
    quotes. An empty quoted argument ('' or \"\") is a REAL empty-string
    arg, not a separator artifact — tracked via `started`."""
    args, buf, depth, i, q = [], [], 0, 0, None
    started = False  # an arg is open even if its buffer is empty ("")
    while i < len(body):
        c = body[i]
        if q:
            if c == q:
                q = None
            else:
                buf.append(c)
        elif c in "\"'":
            q = c
            started = True
        elif c == "(":
            depth += 1
            buf.append(c)
            started = True
        elif c == ")" and depth > 0:
            depth -= 1
            buf.append(c)
        elif c == " " and depth == 0:
            if started or buf:
                args.append("".join(buf))
                buf = []
                started = False
        else:
            buf.append(c)
            started = True
        i += 1
    if started or buf:
        args.append("".join(buf))
    return args


def _find_call_end(s: str, start: int) -> int:
    """start points just after '$('; return index of the matching ')'."""
    depth, i, q = 1, start, None
    while i < len(s):
        c = s[i]
        if q:
            if c == q:
                q = None
        elif c in "\"'":
            q = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError(f"unterminated $( in template: {s!r}")


class Template:
    def __init__(self, spec: str):
        self.spec = spec
        self.elems = self._compile(spec)

    @staticmethod
    def _compile(spec: str) -> list:
        elems, pos = [], 0
        while pos < len(spec):
            if spec.startswith("${", pos) and "}" not in spec[pos:]:
                # reference compiler.c: "'}' is missing"
                raise ValueError(f"template: '}}' is missing: {spec!r}")
            if spec.startswith("$$", pos):
                elems.append(Literal("$"))
                pos += 2
                continue
            if spec.startswith("$(", pos):
                end = _find_call_end(spec, pos + 2)
                body = spec[pos + 2 : end]
                parts = _split_args(body)
                if not parts:
                    raise ValueError("empty $()")
                elems.append(FuncCall(parts[0], [Template(p) for p in parts[1:]]))
                pos = end + 1
                continue
            m = _TOKEN.search(spec, pos)
            if not m or m.start() > pos:
                nxt = m.start() if m else len(spec)
                elems.append(Literal(spec[pos:nxt]))
                pos = nxt
                continue
            name = m.group("braced") or m.group("bare")
            if name:
                elems.append(ValueRef(name, m.group("default") if m.group("braced") else None))
                pos = m.end()
            else:  # matched '$(' via regex — handled above, defensive
                pos += 1
        return elems

    def eval(self, table: pa.Table) -> pd.Series:
        if not self.elems:
            return pd.Series([""] * table.num_rows, dtype=object)
        if len(self.elems) == 1:  # trivial template short-circuit
            return self.elems[0].eval(table)
        parts = [e.eval(table).astype(str) for e in self.elems]
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return out.astype(object)

    def eval_arrow(self, table: pa.Table) -> pa.Array:
        return pa.array(self.eval(table).to_numpy(dtype=object), type=pa.string())


def template_hash(spec: str, table: pa.Table, num_partitions: int | None = None) -> np.ndarray:
    """Deterministic per-row hash of a template's value (the reference's
    log_template_hash, lib/template/eval.c:306) — the partition key for
    parallelize()-style keyed distribution."""
    vals = Template(spec).eval(table).to_numpy(dtype=object)
    h = hash_str_array(vals)
    if num_partitions:
        h = h % np.uint64(num_partitions)
    return h
