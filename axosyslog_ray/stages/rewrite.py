"""Rewrites: per-record mutation stages.

Mirrors the reference rewrite vocabulary (reference lib/rewrite/):
set (rewrite-set.c:48-61), unset/groupunset (rewrite-unset.c,
rewrite-groupset.c), subst (rewrite-subst.c:49-78), rename
(rewrite-rename.c), groupset (rewrite-groupset.c), set-tag/clear-tag
(rewrite-set-tag.c), set-pri/set-severity/set-facility
(rewrite-set-pri.c & friends), set-matches (rewrite-set-matches.c).
Every rewrite accepts an optional `condition` filter — rows failing it
keep their old value (the reference's condition() option).

Arrow blocks are immutable, so "mutation" = rebuild the column; masked
writes merge old and new with np.where, still one vectorized pass.
"""

from __future__ import annotations

import fnmatch
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.macros import FACILITY_NUM, SEVERITY_ALIASES, SEVERITY_NUM
from ..functions.templates import Template


def _cond_mask(table: pa.Table, condition) -> np.ndarray:
    if condition is None:
        return np.ones(table.num_rows, dtype=bool)
    return condition.mask(table)


def _replace_col(table: pa.Table, name: str, arr: pa.Array) -> pa.Table:
    if name in table.column_names:
        i = table.column_names.index(name)
        return table.set_column(i, name, arr)
    return table.append_column(name, arr)


def set_value(table: pa.Table, field: str, template: str, condition=None) -> pa.Table:
    """set("tmpl", value(X)) — evaluate template, store into field
    (reference rewrite-set.c:48-61). Rows failing condition() keep their
    old value — or stay UNSET (null) when the field did not exist
    (reference condition semantics: untouched rows are untouched)."""
    new = Template(template).eval(table).to_numpy(dtype=object)
    m = _cond_mask(table, condition)
    if not m.all():
        if field in table.column_names:
            # stringify surviving old values (the target becomes a string
            # column; numeric originals keep their repr, nulls stay null)
            old_s = table.column(field).to_pandas()
            old = old_s.map(lambda v: None if pd.isna(v) else str(v)).to_numpy(dtype=object)
        else:
            old = np.full(table.num_rows, None, dtype=object)
        new = np.where(m, new, old)
    return _replace_col(table, field, pa.array(new, type=pa.string()))


def unset(table: pa.Table, *fields: str) -> pa.Table:
    """unset(value(X)) — drop fields entirely (reference rewrite-unset.c)."""
    present = [f for f in fields if f in table.column_names]
    return table.drop_columns(present) if present else table


def groupunset(table: pa.Table, glob: str) -> pa.Table:
    """groupunset(values(glob)) (reference rewrite-groupset.c)."""
    rx = re.compile(fnmatch.translate(glob))
    return unset(table, *[c for c in table.column_names if rx.match(c)])


def rename(table: pa.Table, src: str, dst: str) -> pa.Table:
    """rename(X,Y) (reference rewrite-rename.c)."""
    if src not in table.column_names:
        return table
    names = [dst if c == src else c for c in table.column_names]
    return table.rename_columns(names)


def subst(table: pa.Table, pattern: str, replacement: str, field: str = "message",
          global_: bool = True, condition=None) -> pa.Table:
    """subst("re","rep", value(X) [global]) (reference rewrite-subst.c:49-78).

    Replacement supports $1..$9 backrefs like the reference's matcher.
    A replacement containing template FUNCTIONS ($(substr $0 ...),
    $(sha1 --length 16 $0), ...) evaluates as a TEMPLATE per match with
    the match registers $0..$9 bound (the reference's store-matches +
    template-replacement semantics, scl/rewrite/cc-mask.conf's shape):
    all matches of the batch are collected into ONE flat register table
    and the template evaluates vectorized over it, then the rendered
    replacements splice back by span."""
    if "$(" in replacement:
        return _subst_template(table, pattern, replacement, field,
                               global_, condition)
    s = table.column(field).to_pandas().astype("string")
    rep = re.sub(r"\$(\d)", r"\\\1", replacement)
    new = s.str.replace(pattern, rep, regex=True, n=-1 if global_ else 1)
    m = _cond_mask(table, condition)
    out = np.where(m, new.astype(object).to_numpy(), s.astype(object).to_numpy())
    out = np.where(pd.isna(out), None, out)
    return _replace_col(table, field, pa.array(out, type=pa.string()))


def _subst_template(table: pa.Table, pattern: str, replacement: str,
                    field: str, global_: bool, condition) -> pa.Table:
    from ..functions.templates import Template

    s = table.column(field).to_pandas().astype(object).to_numpy()
    rx = re.compile(pattern)
    cond = _cond_mask(table, condition)
    per_row: list[list] = [[] for _ in range(len(s))]
    regs: list[list[str]] = [[] for _ in range(10)]
    n_flat = 0
    for ri, x in enumerate(s):
        if x is None or not cond[ri]:
            continue
        for m in rx.finditer(x):
            per_row[ri].append((m.start(), m.end(), n_flat))
            ng = m.lastindex or 0
            for i in range(10):
                g = m.group(i) if i <= ng else None
                regs[i].append(g if g is not None else "")
            n_flat += 1
            if not global_:
                break
    if n_flat:
        flat = pa.table({str(i): pa.array(regs[i], type=pa.string())
                         for i in range(10)})
        reps = Template(replacement).eval(flat).tolist()
    else:
        reps = []
    out = []
    for ri, x in enumerate(s):
        if x is None or not per_row[ri]:
            out.append(x)
            continue
        buf: list[str] = []
        last = 0
        for st, en, gi in per_row[ri]:
            buf.append(x[last:st])
            buf.append(reps[gi])
            last = en
        buf.append(x[last:])
        out.append("".join(buf))
    return _replace_col(table, field, pa.array(out, type=pa.string()))


def groupset(table: pa.Table, template: str, glob: str, condition=None) -> pa.Table:
    """groupset("v", values("g1","g2")) — set every matching field
    (reference lib/rewrite/rewrite-groupset.c)."""
    rx = re.compile(fnmatch.translate(glob))
    out = table
    for c in [c for c in table.column_names if rx.match(c)]:
        out = set_value(out, c, template, condition)
    return out


def _tags_col(table: pa.Table) -> pd.Series:
    if "tags" in table.column_names:
        return table.column("tags").to_pandas().map(lambda v: list(v) if v is not None else [])
    return pd.Series([[] for _ in range(table.num_rows)], dtype=object)


def set_tag(table: pa.Table, tag: str, condition=None) -> pa.Table:
    """set-tag() (reference rewrite-set-tag.c; tags bitset
    lib/logmsg/tags.c). A tag containing macros renders as a TEMPLATE
    per row (reference set-tag template support, Light
    test_set_tag_with_template)."""
    tags = _tags_col(table)
    m = _cond_mask(table, condition)
    if "$" in tag:
        from ..functions.templates import Template

        per_row = Template(tag).eval(table).tolist()
    else:
        per_row = [tag] * table.num_rows
    new = [sorted(set(v) | {ti}) if mi else v
           for v, ti, mi in zip(tags, per_row, m)]
    return _replace_col(table, "tags", pa.array(new, type=pa.list_(pa.string())))


def clear_tag(table: pa.Table, tag: str, condition=None) -> pa.Table:
    tags = _tags_col(table)
    m = _cond_mask(table, condition)
    new = [[x for x in v if x != tag] if mi else v for v, mi in zip(tags, m)]
    return _replace_col(table, "tags", pa.array(new, type=pa.list_(pa.string())))


def _set_pri_part(table: pa.Table, template: str, part: str, condition=None) -> pa.Table:
    vals = Template(template).eval(table)
    pri = table.column("pri").to_numpy().astype(np.int64)
    # out-of-range values leave the row unchanged (the reference rejects
    # severity > 7 / facility > 23 / pri > 1023, rewrite-set-pri.c)
    if part == "pri":
        num = pd.to_numeric(vals, errors="coerce")
        num = num.where((num >= 0) & (num <= 1023))
        new = np.where(num.notna(), num.fillna(0).astype(int), pri)
    elif part == "severity":
        # name lookup is case-insensitive (lib/syslog-names.c
        # strcasecmp) and set-severity also accepts the app-log alias
        # table (severity-aliases.table: FTL/WRN/INF/DBG/TRACE...)
        num = pd.to_numeric(
            vals.map(lambda v: SEVERITY_ALIASES.get(
                str(v).lower(), int(v) if str(v).isdigit() else None)),
            errors="coerce")
        num = num.where((num >= 0) & (num <= 7))
        new = np.where(num.notna(), (pri // 8) * 8 + num.fillna(0).astype(int), pri)
    else:  # facility
        num = pd.to_numeric(
            vals.map(lambda v: FACILITY_NUM.get(
                str(v).lower(), int(v) if str(v).isdigit() else None)),
            errors="coerce")
        num = num.where((num >= 0) & (num <= 23))
        new = np.where(num.notna(), num.fillna(0).astype(int) * 8 + pri % 8, pri)
    m = _cond_mask(table, condition)
    new = np.where(m, new, pri)
    return _replace_col(table, "pri", pa.array(new.astype(np.uint16), type=pa.uint16()))


def set_pri(table, template, condition=None):
    """set-pri() (reference rewrite-set-pri.c)."""
    return _set_pri_part(table, template, "pri", condition)


def set_severity(table, template, condition=None):
    """set-severity() (reference rewrite-set-severity.c)."""
    return _set_pri_part(table, template, "severity", condition)


def set_facility(table, template, condition=None):
    """set-facility() (reference rewrite-set-facility.c)."""
    return _set_pri_part(table, template, "facility", condition)


def set_matches(table: pa.Table, list_template: str, condition=None) -> pa.Table:
    """set-matches() — fill $1.. from a comma-separated list value
    (reference rewrite-set-matches.c)."""
    vals = Template(list_template).eval(table)
    m = _cond_mask(table, condition)
    old = (
        table.column("matches").to_pandas()
        if "matches" in table.column_names
        else pd.Series([None] * table.num_rows, dtype=object)
    )
    new = [v.split(",") if (mi and v) else (list(o) if o is not None else None) for v, o, mi in zip(vals, old, m)]
    return _replace_col(table, "matches", pa.array(new, type=pa.list_(pa.string())))
