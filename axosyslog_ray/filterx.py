"""FilterX: a minimal, vectorized expression/statement evaluator.

Mirrors the semantics of the reference's FilterX block language
(reference lib/filterx/: expr-condition.c if/elif/else, expr-switch.c,
expr-null-coalesce.c `??`, expr-comparison.c, expr-boolalg.c,
expr-arithmetic-operators.c, expr-assign.c, expr-drop.c / expr-done.c
verdicts, expr-isset.c isset()) — re-expressed Ray-Data-first: a
program compiles ONCE (per actor / process) into a statement tree, and
evaluation is columnar — every expression produces a pandas Series for
the whole batch, and statements apply under a boolean row mask, so
if/else/switch/drop/done cost one vectorized masked assignment each
instead of a per-row interpreter loop.

Surface (the subset a log pipeline actually uses):
  $name           message field (table column)
  name            local variable
  literals        "str" 'str' 123 4.5 true false null
  operators       == != < <= > >= + - * / %  and or not  ??  cond ? a : b
                  =~ "pat"  !~ "pat" (expr-regexp.c, literal pattern,
                  compiled once)   x in [a, b, c] (expr-membership.c)
  literals        [e1, e2, ...] list; {"k": e, ...} dict (null key
                  contributes no member) (expr-literal-container.c)
  functions       upper(x) lower(x) len(x) string(x) int(x) double(x)
                  isset(x) defined(x) startswith(x, "p") endswith(x, "s")
                  includes(x, "sub") (func-str.c)
                  str_strip/str_lstrip/str_rstrip(x) str_replace(x, o, n)
                  (func-str-transform.c)
                  regexp_subst(x, "pat", "rep"[, global])  first match by
                  default, all with the global flag; \\1 group refs
                  (expr-regexp-subst.c)
                  regexp_search(x, "pat") -> capture list (expr-regexp-search.c)
                  glob_match(x, "a*b") (func-glob.c)
                  md5/sha1/sha256/sha512(x) (func-digest.c)
                  hex_/base64_/url encode+decode (func-encode.c)
  datetime        strptime(x, "%Y-%m-%d %H:%M:%S") strftime(x, fmt)
                  format_isodate(x)/isodate(x) fix_timezone(x, "zone")
                  (func-timestamp.c; two-pass DST via stages/timezones)
  object model    parse_json(x)/json(x) format_json(x) keys(x)
                  unset_empties(x) istype(x, "dict")
                  flatten(x[, sep]) dict_to_pairs(x)
                  (func-flatten.c, func-dict-to-pairs.c)
                  $p["k"]  $p.k.j  $p["tags"][0]   (expr-get-subscript.c,
                  expr-getattr.c; missing member -> unset)
                  $p["k"] = e;  $p.k = e;  (expr-set-subscript.c,
                  expr-setattr; copy-on-write per masked row)
  statements      lval = expr;   lval += expr; (expr-plus-assign.c)
                  lval =?? expr; (null-safe assign, expr-assign.c nullv)
                  declare x = expr;   break; (expr-break.c, innermost
                  block)   unset($f); (expr-unset.c)
                  if (e) {..} elif (e) {..} else {..}
                  switch (e) { case LIT: ..; case LO..HI: ..; default: ..; }
                  drop;   done;
  more operators  e[a..b] string/list slicing (negative indices OK)
                  eq/ne/lt/le/gt/ge string comparisons (KW_STR_*)
                  === / !== type-and-value comparisons (KW_TAV_*)
                  x not in [..]   {"k" :?? e} null-elided dict member
                  ${dotted.name} message refs; 0xff / 2k / 2Kib literals
Null semantics follow the reference: `??` takes the right side when the
left is null/unset; comparisons with null are false; `and`/`or` treat
null as false. `drop;` removes the row from the output; `done;` freezes
the row (no further statements touch it) but keeps it.

Usage (map_batches-ready):
    fx = FilterX('if ($status >= 500) { $class = "err"; drop; } '
                 'else { $class = "ok"; };')
    ds.map_batches(fx, batch_format="pyarrow")
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<comment>\#[^\n]*|//[^\n]*|/\*(?s:.*?)\*/)
    | (?P<num>0x[0-9a-fA-F]+|\d+\.\d+|\d+[kKmMgG][iI]?[bB]?|\d+)
    | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
    | (?P<field>\$\{[^}]+\}|\$[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z0-9_]+)*)
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>===|!==|=\?\?|:\?\?|\.\.|\?\?|=~|!~|\+=|==|!=|<=|>=|&&|\|\||[-+*/%<>=(){};:,?!\[\].])
    )""",
    re.VERBOSE,
)

_BUILTIN_FIELDS = {"MSG": "message", "MESSAGE": "message", "HOST": "host",
                   "PROGRAM": "program", "PID": "pid", "MSGID": "msgid"}

_NOT_CONST = object()


def _const_fold(node):
    """Scalar value of a constant expression (literal / ternary / not /
    and / or over constants) — the subset expr-switch.c's optimizer
    folds before duplicate-case detection; _NOT_CONST otherwise."""
    tag = node[0] if isinstance(node, tuple) else None
    if tag == "lit":
        return node[1]
    if tag == "ternary":
        c = _const_fold(node[1])
        if c is _NOT_CONST:
            return _NOT_CONST
        return _const_fold(node[2] if c else node[3])
    if tag == "not":
        v = _const_fold(node[1])
        return _NOT_CONST if v is _NOT_CONST else not v
    if tag in ("and", "or"):
        a, b = _const_fold(node[1]), _const_fold(node[2])
        if a is _NOT_CONST or b is _NOT_CONST:
            return _NOT_CONST
        return (a and b) if tag == "and" else (a or b)
    return _NOT_CONST


_KEYWORDS = {"if", "elif", "else", "switch", "case", "default", "drop", "done",
             "and", "or", "not", "true", "false", "null", "in", "unset",
             "eq", "ne", "lt", "le", "gt", "ge", "declare", "break"}

_ESCAPES = {"\\": "\\", '"': '"', "'": "'", "n": "\n", "t": "\t", "r": "\r"}


def _unescape(body: str) -> str:
    """String-literal escapes: the quote/backslash/whitespace set is
    processed; UNKNOWN escapes keep their backslash so regex classes
    (\\d, \\w) and group refs (\\1) written inside a quoted pattern
    survive to the regex compiler (matching the reference, where the
    pattern string reaches PCRE with its backslashes intact)."""
    return re.sub(r"\\(.)", lambda m: _ESCAPES.get(m.group(1), "\\" + m.group(1)), body)


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise SyntaxError(f"filterx: cannot tokenize at {src[pos:pos+20]!r}")
            break
        pos = m.end()
        for kind in ("num", "str", "field", "name", "op"):
            v = m.group(kind)
            if v is not None:
                if kind == "field" and v.startswith("${"):
                    # ${name-with-specials} message ref (cfg-lex.l
                    # LL_MESSAGE_REF) — same as $name after unwrapping
                    v = "$" + v[2:-1]
                if kind == "field":
                    # hard-macro aliases resolve to the engine's message
                    # columns ($MSG / $MESSAGE are the SAME nv in the
                    # reference — lib/logmsg LM_V_MESSAGE); a dotted
                    # token aliases its BASE ($MSG.app -> $message.app,
                    # the expr-getattr/setattr path)
                    base, dot, rest = v[1:].partition(".")
                    if base in _BUILTIN_FIELDS:
                        v = "$" + _BUILTIN_FIELDS[base] + dot + rest
                toks.append((kind, v))
                break
    toks.append(("eof", ""))
    return toks


# ---------------------------------------------------------------------------
# AST + parser (recursive descent, precedence climbing)
# ---------------------------------------------------------------------------

class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise SyntaxError(f"filterx: expected {val!r}, got {v!r}")

    def accept(self, val) -> bool:
        if self.peek()[1] == val:
            self.i += 1
            return True
        return False

    # -- statements --
    def program(self):
        stmts = []
        while self.peek()[0] != "eof":
            stmts.append(self.statement())
            while self.accept(";"):
                pass
        return ("block", stmts)

    def block(self):
        self.expect("{")
        stmts = []
        while not self.accept("}"):
            stmts.append(self.statement())
            while self.accept(";"):
                pass
        return ("block", stmts)

    def statement(self):
        k, v = self.peek()
        if v == "if":
            return self.if_stmt()
        if v == "switch":
            return self.switch_stmt()
        if v == "drop":
            self.next()
            return ("drop",)
        if v == "done":
            self.next()
            return ("done",)
        if v == "break":
            # lib/filterx/expr-break.c: short-circuits the rest of the
            # INNERMOST enclosing block (the compound consumes it)
            self.next()
            return ("break",)
        if v == "declare":
            # declare x = expr; (filterx-grammar.ym KW_DECLARE): a
            # DECLARED variable outlives its block — it is carried to
            # later filterx blocks in the same log path (Light
            # test_filterx_scope.py declared-retention cases), where a
            # floating (plain) variable is dropped at end of scope
            self.next()
            nk, nv = self.next()
            if nk != "name":
                raise SyntaxError("filterx: declare needs a variable name")
            self.expect("=")
            return ("declare", ("name", nv), self.expr())
        if v == "unset":
            # unset($field); — reference lib/filterx/expr-unset.c: the
            # value becomes unset (null here); isset() turns false.
            # unset(d.k) / unset(d["k"]) removes the dict member
            # (filterx_object_unset_key; Light test_filterx_dict.py)
            self.next()
            self.expect("(")
            fk, fv = self.next()
            if fk not in ("field", "name"):
                raise SyntaxError("filterx: unset() takes a $field or variable")
            path = self._lval_path()
            self.expect(")")
            if path:
                # `unset(x.y) ?? true` guards the reference's unset
                # error path (missing parent -> error -> ?? true keeps
                # the row); this engine's unset on a missing path is
                # already a per-row no-op, so the guard expression is
                # consumed and discarded
                if self.accept("??"):
                    self.expr()
                return ("unsetpath", (fk, fv), path)
            if fk != "field":
                raise SyntaxError("filterx: unset() on a bare variable needs a path")
            if self.accept("??"):
                self.expr()
            return ("unset", fv[1:])
        if v == "dpath" and self.toks[self.i + 1][1] == "(":
            # dpath(x.a.b) = e; / dpath(x.a.b) += e; — an lvalue that
            # auto-creates missing intermediate dicts along the path
            # (lib/filterx/filterx-dpath.c; Light test_filterx_dict.py
            # test_filterx_dpath). This engine's setpath already creates
            # intermediates, so dpath compiles onto it; += desugars to
            # path = path + rhs ('+' is typed: dict merge, list concat).
            self.next()
            self.expect("(")
            bk, bv = self.next()
            if bk not in ("field", "name"):
                raise SyntaxError("filterx: dpath() needs a variable or $field base")
            path = self._lval_path()
            self.expect(")")
            if not path:
                raise SyntaxError("filterx: dpath() needs at least one path element")
            if self.accept("+="):
                read = ("field", bv[1:]) if bk == "field" else ("var", bv)
                for p in path:
                    read = ("subscript", read, p)
                return ("setpath", (bk, bv), path,
                        ("arith", "+", read, self.expr()))
            if self.accept("=??"):
                # nullv dpath assign (expr-assign.c _do_nullv_assign)
                return ("setpath", (bk, bv), path, self.expr(), True)
            self.expect("=")
            return ("setpath", (bk, bv), path, self.expr())
        if (k == "name" and v not in _KEYWORDS and v != "dpath"
                and self.toks[self.i + 1][1] == "("):
            # expression statement: a bare function call used for its
            # side effect (load_vars(...); set_pri(...); update-style
            # functions) — the FilterX compound statement allows any
            # expression as a step (lib/filterx/expr-compound.c)
            return ("exprstmt", self.expr())
        if k in ("field", "name") and v not in _KEYWORDS:
            start_i = self.i
            self.next()
            # subscript / attr lval: $d["k"] = e; d.k = e;
            # (lib/filterx/expr-set-subscript.c, expr-setattr; a dotted
            # FIELD token `$d.k` is one token — resolved at exec time)
            path = self._lval_path()
            if path:
                if self.accept("=??"):
                    # nullv set: only assign when the RHS is set
                    # (expr-assign.c _do_nullv_assign)
                    return ("setpath", (k, v), path, self.expr(), True)
                if self.accept("+="):
                    # d.k += e desugars to d.k = d.k + e with the READ
                    # taken before the write (expr-plus-assign.c; the
                    # recursive-merge Light case stores the OLD version)
                    read = ("field", v[1:]) if k == "field" else ("var", v)
                    for p in path:
                        read = ("subscript", read, p)
                    return ("setpath", (k, v), path,
                            ("arith", "+", read, self.expr()))
                if self.peek()[1] != "=":
                    # e.g. `$d["k"] == 1;` — expression statement
                    self.i = start_i
                    return ("exprstmt", self.expr())
                self.expect("=")
                return ("setpath", (k, v), path, self.expr())
            if self.accept("+="):
                # lib/filterx/expr-plus-assign.c: desugars to lval = lval + rhs
                lval = ("field", v[1:]) if k == "field" else ("var", v)
                return ("assign", (k, v), ("arith", "+", lval, self.expr()))
            if self.accept("=??"):
                return ("assign", (k, v), self.expr(), True)
            if self.peek()[1] == "=" and self.toks[self.i + 1][1] != "=":
                self.expect("=")
                return ("assign", (k, v), self.expr())
            # not an assignment: a bare expression statement — rows where
            # it evaluates falsey are FILTERED OUT ('bailing out due to a
            # falsy expr', expr-compound.c:42-78; only assignments carry
            # ignore_falsy_result). Re-parse the full expression.
            self.i = start_i
            return ("exprstmt", self.expr())
        # anything else — literals (false; 0;), negations, parenthesized
        # expressions — is a bare expression statement too: the compound
        # accepts ANY expression as a step (expr-compound.c, pinned by
        # test_expr_condition.c's falsey-statement-interrupts case)
        return ("exprstmt", self.expr())

    def _lval_path(self):
        """Parse a (possibly empty) .name / [expr] lvalue path chain.
        An EMPTY subscript `l[] = v` is the list-append lvalue
        (filterx-grammar.ym LL_EMPTY_BRACKETS set-subscript with a
        NULL key; Light test_filterx_cow.py list cases)."""
        path = []
        while True:
            if self.accept("["):
                if self.accept("]"):
                    path.append(("lit", _APPEND_KEY))
                    continue
                path.append(self.expr())
                self.expect("]")
            elif self.accept("."):
                nk, nv = self.next()
                if nk != "name":
                    raise SyntaxError("filterx: expected name after '.'")
                path.append(("lit", nv))
            else:
                return path

    def if_stmt(self):
        self.expect("if")
        self.expect("(")
        cond = self.expr()
        self.expect(")")
        then = self.block()
        if self.accept("elif"):
            # rewind: treat as 'if' for the nested parse
            self.i -= 1
            self.toks[self.i] = ("name", "if")
            return ("if", cond, then, ("block", [self.if_stmt()]))
        if self.accept("else"):
            return ("if", cond, then, self.block())
        return ("if", cond, then, None)

    def _case_body(self):
        body = []
        while self.peek()[1] not in ("case", "default", "}"):
            body.append(self.statement())
            while self.accept(";"):
                pass
        return body

    def switch_stmt(self):
        """The switch body is ONE compound with case labels as entry
        points — execution FALLS THROUGH into later cases until a
        `break;` (expr-switch.c _eval_body -> compound_expr_eval_ext
        from the matched target; pinned by the reference's own
        functional tests test_switch_fallthrough*). `default:` keeps
        its source position like a C switch."""
        self.expect("switch")
        self.expect("(")
        subject = self.expr()
        self.expect(")")
        self.expect("{")
        cases = []
        while not self.accept("}"):
            if self.accept("case"):
                lit = self.expr()
                if self.accept(".."):
                    # case lo..hi: numeric half-open range lo <= x < hi
                    # (expr-switch.c _switch_case_range_match)
                    lit = ("caserange", lit, self.expr())
                self.expect(":")
                cases.append((lit, self._case_body()))
            elif self.accept("default"):
                self.expect(":")
                cases.append((None, self._case_body()))
            else:
                raise SyntaxError("filterx: expected case/default in switch")
        # duplicate LITERAL cases and duplicate defaults are config-init
        # errors (expr-switch.c _optimize: literal targets dedupe into a
        # hash and a collision aborts; Light
        # test_switch_duplicate_literal_case / _duplicate_default_case).
        # Constant expressions fold first, like the reference optimizer.
        seen_lits: set = set()
        n_default = 0
        for lit, _body in cases:
            if lit is None:
                n_default += 1
                if n_default > 1:
                    raise SyntaxError(
                        "filterx: duplicate default case in switch")
                continue
            cv = _const_fold(lit)
            if cv is not _NOT_CONST:
                key = (type(cv).__name__, cv)
                if key in seen_lits:
                    raise SyntaxError(
                        f"filterx: duplicate case {cv!r} in switch")
                seen_lits.add(key)
        return ("switch", subject, cases)

    # -- expressions --
    def expr(self):
        e = self.or_()
        if self.accept("?"):
            if self.accept(":"):
                # GNU elvis `a ? : b` — a if truthy else b
                # (filterx-grammar.y ternary with omitted middle)
                return ("ternary", e, e, self.expr())
            a = self.expr()
            self.expect(":")
            b = self.expr()
            return ("ternary", e, a, b)
        return e

    def or_(self):
        e = self.and_()
        while self.peek()[1] in ("or", "||"):
            self.next()
            e = ("or", e, self.and_())
        return e

    def and_(self):
        e = self.not_()
        while self.peek()[1] in ("and", "&&"):
            self.next()
            e = ("and", e, self.not_())
        return e

    def not_(self):
        if self.peek()[1] in ("not", "!"):
            self.next()
            return ("not", self.not_())
        return self.comparison()

    def comparison(self):
        e = self.coalesce()
        if self.peek()[1] in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next()[1]
            return ("cmp", op, e, self.coalesce())
        if self.peek()[1] in ("===", "!=="):
            # type-AND-value comparison (filterx-grammar.ym KW_TAV_EQ/NE:
            # FCMPX_TYPE_AND_VALUE_BASED — no conversion, type mismatch
            # means unequal)
            op = self.next()[1]
            return ("cmptav", op, e, self.coalesce())
        if self.peek()[1] in ("eq", "ne", "lt", "le", "gt", "ge"):
            # string-based comparison keywords (KW_STR_*: both sides
            # rendered to string, memcmp order)
            op = self.next()[1]
            return ("cmpstr", op, e, self.coalesce())
        if self.peek()[1] in ("=~", "!~"):
            # lib/filterx/expr-regexp.c: RHS must be a literal pattern so it
            # compiles ONCE per program, not per batch/row
            op = self.next()[1]
            pk, pv = self.next()
            if pk != "str":
                raise SyntaxError("filterx: =~ / !~ needs a literal string pattern")
            pat = re.compile(_unescape(pv[1:-1]))
            return ("regex", op == "!~", e, pat)
        if self.peek()[1] == "in":
            # lib/filterx/expr-membership.c — the RHS binds tighter than
            # ?: so `a in b ? c : d` is `(a in b) ? c : d`
            self.next()
            return ("in", e, self.coalesce())
        if self.peek()[1] == "not" and self.toks[self.i + 1][1] == "in":
            self.next()
            self.next()
            return ("not", ("in", e, self.coalesce()))
        return e

    def coalesce(self):
        e = self.additive()
        while self.accept("??"):
            e = ("coalesce", e, self.additive())
        return e

    def additive(self):
        e = self.mult()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            e = ("arith", op, e, self.mult())
        return e

    def mult(self):
        e = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            e = ("arith", op, e, self.unary())
        return e

    def unary(self):
        if self.accept("-"):
            return ("neg", self.unary())
        return self.primary()

    def postfix(self, e):
        """Postfix access chain (lib/filterx/expr-get-subscript.c `[k]`,
        expr-getattr.c `.name`) on any primary expression."""
        while True:
            if self.accept("["):
                # slicing e[a..b] / e[..b] / e[a..] (filterx-grammar.ym
                # LL_DOTDOT -> filterx_string_slicing_new; Python-style
                # negative indices per the reference functional pins)
                if self.accept(".."):
                    hi = self.expr()
                    self.expect("]")
                    e = ("slice", e, None, hi)
                    continue
                key = self.expr()
                if self.accept(".."):
                    hi = None if self.peek()[1] == "]" else self.expr()
                    self.expect("]")
                    e = ("slice", e, key, hi)
                    continue
                self.expect("]")
                e = ("subscript", e, key)
            elif self.accept("."):
                nk, nv = self.next()
                if nk != "name":
                    raise SyntaxError("filterx: expected name after '.'")
                e = ("subscript", e, ("lit", nv))
            else:
                return e

    def primary(self):
        return self.postfix(self._primary_base())

    def _primary_base(self):
        k, v = self.next()
        if k == "num":
            if v.startswith("0x"):
                return ("lit", int(v, 16))
            if "." in v:
                return ("lit", float(v))
            m = re.fullmatch(r"(\d+)([kKmMgG])?([iI])?[bB]?", v)
            base, suf, binary = int(m.group(1)), m.group(2), m.group(3)
            if suf:
                # size suffixes (lib/parse-number.c): k/M/G are decimal
                # powers, the 'i' infix makes them binary (Ki/Mi/Gi)
                exp = {"k": 1, "m": 2, "g": 3}[suf.lower()]
                base *= (1024 if binary else 1000) ** exp
            return ("lit", base)
        if k == "str":
            return ("lit", _unescape(v[1:-1]))
        if k == "field":
            return ("field", v[1:])
        if k == "name":
            if v == "true":
                return ("lit", True)
            if v == "false":
                return ("lit", False)
            if v == "null":
                return ("lit", None)
            if self.accept("("):
                # positional then named args: f(a, b, key=expr, ...) —
                # the reference FILTERX_FUNCTION arg convention
                # (lib/filterx/expr-function.c named literal args)
                args, kwargs = [], []
                if not self.accept(")"):
                    while True:
                        if (self.peek()[0] == "name"
                                and self.toks[self.i + 1][1] == "="):
                            kname = self.next()[1]
                            self.next()  # '='
                            kwargs.append((kname, self.expr()))
                        else:
                            args.append(self.expr())
                        if not self.accept(","):
                            break
                    self.expect(")")
                return ("call", v, args, kwargs)
            return ("var", v)
        if v == "(":
            e = self.expr()
            self.expect(")")
            return e
        if v == "[":
            # literal list (lib/filterx/expr-literal-container.c)
            items = []
            if not self.accept("]"):
                items.append(self.expr())
                while self.accept(","):
                    if self.peek()[1] == "]":  # trailing comma
                        break
                    items.append(self.expr())
                self.expect("]")
            return ("listlit", items)
        if v == "{":
            # literal dict (expr-literal-container.c): {"k": expr, ...} —
            # unambiguous in expression position (blocks are statements)
            pairs = []
            if not self.accept("}"):
                while True:
                    key = self.expr()
                    if self.accept(":??"):
                        # "k" :?? expr — member elided when the value is
                        # null/unset (cfg-lex.l KW_NULLV_DICT_ELEM)
                        pairs.append((key, self.expr(), True))
                    else:
                        self.expect(":")
                        pairs.append((key, self.expr(), False))
                    if not self.accept(","):
                        break
                    if self.peek()[1] == "}":  # trailing comma
                        break
                self.expect("}")
            return ("dictlit", pairs)
        raise SyntaxError(f"filterx: unexpected token {v!r}")


# ---------------------------------------------------------------------------
# vectorized evaluator
# ---------------------------------------------------------------------------

class _Ctx:
    def __init__(self, table: pa.Table):
        self.n = table.num_rows
        self.cols: dict[str, pd.Series] = {}
        self.assigned: set[str] = set()  # only these are written back
        self.table = table
        self.vars: dict[str, pd.Series] = {}
        self.active = np.ones(self.n, dtype=bool)  # rows still processed
        self.kept = np.ones(self.n, dtype=bool)    # rows not dropped
        self.mask = np.ones(self.n, dtype=bool)    # exprstmt write mask
        self.metrics: dict = {}                    # update_metric counters
        self.break_rows = np.zeros(self.n, dtype=bool)  # break verdicts
        self.failure_enabled = False               # failure_info collector
        self.failure_collect_falsy = False
        self.failure_info: list = []
        self.failure_meta = None
        # declared variables (filterx-grammar KW_DECLARE) arriving from
        # an earlier filterx block travel as hidden _FXDECL-prefixed
        # columns; seed them as variables and keep them declared
        self.declared: set[str] = set()
        for cn in table.column_names:
            if cn.startswith(_FXDECL):
                name = cn[len(_FXDECL):]
                self.vars[name] = pd.Series(
                    [_maybe_unmarshal(v)
                     for v in table.column(cn).to_pandas()], dtype=object)
                self.declared.add(name)

    def col(self, name: str) -> pd.Series:
        if name in self.cols:
            return self.cols[name]
        if name in self.table.column_names:
            s = self.table.column(name).to_pandas()
        else:
            s = pd.Series([None] * self.n, dtype=object)
        self.cols[name] = s
        return s


# sentinel key for the `l[] = v` append lvalue (an impossible real key)
_APPEND_KEY = "\x00__fx_append__\x00"

# hidden-column prefix carrying DECLARED filterx variables between
# consecutive filterx blocks (filterx-grammar KW_DECLARE retention;
# Light test_filterx_scope.py). Stripped by strip_declared_columns()
# at the destination boundary.
_FXDECL = "__fxdecl_"


class Protobuf(bytes):
    """FilterX protobuf object (lib/filterx/object-string.c
    filterx_protobuf_new): opaque bytes with a distinct type label —
    repr shows protobuf(...), JSON marshals as base64."""


def _double_repr(dbl: float, prec: int = -1) -> str:
    """Reference double rendering (lib/filterx/object-primitive.c:140
    double_repr): %.17g when precision is unknown, trailing zeroes
    truncated, a bare integer value gains '.0'."""
    import math

    if math.isnan(dbl):
        return "NaN"
    if math.isinf(dbl):
        return "-Infinity" if dbl < 0 else "Infinity"
    buf = f"{dbl:.{prec}f}" if prec >= 0 else f"{dbl:.17g}"
    if "." not in buf and "e" not in buf:
        return buf + ".0"
    if "." in buf:
        dot = buf.index(".")
        last = dot + 1
        for i in range(dot + 1, len(buf)):
            if buf[i] != "0":
                last = i
        buf = buf[:last + 1]
    return buf


def _unix_6f(v) -> str:
    """Unix-epoch rendering of a datetime with 6 fraction digits
    (lib/timeutils append_format_unix_time TS_FMT_UNIX, frac_digits=6 —
    the datetime string/JSON marshal, object-datetime.c:244-257)."""
    ts = pd.Timestamp(v)
    if ts.tzinfo is None:
        ts = ts.tz_localize("UTC")
    ns = ts.value
    sec, frac_ns = divmod(ns, 1_000_000_000)
    return f"{sec}.{frac_ns // 1000:06d}"


def _escape_bin(b: bytes) -> str:
    """append_unsafe_utf8_as_escaped_binary with AUTF8_UNSAFE_QUOTE:
    printable UTF-8 passes through, quotes/backslashes escape, other
    bytes render as \\xNN."""
    out = []
    for ch in bytes(b).decode("utf-8", "backslashreplace"):
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch.isprintable() or ch in ("\t",):
            out.append(ch)
        else:
            out.append(f"\\x{ord(ch):02x}")
    return "".join(out)


def _fx_render(v, mode: str) -> str:
    """Reference value rendering, one scalar. mode: 'repr' (repr()),
    'json' (format_json / dict-member marshal), 'str' (string() cast).
    Matches the per-type repr/format_json/str methods in
    lib/filterx/object-*.c, pinned by the Light types suite."""
    import base64 as _b64
    import datetime as _dt
    import json as _json

    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return _double_repr(float(v))
    if isinstance(v, Protobuf):
        if mode == "repr":
            return 'protobuf("' + _escape_bin(v) + '")'
        if mode == "str":
            return bytes(v).decode("utf-8", "replace")
        return '"' + _b64.b64encode(bytes(v)).decode() + '"'
    if isinstance(v, (bytes, bytearray)):
        if mode == "repr":
            return 'bytes("' + _escape_bin(v) + '")'
        if mode == "str":
            return bytes(v).decode("utf-8", "replace")
        return '"' + _b64.b64encode(bytes(v)).decode() + '"'
    if isinstance(v, (pd.Timestamp, np.datetime64, _dt.datetime)):
        u = _unix_6f(v)
        if mode == "repr":
            return f"datetime({u})"
        if mode == "str":
            return u
        return f'"{u}"'
    if isinstance(v, str):
        if mode == "str":
            return v
        return _json.dumps(v, ensure_ascii=False)
    if isinstance(v, dict) or isinstance(v, (list, tuple)):
        # otel objects (object-otel-*.cpp): repr/string render as
        # 'otel_x(<protobuf-JSON>)'; format_json yields the plain value
        # (Light test_filterx_types otel pins)
        from .functions.otel import OtelArray, OtelKVList, _OtelMessage
        from .functions.otel import proto_json as _otel_pj

        if isinstance(v, (_OtelMessage, OtelKVList, OtelArray)):
            if mode == "json":
                plain = dict(v) if isinstance(v, dict) else list(v)
                return _fx_render(plain, "json")
            return f"{v.FX_NAME}({_otel_pj(v)})"
    if isinstance(v, dict):
        # dict repr/string render members via repr, format_json via
        # the members' JSON marshal (Light test_type_dict: the same
        # dict differs only in its datetime member)
        inner = "json" if mode == "json" else "repr"
        items = []
        for k, val in v.items():
            kv = _json.dumps(str(k), ensure_ascii=False)
            if val is None or (np.ndim(val) == 0 and not isinstance(
                    val, (dict, list, str, bytes)) and pd.isna(val)):
                items.append(kv + ":null")
            else:
                items.append(kv + ":" + _fx_render(val, inner))
        return "{" + ",".join(items) + "}"
    if isinstance(v, (list, tuple, np.ndarray)):
        inner = "json" if mode == "json" else "repr"
        items = []
        for val in v:
            if val is None or (np.ndim(val) == 0 and not isinstance(
                    val, (dict, list, str, bytes)) and pd.isna(val)):
                items.append("null")
            else:
                items.append(_fx_render(val, inner))
        return "[" + ",".join(items) + "]"
    if mode == "str":
        return str(v)
    return _json.dumps(str(v), ensure_ascii=False)


def _fx_vt(v) -> str:
    """Runtime type label of a FilterX value (the evaluator's Python
    object model mapped to the reference's FILTERX_TYPE names)."""
    if v is None or (np.ndim(v) == 0 and pd.isna(v)):
        return "null"
    if isinstance(v, (bool, np.bool_)):
        return "boolean"
    if isinstance(v, (int, np.integer)):
        return "integer"
    if isinstance(v, (float, np.floating)):
        return "double"
    if isinstance(v, Protobuf):
        return "protobuf"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, str):
        return "string"
    if isinstance(v, dict):
        return "json"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "list"
    return "string"


def _fx_num(v, vt: str) -> float:
    """expr-comparison.c _convert_filterx_object_to_generic_number:
    null 0, boolean 0/1, numbers as-is, strings parsed (NaN on failure),
    objects/bytes NaN."""
    if vt == "null":
        return 0.0
    if vt == "boolean":
        return 1.0 if v else 0.0
    if vt in ("integer", "double"):
        return float(v)
    if vt == "string":
        try:
            return float(v)
        except (TypeError, ValueError):
            return float("nan")
    return float("nan")


def _fx_marshal_str(v, vt: str) -> str:
    """String marshal for string-based comparisons (_evaluate_as_string):
    null is the empty string, booleans render lowercase."""
    if vt == "null":
        return ""
    if vt == "boolean":
        return "true" if v else "false"
    if vt == "bytes":
        return bytes(v).decode("utf-8", "replace")
    return str(v)


def _fx_cmp_typed(x, y, op: str) -> bool:
    """expr-comparison.c _evaluate_type_aware, one row."""
    import math

    xt, yt = _fx_vt(x), _fx_vt(y)
    if xt == yt and xt in ("string", "bytes"):
        xs, ys = _fx_marshal_str(x, xt), _fx_marshal_str(y, yt)
        return _fx_apply_op((xs > ys) - (xs < ys), op)
    if xt == "null" or yt == "null":
        if op == "==":
            return xt == yt
        if op == "!=":
            return xt != yt
        # ordering ops fall through: null converts to 0
    xn, yn = _fx_num(x, xt), _fx_num(y, yt)
    if math.isnan(xn) or math.isnan(yn):
        return op == "!="
    return _fx_apply_op((xn > yn) - (xn < yn), op)


def _fx_apply_op(sign: int, op: str) -> bool:
    if op == "==":
        return sign == 0
    if op == "!=":
        return sign != 0
    if op == "<":
        return sign < 0
    if op == "<=":
        return sign <= 0
    if op == ">":
        return sign > 0
    return sign >= 0


def _isnull(s) -> np.ndarray:
    return pd.isna(s).to_numpy() if isinstance(s, pd.Series) else np.asarray(pd.isna(s))


def _truthy(s: pd.Series) -> np.ndarray:
    """reference boolalg: null -> false; numbers: != 0; strings: != ''."""
    vals = s.to_numpy(dtype=object) if isinstance(s, pd.Series) else s
    out = np.zeros(len(vals), dtype=bool)
    nn = ~_isnull(vals)
    out[nn] = np.array([bool(v) for v in vals[nn]], dtype=bool)
    return out


def _first_nonnull(s: pd.Series):
    for v in s:
        if v is None:
            continue
        if np.ndim(v) == 0 and pd.isna(v):
            continue
        return v
    return None


def _plus_typed(a, b):
    """Typed '+' branches beyond string/number (expr-plus dispatch is
    lhs-type-directed; pinned by lib/filterx/tests/test_expr_plus.c):
    datetime + integer adds microseconds, datetime + double adds
    seconds (object-datetime.c:284-311 _add); list + list concatenates,
    dict + dict merges. datetime + datetime raises like the reference's
    NULL eval result. Returns None when the generic string/number path
    should handle the operands."""
    a_dt = isinstance(a, pd.Series) and pd.api.types.is_datetime64_any_dtype(a)
    b_dt = isinstance(b, pd.Series) and pd.api.types.is_datetime64_any_dtype(b)
    if a_dt or b_dt:
        if a_dt and b_dt:
            raise TypeError(
                "filterx '+': datetime + datetime is not supported "
                "(object-datetime.c _add)")
        dt, other = (a, b) if a_dt else (b, a)
        num = pd.to_numeric(other, errors="coerce")
        is_double = (isinstance(other, pd.Series)
                     and pd.api.types.is_float_dtype(other)) \
            or isinstance(other, float)
        usec = num * 1_000_000 if is_double else num
        return dt + pd.to_timedelta(usec, unit="us", errors="coerce")
    if isinstance(a, pd.Series) and a.dtype == object \
            and isinstance(b, pd.Series) and b.dtype == object:
        fa, fb = _first_nonnull(a), _first_nonnull(b)
        # one side marshaled container text + other side container:
        # unmarshal before the typed dispatch (LM_VT_JSON on access)
        if isinstance(fa, str) and isinstance(fb, (dict, list, np.ndarray)):
            a = pd.Series([_maybe_unmarshal(v) for v in a], dtype=object)
            fa = _first_nonnull(a)
        elif isinstance(fb, str) and isinstance(fa, (dict, list, np.ndarray)):
            b = pd.Series([_maybe_unmarshal(v) for v in b], dtype=object)
            fb = _first_nonnull(b)
        # Arrow list columns reach pandas as numpy arrays
        is_list = lambda v: isinstance(v, (list, np.ndarray))  # noqa: E731
        if is_list(fa) or is_list(fb):
            if not (is_list(fa) and is_list(fb)):
                raise TypeError("filterx '+': list + non-list")

            def cat(x, y):
                if x is None and y is None:
                    return None
                return (list(x) if x is not None else []) \
                    + (list(y) if y is not None else [])
            return pd.Series([cat(x, y) for x, y in zip(a, b)], dtype=object)
        if isinstance(fa, dict) or isinstance(fb, dict):
            if not (isinstance(fa, dict) and isinstance(fb, dict)):
                raise TypeError("filterx '+': dict + non-dict")
            return pd.Series(
                [{**(x or {}), **(y or {})}
                 if not (x is None and y is None) else None
                 for x, y in zip(a, b)], dtype=object)
    return None


def _arg_scalar(b: pd.Series):
    """A literal argument evaluates to a constant Series; take its value.
    (The reference str funcs take literal needles: func-str.c usage.)"""
    if not isinstance(b, pd.Series):
        return b
    nn = b[~pd.isna(b)]
    return nn.iloc[0] if len(nn) else ""


def _str_match_family(a: pd.Series, b, ignorecase, op) -> pd.Series:
    """Shared startswith/endswith/includes core (reference
    filterx-func-str.c): the needle may be one string or a LIST — true
    if ANY element matches; ignorecase=true folds both sides."""
    ic = bool(_arg_scalar(ignorecase)) if ignorecase is not None else False

    def needles_of(row_b):
        ns = row_b if isinstance(row_b, (list, tuple)) else [row_b]
        return [str(x).lower() if ic else str(x) for x in ns if x is not None]

    bs = b if isinstance(b, pd.Series) else pd.Series([b] * len(a), dtype=object)
    out = []
    for x, row_b in zip(a, bs):
        if x is None or (not isinstance(x, (str, bytes)) and pd.isna(x)):
            out.append(False)
            continue
        s = str(x).lower() if ic else str(x)
        out.append(any(op(s, n) for n in needles_of(row_b)))
    return pd.Series(out, dtype=object)


def _startswith(a: pd.Series, b, ignorecase=None) -> pd.Series:
    return _str_match_family(a, b, ignorecase, lambda s, n: s.startswith(n))


def _endswith(a: pd.Series, b, ignorecase=None) -> pd.Series:
    return _str_match_family(a, b, ignorecase, lambda s, n: s.endswith(n))


def _includes(a: pd.Series, b, ignorecase=None) -> pd.Series:
    return _str_match_family(a, b, ignorecase, lambda s, n: n in s)


def _maybe_unmarshal(v):
    """LM_VT_JSON unmarshal-on-access: a container-valued message field
    crosses filterx block boundaries as its marshaled JSON text (the
    reference stores nv-pairs as typed strings and unmarshals on access,
    lib/filterx/object-message-value.c). A string starting with '{' or
    '[' that parses as JSON yields the container; anything else passes
    through. (Without the reference's type-hint channel, a plain string
    that happens to BE valid JSON unmarshals too — documented.)"""
    if isinstance(v, str) and v[:1] in ("{", "["):
        import json

        try:
            return json.loads(v)
        except ValueError:
            return v
    return v


def _get_one(v, key):
    """Single-value get: dict member, list index, else None."""
    v = _maybe_unmarshal(v)
    if isinstance(v, dict):
        return v.get(key)
    if isinstance(v, (list, tuple)):
        try:
            return v[int(key)]
        except (IndexError, ValueError, TypeError):
            return None
    return None


def _get_key(s: pd.Series, key) -> pd.Series:
    """Vectorized-over-objects get: dict -> .get(key); list -> index (int
    key, None when out of range); anything else / null -> None.
    (lib/filterx/expr-get-subscript.c + expr-getattr.c: a missing member
    evaluates to unset, which a filter treats as false.)"""
    out = []
    for v in s:
        v = _maybe_unmarshal(v)
        if isinstance(v, dict):
            out.append(v.get(key))
        elif isinstance(v, (list, tuple)):
            try:
                out.append(v[int(key)])
            except (IndexError, ValueError, TypeError):
                out.append(None)
        else:
            out.append(None)
    return pd.Series(out, dtype=object)


def _parse_json(a: pd.Series) -> pd.Series:
    """lib/filterx/: json() / parse_json() — invalid JSON evaluates to
    unset (null), matching eval-error-as-no-verdict filter semantics."""
    import json

    out = []
    for v in a:
        if v is None or (not isinstance(v, (str, bytes)) and pd.isna(v)):
            out.append(None)
            continue
        try:
            out.append(json.loads(v))
        except (ValueError, TypeError):
            out.append(None)
    return pd.Series(out, dtype=object)


def _format_json(a: pd.Series) -> pd.Series:
    """format_json(x): the per-type JSON marshal (object-*.c
    format_json methods) — doubles as %.17g with trailing zeroes
    trimmed, datetimes as quoted unix.usec strings, bytes/protobuf as
    quoted base64 (pinned by Light test_filterx_types.py)."""
    if pd.api.types.is_datetime64_any_dtype(a):
        return pd.Series([None if pd.isna(v) else _fx_render(v, "json")
                          for v in a], dtype=object)
    out = []
    for v in a:
        if v is None or (not isinstance(v, (dict, list, str, bytes)) and pd.isna(v)):
            out.append(None)
        else:
            out.append(_fx_render(v, "json"))
    return pd.Series(out, dtype=object)


def _cast_string(a: pd.Series) -> pd.Series:
    """string(x) typecast (filterx_typecast_string -> per-type str
    marshal): doubles via double_repr, datetimes as unix.usec,
    bytes decode raw, dict/list like repr (Light test_filterx_types.py
    asserts string(dict) == repr(dict))."""
    if pd.api.types.is_datetime64_any_dtype(a):
        return pd.Series([None if pd.isna(v) else _unix_6f(v) for v in a],
                         dtype=object)
    return pd.Series(
        [None if (v is None or (not isinstance(v, (dict, list, str, bytes))
                                and np.ndim(v) == 0 and pd.isna(v)))
         else _fx_render(v, "str") for v in a], dtype=object)


def _cast_bytes(a: pd.Series) -> pd.Series:
    """bytes(x) constructor (filterx_bytes_new): strings encode UTF-8,
    bytes/protobuf pass through re-labeled."""
    out = []
    for v in a:
        if v is None or (np.ndim(v) == 0 and not isinstance(v, (str, bytes)) and pd.isna(v)):
            out.append(None)
        elif isinstance(v, (bytes, bytearray)):
            out.append(bytes(v))
        else:
            out.append(str(v).encode())
    return pd.Series(out, dtype=object)


def _cast_protobuf(a: pd.Series) -> pd.Series:
    """protobuf(x) constructor (filterx_protobuf_new): opaque bytes
    with the protobuf type label."""
    return pd.Series([None if v is None else Protobuf(v)
                      for v in _cast_bytes(a)], dtype=object)


def _keys(a: pd.Series) -> pd.Series:
    """lib/filterx/func-keys.c: keys of a dict as a list; null otherwise."""
    return pd.Series(
        [list(v.keys()) if isinstance(v, dict) else None for v in a], dtype=object)


def _unset_empties(a: pd.Series, recursive=None, targets=None,
                   replacement=None, ignorecase=None) -> pd.Series:
    """lib/filterx/func-unset-empties.c: remove (or substitute with
    `replacement`) matching members of dicts and lists. Defaults match
    null / "" / [] / {} and recurse; an explicit `targets` list RESETS
    the defaults and enables only the listed shapes — null, "", [], {}
    and non-empty strings compared against values (case-insensitively
    when ignorecase=true; default false). Cleaning is bottom-up: a
    child emptied by the recursion is re-tested by its parent (pinned
    by lib/filterx/tests/test_func_unset_empties.c)."""
    rec = True if recursive is None else bool(_arg_scalar(recursive))
    ic = False if ignorecase is None else bool(_arg_scalar(ignorecase))
    repl_given = replacement is not None
    repl = _arg_scalar(replacement) if repl_given else None
    tgt = _arg_scalar(targets) if targets is not None else None

    if tgt is None:
        want_null = want_estr = want_elist = want_edict = True
        strs: set = set()
    else:
        tgt = list(tgt)
        want_null = any(t is None for t in tgt)
        want_estr = any(t == "" for t in tgt if isinstance(t, str))
        want_elist = any(isinstance(t, (list, np.ndarray)) and len(t) == 0
                         for t in tgt)
        want_edict = any(isinstance(t, dict) and not t for t in tgt)
        strs = {t for t in tgt if isinstance(t, str) and t != ""}
        if ic:
            strs = {s.lower() for s in strs}

    def should_unset(v) -> bool:
        if v is None or (np.ndim(v) == 0 and pd.isna(v)):
            return want_null
        if isinstance(v, str):
            if v == "":
                return want_estr
            return (v.lower() if ic else v) in strs
        if isinstance(v, (list, np.ndarray)):
            return want_elist and len(v) == 0
        if isinstance(v, dict):
            return want_edict and not v
        return False

    def walk(v):
        if isinstance(v, dict):
            out = {}
            for k, x in v.items():
                if rec and isinstance(x, (dict, list, np.ndarray)):
                    x = walk(x)
                if should_unset(x):
                    if repl_given:
                        out[k] = repl
                else:
                    out[k] = x
            return out
        if isinstance(v, (list, np.ndarray)):
            out = []
            for x in v:
                if rec and isinstance(x, (dict, list, np.ndarray)):
                    x = walk(x)
                if should_unset(x):
                    if repl_given:
                        out.append(repl)
                else:
                    out.append(x)
            return out
        return v

    return pd.Series(
        [walk(v) if isinstance(v, (dict, list, np.ndarray)) else v
         for v in a], dtype=object)


def _to_dt(a: pd.Series) -> pd.Series:
    if pd.api.types.is_datetime64_any_dtype(a):
        return a
    return pd.to_datetime(a, errors="coerce")


def _strptime(a: pd.Series, fmt: pd.Series) -> pd.Series:
    """lib/filterx/func-timestamp.c strptime(): unparseable -> unset.
    A %z format carries its own offset -> tz_source "parsed", else
    "assumed" (get_timezone_source, lib/timeutils/unixtime.c:428)."""
    f = str(_arg_scalar(fmt))
    out = pd.to_datetime(a.astype("string"), format=f, errors="coerce", utc="%z" in f)
    if "%z" in f:
        out = out.dt.tz_localize(None)
    out.attrs["tz_source"] = "parsed" if "%z" in f else "assumed"
    return out


def _strftime(a: pd.Series, fmt: pd.Series) -> pd.Series:
    out = _to_dt(a).dt.strftime(str(_arg_scalar(fmt)))
    return out.astype(object).where(~pd.isna(out), None)


def _format_isodate(a: pd.Series) -> pd.Series:
    """format_isodate(): same normalized form as the ISODATE macro
    (functions/macros.py — engine timestamps are UTC)."""
    out = _to_dt(a).dt.strftime("%Y-%m-%dT%H:%M:%S+00:00")
    return out.astype(object).where(~pd.isna(out), None)


def _fix_timezone(a: pd.Series, zone: pd.Series) -> pd.Series:
    """fix_timezone(): reinterpret the wall-clock value as being in
    `zone` and shift to UTC, with the stage's two-pass DST re-lookup
    (stages/timezones.fix_time_zone; reference
    modules/timestamp/rewrite-fix-timezone.c)."""
    from .stages.timezones import zone_offsets_at

    z = str(_arg_scalar(zone))
    dt = _to_dt(a)
    ns = dt.to_numpy(dtype="datetime64[ns]").view(np.int64)
    valid = ~dt.isna().to_numpy()
    off1 = zone_offsets_at(ns.view("int64"), z)
    ns1 = np.where(valid, ns - off1 * 1_000_000_000, ns)
    off2 = zone_offsets_at(ns1, z)
    ns2 = np.where(valid, ns - off2 * 1_000_000_000, ns)
    res = pd.Series(ns2.view("datetime64[ns]")).where(pd.Series(valid), pd.NaT)
    res.attrs["tz_source"] = "fixed"
    return res


def _flatten(a: pd.Series, sep=None) -> pd.Series:
    """lib/filterx/func-flatten.c: flatten(dict, separator=".") — nested
    dict keys joined by the separator, one level of output."""
    s = str(_arg_scalar(sep)) if sep is not None else "."

    def fl(v):
        if not isinstance(v, dict):
            return v
        out = {}

        def rec(prefix, d):
            for k, x in d.items():
                kk = f"{prefix}{s}{k}" if prefix else str(k)
                if isinstance(x, dict):
                    rec(kk, x)
                else:
                    out[kk] = x

        rec("", v)
        return out

    return pd.Series([fl(v) for v in a], dtype=object)


def _dict_to_pairs(a: pd.Series) -> pd.Series:
    """lib/filterx/func-dict-to-pairs.c: dict -> list of {key, value}
    dicts (iterable pair form)."""
    return pd.Series(
        [[{"key": k, "value": x} for k, x in v.items()] if isinstance(v, dict) else None
         for v in a], dtype=object)


_TYPE_CHECKS = {
    "string": lambda v: isinstance(v, str),
    "int": lambda v: isinstance(v, (int, np.integer)) and not isinstance(v, bool),
    "double": lambda v: isinstance(v, (float, np.floating)),
    "bool": lambda v: isinstance(v, bool),
    "dict": lambda v: isinstance(v, dict),
    "list": lambda v: isinstance(v, (list, tuple)),
    "bytes": lambda v: isinstance(v, (bytes, bytearray)) and not isinstance(v, Protobuf),
    "protobuf": lambda v: isinstance(v, Protobuf),
    "null": lambda v: v is None,
    "json_object": lambda v: isinstance(v, dict),
    "json_array": lambda v: isinstance(v, (list, tuple)),
    "datetime": lambda v: isinstance(v, (pd.Timestamp, np.datetime64)),
    # message_value is the reference's lazily-typed nv reference; this
    # engine types message reads eagerly, so nothing retains that type
    # (configs guard it with `or istype(x, "string")` — func-istype.c)
    "message_value": lambda v: False,
}


def _istype(a: pd.Series, t: pd.Series) -> pd.Series:
    """lib/filterx/func-istype.c (json types map to dict/list here)."""
    name = str(_arg_scalar(t))
    chk = _TYPE_CHECKS.get(name)
    if chk is None:
        raise ValueError(f"filterx: istype(): unknown type {name!r}")
    return pd.Series([False if pd.isna(v) is True else chk(v) for v in a], dtype=object)


def _len(a: pd.Series) -> pd.Series:
    """lib/filterx/func-len.c: length of a string, dict or list."""
    first = next((v for v in a if v is not None and not (np.ndim(v) == 0 and pd.isna(v))), None)
    if isinstance(first, (dict, list, tuple)):
        return pd.Series([len(v) if isinstance(v, (dict, list, tuple)) else None for v in a],
                         dtype=object)
    return a.astype("string").str.len()


def _subst_repl_for_match(m: re.Match, repl: str) -> str:
    """reference expr-regexp-subst.c
    _build_replacement_string_with_match_groups: \\N (up to 3 digits,
    leading zeros allowed) substitutes the group when it exists and
    matched; an invalid/unknown ref stays LITERALLY (backslash + all
    scanned digits)."""
    out: list[str] = []
    i, n = 0, len(repl)
    while i < n:
        c = repl[i]
        if c == "\\" and i + 1 < n and repl[i + 1].isdigit():
            j = i + 1
            while j < n and repl[j].isdigit() and j - i <= 3:
                j += 1
            g = int(repl[i + 1 : j])
            if 1 <= g <= m.re.groups:
                out.append(m.group(g) or "")
            else:
                out.append(repl[i:j])
            i = j
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _subst_one(rx: re.Pattern, repl: str, s: str, glob: bool, groups: bool) -> str:
    """Faithful port of the reference's replace loop
    (expr-regexp-subst.c _replace_matches:151-195), INCLUDING its
    zero-length-match quirks: a zero-length match emits the replacement,
    copies one source char from `pos`, and advances by one; after the
    loop the replacement is appended once more when the LAST attempted
    match (even a post-break rematch) was zero-length. Conformance
    pinned to the reference's own test file in
    tests/test_filterx_regexp_subst_conformance.py."""
    out: list[str] = []
    pos = 0
    n = len(s)
    m = rx.search(s, 0)
    if m is None:
        return s
    while True:
        rep = _subst_repl_for_match(m, repl) if groups else repl
        out.append(s[pos:m.start()])
        out.append(rep)
        if m.start() == m.end():
            if pos < n:
                out.append(s[pos])
            pos += 1
        else:
            pos = m.end()
        m = rx.search(s, pos) if pos <= n else None
        if m is None:
            break
        if not (pos < n and glob):
            break
    if pos < n:
        out.append(s[pos:])
    if m is not None and m.start() == m.end():
        out.append(_subst_repl_for_match(m, repl) if groups else repl)
    return "".join(out)


def _regexp_subst(a: pd.Series, pat: pd.Series, repl: pd.Series, glob=None,
                  ignorecase=None, groups=None, jit=None, utf8=None,
                  newline=None) -> pd.Series:
    """reference lib/filterx/expr-regexp-subst.c: replace the FIRST match
    unless the `global` flag is set; \\1 group refs honored unless
    groups=false; ignorecase/newline/utf8 map to regex flags; jit is
    accepted and ignored (a PCRE2 implementation detail)."""
    p = str(_arg_scalar(pat))
    r = str(_arg_scalar(repl))

    def _b(v, default=False):
        return default if v is None else bool(_arg_scalar(v))

    flags = 0
    if _b(ignorecase):
        flags |= re.IGNORECASE
    if _b(newline):
        flags |= re.MULTILINE
    rx = re.compile(p, flags)
    g = _b(glob)
    grp = _b(groups, default=True)
    out = a.astype("string").map(
        lambda x: _subst_one(rx, r, x, g, grp) if pd.notna(x) else None
    )
    return out.astype(object).where(~pd.isna(a), None)


def _regexp_search(a: pd.Series, pat: pd.Series, keep_zero=None, list_mode=None) -> pd.Series:
    """reference lib/filterx/expr-regexp-search.c: a DICT of the match's
    groups by default — named groups keyed by name, unnamed by number,
    group 0 dropped unless keep_zero=true OR the pattern has no capture
    groups at all; unmatched optional groups are absent. list_mode=true
    returns a list instead, where unmatched optional groups are null.
    NO MATCH returns an empty dict/list (never null). Conformance
    pinned to the reference's test_expr_regexp_search.c cases in
    tests/test_filterx.py."""
    p = str(_arg_scalar(pat))
    # PCRE named-group syntax (?<name>...) -> Python (?P<name>...); the
    # negative char after '<' keeps lookbehinds (?<=, (?<! intact
    p = re.sub(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>", r"(?P<\1>", p)
    kz = keep_zero is not None and bool(_arg_scalar(keep_zero))
    lm = list_mode is not None and bool(_arg_scalar(list_mode))
    rx = re.compile(p)
    idx_to_name = {v: k for k, v in rx.groupindex.items()}

    def one(x):
        if x is None or (np.ndim(x) == 0 and pd.isna(x)):
            return None
        m = rx.search(str(x))
        if m is None:
            return [] if lm else {}
        n = rx.groups
        include_zero = kz or n == 0
        if lm:
            out = [m.group(0)] if include_zero else []
            out.extend(m.group(i) for i in range(1, n + 1))
            return out
        d = {}
        if include_zero:
            d["0"] = m.group(0)
        for i in range(1, n + 1):
            if m.group(i) is None:
                continue  # unmatched optional group: key absent
            d[idx_to_name.get(i, str(i))] = m.group(i)
        return d

    return a.map(one)


def _str_replace(a: pd.Series, old: pd.Series, new: pd.Series) -> pd.Series:
    return a.astype("string").str.replace(
        str(_arg_scalar(old)), str(_arg_scalar(new)), regex=False
    ).astype(object).where(~pd.isna(a), None)


def _glob_match(a: pd.Series, pat: pd.Series) -> pd.Series:
    import fnmatch

    rx = fnmatch.translate(str(_arg_scalar(pat)))
    return pd.Series(a.astype("string").str.fullmatch(rx).fillna(False).to_numpy(), dtype=object)


def _digest(algo: str):
    import hashlib

    h = getattr(hashlib, algo)

    def fn(a: pd.Series) -> pd.Series:
        # hashing is C; the comprehension is unavoidable for per-row digests
        return pd.Series(
            [None if pd.isna(v) else h(str(v).encode()).hexdigest() for v in a],
            dtype=object)

    return fn


def _codec(enc, bytes_ok=True):
    """func-encode.c arg handling: string/bytes accepted (strings as
    their utf-8 bytes), ANY other type is the reference's
    wrong-arg-type eval error -> the engine's per-row error value
    (null); decode failures (bad hex/base64) also null."""
    def fn(a: pd.Series) -> pd.Series:
        out = []
        for v in a:
            if pd.isna(v):
                out.append(None)
                continue
            if isinstance(v, str):
                arg = v.encode("utf-8", "replace")
            elif bytes_ok and isinstance(v, (bytes, bytearray)):
                arg = bytes(v)
            else:
                out.append(None)  # wrong_arg_type (test_func_encode.c)
                continue
            try:
                out.append(enc(arg))
            except (ValueError, TypeError):
                out.append(None)
        return pd.Series(out, dtype=object)

    return fn


def _b64e(b: bytes) -> str:
    import base64

    return base64.b64encode(b).decode()


def _b64d(b: bytes) -> bytes:
    """base64_decode returns a BYTES object like the reference (the
    decoded payload need not be utf-8)."""
    import base64

    return base64.b64decode(b, validate=True)


def _urlencode(b: bytes) -> str:
    from urllib.parse import quote

    return quote(b, safe="")


def _urldecode(b: bytes) -> str:
    from urllib.parse import unquote

    return unquote(b.decode("utf-8", "replace"))


_FUNCS = {
    "upper": lambda a: a.astype("string").str.upper().astype(object),
    "lower": lambda a: a.astype("string").str.lower().astype(object),
    "len": _len,
    "string": _cast_string,
    "bytes": _cast_bytes,
    "protobuf": _cast_protobuf,
    "int": lambda a: pd.to_numeric(a, errors="coerce").astype("Int64"),
    "double": lambda a: pd.to_numeric(a, errors="coerce").astype(float),
    "isset": lambda a: pd.Series(~pd.isna(a).to_numpy(), dtype=object),
    "defined": lambda a: pd.Series(~pd.isna(a).to_numpy(), dtype=object),
    # reference lib/filterx/func-str.c (literal needle, vectorized subject)
    "startswith": _startswith,
    "endswith": _endswith,
    "includes": _includes,
    # lib/filterx/func-str-transform.c
    "str_strip": lambda a: a.astype("string").str.strip().astype(object).where(~pd.isna(a), None),
    "str_lstrip": lambda a: a.astype("string").str.lstrip().astype(object).where(~pd.isna(a), None),
    "str_rstrip": lambda a: a.astype("string").str.rstrip().astype(object).where(~pd.isna(a), None),
    "str_replace": _str_replace,
    # lib/filterx/expr-regexp-subst.c / expr-regexp-search.c
    "regexp_subst": _regexp_subst,
    "regexp_search": _regexp_search,
    # lib/filterx/func-glob.c
    "glob_match": _glob_match,
    # lib/filterx/func-digest.c (md5/sha1/sha256/sha512 registered in
    # filterx-globals.c)
    "md5": _digest("md5"),
    "sha1": _digest("sha1"),
    "sha256": _digest("sha256"),
    "sha512": _digest("sha512"),
    # lib/filterx/func-encode.c + urlencode/urldecode (decode returns
    # BYTES objects like the reference; conformance pins from
    # lib/filterx/tests/test_func_encode.c in
    # tests/test_filterx_encode_conformance.py)
    "hex_encode": _codec(lambda b: b.hex()),
    "hex_decode": _codec(lambda b: bytes.fromhex(b.decode("ascii"))),
    "base64_encode": _codec(_b64e),
    "base64_decode": _codec(_b64d),
    "urlencode": _codec(_urlencode),
    "urldecode": _codec(_urldecode),
    # object model: lib/filterx json()/parse_json, format_json(),
    # func-keys.c, func-unset-empties.c, func-istype.c
    "parse_json": _parse_json,
    "json": _parse_json,
    "format_json": _format_json,
    "keys": _keys,
    "unset_empties": _unset_empties,
    "istype": _istype,
    "flatten": _flatten,
    "dict_to_pairs": _dict_to_pairs,
    # datetime: lib/filterx/func-timestamp.c strptime/strftime/
    # format_isodate; fix_timezone registered in filterx-globals.c
    "strptime": _strptime,
    "strftime": _strftime,
    "format_isodate": _format_isodate,
    "isodate": _format_isodate,
    "fix_timezone": _fix_timezone,
}

# reference arg names that collide with Python keywords
_KWARG_RENAME = {"global": "glob"}


def _uuid4(ctx) -> pd.Series:
    """uuid()/uuid4() (filterx-globals.c simple functions): one random
    UUID per row — inherently nondeterministic, like the reference."""
    import uuid

    return pd.Series([str(uuid.uuid4()) for _ in range(ctx.n)], dtype=object)


def _uuid7(ctx) -> pd.Series:
    """uuid7(): RFC 9562 time-ordered UUID (48-bit unix-ms timestamp +
    random tail), built from os.urandom like the reference's
    implementation."""
    import os
    import time

    out = []
    for _ in range(ctx.n):
        ms = time.time_ns() // 1_000_000
        rnd = os.urandom(10)
        b = ms.to_bytes(6, "big") + bytes([0x70 | (rnd[0] & 0x0F), rnd[1],
                                           0x80 | (rnd[2] & 0x3F)]) + rnd[3:10]
        h = b.hex()
        out.append(f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}")
    return pd.Series(out, dtype=object)


def _vars(ctx) -> pd.Series:
    """vars() (lib/filterx/func-vars.c): snapshot of the declared
    variables as a dict, per row."""
    names = list(ctx.vars)
    cols = [ctx.vars[k].to_numpy(dtype=object) for k in names]
    return pd.Series(
        [{k: col[i] for k, col in zip(names, cols)
          if not (col[i] is None or (np.ndim(col[i]) == 0 and pd.isna(col[i])))}
         for i in range(ctx.n)], dtype=object)


def _load_vars(ctx, d: pd.Series) -> pd.Series:
    """load_vars(dict) (lib/filterx/func-vars.c): declare a variable per
    dict key, holding that key's value — inverse of vars(). Masked:
    inside an if-branch only the selected rows are written."""
    darr = d.to_numpy(dtype=object) if isinstance(d, pd.Series) else np.full(ctx.n, d, dtype=object)
    names: set[str] = set()
    for i in np.nonzero(ctx.mask)[0]:
        if isinstance(darr[i], dict):
            names.update(darr[i])
    for name in names:
        cur = ctx.vars.get(name, pd.Series([None] * ctx.n, dtype=object)).astype(object)
        arr = cur.to_numpy(dtype=object)
        for i in np.nonzero(ctx.mask)[0]:
            if isinstance(darr[i], dict) and name in darr[i]:
                arr[i] = darr[i][name]
        ctx.vars[name] = pd.Series(arr, dtype=object)
    return pd.Series([None] * ctx.n, dtype=object)


def _set_pri(ctx, pri: pd.Series) -> pd.Series:
    """set_pri(int) (lib/filterx/func-set-pri.c): split the syslog PRI
    into the engine's facility/severity columns (facility = pri >> 3,
    severity = pri & 7); out-of-range rows are left untouched, like the
    reference's eval error. Masked like load_vars."""
    p = pd.to_numeric(pri, errors="coerce") if isinstance(pri, pd.Series) else pd.Series([pri] * ctx.n)
    vals = p.to_numpy(dtype="float64")
    with np.errstate(invalid="ignore"):
        ok = ctx.mask & ~np.isnan(vals) & (vals >= 0) & (vals <= 1023)
    iv = np.nan_to_num(vals, nan=0).astype("int64")
    for colname, newv in (("facility", iv >> 3), ("severity", iv & 7)):
        cur = ctx.col(colname).astype(object)
        arr = cur.to_numpy(dtype=object)
        arr[ok] = newv[ok]
        ctx.cols[colname] = pd.Series(arr, dtype=object)
        ctx.assigned.add(colname)
    return pd.Series([None] * ctx.n, dtype=object)


# functions that need the row context (count / variable scope / columns)
def _json_fn(ctx, a=None):
    """json(): zero-arg form constructs one EMPTY DICT per row (the
    reference's object constructor, filterx-object-json.c); a dict/list
    argument passes through (json({...}) literal construction, Light
    test_filterx_scope.py); strings parse like parse_json()."""
    if a is None:
        return pd.Series([{} for _ in range(ctx.n)], dtype=object)
    if isinstance(a, pd.Series) and a.dtype == object:
        first = _first_nonnull(a)
        if isinstance(first, (dict, list)):
            return a
    return _parse_json(a)


_CTX_FUNCS = {"uuid", "uuid4", "uuid7", "vars", "load_vars", "set_pri",
              "json",
              # otel constructors need ctx.n for the zero-arg form
              "otel_logrecord", "otel_resource", "otel_scope",
              "otel_kvlist", "otel_array"}
_FUNCS["uuid"] = _uuid4
_FUNCS["uuid4"] = _uuid4
_FUNCS["uuid7"] = _uuid7
_FUNCS["vars"] = _vars
_FUNCS["json"] = _json_fn
_FUNCS["load_vars"] = _load_vars
_FUNCS["set_pri"] = _set_pri

# parse_*/format_* + casts + misc extension registry (filterx_ext.py)
from .filterx_ext import EXT_FUNCS as _EXT_FUNCS  # noqa: E402

_FUNCS.update(_EXT_FUNCS)

# message-context + network-object functions (filterx_msg.py): sdata,
# timestamps, metrics, failure_info, ip()/subnet(), digest()
from .filterx_msg import MSG_FUNCS as _MSG_FUNCS  # noqa: E402
from .filterx_msg import MSG_CTX_FUNCS as _MSG_CTX_FUNCS  # noqa: E402
from .filterx_msg import FxSubnet as _FxSubnet  # noqa: E402

_FUNCS.update(_MSG_FUNCS)
_FUNCS.update(_MSG_CTX_FUNCS)
_CTX_FUNCS |= set(_MSG_CTX_FUNCS)


class FilterX:
    """Compiled FilterX program; callable as a map_batches stage."""

    def __init__(self, src: str, marshal_containers: bool = False,
                 stats_level: int = 0):
        self.ast = _Parser(src).program()
        # options { stats(level(N)); } gate for update_metric(level=)
        # (lib/filterx/filterx-metrics.c stats_check_level)
        self.stats_level = stats_level
        # update_metric counters, merged per batch; per-actor in an
        # actor-pool map_batches (the Ray-native stats registry — a
        # pipeline aggregates snapshots instead of scraping a global)
        self.metrics: dict = {}
        # marshal_containers=True is MESSAGE semantics (the config front
        # end): dict/list fields leave the block as compact JSON text
        # like the reference's LogMessage write path, and unmarshal on
        # access in a later block — so parallel junction branches can't
        # drift block schemas. False (the default) keeps the Ray-stage
        # contract: containers egress as typed Arrow struct/list columns
        # for downstream vectorized stages.
        self.marshal_containers = marshal_containers

    # -- expression eval: returns pd.Series aligned with the batch --
    def _eval(self, node, ctx: _Ctx) -> pd.Series:
        tag = node[0]
        if tag == "lit":
            return pd.Series([node[1]] * ctx.n, dtype=object if not isinstance(node[1], (int, float)) or isinstance(node[1], bool) else None)
        if tag == "field":
            name = node[1]
            # dotted field $d.k.j: if no column has the literal dotted
            # name, resolve as base column + getattr chain
            # (lib/filterx/expr-getattr.c)
            if name not in ctx.cols and name not in ctx.table.column_names and "." in name:
                base, *path = name.split(".")
                s = ctx.col(base)
                for key in path:
                    s = _get_key(s, key)
                return s
            return ctx.col(name)
        if tag == "var":
            return ctx.vars.get(node[1], pd.Series([None] * ctx.n, dtype=object))
        if tag == "subscript":
            obj = self._eval(node[1], ctx)
            key = self._eval(node[2], ctx)
            if node[2][0] == "lit" or not isinstance(key, pd.Series):
                return _get_key(obj, _arg_scalar(key))
            # row-varying key (e.g. $cfg[$svc]): per-row lookup
            karr = key.to_numpy(dtype=object)
            return pd.Series(
                [_get_one(v, karr[i]) for i, v in enumerate(obj)], dtype=object)
        if tag == "call":
            if node[1] == "move" and node[2] and node[2][0][0] == "field":
                # $a = move($b): eval then unset the source under the
                # mask (lib/filterx/expr-move.c filterx_expr_move_method:
                # eval + unset, skipping the copy)
                src = node[2][0][1]
                val = ctx.col(src).copy()
                cur = ctx.col(src).astype(object)
                cur[ctx.mask] = None
                ctx.cols[src] = cur
                ctx.assigned.add(src)
                return val
            fn = _FUNCS.get(node[1])
            if fn is None:
                raise NameError(f"filterx: unknown function {node[1]}()")
            args = [self._eval(a, ctx) for a in node[2]]
            kwargs = {_KWARG_RENAME.get(k, k): self._eval(x, ctx)
                      for k, x in (node[3] if len(node) > 3 else [])}
            try:
                if node[1] in _CTX_FUNCS:
                    return fn(ctx, *args, **kwargs)
                return fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001
                if not ctx.failure_enabled:
                    raise
                # func-failure-info.c: under an enabled collector an eval
                # error becomes a recorded entry; the expression yields
                # unset instead of aborting the program
                ctx.failure_info.append(
                    {"meta": ctx.failure_meta, "error": f"{node[1]}(): {e}"})
                return pd.Series([None] * ctx.n, dtype=object)
        if tag == "coalesce":
            left = self._eval(node[1], ctx)
            right = self._eval(node[2], ctx)
            nullmask = _isnull(left)
            if not nullmask.any():
                return left
            out = left.copy().astype(object)
            out[nullmask] = right[nullmask] if isinstance(right, pd.Series) else right
            return out
        if tag == "ternary":
            c = _truthy(self._eval(node[1], ctx))
            a, b = self._eval(node[2], ctx), self._eval(node[3], ctx)
            return pd.Series(np.where(c, a.to_numpy(dtype=object), b.to_numpy(dtype=object)), dtype=object)
        if tag == "regex":
            negate, subj, pat = node[1], self._eval(node[2], ctx), node[3]
            m = subj.astype("string").str.contains(pat, regex=True)
            # null/unset never matches; under !~ a null subject stays false
            # too (an eval error in the reference, which a filter treats
            # as no-verdict) — documented divergence from pure negation
            res = m.fillna(False).to_numpy(dtype=bool)
            if negate:
                res = ~res & ~_isnull(subj)
            return pd.Series(res)
        if tag == "in":
            subj = self._eval(node[1], ctx)
            items = node[2][1] if node[2][0] == "listlit" else [node[2]]
            res = np.zeros(ctx.n, dtype=bool)
            for it in items:
                rhs = self._eval(it, ctx)
                rv = rhs.iloc[0] if isinstance(rhs, pd.Series) and len(rhs) else rhs
                if isinstance(rv, _FxSubnet):
                    # ip/string in subnet(...) membership
                    # (object-subnet.c:268-303 _subnet_contains)
                    rarr = rhs.to_numpy(dtype=object) if isinstance(rhs, pd.Series) \
                        else np.full(ctx.n, rhs, dtype=object)
                    hit = np.array(
                        [isinstance(rarr[i], _FxSubnet) and rarr[i].contains(v)
                         for i, v in enumerate(subj)], dtype=bool)
                    res |= hit
                    continue
                aa, bb = _align_types(subj, rhs)
                eq = aa == bb
                if isinstance(eq, pd.Series):
                    eq = eq.fillna(False).to_numpy(dtype=bool)
                res |= np.asarray(eq, dtype=bool)
            return pd.Series(res & ~_isnull(subj))
        if tag == "dictlit":
            kvs = []
            for entry in node[1]:
                kx, vx = entry[0], entry[1]
                nullv = entry[2] if len(entry) > 2 else False
                ks, vs = self._eval(kx, ctx), self._eval(vx, ctx)
                kvs.append((ks.to_numpy(dtype=object) if isinstance(ks, pd.Series) else ks,
                            vs.to_numpy(dtype=object) if isinstance(vs, pd.Series) else vs,
                            nullv))
            rows = []
            for i in range(ctx.n):
                d = {}
                for ka, va, nullv in kvs:
                    kv = ka[i] if isinstance(ka, np.ndarray) else ka
                    if kv is None or (np.ndim(kv) == 0 and pd.isna(kv)):
                        continue  # unset key contributes no member
                    vv = va[i] if isinstance(va, np.ndarray) else va
                    if nullv and (vv is None or (np.ndim(vv) == 0 and pd.isna(vv))):
                        continue  # ":??" member elided when value unset
                    d[str(kv)] = vv
                rows.append(d)
            return pd.Series(rows, dtype=object)
        if tag == "listlit":
            cols = [self._eval(it, ctx).to_numpy(dtype=object) for it in node[1]]
            return pd.Series([list(row) for row in zip(*cols)] if cols else [[]] * ctx.n,
                             dtype=object)
        if tag == "slice":
            # e[a..b] Python-slice semantics incl. negative indices
            # (expr-string-slicing; functional pins: "example"[3..5]=="mp")
            s = self._eval(node[1], ctx)
            lo = self._eval(node[2], ctx) if node[2] is not None else None
            hi = self._eval(node[3], ctx) if node[3] is not None else None

            def _idx(series, i):
                if series is None:
                    return None
                v = series.iloc[i] if isinstance(series, pd.Series) else series
                if v is None or (np.ndim(v) == 0 and pd.isna(v)):
                    return None
                return int(v)
            out = []
            for i, v in enumerate(s):
                if isinstance(v, (str, list)):
                    out.append(v[_idx(lo, i):_idx(hi, i)])
                else:
                    out.append(None)
            return pd.Series(out, dtype=object)
        if tag == "cmpstr":
            # string-based comparison (expr-comparison.c
            # _evaluate_as_string): BOTH sides marshal to strings — null
            # is the empty string, booleans render lowercase — then
            # memcmp order (test_expr_comparison.c string-based groups)
            op, a, b = node[1], self._eval(node[2], ctx), self._eval(node[3], ctx)
            opmap = {"eq": "==", "ne": "!=", "lt": "<", "le": "<=", "gt": ">", "ge": ">="}
            pyop = opmap[op]
            aarr = a.to_numpy(dtype=object) if isinstance(a, pd.Series) else np.full(ctx.n, a, dtype=object)
            barr = b.to_numpy(dtype=object) if isinstance(b, pd.Series) else np.full(ctx.n, b, dtype=object)

            def one(x, y):
                xs = _fx_marshal_str(x, _fx_vt(x))
                ys = _fx_marshal_str(y, _fx_vt(y))
                return _fx_apply_op((xs > ys) - (xs < ys), pyop)

            res = np.fromiter((one(aarr[i], barr[i]) for i in range(ctx.n)),
                              dtype=bool, count=ctx.n)
            return pd.Series(res)
        if tag == "cmptav":
            # === / !== type-and-value comparison: no conversion; a type
            # mismatch (incl. bool vs int) means unequal; null === null
            # is true (same type, same value)
            op, a, b = node[1], self._eval(node[2], ctx), self._eval(node[3], ctx)
            aarr = a.to_numpy(dtype=object) if isinstance(a, pd.Series) else np.full(ctx.n, a, dtype=object)
            barr = b.to_numpy(dtype=object) if isinstance(b, pd.Series) else np.full(ctx.n, b, dtype=object)

            def _tv_eq(x, y):
                xn = x is None or (np.ndim(x) == 0 and pd.isna(x))
                yn = y is None or (np.ndim(y) == 0 and pd.isna(y))
                if xn or yn:
                    return xn and yn
                if isinstance(x, bool) != isinstance(y, bool):
                    return False
                if isinstance(x, bool):
                    return x == y
                if isinstance(x, (int, np.integer)) != isinstance(y, (int, np.integer)):
                    return False
                if isinstance(x, (float, np.floating)) != isinstance(y, (float, np.floating)):
                    return False
                if isinstance(x, str) != isinstance(y, str):
                    return False
                try:
                    return bool(x == y)
                except Exception:  # noqa: BLE001
                    return False
            eq = np.array([_tv_eq(aarr[i], barr[i]) for i in range(ctx.n)], dtype=bool)
            return pd.Series(eq if op == "===" else ~eq)
        if tag == "cmp":
            # type-aware comparison — faithful to expr-comparison.c
            # _evaluate_type_aware (conformance pins from
            # test_expr_comparison.c in tests/test_filterx.py):
            # same-type string/bytes -> byte compare; null under ==/!=
            # is type-equality; everything else converts to numbers
            # (null 0, bool 0/1, objects NaN) where NaN makes every
            # comparison FALSE except != (TRUE)
            op, a, b = node[1], self._eval(node[2], ctx), self._eval(node[3], ctx)
            if (isinstance(a, pd.Series) and isinstance(b, pd.Series)
                    and a.dtype != object and b.dtype != object):
                # vectorized fast path: typed numeric/bool columns have
                # uniform types — identical semantics, no per-row loop.
                # Nulls (NaN/NA — _fx_vt labels both "null") follow the
                # per-row _fx_cmp_typed rules: ==/!= is type-equality,
                # ordering ops convert null to 0.
                anull = pd.isna(a).to_numpy()
                bnull = pd.isna(b).to_numpy()
                either = anull | bnull
                if op == "==":
                    r = np.asarray((a == b).fillna(False), dtype=bool)
                    if either.any():
                        r = np.where(either, anull & bnull, r)
                elif op == "!=":
                    r = np.asarray((a != b).fillna(True), dtype=bool)
                    if either.any():
                        r = np.where(either, anull != bnull, r)
                else:
                    def _fill0(s, has_null):
                        if not has_null:
                            return s
                        if pd.api.types.is_datetime64_any_dtype(s):
                            # null datetime -> epoch 0 (int64 ns compare)
                            return pd.Series(
                                np.where(pd.isna(s), 0,
                                         s.to_numpy(dtype="int64", na_value=0)))
                        return s.fillna(0)
                    if either.any() and (
                            pd.api.types.is_datetime64_any_dtype(a)
                            or pd.api.types.is_datetime64_any_dtype(b)):
                        a0, b0 = _fill0(a, True), _fill0(b, True)
                    else:
                        a0 = _fill0(a, either.any())
                        b0 = _fill0(b, either.any())
                    if op == "<":
                        r = a0 < b0
                    elif op == "<=":
                        r = a0 <= b0
                    elif op == ">":
                        r = a0 > b0
                    else:
                        r = a0 >= b0
                    r = np.asarray(r.fillna(False), dtype=bool)
                return pd.Series(r)
            aarr = a.to_numpy(dtype=object) if isinstance(a, pd.Series) else np.full(ctx.n, a, dtype=object)
            barr = b.to_numpy(dtype=object) if isinstance(b, pd.Series) else np.full(ctx.n, b, dtype=object)
            res = np.fromiter(
                (_fx_cmp_typed(aarr[i], barr[i], op) for i in range(ctx.n)),
                dtype=bool, count=ctx.n)
            return pd.Series(res)
        if tag == "arith":
            op, a, b = node[1], self._eval(node[2], ctx), self._eval(node[3], ctx)
            if op == "+":
                r = _plus_typed(a, b)
                if r is not None:
                    return r
            if op == "+" and (a.dtype == object or b.dtype == object):
                # string concat when either side HOLDS strings (reference
                # expr-plus is type-directed: a string operand means
                # concatenation even if the text looks numeric, e.g.
                # "10." + "11" -> "10.11")
                def _holds_str(s):
                    if not isinstance(s, pd.Series) or s.dtype != object:
                        return False
                    for v in s:
                        if v is None or (np.ndim(v) == 0 and pd.isna(v)):
                            continue
                        return isinstance(v, str)
                    return False
                if _holds_str(a) or _holds_str(b):
                    return (a.astype("string") + b.astype("string")).astype(object)
                na = pd.to_numeric(a, errors="coerce")
                nb = pd.to_numeric(b, errors="coerce")
                if na.isna().to_numpy().all() or nb.isna().to_numpy().all():
                    return (a.astype("string") + b.astype("string")).astype(object)
                a, b = na, nb
            a = pd.to_numeric(a, errors="coerce")
            b = pd.to_numeric(b, errors="coerce")
            if op == "+":
                return a + b
            if op == "-":
                return a - b
            if op == "*":
                return a * b
            if op == "/":
                return a / b
            return a % b
        if tag == "neg":
            return -pd.to_numeric(self._eval(node[1], ctx), errors="coerce")
        if tag == "and":
            return pd.Series(_truthy(self._eval(node[1], ctx)) & _truthy(self._eval(node[2], ctx)))
        if tag == "or":
            return pd.Series(_truthy(self._eval(node[1], ctx)) | _truthy(self._eval(node[2], ctx)))
        if tag == "not":
            return pd.Series(~_truthy(self._eval(node[1], ctx)))
        raise ValueError(f"filterx: bad node {tag}")

    def _set_path(self, ctx: _Ctx, base: str, keys_, val: pd.Series,
                  mask: np.ndarray) -> None:
        cur = ctx.col(base).astype(object)
        ctx.cols[base] = _set_path_series(cur, keys_, val, mask)
        ctx.assigned.add(base)

    # -- statement execution under a row mask --
    def _exec(self, node, ctx: _Ctx, mask: np.ndarray) -> None:
        tag = node[0]
        if tag == "block":
            # each compound consumes break verdicts raised inside it
            # (expr-compound.c _is_control_modifier_set resets FXC_BREAK)
            prev_break = ctx.break_rows
            ctx.break_rows = np.zeros(ctx.n, dtype=bool)
            try:
                for st in node[1]:
                    # ALWAYS execute, even with an all-false mask: every
                    # assignment must register its output column so each
                    # batch produces the SAME schema (Ray Data requires
                    # block-schema stability; writes are masked anyway)
                    self._exec(st, ctx, mask & ctx.active & ~ctx.break_rows)
            finally:
                ctx.break_rows = prev_break
            return
        if tag == "break":
            ctx.break_rows = ctx.break_rows | mask
            return
        if tag == "declare":
            # execute as a variable assign, then mark the name declared
            # so __call__ persists it for downstream filterx blocks
            self._exec(("assign",) + node[1:], ctx, mask)
            ctx.declared.add(node[1][1])
            return
        if tag == "assign":
            (kind, name), valnode = node[1], node[2]
            # ctx funcs evaluated in the RHS (move, set_timestamp,
            # update_metric) must see the branch's row mask
            ctx.mask = mask
            try:
                val = self._eval(valnode, ctx)
            finally:
                ctx.mask = np.ones(ctx.n, dtype=bool)
            if len(node) > 3 and node[3]:
                # =?? nullv assign: rows with an unset RHS keep their value
                mask = mask & ~_isnull(val)
            if not isinstance(val, pd.Series):
                val = pd.Series([val] * ctx.n)
            if kind == "field":
                fname = name[1:]
                # dotted lval $d.k = e on an existing base column of dicts
                # -> setattr (expr-setattr); otherwise a literal dotted
                # column name is created/assigned
                if ("." in fname and fname not in ctx.cols
                        and fname not in ctx.table.column_names):
                    base, *path = fname.split(".")
                    if base in ctx.cols or base in ctx.table.column_names:
                        self._set_path(ctx, base, path, val, mask)
                        return
                cur = ctx.col(fname).astype(object)
                cur[mask] = val[mask]
                ctx.cols[fname] = cur
                ctx.assigned.add(fname)
            else:
                cur = ctx.vars.get(name, pd.Series([None] * ctx.n, dtype=object)).astype(object)
                cur[mask] = val[mask]
                ctx.vars[name] = cur
            return
        if tag == "setpath":
            # $d["k"] = e; / d.k = e; (lib/filterx/expr-set-subscript.c)
            (kind, name), keyexprs, valnode = node[1], node[2], node[3]
            keys_ = [_arg_scalar(self._eval(k, ctx)) for k in keyexprs]
            val = self._eval(valnode, ctx)
            if not isinstance(val, pd.Series):
                val = pd.Series([val] * ctx.n)
            if len(node) > 4 and node[4]:
                mask = mask & ~_isnull(val)  # =?? nullv set
            if kind == "field":
                self._set_path(ctx, name[1:], keys_, val, mask)
            else:
                base = ctx.vars.get(name, pd.Series([None] * ctx.n, dtype=object))
                ctx.vars[name] = _set_path_series(base, keys_, val, mask)
            return
        if tag == "if":
            cond = _truthy(self._eval(node[1], ctx)) & mask
            self._exec(node[2], ctx, cond)
            if node[3] is not None:
                self._exec(node[3], ctx, mask & ~cond)
            return
        if tag == "switch":
            # C-style dispatch: each row enters at its matched case and
            # FALLS THROUGH subsequent case bodies until a break exits
            # the switch (expr-switch.c _eval_body runs the body compound
            # from the target index; the compound consumes FXC_BREAK).
            # Literal cases match before range/expr cases regardless of
            # position (the reference's literal_cache is probed first).
            subject = self._eval(node[1], ctx)
            cases = node[2]
            flat: list = []
            offsets: list[int] = []
            for _lit, body in cases:
                offsets.append(len(flat))
                flat.extend(body)
            entry = np.full(ctx.n, len(flat), dtype=np.int64)
            assigned = np.zeros(ctx.n, dtype=bool)
            subj_ok = ~_isnull(subject)
            for literal_pass in (True, False):
                for ci, (lit, _body) in enumerate(cases):
                    if lit is None:
                        continue
                    if (lit[0] == "lit") != literal_pass:
                        continue
                    if lit[0] == "caserange":
                        # case lo..hi: numeric lo <= x < hi
                        # (expr-switch.c _switch_case_range_match)
                        sn = pd.to_numeric(subject, errors="coerce")
                        lo = pd.to_numeric(self._eval(lit[1], ctx), errors="coerce")
                        hi = pd.to_numeric(self._eval(lit[2], ctx), errors="coerce")
                        eq = ((sn >= lo) & (sn < hi)).fillna(False).to_numpy(dtype=bool)
                    else:
                        case_val = self._eval(lit, ctx)
                        aa, bb = _align_types(subject, case_val)
                        eq = aa == bb
                        if isinstance(eq, pd.Series):
                            eq = eq.fillna(False).to_numpy(dtype=bool)
                    m = ~assigned & np.asarray(eq, dtype=bool) & subj_ok
                    entry[m] = offsets[ci]
                    assigned |= m
            for ci, (lit, _body) in enumerate(cases):
                if lit is None:  # default keeps its source position
                    m = ~assigned
                    entry[m] = offsets[ci]
                    assigned |= m
            prev_break = ctx.break_rows
            ctx.break_rows = np.zeros(ctx.n, dtype=bool)
            try:
                for j, st in enumerate(flat):
                    self._exec(st, ctx,
                               mask & ctx.active & (entry <= j) & ~ctx.break_rows)
            finally:
                ctx.break_rows = prev_break
            return
        if tag == "unset":
            name = node[1]
            cur = ctx.col(name).astype(object)
            cur[mask] = None
            ctx.cols[name] = cur
            ctx.assigned.add(name)
            return
        if tag == "unsetpath":
            # unset(d.k) — remove a dict member along a path
            # (filterx_object_unset_key; Light dict unset-with-collision)
            (kind, name), keyexprs = node[1], node[2]
            keys_ = [_arg_scalar(self._eval(k, ctx)) for k in keyexprs]
            if kind == "field":
                fname = name[1:]
                ctx.cols[fname] = _unset_path_series(
                    ctx.col(fname), keys_, mask)
                ctx.assigned.add(fname)
            else:
                base = ctx.vars.get(name, pd.Series([None] * ctx.n, dtype=object))
                ctx.vars[name] = _unset_path_series(base, keys_, mask)
            return
        if tag == "exprstmt":
            # expression statement: expose the active-row mask so ctx
            # functions (load_vars, set_pri) mutate only selected rows
            ctx.mask = mask
            try:
                res = self._eval(node[1], ctx)
            finally:
                ctx.mask = np.ones(ctx.n, dtype=bool)
            # 'bailing out due to a falsy expr' (expr-compound.c:42-78):
            # rows where the statement is falsey are filtered out.
            # DIVERGENCE, documented: a null result counts as success
            # here — this engine's side-effect ctx functions (set_pri,
            # load_vars, update_metric, failure_info_*) return null
            # series as their "no value" convention, where the reference
            # returns a truthy object. Boolean/value falseyness bails
            # exactly like the reference.
            if res is not None:
                falsey = ~_truthy(res) & ~_isnull(res)
                drop = mask & falsey
                if drop.any():
                    if ctx.failure_enabled and ctx.failure_collect_falsy:
                        # failure_info_enable(collect_falsy=true): a
                        # bailing falsy statement records an entry too
                        # (func-failure-info.c / Light failure_info)
                        ctx.failure_info.append({
                            "meta": ctx.failure_meta,
                            "error":
                                "bailing out due to a falsy expr: false"})
                    ctx.kept &= ~drop
                    ctx.active &= ~drop
            return
        if tag == "drop":
            ctx.kept &= ~mask
            ctx.active &= ~mask
            return
        if tag == "done":
            ctx.active &= ~mask
            return
        raise ValueError(f"filterx: bad statement {tag}")

    def __call__(self, table: pa.Table) -> pa.Table:
        ctx = _Ctx(table)
        ctx.stats_level = self.stats_level
        self._exec(self.ast, ctx, np.ones(table.num_rows, dtype=bool))
        for mk, mv in ctx.metrics.items():
            self.metrics[mk] = self.metrics.get(mk, 0) + mv
        out = table
        # write back ONLY assigned fields: merely-read columns must keep
        # their original Arrow buffers and types (a pandas round-trip would
        # demote nullable int64 to float64)
        for name in ctx.assigned:
            series = ctx.cols[name]
            if self.marshal_containers:
                series = _marshal_containers(series)
            arr = _series_to_arrow(series)
            if name in out.column_names:
                out = out.set_column(out.column_names.index(name), name, arr)
            else:
                out = out.append_column(name, arr)
        # persist DECLARED variables for downstream filterx blocks —
        # containers marshal to JSON text like message-tied values do
        for name in ctx.declared:
            series = _marshal_containers(ctx.vars.get(
                name, pd.Series([None] * ctx.n, dtype=object)))
            arr = _series_to_arrow(series)
            cn = _FXDECL + name
            if cn in out.column_names:
                out = out.set_column(out.column_names.index(cn), cn, arr)
            else:
                out = out.append_column(cn, arr)
        if not ctx.kept.all():
            out = out.filter(pa.array(ctx.kept))
        return out


def _align_types(a, b):
    """Numeric comparison when both sides look numeric, else string-wise."""
    na = pd.to_numeric(a, errors="coerce") if isinstance(a, pd.Series) else a
    nb = pd.to_numeric(b, errors="coerce") if isinstance(b, pd.Series) else b
    a_num = isinstance(na, pd.Series) and not na.isna().to_numpy().all() or np.isscalar(na) and not pd.isna(na)
    b_num = isinstance(nb, pd.Series) and not nb.isna().to_numpy().all() or np.isscalar(nb) and not pd.isna(nb)
    # pd.api.types handles numpy AND pandas nullable dtypes (Int64 from
    # len(), boolean, etc.) where np.issubdtype raises
    if isinstance(a, pd.Series) and a.dtype != object and pd.api.types.is_numeric_dtype(a.dtype):
        a_num = True
    if isinstance(b, pd.Series) and b.dtype != object and pd.api.types.is_numeric_dtype(b.dtype):
        b_num = True
    if a_num and b_num:
        return na, nb
    sa = a.astype("string") if isinstance(a, pd.Series) else str(a)
    sb = b.astype("string") if isinstance(b, pd.Series) else str(b)
    return sa, sb


def _cow_clone(c):
    """Type-preserving shallow clone of a container (the object model's
    copy-on-write: a write along a shared chain clones only the touched
    levels — lib/filterx object COW, Light test_filterx_cow.py).
    dict/list SUBCLASSES (the otel objects) keep their class so typed
    field validation/coercion survives member writes; the raw-copy dict
    constructor bypasses __setitem__, leaf writes go through it."""
    if isinstance(c, dict):
        return dict(c) if type(c) is dict else type(c)(c)
    if isinstance(c, list):
        return list(c) if type(c) is list else type(c)(c)
    if isinstance(c, (tuple, np.ndarray)):
        return list(c)
    return None


def _set_path_series(cur: pd.Series, keys_, val: pd.Series,
                     mask: np.ndarray) -> pd.Series:
    """Masked nested-key store into a Series of dicts/lists
    (expr-set-subscript.c / expr-setattr): per selected row,
    copy-on-write the container chain and set the leaf. Lists index by
    integer (exactly-one-past-the-end appends, other out-of-range
    writes skip like an eval error); _APPEND_KEY is the `l[] = v`
    append lvalue. A null/non-container row becomes a fresh dict (or
    list for an append) — the reference errors, the columnar engine
    creates, matching set-subscript on unset."""
    arr = cur.to_numpy(dtype=object).copy()
    varr = val.to_numpy(dtype=object)
    for i in np.nonzero(mask)[0]:
        root = _cow_clone(_maybe_unmarshal(arr[i]))
        if root is None:
            root = [] if keys_[0] == _APPEND_KEY else {}
        tgt = root
        ok = True
        for k in keys_[:-1]:
            if isinstance(tgt, list):
                if k == _APPEND_KEY:
                    nxt = {}
                    tgt.append(nxt)
                    tgt = nxt
                    continue
                try:
                    ik = int(k)
                except (TypeError, ValueError):
                    ok = False
                    break
                if not (-len(tgt) <= ik < len(tgt)):
                    ok = False
                    break
                nxt = _cow_clone(tgt[ik])
                if nxt is None:
                    nxt = {}
                tgt[ik] = nxt
                tgt = nxt
            else:
                nxt = _cow_clone(tgt.get(k))
                if nxt is None:
                    nxt = {}
                tgt[k] = nxt
                tgt = nxt
        if not ok:
            continue
        last = keys_[-1]
        v = varr[i]
        if isinstance(tgt, list):
            if last == _APPEND_KEY:
                tgt.append(v)
            else:
                try:
                    ik = int(last)
                except (TypeError, ValueError):
                    continue
                if -len(tgt) <= ik < len(tgt):
                    tgt[ik] = v
                elif ik == len(tgt):
                    tgt.append(v)
        else:
            tgt[last] = v
        arr[i] = root
    return pd.Series(arr, dtype=object)


def _unset_path_series(cur: pd.Series, keys_, mask: np.ndarray) -> pd.Series:
    """Masked nested-key delete from a Series of dicts/lists (expr-unset
    on a subscript/attr lvalue): per selected row, copy-on-write the
    container chain and del the leaf key / list element; missing
    intermediates are a no-op."""
    arr = cur.to_numpy(dtype=object).copy()
    for i in np.nonzero(mask)[0]:
        root = _cow_clone(_maybe_unmarshal(arr[i]))
        if root is None:
            continue
        tgt = root
        ok = True
        for k in keys_[:-1]:
            if isinstance(tgt, list):
                try:
                    ik = int(k)
                except (TypeError, ValueError):
                    ok = False
                    break
                if not (-len(tgt) <= ik < len(tgt)):
                    ok = False
                    break
                nxt = _cow_clone(tgt[ik])
                if nxt is None:
                    ok = False
                    break
                tgt[ik] = nxt
                tgt = nxt
            else:
                nxt = _cow_clone(tgt.get(k))
                if nxt is None:
                    ok = False
                    break
                tgt[k] = nxt
                tgt = nxt
        if not ok:
            continue
        last = keys_[-1]
        if isinstance(tgt, list):
            try:
                ik = int(last)
            except (TypeError, ValueError):
                continue
            if -len(tgt) <= ik < len(tgt):
                del tgt[ik]
                arr[i] = root
        elif last in tgt:
            del tgt[last]
            arr[i] = root
    return pd.Series(arr, dtype=object)


def _marshal_containers(s: pd.Series) -> pd.Series:
    """Block-egress marshal (the reference's LogMessage write path):
    dict/list values leave a filterx block as their compact JSON text —
    exactly what a destination template renders for an LM_VT_JSON value
    — and unmarshal on access in a later block (_maybe_unmarshal).
    Keeping containers as Arrow structs instead would drift block
    schemas (branch A adds a member branch B lacks) and break
    junction-merge concatenation."""
    if s.dtype != object:
        return s
    has = any(isinstance(v, (dict, list)) for v in s)
    if not has:
        return s
    return pd.Series(
        [_fx_render(v, "json") if isinstance(v, (dict, list)) else v
         for v in s], dtype=object)


def _series_to_arrow(s: pd.Series) -> pa.Array:
    try:
        return pa.array(s)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        return pa.array(s.astype("string"))
