"""Config preprocessor: pragmas and backtick substitution.

Implements the reference's configuration preprocessing layer:

- `` `name` `` backtick substitution with the string-tracking state
  machine of lib/cfg-lexer-subst.c (CLS_* states, _append_value's
  string-literal re-encoding, the double-backtick escape and the two
  error modes), resolution order args > defs > globals > environment
  (lib/cfg-lexer-subst.c:51-66), and `-`/`_` key normalization
  (lib/cfg-args.c cfg_args_set -> lib/str-utils.c __normalize_key).
- Line pragmas `@version` / `@define` / `@include` / `@requires` /
  `@module` / `@config-id` / `@line` (lib/pragma-grammar.ym:95-220).
  `@include` resolves a plain file, a directory (alphabetical, entries
  restricted to [-._a-zA-Z0-9]+ and no leading dot,
  lib/cfg-lexer.c:536-590) or a glob pattern, searching the
  colon-separated `include-path` define (lib/cfg-lexer.c:720-805).

Substitution happens per input line with persistent string state, the
shape the reference gets from applying cfg_lexer_subst_invoke inside
YY_INPUT (lib/cfg-lex.l:36-150): an `@define` on one line affects
backticks on every later line of the same file and of included files.
"""

from __future__ import annotations

import glob as _glob
import os
import re

MAX_INCLUDE_DEPTH = 256


class PreprocessError(ValueError):
    pass


class SubstError(PreprocessError):
    pass


def unquote(tok: str) -> str:
    """cfg-lex.l string semantics: double-quoted strings process
    backslash escapes (\\n \\r \\t \\a \\v, \\xHH, \\oOOO, \\<other> ->
    the char itself — cfg-lex.l:377-384); single-quoted (qstring)
    strings are LITERAL, backslashes included."""
    if tok[:1] == "'" and tok[-1:] == "'" and len(tok) >= 2:
        return tok[1:-1]
    if tok[:1] == '"' and tok[-1:] == '"' and len(tok) >= 2:
        def one(m: re.Match) -> str:
            e = m.group(1)
            if e[0] == "x" and len(e) > 1:
                return chr(int(e[1:], 16))
            if e[0] == "o" and len(e) > 1:
                return chr(int(e[1:], 8))
            return _STR_ESCAPES.get(e, e)

        return _ESC_RE.sub(one, tok[1:-1])
    return tok


_STR_ESCAPES = {"a": "\a", "n": "\n", "r": "\r", "t": "\t", "v": "\v"}
_ESC_RE = re.compile(r"\\(x[0-9a-fA-F]{1,2}|o[0-7]{1,3}|.)", re.S)


def _normalize_key(name: str) -> str:
    """lib/str-utils.c __normalize_key: '-' -> '_'."""
    return name.replace("-", "_")


class CfgArgs:
    """Name/value store with dash/underscore-insensitive keys
    (lib/cfg-args.c)."""

    def __init__(self, values: dict | None = None):
        self._d: dict[str, str] = {}
        for k, v in (values or {}).items():
            self.set(k, v)

    def set(self, name: str, value: str):
        self._d[_normalize_key(name)] = value

    def get(self, name: str):
        return self._d.get(name) or self._d.get(_normalize_key(name))

    def __contains__(self, name: str) -> bool:
        return _normalize_key(name) in self._d


# ------------------------------------------------- backtick substitution

# CfgLexerStringTrackState (cfg-lexer-subst.c:33-40)
_NOT_STRING = 0
_WITHIN_STRING = 1
_WITHIN_STRING_QUOTE = 2
_WITHIN_STRING_QUOTED_CHARACTER = 3
_WITHIN_QSTRING = 4

# A define value is spliced as a decoded string literal when it lexes
# as exactly one string token (possibly whitespace-padded) and nothing
# else (_extract_string_literal, cfg-lexer-subst.c:100-119).
_ONE_STRING_RE = re.compile(
    r"""\s*("(?:[^"\\]|\\.)*"|'[^']*')\s*\Z""", re.S)


class BacktickSubst:
    """cfg_lexer_subst_invoke's per-buffer state machine
    (lib/cfg-lexer-subst.c:208-280). String-tracking state persists
    across invoke() calls, like the C struct member does across
    YY_INPUT chunks."""

    def __init__(self, globals: CfgArgs | None = None,
                 defs: CfgArgs | None = None,
                 args: CfgArgs | None = None,
                 env: dict | None = None):
        self.globals = globals
        self.defs = defs
        self.args = args
        self.env = os.environ if env is None else env
        self.string_state = _NOT_STRING

    def _lookup(self, name: str):
        for scope in (self.args, self.defs, self.globals):
            if scope is not None:
                v = scope.get(name)
                if v is not None:
                    return v
        return self.env.get(name)

    def _track(self, state: int, ch: str) -> int:
        if state == _NOT_STRING:
            if ch == '"':
                return _WITHIN_STRING
            if ch == "'":
                return _WITHIN_QSTRING
            return _NOT_STRING
        if state in (_WITHIN_STRING, _WITHIN_STRING_QUOTED_CHARACTER):
            if ch == "\\":
                return _WITHIN_STRING_QUOTE
            if ch == '"':
                return _NOT_STRING
            return _WITHIN_STRING
        if state == _WITHIN_STRING_QUOTE:
            return _WITHIN_STRING_QUOTED_CHARACTER
        if state == _WITHIN_QSTRING:
            if ch == "'":
                return _NOT_STRING
            return _WITHIN_QSTRING
        raise AssertionError(state)

    def _append_value(self, value: str, out: list[str]):
        if self.string_state == _NOT_STRING:
            out.append(value)
            return
        m = _ONE_STRING_RE.match(value)
        if m is None:
            # not a single string literal: spliced verbatim
            out.append(value)
            return
        literal = unquote(m.group(1))
        if self.string_state == _WITHIN_STRING:
            out.append(literal.replace("\\", "\\\\").replace('"', '\\"')
                       .replace("\n", "\\n").replace("\r", "\\r"))
        elif self.string_state == _WITHIN_QSTRING:
            if "'" in literal:
                raise SubstError(
                    "cannot represent apostrophes within "
                    "apostroph-enclosed string")
            out.append(literal)
        else:  # pragma: no cover - states excluded by the backtick checks
            raise AssertionError(self.string_state)

    def invoke(self, text: str) -> str:
        out: list[str] = []
        backtick = False
        ref_start = 0
        for i, ch in enumerate(text):
            self.string_state = self._track(self.string_state, ch)
            if not backtick and ch == "`":
                if self.string_state == _WITHIN_STRING_QUOTED_CHARACTER:
                    raise SubstError(
                        "cannot subsitute backticked values right after "
                        "a string quote character")
                backtick = True
                ref_start = i + 1
            elif backtick and ch == "`":
                backtick = False
                if ref_start == i:
                    out.append("`")  # `` escapes a literal backtick
                else:
                    self._append_value(
                        self._lookup(text[ref_start:i]) or "", out)
            elif not backtick:
                out.append(ch)
        if backtick:
            raise SubstError("missing closing backtick (`) character")
        return "".join(out)


# ------------------------------------------- block-body suspension scan

_BLOCK_HDR_RE = re.compile(r"\s*block\s")


def _scan_block_line(line: str, bs: dict) -> None:
    """Track brace depth (string- and comment-aware) across a suspended
    block definition; flips bs['suspended'] off when the body closes.
    Mirrors the reference lexer's cfg_lexer_suspend_input_subst /
    resume pair around block capture (lib/cfg-lex.l:603-612): backticks
    inside a block BODY are generate-time references, not
    definition-time ones."""
    tracker = BacktickSubst()
    st = bs["str"]
    for ch in line:
        if st == _NOT_STRING:
            if ch == "#":
                break
            if ch == "{":
                bs["depth"] += 1
                bs["seen"] = True
            elif ch == "}":
                bs["depth"] -= 1
        st = tracker._track(st, ch)
    bs["str"] = st
    if bs["seen"] and bs["depth"] <= 0:
        bs["suspended"] = False


# ------------------------------------------------------- pragma handling

_DIR_ENTRY_RE = re.compile(r"[-._a-zA-Z0-9]+\Z")
# one pragma argument: a quoted string or a bare word
_PRAGMA_ARG_RE = re.compile(
    r"""\s*("(?:[^"\\]|\\.)*"|'[^']*'|[^\s"']+)""")


def _find_file_in_path(path: str | None, filename: str):
    """lib/pathutils find_file_in_path: absolute / explicitly relative
    names resolve as-is; otherwise try each colon-separated dir."""
    if os.path.isabs(filename) or filename.startswith("."):
        return filename if os.path.exists(filename) else None
    if os.path.exists(filename):
        return filename
    for d in (path or "").split(":"):
        if not d:
            continue
        cand = os.path.join(d, filename)
        if os.path.exists(cand):
            return cand
    return None


def _directory_files(dirname: str) -> list[str]:
    """cfg-lexer.c:536-590 cfg_lexer_include_directory: plain files
    only, names in [-._a-zA-Z0-9]+, no leading dot, alphabetical."""
    out = []
    for entry in sorted(os.listdir(dirname)):
        if entry.startswith("."):
            continue
        if not _DIR_ENTRY_RE.match(entry):
            continue
        full = os.path.join(dirname, entry)
        if os.path.isdir(full):
            continue
        out.append(full)
    return out


def _resolve_include(pattern: str, include_path: str | None) -> list[str]:
    found = _find_file_in_path(include_path, pattern)
    if found is not None:
        if os.path.isdir(found):
            return _directory_files(found)
        return [found]
    # glob, first relative then along the include path
    # (cfg_lexer_include_file_glob, cfg-lexer.c:747-777)
    hits = sorted(_glob.glob(pattern))
    if not hits and not os.path.isabs(pattern):
        for d in (include_path or "").split(":"):
            if not d:
                continue
            hits.extend(sorted(_glob.glob(os.path.join(d, pattern))))
    hits = [h for h in hits if not os.path.isdir(h)]
    if not hits and not _glob.has_magic(pattern):
        raise PreprocessError(f"Error including {pattern}: file not found")
    return hits


def _parse_version(arg: str):
    """pragma-grammar.ym version_stmt: 'current' or MAJOR.MINOR packed
    as (major << 8) | minor, the user_version hex form asserted by
    test_lexer.c:316-351."""
    if arg == "current":
        return "current"
    m = re.fullmatch(r"(\d+)\.(\d+)", arg)
    if not m:
        raise PreprocessError(f"invalid @version: {arg!r}")
    return (int(m.group(1)) << 8) | int(m.group(2))


class PreprocessResult:
    def __init__(self, text: str, version, defines: CfgArgs):
        self.text = text
        self.version = version
        self.defines = defines


def preprocess_config(text: str, *, include_path: str | None = None,
                      defines: dict | CfgArgs | None = None,
                      env: dict | None = None,
                      _depth: int = 0,
                      _subst: BacktickSubst | None = None,
                      _state: dict | None = None) -> PreprocessResult:
    """Expand pragmas and backtick references, returning plain config
    text for the tokenizer. `defines` seeds the global CfgArgs (the
    command-line -D equivalent); an `include-path` define extends the
    search path for `@include`."""
    if _depth > MAX_INCLUDE_DEPTH:
        raise PreprocessError("include depth too deep")
    if isinstance(defines, CfgArgs):
        globals_args = defines
    else:
        globals_args = CfgArgs(defines)
    state = _state if _state is not None else {"version": None}
    subst = _subst or BacktickSubst(globals=globals_args, env=env)
    out: list[str] = []
    blockscan = {"suspended": False, "depth": 0, "seen": False,
                 "str": _NOT_STRING}
    for line in text.splitlines(keepends=True):
        if blockscan["suspended"]:
            # inside a block {} definition: substitution is SUSPENDED
            # (generate-time backticks must survive to the compiler)
            out.append(line)
            _scan_block_line(line, blockscan)
            continue
        if _BLOCK_HDR_RE.match(line):
            blockscan.update(suspended=True, depth=0, seen=False,
                             str=_NOT_STRING)
            out.append(line)
            _scan_block_line(line, blockscan)
            continue
        line = subst.invoke(line)
        stripped = line.lstrip()
        if not stripped.startswith("@") or subst.string_state != _NOT_STRING:
            out.append(line)
            continue
        body = stripped[1:].rstrip("\n")
        # '@version:' / '@version :' / '@config-id:' spellings
        m = re.match(r"([\w-]+)\s*:?", body)
        kw = m.group(1) if m else ""
        rest = body[m.end():] if m else ""
        args = [unquote(a) for a in _PRAGMA_ARG_RE.findall(rest)]
        if kw == "version":
            if not args:
                raise PreprocessError("@version needs a value")
            state["version"] = _parse_version(args[0])
        elif kw == "define":
            if len(args) < 1:
                raise PreprocessError("@define needs a name")
            globals_args.set(args[0], args[1] if len(args) > 1 else "")
        elif kw == "include":
            if not args:
                raise PreprocessError("@include needs a filename")
            inc_path = globals_args.get("include-path")
            if include_path:
                inc_path = (inc_path + ":" + include_path
                            if inc_path else include_path)
            for fn in _resolve_include(args[0], inc_path):
                with open(fn, "r", encoding="utf-8", errors="replace") as f:
                    content = f.read()
                # each include is substituted with its own fresh string
                # state but the shared define scope
                sub = preprocess_config(
                    content, include_path=include_path,
                    defines=globals_args, env=env, _depth=_depth + 1,
                    _state=state)
                out.append(sub.text)
                if sub.text and not sub.text.endswith("\n"):
                    out.append("\n")
        elif kw in ("requires", "module", "config-id", "line"):
            pass  # accepted and ignored: all engine modules are built in
        else:
            raise PreprocessError(f"unknown pragma @{kw}")
    return PreprocessResult("".join(out), state["version"], globals_args)
