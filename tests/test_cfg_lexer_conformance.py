"""Config lexer / preprocessor conformance.

Pins the reference's own test corpora through this engine's config
front end:

- lib/tests/test_cfg_lexer_subst.c — every backtick-substitution case
  (fixture values, resolution order, string re-encoding, both error
  modes) through config_prep.BacktickSubst.
- lib/tests/test_lexer.c — the string/qstring escape, number,
  multiline-literal, @version, @define+backtick and @include
  (file / wildcard / directory / include-path) cases, through
  config_prep and the config tokenizer.
"""

import os

import pytest

from axosyslog_ray.config import _unquote, compile_config, tokenize
from axosyslog_ray.config_prep import (BacktickSubst, CfgArgs,
                                       PreprocessError, SubstError,
                                       preprocess_config, unquote)
from axosyslog_ray.functions.numbers import parse_double, parse_int64_base_any


# ---------------------------------------------------- cfg-lexer-subst.c

def construct_subst(additional_values=None):
    """The test file's construct_object_with_values fixture
    (test_cfg_lexer_subst.c:29-81)."""
    args = CfgArgs({
        "arg": "arg_value",
        "simple_string": '"simple_string_value"',
        "simple_qstring": "'simple_qstring_value'",
        "escaped_string": '"escaped_string\\"\\r\\n"',
    })
    for k, v in (additional_values or {}).items():
        args.set(k, v)
    defs = CfgArgs({"arg": "default_for_arg", "def": "default_for_def"})
    globals_ = CfgArgs({"arg": "global_for_arg", "def": "global_for_def",
                        "globl": "global_for_globl"})
    return BacktickSubst(globals=globals_, defs=defs, args=args,
                         env={"env": "env_for_env"})


def test_cfg_args_normalizes_dashes():
    args = CfgArgs({"simple_string": "x"})
    assert "simple-string" in args
    assert "simple_string" in args
    assert args.get("simple-string") == "x"


def test_double_backtick_replaced_with_a_single_one():
    assert construct_subst().invoke("``") == "`"


def test_single_backtick_causes_an_error():
    with pytest.raises(SubstError, match="missing closing backtick"):
        construct_subst().invoke("foo ` bar")


def test_backtick_after_quoted_character_succeeds():
    assert (construct_subst().invoke('foo "string \\n`arg`" bar')
            == 'foo "string \\narg_value" bar')


def test_backtick_as_a_quoted_character_in_a_string_results_in_failure():
    with pytest.raises(SubstError,
                       match="right after a string quote character"):
        construct_subst().invoke('foo "string \\`arg`" bar')


def test_value_in_normal_text_replaced_with_its_literal_value():
    s = construct_subst()
    assert s.invoke("foo `arg` bar") == "foo arg_value bar"
    assert (s.invoke("foo `simple_string` bar")
            == 'foo "simple_string_value" bar')
    assert (s.invoke("foo `simple_qstring` bar")
            == "foo 'simple_qstring_value' bar")
    assert (s.invoke("foo `escaped_string` bar")
            == 'foo "escaped_string\\"\\r\\n" bar')


def test_values_are_resolution_order_args_defaults_globals_env():
    s = construct_subst()
    assert s.invoke("foo `arg` bar") == "foo arg_value bar"
    assert s.invoke("foo `def` bar") == "foo default_for_def bar"
    assert s.invoke("foo `globl` bar") == "foo global_for_globl bar"
    assert s.invoke("foo `env` bar") == "foo env_for_env bar"


def test_values_are_inserted_within_strings():
    s = construct_subst()
    assert s.invoke('foo "`arg`" bar') == 'foo "arg_value" bar'
    assert s.invoke("foo '`arg`' bar") == "foo 'arg_value' bar"


def test_string_literals_are_inserted_into_strings_without_quotes():
    s = construct_subst({
        "simple_string_with_whitespace": '  "string_with_whitespace"   '})
    assert (s.invoke('foo "x `simple_string` y" bar')
            == 'foo "x simple_string_value y" bar')
    assert (s.invoke("foo 'x `simple_string` y' bar")
            == "foo 'x simple_string_value y' bar")
    assert (s.invoke('foo "x `simple_string_with_whitespace` y" bar')
            == 'foo "x string_with_whitespace y" bar')


def test_incorrect_strings_and_multiple_tokens_are_inserted_verbatim():
    s = construct_subst({
        "half_string": '"halfstring',
        "tokens_that_start_with_string": '"str", token',
        "tokens_enclosed_in_strings": '"str1", token, "str2"',
    })
    assert (s.invoke('foo "x `simple_string` y" bar')
            == 'foo "x simple_string_value y" bar')
    assert (s.invoke('foo "x `half_string` y" bar')
            == 'foo "x "halfstring y" bar')
    assert (s.invoke('foo "x `tokens_that_start_with_string` y" bar')
            == 'foo "x "str", token y" bar')
    assert (s.invoke('foo "x `tokens_enclosed_in_strings` y" bar')
            == 'foo "x "str1", token, "str2" y" bar')


def test_strings_with_special_chars_are_properly_encoded_in_strings():
    s = construct_subst({
        "string_with_characters_that_need_quoting":
            '"quote: \\", newline: \\r\\n, backslash: \\\\"'})
    assert (s.invoke('foo "x `string_with_characters_that_need_quoting` y" bar')
            == 'foo "x quote: \\", newline: \\r\\n, backslash: \\\\ y" bar')


def test_strings_with_embedded_apostrophe_cause_an_error_in_qstring():
    s = construct_subst({"string_with_apostrophe": "\"'foo'\""})
    assert (s.invoke('foo "x `string_with_apostrophe` y" bar')
            == 'foo "x \'foo\' y" bar')
    with pytest.raises(SubstError, match="cannot represent apostrophes"):
        construct_subst({"string_with_apostrophe": "\"'foo'\""}).invoke(
            "foo 'x `string_with_apostrophe` y' bar")


def test_tracking_string_state():
    for inp in ('"hello\\n" `quoted_escaped_newline`',
                '"hello\\n\\n" `quoted_escaped_newline`',
                '"hello\\n\\n " `quoted_escaped_newline`'):
        s = construct_subst({"quoted_escaped_newline": '"\\n"'})
        assert s.invoke(inp) == inp.replace("`quoted_escaped_newline`",
                                            '"\\n"')


def test_string_state_persists_across_invocations():
    # the C struct keeps string_state across YY_INPUT chunks: a string
    # opened on one line keeps ` literal-splicing semantics on the next
    s = construct_subst()
    assert s.invoke('foo "first line\n') == 'foo "first line\n'
    assert s.invoke('`simple_string` end" bar') == 'simple_string_value end" bar'


# ------------------------------------------------------- lib/tests/test_lexer.c

def test_string_escapes():
    # test_lexer.c test_string
    assert _unquote('"test"') == "test"
    assert _unquote('"test\\x0a"') == "test\n"
    assert _unquote('"test\\o011"') == "test\t"
    assert _unquote('"test\\n\\r\\a\\t\\v\\c"') == "test\n\r\a\t\vc"


def test_qstring_literal():
    # test_lexer.c test_qstring: qstrings take backslashes literally
    assert unquote("'test'") == "test"
    assert unquote("'\"test\\n\\r\"'") == '"test\\n\\r"'


def test_numbers():
    # test_lexer.c test_lexer_others number forms via the engine's
    # config-number parser (lib/parse-number.c semantics)
    assert parse_int64_base_any("12") == 12
    assert parse_int64_base_any("0x50") == 80
    assert parse_int64_base_any("011") == 9
    assert parse_int64_base_any("+12") == 12
    assert parse_int64_base_any("-12") == -12
    assert parse_double("4.2")[0] == pytest.approx(4.2)
    assert parse_double("-4.2")[0] == pytest.approx(-4.2)
    assert parse_double("+4.2")[0] == pytest.approx(4.2)


def test_multiline_string_literals_tokenize_as_one_token():
    # test_lexer.c test_multiline_string_literals /
    # test_multiline_qstring_literals
    toks = [t for t, _, _ in tokenize('"test another\nfoo"\nbar')]
    assert toks == ['"test another\nfoo"', "bar"]
    toks = [t for t, _, _ in tokenize("'test another\nfoo'\nbar")]
    assert toks == ["'test another\nfoo'", "bar"]


def test_at_version_stores_config_version_in_hex_form():
    # test_lexer.c at_version_stores_config_version_in_parsed_version
    assert preprocess_config("@version: 3.1\nbar\n").version == 0x0301
    assert preprocess_config("@version: 3.5\nbaz\n").version == 0x0305
    assert preprocess_config("@version: current\nfoo\n").version == "current"


def test_defined_variables_are_substituted_when_enclosed_in_backticks():
    # test_lexer.c defined_variables_are_substituted...
    res = preprocess_config(
        "@define var1 value1\n@define var2 value2\nvalue0\n`var1`\n`var2`\n",
        env={})
    assert res.text == "value0\nvalue1\nvalue2\n"


@pytest.fixture()
def include_tree(tmp_path):
    inc = tmp_path / "include-test"
    inc.mkdir()
    (inc / "foo.conf").write_text("foo\n")
    (inc / "bar.conf").write_text("bar\n")
    (inc / "baz.conf").write_text("baz\n")
    (inc / ".hidden.conf").write_text("hidden\n")
    (inc / "skip me.conf").write_text("spaced\n")  # name outside [-._a-zA-Z0-9]
    return str(inc)


def test_include_file_expands_content(include_tree):
    res = preprocess_config(
        f'@include "{include_tree}/foo.conf"\n', env={})
    assert res.text.split() == ["foo"]


def test_include_wildcard_alphabetical(include_tree):
    # glob expansion is alphabetical and, unlike directory expansion,
    # not name-filtered ("skip me.conf" matches the pattern; dot-files
    # don't match a non-dot glob)
    res = preprocess_config(
        f'@include "{include_tree}/*.conf"\n', env={})
    assert res.text.split() == ["bar", "baz", "foo", "spaced"]


def test_include_directory_alphabetical_with_name_filter(include_tree):
    # directory expansion skips dot-files and names outside the
    # [-._a-zA-Z0-9]+ pattern (cfg-lexer.c:552-573)
    res = preprocess_config(f'@include "{include_tree}"\n', env={})
    assert res.text.split() == ["bar", "baz", "foo"]


def test_include_finds_files_in_include_path(include_tree):
    res = preprocess_config(
        f'@define include-path "{include_tree}"\n@include foo.conf\n',
        env={})
    assert res.text.split() == ["foo"]


def test_include_finds_wildcards_in_include_path(include_tree):
    res = preprocess_config(
        f'@define include-path "{include_tree}"\n@include "*.conf"\n',
        env={})
    assert res.text.split() == ["bar", "baz", "foo", "spaced"]


def test_include_missing_file_is_an_error():
    with pytest.raises(PreprocessError, match="file not found"):
        preprocess_config('@include "no-such-file.conf"\n', env={})


def test_includes_see_defines_and_define_inside_include_propagates(tmp_path):
    sub = tmp_path / "sub.conf"
    sub.write_text("@define from_include inner\n`outer`\n")
    res = preprocess_config(
        f'@define outer outer_value\n@include "{sub}"\n`from_include`\n',
        env={})
    assert res.text.split() == ["outer_value", "inner"]


def test_compile_config_with_define_and_include(tmp_path):
    # end-to-end: a filter block arrives via @include and a backticked
    # threshold lands in the filter expression
    inc = tmp_path / "filters.conf"
    inc.write_text("block filter is_err { severity(err..emerg); };\n")
    cfg = compile_config(
        '@version: 4.8\n'
        '@define minsev err\n'
        f'@include "{inc}"\n'
        'filter f_main { is_err() and severity(`minsev`); };\n')
    assert cfg.version == 0x0408
    assert "is_err" in cfg.filters
    assert "f_main" in cfg.filters


def test_requires_module_config_id_line_pragmas_are_accepted():
    txt = ('@requires json-plugin\n@module basicfuncs\n'
           '@config-id: 1234abc\n@line "x.conf" 10 2\nident\n')
    assert preprocess_config(txt, env={}).text.strip() == "ident"
