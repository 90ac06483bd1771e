"""Template compiler structural conformance.

Pins lib/template/tests/test_template_compile.c case by case through
the engine's compiler (functions/templates.py _Compiler, a faithful
port of lib/template/compiler.c): element structure, msg_ref parsing,
version-dependent backslash escaping, error messages with error_pos,
and the 'error in template:' fallback element.
"""

import pandas as pd
import pytest

from axosyslog_ray.functions.macros import MACROS
from axosyslog_ray.functions.strings import TEMPLATE_FUNCS
from axosyslog_ray.functions.templates import (FuncCall, Literal, Template,
                                               TemplateCompileError, ValueRef,
                                               compile_template_checked)

V3_4 = 0x0304
V3_5 = 0x0305


@pytest.fixture(autouse=True)
def hello_plugin():
    """The corpus registers a no-op 'hello' template function."""
    TEMPLATE_FUNCS["hello"] = lambda table, *a: pd.Series(
        [""] * table.num_rows, dtype=object)
    yield
    del TEMPLATE_FUNCS["hello"]


def ref_elems(spec, version=None):
    """Adapt our element list to the reference's LogTemplateElem shape:
    (text-before, type, name, default, msg_ref). Literal runs merge
    into the text attached to the next reference element; a trailing
    literal is the reference's M_NONE macro element."""
    t = Template(spec, version=version)
    out, text = [], []
    for e in t.elems:
        if isinstance(e, Literal):
            text.append(e.text)
            continue
        kind = "func" if isinstance(e, FuncCall) else (
            "macro" if e.name in MACROS else "value")
        out.append(("".join(text), kind, e.name,
                    getattr(e, "default", None), e.msg_ref))
        text = []
    if text or not out:
        out.append(("".join(text), "macro", None, None, 0))
    return out


def test_simple_string_literal():
    assert ref_elems("Test String") == [("Test String", "macro", None, None, 0)]


def test_simple_macro():
    assert ref_elems("${MSGHDR}") == [("", "macro", "MSGHDR", None, 0)]


def test_macro_and_text():
    assert ref_elems("${MSGHDR}test value") == [
        ("", "macro", "MSGHDR", None, 0),
        ("test value", "macro", None, None, 0)]


def test_macro_without_braces():
    assert ref_elems("$MSGHDR") == [("", "macro", "MSGHDR", None, 0)]


def test_macro_name_without_braces_terminated_by_non_identifier():
    assert ref_elems("$MSGHDR test value") == [
        ("", "macro", "MSGHDR", None, 0),
        (" test value", "macro", None, None, 0)]


def test_macro_without_at_has_msgref_zero():
    assert ref_elems("${MSGHDR}") == [("", "macro", "MSGHDR", None, 0)]


def test_macro_with_at_references_single_msg():
    assert ref_elems("${MSGHDR}@0") == [("", "macro", "MSGHDR", None, 1)]
    assert ref_elems("${MSGHDR}@1") == [("", "macro", "MSGHDR", None, 2)]


def test_macro_with_invalid_msgref_is_top_of_stack():
    assert ref_elems("${MSGHDR}@gmail.com") == [
        ("", "macro", "MSGHDR", None, 0),
        ("@gmail.com", "macro", None, None, 0)]


def test_dollar_prefixed_with_backslash_version_dependent():
    # pre-3.5: \$ is a literal dollar; 3.5+: backslash is a plain char
    assert ref_elems("Test \\$STRING", version=V3_4) == [
        ("Test $STRING", "macro", None, None, 0)]
    assert ref_elems("Test \\$STRING", version=V3_5) == [
        ("Test \\", "value", "STRING", None, 0),
        ]


def test_colon_dash_in_braces_is_default_value():
    assert ref_elems("${MSGHDR:-default value}") == [
        ("", "macro", "MSGHDR", "default value", 0)]
    assert ref_elems("${MSGHDR:-}") == [("", "macro", "MSGHDR", "", 0)]


def test_double_dollar_is_literal_dollar():
    assert ref_elems("$$VALUE_NAME") == [
        ("$VALUE_NAME", "macro", None, None, 0)]
    assert ref_elems("$${VALUE_NAME}") == [
        ("${VALUE_NAME}", "macro", None, None, 0)]


def test_invalid_macro_name_is_literal_dollar():
    assert ref_elems("$:VALUE_NAME") == [
        ("$:VALUE_NAME", "macro", None, None, 0)]
    assert ref_elems("$") == [("$", "macro", None, None, 0)]


def test_backslash_without_finishing_escape():
    assert ref_elems("foo\\", version=V3_4) == [("foo", "macro", None, None, 0)]
    assert ref_elems("foo\\", version=V3_5) == [("foo\\", "macro", None, None, 0)]


def test_double_at_is_literal_at():
    assert ref_elems("${MSGHDR}@@12") == [
        ("", "macro", "MSGHDR", None, 0),
        ("@12", "macro", None, None, 0)]


def test_simple_value():
    assert ref_elems("${VALUE_NAME}") == [("", "value", "VALUE_NAME", None, 0)]


def test_value_without_braces():
    assert ref_elems("$VALUE_NAME") == [("", "value", "VALUE_NAME", None, 0)]


def test_backslash_within_braces_is_literal():
    assert ref_elems("${VALUE\\}NAME}")[0] == ("", "value", "VALUE\\", None, 0)


def test_value_name_can_be_empty_with_braces():
    assert ref_elems("${}") == [("", "value", "", None, 0)]


def test_simple_template_function():
    assert ref_elems("$(hello)") == [("", "func", "hello", None, 0)]


def test_complicated_template_function():
    spec = ("$( hello \\tes\t\t\t value(xyz) \"value with spaces\" "
            "'test value with spa\"ces')@2")
    elems = Template(spec).elems
    assert len(elems) == 1
    fc = elems[0]
    assert isinstance(fc, FuncCall) and fc.name == "hello"
    assert fc.msg_ref == 3
    # backslash quotes the next char; top-level quotes are stripped;
    # nested parens are kept
    assert [a.spec for a in fc.args] == [
        "tes", "value(xyz)", "value with spaces",
        'test value with spa"ces']


def test_simple_template_function_with_additional_text():
    assert ref_elems("$(hello)test value") == [
        ("", "func", "hello", None, 0),
        ("test value", "macro", None, None, 0)]


def test_quoted_string_in_function_name():
    assert ref_elems('$(he"ll"o)') == [("", "func", "hello", None, 0)]


def test_nested_quotes_are_preserved_inside_parens():
    fc = Template('$(hello value("a b") \'top level\')').elems[0]
    assert [a.spec for a in fc.args] == ['value("a b")', "top level"]


def test_empty_function_compiles_to_nothing():
    # add_func_elem returns TRUE without an element when argc == 0
    assert Template("$()").elems == []


def test_invalid_macro():
    with pytest.raises(TemplateCompileError) as ei:
        Template("${MSGHDR")
    assert str(ei.value) == "Invalid macro, '}' is missing, error_pos='8'"
    t, err = compile_template_checked("${MSGHDR")
    assert err is not None
    assert [e.text for e in t.elems] == ["error in template: ${MSGHDR"]


def test_invalid_subst():
    with pytest.raises(TemplateCompileError) as ei:
        Template("${MSGHDR:1}")
    assert str(ei.value) == "Unknown substitution function, error_pos='9'"
    t, _ = compile_template_checked("${MSGHDR:1}")
    assert [e.text for e in t.elems] == ["error in template: ${MSGHDR:1}"]


def test_template_function_bad1():
    spec = ("$( hello \\tes\t\t\t value(xyz \"value with spaces\" "
            "'test value with spa\"ces')")
    with pytest.raises(TemplateCompileError) as ei:
        Template(spec)
    assert str(ei.value) == ("Invalid template function reference, missing "
                             "function name or imbalanced '(', error_pos='73'")


def test_template_function_bad2():
    spec = ("$( hello \\tes\t\t\t value xyz \"value with spaces\" "
            "'test value with spa\"ces'")
    with pytest.raises(TemplateCompileError) as ei:
        Template(spec)
    assert str(ei.value) == ("Invalid template function reference, missing "
                             "function name or imbalanced '(', error_pos='72'")


def test_template_function_bad3():
    spec = '$(hello "This is an unclosed quoted string)'
    with pytest.raises(TemplateCompileError) as ei:
        Template(spec)
    assert str(ei.value) == ("Invalid template function reference, missing "
                             "function name or imbalanced '(', error_pos='8'")


def test_unknown_function():
    with pytest.raises(TemplateCompileError) as ei:
        Template("$(unknown function)")
    assert str(ei.value) == 'Unknown template function "unknown"'
    t, _ = compile_template_checked("$(unknown function)")
    assert [e.text for e in t.elems] == [
        "error in template: $(unknown function)"]


def test_dollar_asterisk_renders_matches():
    import pyarrow as pa

    assert ref_elems("$*") == [("", "macro", "*", None, 0)]
    t = pa.table({
        "message": ["m", "m"],
        "matches": pa.array([["a", "b,c"], None],
                            type=pa.list_(pa.string())),
    })
    # log_msg_format_matches: str-repr elements joined with ','
    assert Template("$*").eval(t).tolist() == ['a,"b,c"', ""]
    # digit refs read the matches list: $1 = matches[0]
    assert Template("$1/$2").eval(t).tolist() == ["a/b,c", "/"]
