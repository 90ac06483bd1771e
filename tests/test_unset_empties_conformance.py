"""unset_empties() conformance.

Pins lib/filterx/tests/test_func_unset_empties.c through the FilterX
surface: default empties, recursive-by-default bottom-up cleaning,
targets= resetting the defaults (null/""/[]/{} individually and string
value targets), replacement=, and ignorecase= (default false).
"""

import pyarrow as pa

from axosyslog_ray.filterx import FilterX


def _clean(input_json: str, args: str = "") -> str:
    t = pa.table({"j": [input_json]})
    prog = f"$r = format_json(unset_empties(parse_json($j){args}));"
    out = FilterX(prog)(t)
    return out.column("r").to_pylist()[0]


def test_default_empties():
    assert _clean('["", null, [], {}]') == "[]"


def test_recursive_default_true_dict():
    assert _clean('[{"foo":""}]') == "[]"


def test_recursive_false_dict():
    assert _clean('[{"foo":""}]', ", recursive=false") == '[{"foo":""}]'


def test_recursive_default_true_list():
    assert _clean('[[""]]') == "[]"


def test_recursive_false_list():
    assert _clean('[[""]]', ", recursive=false") == '[[""]]'


def test_target_resets_defaults():
    got = _clean('["",null,[],{}]', ', targets=["anything"]')
    assert got == '["",null,[],{}]'


def test_target_null_only():
    assert _clean('["",null,[],{}]', ", targets=[null]") == '["",[],{}]'


def test_target_empty_string_only():
    assert _clean('["",null,[],{}]', ', targets=[""]') == "[null,[],{}]"


def test_target_empty_list_only():
    assert _clean('["",null,[],{}]', ", targets=[[]]") == '["",null,{}]'


def test_target_empty_dict_only():
    assert _clean('["",null,[],{}]', ", targets=[{}]") == '["",null,[]]'


def test_target_empties_manual():
    assert _clean('["",null,[],{}]', ', targets=[{}, [], "", null]') == "[]"


def test_target_empties_manual_and_strings():
    got = _clean('["bar","",null,[],{},"foo","bar","baz"]',
                 ', targets=[{}, [], "", null, "foo", "bar"]')
    assert got == '["baz"]'


def test_string_targets_dict():
    got = _clean('{"foo":{"bar":"baz","tik":"tak"}}', ', targets=["baz"]')
    assert got == '{"foo":{"tik":"tak"}}'


def test_string_targets_dict_collapse():
    got = _clean('{"foo":{"bar":"baz","tik":"tak"}}',
                 ', targets=["baz", "tak", {}]')
    assert got == "{}"


def test_string_targets_list():
    got = _clean('["foo","bar",null,"baz"]', ', targets=["baz", null]')
    assert got == '["foo","bar"]'
    got = _clean('["foo","bar",null,"baz"]',
                 ', targets=["baz", "foo", null]')
    assert got == '["bar"]'


def test_replacement_dict():
    got = _clean('{"foo":{"bar":"baz","tik":"tak"}}',
                 ', targets=["baz", "tak"], replacement="replaced"')
    assert got == '{"foo":{"bar":"replaced","tik":"replaced"}}'


def test_replacement_list():
    got = _clean('["foo","bar",null,"baz"]',
                 ', targets=["baz", "foo", null], replacement="replaced"')
    assert got == '["replaced","bar","replaced","replaced"]'


def test_ignorecase_default_off_dict():
    got = _clean('{"foo":{"bar":"baz","tik":"tak"}}', ', targets=["BAZ"]')
    assert got == '{"foo":{"bar":"baz","tik":"tak"}}'


def test_ignorecase_explicit_false_dict():
    got = _clean('{"foo":{"bar":"baz","tik":"tak"}}',
                 ', targets=["BAZ"], ignorecase=false')
    assert got == '{"foo":{"bar":"baz","tik":"tak"}}'


def test_ignorecase_true_dict():
    got = _clean('{"foo":{"bar":"baz","tik":"tak"}}',
                 ', targets=["BAZ"], ignorecase=true')
    assert got == '{"foo":{"tik":"tak"}}'


def test_ignorecase_false_list():
    got = _clean('["foo","bar",null,"baz"]',
                 ', targets=["BAR", null], ignorecase=false')
    assert got == '["foo","bar","baz"]'


def test_ignorecase_true_list():
    got = _clean('["foo","bar",null,"baz"]',
                 ', targets=["BAR", null], ignorecase=true')
    assert got == '["foo","baz"]'
