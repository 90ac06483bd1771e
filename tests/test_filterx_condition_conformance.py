"""FilterX conditional conformance.

Pins lib/filterx/tests/test_expr_condition.c through the FilterX
surface: matching/non-matching if/elif/else branch selection,
subsequent-condition nesting, the falsey-statement interrupt inside a
branch (the reference's error return surfaces as the row being
dropped), empty else blocks, and missing-statement conditions.
"""

import pyarrow as pa

from axosyslog_ray.filterx import FilterX

SETUP = '$cv = "default"; $cv2 = "default2"; $cv3 = "default3";\n'


def run(prog, **cols):
    return FilterX(SETUP + prog)(pa.table(cols)).to_pylist()


def test_condition_matching_expression():
    out = run('if (true) { $cv = "matching"; };', x=[1])
    assert out[0]["cv"] == "matching"


def test_condition_non_matching_expression():
    out = run('if (false) { $cv = "matching"; } '
              'else { $cv = "non-matching"; };', x=[1])
    assert out[0]["cv"] == "non-matching"


def test_condition_matching_elif_expression():
    out = run('if (false) { $cv = "matching"; } '
              'elif (true) { $cv = "elif-matching"; } '
              'else { $cv = "else"; };', x=[1])
    assert out[0]["cv"] == "elif-matching"


def test_condition_non_matching_elif_falls_to_else():
    out = run('if (false) { $cv = "matching"; } '
              'elif (false) { $cv = "elif-matching"; } '
              'else { $cv = "else"; };', x=[1])
    assert out[0]["cv"] == "else"


def test_subsequent_conditions_nest():
    # test_condition_subsequent_conditions_must_create_nested_condition:
    # each elif chains into the previous condition's false branch
    prog = ('if ($x == 1) { $cv = "one"; } '
            'elif ($x == 2) { $cv = "two"; } '
            'elif ($x == 3) { $cv = "three"; } '
            'else { $cv = "many"; };')
    out = run(prog, x=[1, 2, 3, 4])
    assert [r["cv"] for r in out] == ["one", "two", "three", "many"]


def test_falsey_statement_interrupts_sequential_execution():
    # a false statement converts to an error return: assignments before
    # it stick (unobservably — the message is dropped), later ones
    # never run, and the row leaves the pipeline
    out = run('if ($x == 1) { $cv = "matching"; false; $cv3 = "m3"; };',
              x=[1, 2])
    assert len(out) == 1  # the x=1 row was dropped
    assert out[0]["x"] == 2
    assert out[0]["cv"] == "default"
    assert out[0]["cv3"] == "default3"


def test_truthy_statement_does_not_interrupt():
    out = run('if ($x == 1) { $cv = "matching"; true; $cv3 = "m3"; };',
              x=[1])
    assert out[0]["cv"] == "matching" and out[0]["cv3"] == "m3"


def test_condition_must_not_fail_on_empty_else_block():
    out = run("if (false) { $cv = \"matching\"; } else { };", x=[1])
    assert len(out) == 1
    assert out[0]["cv"] == "default"


def test_condition_with_no_statements_keeps_the_row():
    # test_condition_return_expr_result_on_missing_stmts: a conditional
    # with no branch body evaluates to the condition result (truthy
    # here), so the row flows on
    out = run("if ($x == 1) { };", x=[1])
    assert len(out) == 1
