"""Gopher repetition rules: dup lines, top n-gram, dup 5-gram coverage."""
import numpy as np
import pyarrow as pa
import pytest

from axosyslog_ray.textstats.repetition import gopher_repetition


def _run(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    return gopher_repetition(t).to_pandas().set_index("doc_id")


def test_dup_lines():
    out = _run(["x y\nx y\nz z z", "a\nb\nc"])
    assert out.loc[0, "n_lines"] == 3
    assert out.loc[0, "dup_line_frac"] == round(1 / 3, 4)
    assert out.loc[0, "dup_line_char_frac"] == round(3 / 11, 4)
    assert out.loc[1, "dup_line_frac"] == 0.0


def test_top_ngram_char_frac():
    # "the cat sat on" repeats twice; total word chars = 32
    out = _run(["the cat sat on the mat the cat sat on a hat"])
    # best 2-gram: "the cat"/"cat sat" x2, chars 6 -> 12/32
    assert out.loc[0, "top_2gram_char_frac"] == round(12 / 32, 4)
    # best 3-gram "the cat sat" x2 chars 9 -> 18/32
    assert out.loc[0, "top_3gram_char_frac"] == round(18 / 32, 4)
    assert out.loc[0, "top_4gram_char_frac"] == round(22 / 32, 4)


def test_dup_5gram_coverage_union():
    # 6-word span repeated -> two overlapping dup 5-grams; coverage is
    # the union of words, not double-counted
    span = "alpha beta gamma delta eps zeta"
    out = _run([span + " filler1 filler2 " + span])
    chars_span = sum(len(w) for w in span.split())
    total = 2 * chars_span + len("filler1") + len("filler2")
    assert out.loc[0, "dup_5gram_char_frac"] == round(2 * chars_span / total, 4)


def test_empty_and_single_word():
    out = _run(["", "word"])
    assert (out["dup_5gram_char_frac"] == 0).all()
    assert (out["top_2gram_char_frac"] == 0).all()
    assert out.loc[0, "n_lines"] == 1


def test_no_cross_doc_leakage():
    # identical docs: n-grams repeat ACROSS docs but not within ->
    # all within-doc metrics stay 0 (this operator is per-document)
    out = _run(["q w e r t y u", "q w e r t y u"])
    assert (out["top_2gram_char_frac"] == 0).all()
    assert (out["dup_5gram_char_frac"] == 0).all()
