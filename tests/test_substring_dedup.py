"""substring_dedup: ExactSubstr removal semantics (Lee et al. ACL 2022)."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from axosyslog_ray.dedup.substring import substring_dedup


def _words(rng, n, lo=0, hi=5000):
    return " ".join(f"w{int(x)}" for x in rng.integers(lo, hi, n))


def _run(rows, k=10, **kw):
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    out = substring_dedup(ds, k=k, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_planted_shared_span_removed_from_both(ray_session):
    rng = np.random.default_rng(7)
    span = _words(rng, 15, 9000, 9100)  # 15 shared words -> 6 dup windows
    rows = [
        {"doc_id": 0, "text": _words(rng, 30) + " " + span + " " + _words(rng, 30)},
        {"doc_id": 1, "text": span + " " + _words(rng, 40)},
        {"doc_id": 2, "text": _words(rng, 50)},
    ]
    out = _run(rows, k=10)
    assert len(out) == 3
    # the 15 shared words vanish from BOTH copies (ExactSubstr removes
    # every occurrence, not n-1 of them)
    r = out.set_index("doc_id")
    assert r.loc[0, "n_removed"] == 15
    assert r.loc[1, "n_removed"] == 15
    assert r.loc[2, "n_removed"] == 0
    assert not any(w.startswith("w90") for w in r.loc[0, "text_clean"].split())
    assert not any(w.startswith("w90") for w in r.loc[1, "text_clean"].split())
    assert r.loc[2, "text_clean"] == rows[2]["text"]


def test_self_repeat_counts_as_duplicate(ray_session):
    rng = np.random.default_rng(3)
    span = _words(rng, 12, 8000, 8050)
    rows = [
        {"doc_id": 0, "text": span + " " + _words(rng, 25) + " " + span},
        {"doc_id": 1, "text": _words(rng, 40)},
    ]
    out = _run(rows, k=10).set_index("doc_id")
    assert out.loc[0, "n_removed"] == 24  # both copies of the span
    assert out.loc[1, "n_removed"] == 0


def test_short_docs_and_empty_pass_through(ray_session):
    rows = [
        {"doc_id": 0, "text": "only three words"},
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "only three words"},  # 3 < k: no window
    ]
    out = _run(rows, k=10).set_index("doc_id")
    assert (out["n_removed"] == 0).all()
    assert out.loc[0, "text_clean"] == "only three words"
    assert out.loc[1, "text_clean"] == ""
    assert out.loc[1, "n_words"] == 0


def test_verify_false_matches_verified_on_clean_data(ray_session):
    rng = np.random.default_rng(5)
    span = _words(rng, 20, 9500, 9550)
    rows = [{"doc_id": i, "text": _words(rng, 40)} for i in range(8)]
    rows[2]["text"] += " " + span
    rows[6]["text"] = span + " " + rows[6]["text"]
    exact = _run(rows, k=10, verify=True)
    fast = _run(rows, k=10, verify=False)
    pd.testing.assert_frame_equal(exact, fast)


def test_coverage_union_of_overlapping_windows(ray_session):
    # 11 shared words with k=10 -> two overlapping dup windows; removal
    # is the union (11 words), not 2*k
    rng = np.random.default_rng(9)
    span = _words(rng, 11, 9990, 9999)
    rows = [
        {"doc_id": 0, "text": span + " " + _words(rng, 30)},
        {"doc_id": 1, "text": _words(rng, 30) + " " + span},
    ]
    out = _run(rows, k=10).set_index("doc_id")
    assert out.loc[0, "n_removed"] == 11
    assert out.loc[1, "n_removed"] == 11


def test_broadcast_and_cogroup_paths_agree(ray_session):
    import ray.data as rd

    from axosyslog_ray.dedup.substring import substring_dedup

    rows = []
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    for i in range(30):
        rows.append({"doc_id": i,
                     "text": f"unique lead {i} " + (dup if i % 3 == 0 else
                                                    f"own words {i} " * 5)})
    df = pd.DataFrame(rows)
    a = substring_dedup(rd.from_pandas(df).repartition(4), k=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = substring_dedup(rd.from_pandas(df).repartition(4), k=5,
                        broadcast_limit=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a.loc[a.doc_id % 3 == 0, "n_removed"] > 0).all()
