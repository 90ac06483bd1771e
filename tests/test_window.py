"""Window operators: per-group top-k, budget-capped selection, quantiles.

Semantics are pinned against DuckDB's window functions over the same
frame — the operators' whole design goal is SQL-window equivalence on a
coarse-bucket shuffle.
"""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.window import (budget_capped_select, group_quantiles,
                                  topk_per_group)


def _ds(df: pd.DataFrame, blocks: int = 4):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
             .repartition(blocks)


@pytest.fixture()
def frame():
    rng = np.random.default_rng(7)
    n = 500
    return pd.DataFrame({
        "k": rng.choice(list("abcde"), n),
        "v": rng.integers(0, 100, n),
        "id": np.arange(n, dtype=np.int64),
    })


def test_topk_matches_sql(ray_session, frame):
    got = topk_per_group(_ds(frame), "k", "v", k=4, descending=True,
                         tie_cols="id").to_pandas()
    got = got.sort_values(["k", "rk"]).reset_index(drop=True)
    want = duckdb.sql("""
        SELECT k, v, id, CAST(row_number() OVER (PARTITION BY k ORDER BY v DESC, id) AS BIGINT) AS rk
        FROM frame QUALIFY rk <= 4 ORDER BY k, rk
    """).df()
    pd.testing.assert_frame_equal(
        got[["k", "v", "id", "rk"]].astype({"v": "int64", "id": "int64"}),
        want.astype({"v": "int64", "id": "int64"}))


def test_topk_ascending(ray_session, frame):
    got = topk_per_group(_ds(frame), "k", "v", k=2, descending=False,
                         tie_cols="id").to_pandas()
    want = duckdb.sql("""
        SELECT k, v, id FROM frame
        QUALIFY row_number() OVER (PARTITION BY k ORDER BY v, id) <= 2
        ORDER BY k, v, id
    """).df()
    got = got.sort_values(["k", "v", "id"]).reset_index(drop=True)
    assert got[["k", "v", "id"]].astype({"v": "int64"}).equals(
        want.astype({"v": "int64"}))


def test_topk_k_larger_than_group(ray_session):
    df = pd.DataFrame({"k": ["x", "x", "y"], "v": [1, 2, 3],
                       "id": [0, 1, 2]})
    got = topk_per_group(_ds(df, blocks=2), "k", "v", k=10,
                         tie_cols="id").to_pandas()
    assert len(got) == 3  # every row survives, ranks dense per group
    assert set(got.loc[got.k == "x", "rk"]) == {1, 2}


def test_budget_capped_matches_sql(ray_session, frame):
    got = budget_capped_select(_ds(frame), "k", "v", budget=300,
                               order_col="id", cum_col="cum").to_pandas()
    got = got.sort_values(["k", "id"]).reset_index(drop=True)
    want = duckdb.sql("""
        WITH c AS (
          SELECT k, v, id, sum(v) OVER (PARTITION BY k ORDER BY id
                                        ROWS UNBOUNDED PRECEDING) AS cum
          FROM frame)
        SELECT k, v, id, CAST(cum AS BIGINT) AS cum FROM c
        WHERE cum <= 300 ORDER BY k, id
    """).df()
    pd.testing.assert_frame_equal(
        got[["k", "v", "id", "cum"]].astype({"v": "int64", "cum": "int64"}),
        want.astype({"v": "int64"}))


def test_budget_local_prune_is_safe(ray_session):
    # rows of one key scattered across blocks: local pruning must not
    # drop a row that is within budget globally (prefix-bound property)
    df = pd.DataFrame({"k": ["a"] * 10, "v": [1] * 10,
                       "id": np.arange(10, dtype=np.int64)})
    got = budget_capped_select(_ds(df, blocks=5), "k", "v", budget=7,
                               order_col="id").to_pandas()
    assert sorted(got["id"]) == list(range(7))
    assert list(got.sort_values("id")["cum_weight"]) == list(range(1, 8))


def test_budget_rejects_negative_weights(ray_session):
    df = pd.DataFrame({"k": ["a", "a"], "v": [3, -1],
                       "id": np.arange(2, dtype=np.int64)})
    with pytest.raises(Exception, match="nonnegative"):
        budget_capped_select(_ds(df), "k", "v", budget=5,
                             order_col="id").to_pandas()


def test_budget_sentinel_keeps_dtypes(ray_session):
    # sentinel-bearing blocks must NOT widen int64 columns to float
    # (cross-block schema drift): extra int column survives pruning
    # with its dtype intact
    df = pd.DataFrame({"k": ["a"] * 8, "v": [3] * 8,
                       "id": np.arange(8, dtype=np.int64),
                       "extra": np.arange(8, dtype=np.int64) * 10})
    out = budget_capped_select(_ds(df, blocks=4), "k", "v", budget=6,
                               order_col="id").to_pandas()
    assert out["extra"].dtype == np.int64
    assert sorted(out["id"]) == [0, 1]


def test_budget_dropped_tail_still_counts(ray_session):
    # regression: batch 1 holds heavy early rows (locally pruned), batch
    # 2 holds light later rows — the pruned tail's weight must still
    # count toward the later rows' prefix (sentinel row), else they
    # sneak under budget
    import ray.data as rd

    heavy = pa.table({"k": ["a"] * 6, "v": [2.0] * 6,
                      "id": np.arange(6, dtype=np.int64)})
    light = pa.table({"k": ["a", "a"], "v": [0.5, 0.5],
                      "id": np.array([6, 7], dtype=np.int64)})
    ds = rd.from_arrow(heavy).union(rd.from_arrow(light))
    got = budget_capped_select(ds, "k", "v", budget=7.0, order_col="id").to_pandas()
    # true prefix: 2,4,6,8,... -> only ids 0,1,2 (cum 6); ids 6,7 have
    # true prefix 12.5,13 and must NOT appear
    assert sorted(got["id"]) == [0, 1, 2]


def test_budget_requires_order_col(ray_session, frame):
    with pytest.raises(ValueError):
        budget_capped_select(_ds(frame), "k", "v", budget=10)


def test_group_quantiles_matches_duckdb(ray_session, frame):
    vals = frame.assign(v=frame.v.astype(float) + 0.25)
    got = group_quantiles(_ds(vals), "k", "v",
                          {"p50": 0.5, "p95": 0.95}).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    want = duckdb.sql("""
        SELECT k, round(quantile_cont(v, 0.5), 4) AS p50,
               round(quantile_cont(v, 0.95), 4) AS p95
        FROM vals GROUP BY k ORDER BY k
    """).df()
    pd.testing.assert_frame_equal(got[["k", "p50", "p95"]], want)


def test_group_quantiles_null_handling(ray_session):
    df = pd.DataFrame({"k": ["a", "a", "a", "b", "b"],
                       "v": [1.0, None, 3.0, None, None]})
    got = group_quantiles(_ds(df, blocks=2), "k", "v", {"p50": 0.5}).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    assert got.loc[0, "p50"] == 2.0      # nulls dropped within key
    assert np.isnan(got.loc[1, "p50"])   # all-null key -> null quantile


# ---------------------------------------------------------------------------
# randomized property checks vs a pure-pandas oracle
# ---------------------------------------------------------------------------

def _pandas_topk(df, k, descending=True):
    s = df.sort_values(["k", "v", "id"],
                       ascending=[True, not descending, True], kind="mergesort")
    rk = s.groupby("k", sort=False).cumcount() + 1
    out = s[rk <= k].copy()
    out["rk"] = rk[rk <= k].astype("int64")
    return out.reset_index(drop=True)


def _pandas_budget(df, budget):
    s = df.sort_values(["k", "id"], kind="mergesort")
    cum = s.groupby("k", sort=False)["v"].cumsum()
    out = s[cum <= budget].copy()
    out["cum_weight"] = cum[cum <= budget]
    return out.reset_index(drop=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_topk_random_frames(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    df = pd.DataFrame({
        "k": rng.choice([f"g{i}" for i in range(int(rng.integers(1, 12)))], n),
        "v": rng.integers(-50, 50, n),
        "id": rng.permutation(n).astype(np.int64),
    })
    k = int(rng.integers(1, 6))
    got = topk_per_group(_ds(df, blocks=int(rng.integers(1, 6))), "k", "v",
                         k=k, tie_cols="id").to_pandas()
    got = got.sort_values(["k", "rk"]).reset_index(drop=True)
    want = _pandas_topk(df, k).sort_values(["k", "rk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "v", "id", "rk"]].astype({"v": "int64"}),
        want[["k", "v", "id", "rk"]].astype({"v": "int64"}))


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_budget_random_frames(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    df = pd.DataFrame({
        "k": rng.choice([f"g{i}" for i in range(int(rng.integers(1, 10)))], n),
        "v": rng.integers(1, 20, n),
        "id": rng.permutation(n).astype(np.int64),
    })
    budget = float(rng.integers(5, 120))
    got = budget_capped_select(_ds(df, blocks=int(rng.integers(1, 6))),
                               "k", "v", budget=budget, order_col="id").to_pandas()
    got = got.sort_values(["k", "id"]).reset_index(drop=True)
    want = _pandas_budget(df, budget)
    pd.testing.assert_frame_equal(
        got[["k", "v", "id", "cum_weight"]].astype({"v": "int64", "cum_weight": "int64"}),
        want[["k", "v", "id", "cum_weight"]].astype({"v": "int64", "cum_weight": "int64"}))


def test_window_ops_empty_group_result(ray_session):
    # budget smaller than every row's weight -> empty result, no crash
    df = pd.DataFrame({"k": ["a", "b"], "v": [5, 6],
                       "id": np.array([0, 1], dtype=np.int64)})
    got = budget_capped_select(_ds(df, blocks=2), "k", "v", budget=1,
                               order_col="id").to_pandas()
    assert len(got) == 0


def test_iqr_outliers_matches_sql(ray_session, frame):
    from axosyslog_ray.window import iqr_outliers

    vals = frame.assign(v=frame.v.astype(float))
    # plant spikes so each key actually has Tukey outliers
    vals.loc[vals.index[:10], "v"] = 5000.0 + np.arange(10)
    got = iqr_outliers(_ds(vals), "k", "v", k=1.5).to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    want = duckdb.sql("""
        WITH q AS (SELECT k, quantile_cont(v, 0.25) q1, quantile_cont(v, 0.75) q3
                   FROM vals GROUP BY k)
        SELECT vals.k, vals.v, vals.id FROM vals JOIN q USING (k)
        WHERE vals.v > q.q3 + 1.5 * (q.q3 - q.q1) ORDER BY id
    """).df()
    assert list(got["id"]) == list(want["id"])


def test_iqr_outliers_null_and_unknown_keys(ray_session):
    from axosyslog_ray.window import iqr_outliers

    df = pd.DataFrame({"k": ["a"] * 8, "v": [1.0, 1, 1, 1, 1, 1, None, 100.0],
                       "id": np.arange(8, dtype=np.int64)})
    got = iqr_outliers(_ds(df, blocks=2), "k", "v").to_pandas()
    assert list(got["id"]) == [7]   # the spike; null row never passes


def test_with_lag_matches_sql(ray_session, frame):
    from axosyslog_ray.window import with_lag

    got = with_lag(_ds(frame), "k", ["id"], ["v"]).to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    want = duckdb.sql("""
        SELECT k, v, id, lag(v) OVER (PARTITION BY k ORDER BY id) AS v_lag
        FROM frame ORDER BY id
    """).df()
    assert len(got) == len(want)
    a = got["v_lag"].to_numpy(dtype=float)
    b = want["v_lag"].to_numpy(dtype=float)
    assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()


def test_with_lag_first_row_null_per_key(ray_session):
    from axosyslog_ray.window import with_lag

    df = pd.DataFrame({"k": ["a", "a", "b"], "id": [1, 2, 3],
                       "v": [10.0, 20.0, 30.0]})
    got = with_lag(_ds(df, blocks=2), "k", "id", "v").to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    assert np.isnan(got.loc[0, "v_lag"]) and got.loc[1, "v_lag"] == 10.0
    assert np.isnan(got.loc[2, "v_lag"])  # first of key b


def test_with_lead_negative_periods(ray_session):
    from axosyslog_ray.window import with_lag

    df = pd.DataFrame({"k": ["a", "a", "a"], "id": [1, 2, 3],
                       "v": [10.0, 20.0, 30.0]})
    got = with_lag(_ds(df, blocks=2), "k", "id", "v", suffix="_lead",
                   periods=-1).to_pandas().sort_values("id").reset_index(drop=True)
    assert got.loc[0, "v_lead"] == 20.0 and got.loc[1, "v_lead"] == 30.0
    assert np.isnan(got.loc[2, "v_lead"])


def test_group_quantile_sketch_exact_when_k_covers(ray_session):
    from axosyslog_ray.window import group_quantile_sketch, group_quantiles

    rng = np.random.default_rng(17)
    df = pd.DataFrame({"id": np.arange(600, dtype=np.int64),
                       "k": np.repeat(["a", "b", "c"], 200),
                       "v": rng.normal(50, 20, 600)})
    exact = group_quantiles(_ds(df), "k", "v", {"p50": 0.5, "p90": 0.9}) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    sk = group_quantile_sketch(_ds(df), "k", "v", {"p50": 0.5, "p90": 0.9},
                               id_col="id", sample_k=500) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(exact, sk)


def test_group_quantile_sketch_partitioning_invariant(ray_session):
    from axosyslog_ray.window import group_quantile_sketch

    rng = np.random.default_rng(19)
    df = pd.DataFrame({"id": np.arange(3000, dtype=np.int64),
                       "k": rng.choice(["x", "y"], 3000),
                       "v": rng.exponential(30, 3000)})

    def run(blocks):
        return group_quantile_sketch(_ds(df, blocks=blocks), "k", "v",
                                     {"p50": 0.5}, id_col="id",
                                     sample_k=128).to_pandas() \
            .sort_values("k").reset_index(drop=True)

    a, b = run(3), run(11)
    pd.testing.assert_frame_equal(a, b)
    # approximate but sane: within 25% of the true median at k=128
    true = df.groupby("k")["v"].median()
    for _, row in a.iterrows():
        assert abs(row.p50 - true[row.k]) / true[row.k] < 0.25


class TestGroupRunningSum:
    def test_restarts_per_key_and_handles_negatives(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from axosyslog_ray.window import group_running_sum

        df = pd.DataFrame({
            "k": ["a", "a", "a", "b", "b"],
            "o": [1, 2, 3, 1, 2],
            "v": [5, -3, 10, 7, 7],
        })
        out = group_running_sum(rd.from_pandas(df).repartition(3),
                                "k", "o", "v", alias="rs").to_pandas() \
            .sort_values(["k", "o"]).reset_index(drop=True)
        assert out["rs"].tolist() == [5, 2, 12, 7, 14]

    def test_matches_duckdb_window(self, ray_session):
        import duckdb
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from axosyslog_ray.window import group_running_sum

        rng = np.random.RandomState(5)
        df = pd.DataFrame({
            "k": rng.randint(0, 7, 300),
            "o": np.arange(300),
            "v": rng.randint(-50, 50, 300).astype(np.int64),
        })
        got = group_running_sum(rd.from_pandas(df).repartition(6),
                                "k", "o", "v").to_pandas() \
            .sort_values("o").reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT k, o, v, sum(v) OVER (PARTITION BY k ORDER BY o "
            "ROWS UNBOUNDED PRECEDING) rs FROM t ORDER BY o").df()
        assert got["running_sum"].astype("int64").tolist() == \
            want["rs"].astype("int64").tolist()


class TestGlobalTopK:
    """global_topk: the bounded-state tree aggregate replacing
    ds.sort().limit(k) — pinned against DuckDB ORDER BY ... LIMIT."""

    def test_matches_sql_order_by_limit(self):
        rng = np.random.default_rng(11)
        df = pd.DataFrame({"id": np.arange(2000),
                           "v": rng.integers(0, 500, 2000)})
        from axosyslog_ray.window import global_topk
        got = global_topk(_ds(df, blocks=8), ["v", "id"], 15,
                          descending=[True, False])
        want = duckdb.sql(
            "SELECT * FROM df ORDER BY v DESC, id LIMIT 15").df()
        pd.testing.assert_frame_equal(got[["id", "v"]], want[["id", "v"]])

    def test_k_larger_than_input(self):
        df = pd.DataFrame({"id": [3, 1, 2], "v": [30, 10, 20]})
        from axosyslog_ray.window import global_topk
        got = global_topk(_ds(df, blocks=2), "v", 100, descending=False)
        assert got["v"].tolist() == [10, 20, 30]

    def test_no_sort_exchange_in_plan(self):
        # the whole point: the plan must not contain an AllToAll sort
        df = pd.DataFrame({"id": np.arange(100), "v": np.arange(100)})
        ds = _ds(df, blocks=4)
        from axosyslog_ray.window import global_topk
        global_topk(ds, ["v", "id"], 5)
        assert "Sort" not in ds.stats()
