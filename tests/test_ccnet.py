"""window.group_quantile_disc + dsir.ccnet_buckets."""
import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from axosyslog_ray.dsir import ccnet_buckets
from axosyslog_ray.window import group_quantile_disc


class TestGroupQuantileDisc:
    def test_matches_duckdb_quantile_disc(self, ray_session):
        rng = np.random.RandomState(7)
        df = pd.DataFrame({
            "k": rng.choice(list("abcde"), 500),
            "v": rng.randint(-50, 50, 500).astype(np.int64),
        })
        got = group_quantile_disc(rd.from_pandas(df).repartition(5), "k", "v",
                                  {"q1": 1.0 / 3, "q2": 2.0 / 3, "p50": 0.5}) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT k, quantile_disc(v, 1.0/3) q1, quantile_disc(v, 2.0/3) q2,"
            " quantile_disc(v, 0.5) p50 FROM t GROUP BY k ORDER BY k").df()
        for c in ("q1", "q2", "p50"):
            assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist()

    def test_singleton_and_small_groups(self, ray_session):
        df = pd.DataFrame({"k": ["a", "b", "b", "c", "c", "c"],
                           "v": [9, 1, 2, 10, 20, 30]})
        got = group_quantile_disc(rd.from_pandas(df), "k", "v",
                                  {"q1": 1.0 / 3, "q2": 2.0 / 3}) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        # n=1: both thirds are the single value; n=2: ceil(2/3)=1 -> v1,
        # ceil(4/3)=2 -> v2; n=3: 1st and 2nd order statistics
        assert got["q1"].astype(int).tolist() == [9, 1, 10]
        assert got["q2"].astype(int).tolist() == [9, 2, 20]


class TestCcnetBuckets:
    def _docs(self, n=300):
        rng = np.random.RandomState(3)
        words = np.array(["alpha", "beta", "gamma", "delta", "rare1",
                          "rare2", "rare3", "zz9"], dtype=object)
        texts = [" ".join(rng.choice(words[:4 if i % 3 else 8],
                                     size=10 + i % 7))
                 for i in range(n)]
        return pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": np.where(np.arange(n) % 2 == 0, "en", "de"),
        })

    def test_tertiles_roughly_balanced_per_lang(self, ray_session):
        out = ccnet_buckets(rd.from_pandas(self._docs()).repartition(4),
                            method="fast").to_pandas()
        for lang, g in out.groupby("lang"):
            frac = g["bucket"].value_counts(normalize=True)
            for b in ("head", "middle", "tail"):
                assert 0.15 < frac.get(b, 0.0) < 0.55, (lang, dict(frac))

    def test_head_has_lowest_scores(self, ray_session):
        out = ccnet_buckets(rd.from_pandas(self._docs()),
                            method="fast").to_pandas()
        for lang, g in out.groupby("lang"):
            assert g.loc[g.bucket == "head", "score_micro"].max() <= \
                g.loc[g.bucket == "middle", "score_micro"].min()
            assert g.loc[g.bucket == "middle", "score_micro"].max() <= \
                g.loc[g.bucket == "tail", "score_micro"].min()

    def test_partitioning_invariant(self, ray_session):
        a = ccnet_buckets(rd.from_pandas(self._docs()), method="fast") \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = ccnet_buckets(rd.from_pandas(self._docs()).repartition(9),
                          method="fast") \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
