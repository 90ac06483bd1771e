"""stages/patternize: frequent-word log-template mining."""
import numpy as np
import pandas as pd
import ray.data as rd

from axosyslog_ray.stages.patternize import (WILDCARD, patternize,
                                             skeleton_series,
                                             word_doc_frequencies)


class TestSkeleton:
    def test_collapses_wildcard_runs(self):
        fr = frozenset({"svc", "login", "ok"})
        s = skeleton_series(pd.Series([
            "svc login u1 t9 ok",
            "svc login ok",
            "x y z",
        ]), fr)
        assert s.tolist() == [f"svc login {WILDCARD} ok",
                              "svc login ok",
                              WILDCARD]


class TestPatternize:
    def _logs(self):
        rows = []
        for i in range(100):
            rows.append({"message": f"svc login user u{i} ok"})
        for i in range(60):
            rows.append({"message": f"svc logout user u{i} bye"})
        for i in range(3):
            rows.append({"message": f"oddball {i} unique line"})
        return rd.from_items(rows).repartition(4)

    def test_clusters_and_supports(self, ray_session):
        out = patternize(self._logs(), support=30).to_pandas()
        got = dict(zip(out["pattern"], out["support"]))
        assert got[f"svc login user {WILDCARD} ok"] == 100
        assert got[f"svc logout user {WILDCARD} bye"] == 60
        # the oddballs collapse into all-wildcard skeletons, each rare
        assert all(v <= 3 for k, v in got.items() if k.startswith(WILDCARD))

    def test_word_df_counts_messages_not_occurrences(self, ray_session):
        ds = rd.from_items([{"message": "a a a b"}, {"message": "a c"}])
        df = word_doc_frequencies(ds).to_pandas()
        got = dict(zip(df["word"], df["df"]))
        assert got == {"a": 2, "b": 1, "c": 1}

    def test_partitioning_invariant(self, ray_session):
        a = patternize(self._logs(), support=30).to_pandas() \
            .sort_values("pattern").reset_index(drop=True)
        b = patternize(self._logs().repartition(9), support=30).to_pandas() \
            .sort_values("pattern").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestPdbtoolPatternize:
    def test_cli(self, tmp_path, capsys, ray_session):
        from axosyslog_ray.pdbtool import main
        f = tmp_path / "log.txt"
        f.write_text("\n".join(
            [f"conn from h{i} accepted" for i in range(20)]
            + [f"conn from h{i} dropped" for i in range(20)]) + "\n")
        rc = main(["patternize", "--support", "10", str(f)])
        assert rc == 0
        out = capsys.readouterr().out
        assert f"20\tconn from {WILDCARD} accepted" in out
        assert f"20\tconn from {WILDCARD} dropped" in out
