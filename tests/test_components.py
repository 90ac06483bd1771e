"""connected_components: true fixpoint clusters over candidate-pair graphs."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from axosyslog_ray.dedup.components import connected_components


def _cc(edges_df, **kw):
    ds = rd.from_pandas(edges_df)
    out = connected_components(ds, **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
class TestConnectedComponents:
    def test_chain_collapses_to_one_component(self):
        # A~B, B~C, C~D: one round of min-label (the minhash approximation)
        # would give D label C's min, not the global min — the fixpoint must
        e = pd.DataFrame({"id_a": [1, 2, 3], "id_b": [2, 3, 4]})
        out = _cc(e)
        assert list(out["node"]) == [1, 2, 3, 4]
        assert list(out["component"]) == [1, 1, 1, 1]

    def test_two_components(self):
        e = pd.DataFrame({"id_a": [10, 11, 50], "id_b": [11, 12, 51]})
        out = _cc(e)
        assert dict(zip(out["node"], out["component"])) == {
            10: 10, 11: 10, 12: 10, 50: 50, 51: 50}

    def test_long_path_needs_iterations_distributed(self):
        # path 0-1-2-...-9: diameter 9, converges only by iterating;
        # also exercises duplicate edges + self-loops (absorbed by min).
        # driver_threshold=0 forces the DISTRIBUTED loop (the default
        # driver fast path is covered by the other tests)
        n = 10
        e = pd.DataFrame({
            "id_a": list(range(n - 1)) + [5, 7],
            "id_b": list(range(1, n)) + [5, 6],
        })
        out = _cc(e, driver_threshold=0)
        assert len(out) == n
        assert set(out["component"]) == {0}

    def test_reversed_edge_direction_is_irrelevant(self):
        out_fwd = _cc(pd.DataFrame({"id_a": [3], "id_b": [9]}))
        out_rev = _cc(pd.DataFrame({"id_a": [9], "id_b": [3]}))
        pd.testing.assert_frame_equal(out_fwd, out_rev)

    def test_empty_edges(self):
        e = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64")})
        ds = connected_components(rd.from_pandas(e))
        assert ds.count() == 0
        # Ray's to_pandas drops columns on 0-row datasets; the Dataset
        # schema is the contract
        assert ds.schema().names == ["node", "component"]

    def test_max_iters_raises_instead_of_wrong_answer(self):
        e = pd.DataFrame({"id_a": range(0, 30), "id_b": range(1, 31)})
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(rd.from_pandas(e), max_iters=2,
                                 driver_threshold=0).to_pandas()

    def test_random_graph_matches_networkx_free_oracle(self):
        # pure-python union-find oracle (no external dep)
        rng = np.random.default_rng(7)
        a = rng.integers(0, 60, 80)
        b = rng.integers(0, 60, 80)
        e = pd.DataFrame({"id_a": a, "id_b": b})

        parent = list(range(61))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a.tolist(), b.tolist()):
            parent[find(x)] = find(y)
        touched = sorted(set(a.tolist()) | set(b.tolist()))
        want = {v: min(u for u in touched if find(u) == find(v)) for v in touched}

        out = _cc(e)
        assert dict(zip(out["node"], out["component"])) == want

    def test_driver_and_distributed_paths_agree(self):
        rng = np.random.default_rng(3)
        e = pd.DataFrame({"id_a": rng.integers(0, 40, 50),
                          "id_b": rng.integers(0, 40, 50)})
        fast = _cc(e)
        slow = _cc(e, driver_threshold=0)
        pd.testing.assert_frame_equal(fast, slow)


class TestDedupKeepBest:
    def test_keeps_best_per_cluster_and_singletons(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from axosyslog_ray.dedup.components import dedup_keep_best

        # clusters: {1,2,3} (chain), {5,6}; singletons: 9
        pairs = rd.from_items([
            {"id_a": 1, "id_b": 2}, {"id_a": 2, "id_b": 3},
            {"id_a": 5, "id_b": 6},
        ])
        docs = rd.from_pandas(pd.DataFrame({
            "doc_id": [1, 2, 3, 5, 6, 9],
            "n_chars": [10, 30, 30, 7, 7, 1],
        }))
        out = dedup_keep_best(docs, pairs).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # cluster {1,2,3}: max n_chars tie 2 vs 3 -> smallest id (2)
        # cluster {5,6}: tie -> 5; singleton 9 survives
        assert out["doc_id"].tolist() == [2, 5, 9]
        assert out["n_chars"].tolist() == [30, 7, 1]

    def test_partitioning_invariant(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from axosyslog_ray.dedup.components import dedup_keep_best

        rng = np.random.RandomState(2)
        pairs = pd.DataFrame({
            "id_a": rng.randint(0, 50, 40),
            "id_b": rng.randint(0, 50, 40),
        })
        pairs = pairs[pairs.id_a != pairs.id_b]
        docs = pd.DataFrame({"doc_id": np.arange(80),
                             "n_chars": rng.randint(1, 100, 80)})
        a = dedup_keep_best(rd.from_pandas(docs),
                            rd.from_pandas(pairs)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = dedup_keep_best(rd.from_pandas(docs).repartition(7),
                            rd.from_pandas(pairs).repartition(5)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
