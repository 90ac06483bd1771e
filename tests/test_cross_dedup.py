"""Cross-corpus MinHash LSH dedup: planted-dup recall, clean-corpus
specificity, prior-band-index reuse, completeness."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from axosyslog_ray.dedup.minhash import (BandEmitter, MinHasher,
                                         minhash_cross_flags)


def _ds(df: pd.DataFrame, blocks: int = 3):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
             .repartition(blocks)


def _mk(rng, words, n, start, n_words=60):
    return pd.DataFrame({
        "doc_id": np.arange(start, start + n, dtype=np.int64),
        "text": [" ".join(rng.choice(words, n_words)) for _ in range(n)],
    })


@pytest.fixture()
def corpora():
    rng = np.random.default_rng(3)
    vocab = np.array([f"w{i}" for i in range(500)])
    prior = _mk(rng, vocab, 20, 0)
    fresh = _mk(rng, vocab, 20, 100)
    # plant: 5 new docs are verbatim copies of prior docs, 3 are
    # near-dups (one word changed)
    new = fresh.copy()
    new.loc[0:4, "text"] = prior.loc[0:4, "text"].to_numpy()
    for i in range(5, 8):
        toks = prior.loc[i, "text"].split()
        toks[10] = "CHANGED"
        new.loc[i, "text"] = " ".join(toks)
    return prior, new


def test_planted_dups_flagged(ray_session, corpora):
    prior, new = corpora
    out = minhash_cross_flags(_ds(new), _ds(prior)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 20                                # one row per NEW doc
    flagged = set(out.loc[out.dup_of_prior, "doc_id"])
    assert set(range(100, 105)) <= flagged               # verbatim copies
    assert set(range(105, 108)) <= flagged               # near-dups (J ~ 0.83)
    # independent random docs over a 500-word vocab are far below the
    # LSH curve's knee — none should be flagged
    assert flagged == set(range(100, 108))


def test_clean_corpora_unflagged(ray_session):
    rng = np.random.default_rng(9)
    a = _mk(rng, np.array([f"a{i}" for i in range(300)]), 15, 0)
    b = _mk(rng, np.array([f"b{i}" for i in range(300)]), 15, 100)  # disjoint vocab
    out = minhash_cross_flags(_ds(b), _ds(a)).to_pandas()
    assert len(out) == 15
    assert not out.dup_of_prior.any()
    assert (out.n_hit_buckets == 0).all()


def test_prior_band_index_reuse(ray_session, corpora):
    # production shape: the prior corpus's band index is persisted and
    # passed back in — results must be identical to re-hashing it
    prior, new = corpora
    mh = MinHasher()
    be = BandEmitter()
    prior_bands = _ds(prior).map_batches(mh, batch_format="pyarrow") \
                            .map_batches(be, batch_format="pyarrow")
    a = minhash_cross_flags(_ds(new), _ds(prior)).to_pandas().sort_values("doc_id")
    b = minhash_cross_flags(_ds(new), None, prior_bands=prior_bands) \
        .to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_partitioning_invariance(ray_session, corpora):
    prior, new = corpora
    a = minhash_cross_flags(_ds(new, blocks=1), _ds(prior, blocks=1)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = minhash_cross_flags(_ds(new, blocks=7), _ds(prior, blocks=5)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
