"""textstats/c4 page cleaning + curation.epoch_mix + vocab.bigram_topk."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from axosyslog_ray.curation import epoch_mix
from axosyslog_ray.textstats.c4 import c4_clean, c4_clean_batch, c4_line_mask
from axosyslog_ray.textstats.vocab import bigram_topk


class TestC4Clean:
    def test_line_rules(self):
        lines = pd.Series([
            "this line has enough words here.",     # keep
            "too short.",                            # < 5 words
            "no terminal punctuation at all here",   # no terminator
            "a javascript snippet lives right here.",  # javascript
            "please accept our cookie policy today ok.",  # blocklist
            'quoted line with five good words."',    # keep (quote)
            "does this line have enough words?",     # keep (?)
        ])
        mask = c4_line_mask(lines, min_words=5)
        assert mask.tolist() == [True, False, False, False, False, True, True]

    def test_page_rules(self):
        good = "\n".join(["one two three four five six."] * 3)
        batch = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": [
                good,                                  # kept, 3 lines
                good + "\nlorem ipsum is right here.",  # page dropped
                good + "\nvar x = { nope };",          # curly brace
                "one two three four five six.",        # only 1 line -> drop
            ],
        })
        out = c4_clean_batch(batch, min_words=5, min_lines=3)
        assert out.column("doc_id").to_pylist() == [1]
        assert out.column("n_lines_kept").to_pylist() == [3]
        assert out.column("clean_text").to_pylist() == [good]

    def test_lines_trimmed_and_order_preserved(self, ray_session):
        page = ("  first sentence with five words.  \n"
                "second sentence also has five words!\n"
                "third sentence has exactly five words?")
        ds = rd.from_items([{"doc_id": 7, "text": page}])
        out = c4_clean(ds, min_words=5, min_lines=3).to_pandas()
        assert out["clean_text"][0].split("\n") == [
            "first sentence with five words.",
            "second sentence also has five words!",
            "third sentence has exactly five words?",
        ]


class TestEpochMix:
    def _ds(self, n=200):
        return rd.from_pandas(pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "source": ["src0" if i % 2 == 0 else "srcX" for i in range(n)],
        }))

    @pytest.mark.parametrize("method", ["md5", "fast"])
    def test_whole_epochs_exact(self, ray_session, method):
        out = epoch_mix(self._ds(), {"src0": 2.0}, method=method).to_pandas()
        # every src0 doc exactly twice (epoch 0 and 1), srcX dropped
        assert set(out["source"]) == {"src0"}
        per = out.groupby("doc_id")["epoch"].agg(["count", "max"])
        assert (per["count"] == 2).all() and (per["max"] == 1).all()

    @pytest.mark.parametrize("method", ["md5", "fast"])
    def test_fractional_epoch_rate(self, ray_session, method):
        out = epoch_mix(self._ds(2000), {"src0": 1.5}, method=method).to_pandas()
        per = out.groupby("doc_id")["epoch"].count()
        frac = (per == 2).mean()
        assert (per >= 1).all() and (per <= 2).all()
        assert 0.35 < frac < 0.65  # ~0.5 deterministic keep rate

    def test_deterministic_across_partitioning(self, ray_session):
        a = epoch_mix(self._ds(), {"src0": 1.25}, method="fast") \
            .to_pandas().sort_values(["doc_id", "epoch"]).reset_index(drop=True)
        b = epoch_mix(self._ds().repartition(7), {"src0": 1.25}, method="fast") \
            .to_pandas().sort_values(["doc_id", "epoch"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestBigramTopk:
    def test_counts_and_ties(self, ray_session):
        ds = rd.from_items([
            {"text": "alpha beta alpha beta gamma"},
            {"text": "alpha beta. delta gamma"},   # punct splits tokens
            {"text": ""},
            {"text": "solo"},
        ])
        out = bigram_topk(ds, k=10).to_pandas()
        got = dict(zip(out["gram"], out["cnt"]))
        assert got["alpha beta"] == 3
        assert got["beta alpha"] == 1
        assert got["beta gamma"] == 1
        assert got["delta gamma"] == 1
        # no cross-document bigram ("gamma alpha" spans docs)
        assert "gamma alpha" not in got
        # ordering: count desc, gram asc
        assert out.iloc[0]["gram"] == "alpha beta"
        assert list(out["gram"][1:]) == sorted(out["gram"][1:])


class TestFleschScores:
    def test_known_text(self, ray_session):
        import ray.data as rd

        from axosyslog_ray.textstats.analysis import flesch_scores

        ds = rd.from_items([
            {"doc_id": 1, "text": "the cat sat. the dog ran!"},
            {"doc_id": 2, "text": ""},
        ])
        out = ds.map_batches(flesch_scores, batch_format="pyarrow") \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        r = out.iloc[0]
        # 6 words, 2 sentences ('.' then text; trailing '!' has none),
        # vowel groups: e,a,a,e,o,a = 6
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
        score = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
        assert r["flesch_micro"] == round(score * 1e6)
        assert out.iloc[1]["flesch_micro"] == 0
        assert out.iloc[1]["n_sentences"] == 0
