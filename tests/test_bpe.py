"""textstats/bpe: from-spec BPE learn/apply + token accounting."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from axosyslog_ray.textstats.bpe import (BPETokenizer, bpe_token_counts,
                                         learn_bpe)

MERGES = [("e", "r"), ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
          ("an", "d"), ("e", "s"), ("s", "t"), ("in", "g"), ("e", "d")]


class TestEncode:
    def test_golden_pins(self):
        tok = BPETokenizer(MERGES)
        # pinned against the DuckDB recursive-CTE replay (same table)
        assert tok.encode_word("the") == ["the"]
        assert tok.encode_word("thermal") == ["th", "er", "m", "a", "l"]
        assert tok.encode_word("standing") == ["st", "and", "ing"]
        assert tok.encode_word("anand") == ["an", "and"]
        assert tok.encode_word("x") == ["x"]
        assert tok.encode_word("") == []

    def test_lowest_rank_wins_over_leftmost(self):
        # "ath": pairs (a,t) unlisted, (t,h) rank 1 -> merge th first,
        # then nothing: a + th
        tok = BPETokenizer(MERGES)
        assert tok.encode_word("ath") == ["a", "th"]
        # "esth": (e,s) rank 6 vs (t,h) rank 1 -> th merges first
        assert tok.encode_word("esth") == ["es", "th"]

    def test_merge_all_occurrences_left_to_right(self):
        tok = BPETokenizer([("a", "a")])
        assert tok.encode_word("aaaa") == ["aa", "aa"]
        assert tok.encode_word("aaa") == ["aa", "a"]

    def test_count_tokens_vectorized(self):
        tok = BPETokenizer(MERGES)
        texts = np.array(["the thermal", "", "standing the the", None],
                         dtype=object)
        n = tok.count_tokens(texts)
        assert list(n) == [1 + 5, 0, 3 + 1 + 1, 0]
        # cache warmed: distinct words encoded once
        assert set(tok._cache) >= {"the", "thermal", "standing"}


class TestLearn:
    def test_learn_recovers_frequent_pairs(self):
        freqs = {"the": 100, "then": 40, "rat": 5}
        merges = learn_bpe(freqs, 2)
        assert merges[0] == ("h", "e")   # 140 occurrences, lexicographic tiebreak vs (t,h)
        assert merges[1] == ("t", "he")  # 140 occurrences
        tok = BPETokenizer(merges)
        assert tok.encode_word("the") == ["the"]
        assert tok.encode_word("then") == ["the", "n"]

    def test_learn_deterministic_tiebreak(self):
        # equal counts -> lexicographically smallest pair wins
        freqs = {"ab": 3, "cd": 3}
        assert learn_bpe(freqs, 1)[0] == ("a", "b")


class TestMergesFile:
    def test_gpt2_merges_format(self, tmp_path):
        p = tmp_path / "merges.txt"
        p.write_text("#version: 0.2\nt h\nth e\n\n")
        tok = BPETokenizer.from_merges_file(str(p))
        assert tok.encode_word("the") == ["the"]


class TestDataset:
    def test_bpe_token_counts_and_budget_wiring(self, ray_session):
        df = pd.DataFrame({
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["the thermal", "standing", "", "the the the"],
        })
        ds = rd.from_pandas(df).repartition(2)
        out = bpe_token_counts(ds, MERGES).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(out["n_tokens_bpe"]) == [6, 3, 0, 3]
        # token_counts(bpe_merges=) routes through the same kernel
        from axosyslog_ray.curation import token_counts
        out2 = token_counts(ds, bpe_merges=MERGES).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(out2.columns) == ["doc_id", "n_tokens"]
        assert list(out2["n_tokens"]) == [6, 3, 0, 3]

    def test_pack_sequences_with_bpe(self, ray_session):
        from axosyslog_ray.curation import pack_sequences
        df = pd.DataFrame({
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["the thermal", "standing", "the"],  # 6, 3, 1 tokens
        })
        out = pack_sequences(rd.from_pandas(df), window=6,
                             bpe_merges=MERGES).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # start offsets 0, 6, 9 -> bins 0, 1, 1
        assert list(out["seq_bin"]) == [0, 1, 1]
