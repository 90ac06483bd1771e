"""From-spec byte-pair-encoding tokenizer for token accounting.

Public spec sources: Sennrich, Haddow & Birch 2016 ("Neural Machine
Translation of Rare Words with Subword Units" — the learn/apply merge
algorithm) and GPT-2's merges.txt format (one "a b" pair per line,
rank = line order). No reference analogue — axosyslog has no
tokenizer; this is the LLM-pipeline half of the brief: token budgets
and sequence packing should count what a training run consumes, not
whitespace runs.

Semantics (pinned, SQL-replayable):
- pre-tokenization is whitespace split (documented simplification vs
  GPT-2's regex — the accounting contract here, and what lets a DuckDB
  recursive CTE replay the exact same tokenization);
- a word starts as its character sequence; encoding repeatedly finds
  the LOWEST-RANK merge pair present and merges its non-overlapping
  occurrences left to right, until no listed pair remains (the standard
  apply-BPE loop).

Scale shape: encoding is per-word with heavy Zipf reuse, so the batch
kernel encodes each DISTINCT word once (np.unique + a per-actor cache
that persists across batches) and scatters counts back with
return_inverse — the per-batch Python loop is over NEW unique words
only, not rows. The merge table is small by contract (a vocab
artifact) and ships once per actor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def learn_bpe(word_freqs: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Sennrich-2016 learn: greedily merge the most frequent adjacent
    symbol pair `num_merges` times. Deterministic: ties break on the
    lexicographically smallest pair. Driver-side by design — training a
    vocab is a bounded artifact-production step, not a streaming one
    (run it on a sample; the APPLY side is the scale path)."""
    vocab = {tuple(w): int(f) for w, f in word_freqs.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and (syms[i], syms[i + 1]) == best):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


class BPETokenizer:
    """Apply-side BPE with a persistent per-instance word cache."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self._cache: dict[str, int] = {}  # word -> token count

    @classmethod
    def from_merges_file(cls, path: str) -> "BPETokenizer":
        """GPT-2 merges.txt format: '#'-comment/version lines skipped,
        one space-separated pair per line, rank = line order."""
        merges = []
        with open(path) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                a, sep, b = line.partition(" ")
                if sep:
                    merges.append((a, b))
        return cls(merges)

    def encode_word(self, word: str) -> list[str]:
        syms = list(word)
        while len(syms) > 1:
            best_rank, best_pair = None, None
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (syms[i], syms[i + 1])
            if best_pair is None:
                break
            out = []
            i = 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and (syms[i], syms[i + 1]) == best_pair):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def count_word(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(self.encode_word(word))
            self._cache[word] = n
        return n

    def count_tokens(self, texts: np.ndarray) -> np.ndarray:
        """Per-document BPE token counts over an object array of texts.
        One pandas split to a flat word table, np.unique so each
        distinct word encodes once (cached across batches), bincount
        scatter back."""
        from .tokens import flat_tokens

        flat, _lens, doc = flat_tokens(texts)
        if not len(flat):
            return np.zeros(len(texts), dtype=np.int64)
        uniq, inv = np.unique(flat, return_inverse=True)
        per_word = np.fromiter((self.count_word(w) for w in uniq),
                               dtype=np.int64, count=len(uniq))
        return np.bincount(doc, weights=per_word[inv],
                           minlength=len(texts)).astype(np.int64)


def bpe_token_counts(ds, merges: list[tuple[str, str]],
                     text_col: str = "text", id_col: str = "doc_id",
                     keep_cols: list[str] | None = None):
    """(keep_cols..., id_col, n_tokens_bpe) per document — map-only; the
    tokenizer (merge table + word cache) builds once per actor in
    __init__ and its cache warms across batches."""
    keep = list(keep_cols or [])

    class _Count:
        def __init__(self):
            self.tok = BPETokenizer(merges)

        def __call__(self, b: pa.Table) -> pa.Table:
            texts = b.column(text_col).to_pandas().to_numpy(dtype=object)
            n = self.tok.count_tokens(texts)
            cols = {c: b.column(c) for c in keep}
            cols[id_col] = b.column(id_col)
            cols["n_tokens_bpe"] = pa.array(n)
            return pa.table(cols)

    return ds.map_batches(_Count, batch_format="pyarrow",
                          concurrency=(1, 8))
