"""Corpus-wide duplicate-passage removal (CCNet-paragraph /
exact-substring-dedup shape, at chunk granularity).

Documents are split into fixed-size non-overlapping token chunks
(curation.chunk_documents), and each distinct chunk text survives ONLY
at its globally-first occurrence (smallest (doc_id, chunk_id)) — the
standard step that strips boilerplate paragraphs repeated across a web
corpus (headers, licenses, navigation) before training.

Scale shape: the explode is map-only; the dedup is ONE coarse-bucket
shuffle on the chunk text (hash(text) % B co-locates copies; a bucket
holds many distinct chunks, group sizes stay bounded) and a vectorized
first-of-segment mask per bucket. Chunk text never returns to the
driver — the output is (doc_id, chunk_id, n_tokens) keeps.
"""

from __future__ import annotations

import pandas as pd

from ..curation import chunk_documents
from ..shuffle import bucketed_map_groups, key_segments


def dedup_chunks(ds, chunk_tokens: int = 20, text_col: str = "text",
                 id_col: str = "doc_id", num_buckets: int | None = None):
    """Keep the globally-first occurrence of every distinct chunk.

    Returns a Dataset of (id_col, chunk_id, n_tokens) for surviving
    chunks. Deterministic: first = smallest (id, chunk_id) per text."""
    chunks = chunk_documents(ds, max_tokens=chunk_tokens, overlap=0,
                             text_col=text_col, id_col=id_col)

    def first_per_text(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([text_col, id_col, "chunk_id"], kind="mergesort")
        first = key_segments(g, [text_col])
        return g.loc[first, [id_col, "chunk_id", "n_tokens"]]

    return bucketed_map_groups(chunks, text_col, first_per_text,
                               num_buckets=num_buckets)
