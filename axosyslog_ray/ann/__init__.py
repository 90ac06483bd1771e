"""Similarity search over embedding columns (list<float>).

Brute-force cosine top-k as the exact baseline (numpy matmul per batch
against a broadcast query matrix) and an LSH-bucketed variant as the
scale path. Also embedding-cosine near-duplicate pairing.
"""

from .brute import CosineTopK, ann_topk, near_dup_pairs  # noqa: F401
from .lsh import lsh_ann_topk  # noqa: F401
from .ivf import ivf_ann_topk, train_centroids  # noqa: F401
from .pq import pq_ann_topk, train_pq, encode_pq  # noqa: F401
