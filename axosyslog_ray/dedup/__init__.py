"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-partition + per-group first), MinHash+LSH, SimHash, n-gram
Jaccard verification, and embedding-cosine near-dup. All are built on
the same scale discipline as the rest of the engine: vectorized
per-batch signature computation (map_batches), then shuffles only over
small derived tables ((band_hash, doc_id) pairs / (hash, count)
partials), never over full documents.
"""
