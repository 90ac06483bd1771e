"""Enrichment stages: broadcast-small-side lookups run as actor pools.

The reference's lookup vocabulary — add-contextual-data (broadcast CSV
dict), geoip2 (range trie), in-list (semi-join) — re-expressed as
stateful map_batches classes: the lookup structure is built once per
actor in __init__ (optionally from a ray.put broadcast ref), applied
vectorized per batch.
"""
