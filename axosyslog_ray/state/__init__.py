"""Stateful machinery: checkpoint manifests, session windows, suppression,
rate limiting — the reference's persist-state / correlation layer
re-expressed for batch lineage."""
