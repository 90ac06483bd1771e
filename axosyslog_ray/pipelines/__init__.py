"""End-to-end pipeline compositions (the reference's config-tree compile
step, lib/cfg-tree.c:758-1400, re-expressed as Python builders producing
Dataset transform chains)."""
