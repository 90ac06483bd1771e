"""Mergeable cardinality sketch: HyperLogLog.

`aggregate.distinct_count` is exact but ships every distinct (key,
value) pair through a shuffle — the right call for bounded telemetry
keys. At 100-TB web scale ("distinct URLs in the crawl") the distinct
set itself is too big to exchange; the standard answer is a HyperLogLog
sketch (Flajolet et al. 2007, public algorithm): m = 2^p one-byte
registers, value hashed once, register = max(leading-zero rank), union
of two sketches = element-wise max — a perfect fit for a Ray
`Dataset.aggregate` tree reduce (same construction as
dedup.bloom.build_bloom_u64: per-block registers, maximum-combine up
the tree, NO shuffle, corpus streams).

Estimator: the classic alpha_m * m^2 / sum(2^-M) with the two standard
corrections — linear counting below 2.5m when empty registers remain,
and the large-range log correction near 2^32 (not reachable with 64-bit
hashes here; kept for the textbook 32-bit variant the tests pin).
Relative error ~= 1.04 / sqrt(m); p=14 (16 KiB) gives ~0.8%.

Deterministic: the value hash is the repo's fixed-key siphash
(hashutil.hash_str_array), so the same input produces the same sketch
on any partitioning — pinned by tests/test_sketch.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashutil import hash_str_array


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_add(registers: np.ndarray, h: np.ndarray) -> None:
    """Fold a batch of uint64 hashes into 2^p registers in place:
    index = top p bits, rank = leading zeros of the remaining 64-p bits
    + 1, register = running max. Fully vectorized (np.maximum.at)."""
    p = int(np.log2(len(registers)))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rank = #leading zeros of the 64-bit `rest` + 1; the OR above plants
    # a sentinel bit so rank caps at 64 - p + 1 (all-zero suffix case)
    v = rest.copy()
    # leading-zero count via float64 exponent would lose precision past
    # 2^53; use a 6-step binary reduction instead (log2(64) passes)
    lz = np.zeros(len(h), dtype=np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        s = np.uint64(s)
        mask = v < (np.uint64(1) << (np.uint64(64) - s))
        lz = np.where(mask, lz + s, lz)
        v = np.where(mask, v << s, v)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rank)


def hll_estimate(registers: np.ndarray) -> float:
    """Cardinality estimate with small-range linear counting."""
    m = len(registers)
    est = _alpha(m) * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros:
            return m * np.log(m / zeros)
    return float(est)


def hll_build(ds, value_col: str, p: int = 14) -> np.ndarray:
    """Stream a Dataset column into one HLL register array: per-block
    fold + element-wise-max tree combine (Dataset.aggregate, no
    shuffle). Returns the uint8 registers (2^p bytes) on the driver."""
    from ray.data.aggregate import AggregateFnV2

    m = 1 << p

    class _HllBuild(AggregateFnV2):
        def __init__(self):
            super().__init__(name="hll", on=None, ignore_nulls=False,
                             zero_factory=lambda: np.zeros(m, dtype=np.uint8))

        def aggregate_block(self, block):
            t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            acc = np.zeros(m, dtype=np.uint8)
            if t.num_rows:
                col = t.column(value_col).to_pandas()
                col = col[col.notna()]
                if len(col):
                    h = hash_str_array(col.to_numpy(dtype=object))
                    hll_add(acc, h)
            return acc

        def combine(self, a, b):
            return np.maximum(np.asarray(a, dtype=np.uint8),
                              np.asarray(b, dtype=np.uint8))

    return np.asarray(ds.aggregate(_HllBuild())["hll"], dtype=np.uint8)


def hll_distinct(ds, value_col: str, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT value_col) of a Dataset — one
    streaming pass, 2^p bytes of state, ~1.04/sqrt(2^p) relative
    error."""
    return hll_estimate(hll_build(ds, value_col, p))
