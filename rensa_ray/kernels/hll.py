"""HyperLogLog distinct-count sketch (Flajolet–Fuchs–Gandouet–Meunier 2007).

Why: COUNT(DISTINCT) over 10^12 rows is an all-to-all shuffle
(``distinct_token_count`` does exactly that, exactly); the HLL lane answers
the same question with ONE register array of 2^p bytes per partition and an
elementwise-max merge — no shuffle at all, ~1.04/sqrt(2^p) relative error
(0.8% at the default p=14 / 16 KiB).  Registers are a commutative monoid
(merge = max), so block sketches fold in any order — the shape that lets a
256-node cluster tree-reduce a corpus-wide cardinality in one pass.

All operations are vectorized: register index = top p hash bits; rho =
leading-zero count of the remaining bits via bit-smear + popcount (exact —
no float log2 rounding hazards); scatter-max via ``np.maximum.at``.
"""

from __future__ import annotations

import numpy as np

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (byte-LUT, exact)."""
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(
        axis=1, dtype=np.int64)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact count-leading-zeros of uint64 (bit smear + popcount); 64 for 0."""
    x = x.copy()
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> np.uint64(s)
    return 64 - _popcount64(x)


class HyperLogLog:
    """Vectorized HLL over uint64 hashes with max-merge and serialization."""

    def __init__(self, p: int = 14):
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4, 18]")
        self.p = int(p)
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> "HyperLogLog":
        h = np.ascontiguousarray(hashes, dtype=np.uint64)
        if len(h) == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        rho = (_clz64(rest) + 1).clip(max=64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs of different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        if self.m >= 128:
            alpha = 0.7213 / (1.0 + 1.079 / m)
        elif self.m == 64:
            alpha = 0.709
        elif self.m == 32:
            alpha = 0.697
        else:
            alpha = 0.673
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)  # linear counting, small range
        return float(e)

    def to_numpy(self) -> np.ndarray:
        return self.registers.copy()

    @classmethod
    def from_numpy(cls, registers: np.ndarray) -> "HyperLogLog":
        m = len(registers)
        p = int(m).bit_length() - 1
        if (1 << p) != m:
            raise ValueError("register count must be a power of two")
        obj = cls(p)
        obj.registers = np.asarray(registers, dtype=np.uint8).copy()
        return obj


def approx_distinct(ds, hash_fn, p: int = 14) -> float:
    """Corpus-wide approximate distinct count, shuffle-free.

    ``hash_fn(batch) -> uint64 ndarray`` extracts the batch's key hashes.
    Each block emits its 2^p-byte register row; the driver max-folds them
    (commutative — at cluster scale this folds per node first, then across
    nodes; the fold order cannot change the answer).
    """
    import pyarrow as pa

    def _sketch(b: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_hashes(hash_fn(b))
        return pa.table({"registers": pa.array(
            [hll.to_numpy()], pa.list_(pa.uint8(), hll.m))})

    acc = HyperLogLog(p)
    for b in (ds.map_batches(_sketch, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        for row in b["registers"].to_numpy(zero_copy_only=False):
            acc.merge(HyperLogLog.from_numpy(np.asarray(row)))
    return acc.estimate()
