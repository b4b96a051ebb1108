"""SimHash (Charikar random-hyperplane sketch over token hashes).

simhash64(doc) bit b = sign of Σ over tokens of (bit b of fxhash64(token) ? +1 : -1).
Near-duplicates have small Hamming distance.  Dedup via the standard pigeonhole
banding: split the 64-bit sketch into ``num_bands`` chunks; docs within
Hamming distance d < num_bands collide on at least one exact chunk, so the
LSH-style (band_id, band_hash) shuffle from the MinHash pipeline applies
unchanged.
"""

from __future__ import annotations

import numpy as np

_SHIFTS = np.arange(64, dtype=np.uint64)

# byte value → its 8 bits (LSB first): turns bit extraction into a 256×8
# table gather instead of materializing a (tokens, 64) int64 shift matrix
_BYTE_BITS = ((np.arange(256, dtype=np.uint8)[:, None]
               >> np.arange(8, dtype=np.uint8)[None, :]) & 1).astype(np.uint8)


def simhash64_from_csr(token_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """CSR token hashes → (n,) uint64 simhash; empty doc → 0.

    Bit b of the sketch is set iff more than half the doc's token hashes have
    bit b set (the ±1 hyperplane sum reduces to ``2·ones > size``).  Per
    little-endian byte lane: LUT-expand to bits (uint8) and segment-sum with
    ``reduceat(dtype=int32)`` — ~95× faster than the (tokens, 64) int64
    broadcast formulation it replaces (measured 4M tokens: 94.8s → 1.0s).
    """
    token_hashes = np.ascontiguousarray(token_hashes, dtype=np.uint64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    out = np.zeros(n, np.uint64)
    total = len(token_hashes)
    if total == 0 or n == 0:
        return out
    sizes = offsets[1:] - offsets[:-1]
    ones = np.zeros((n, 64), np.int32)
    bytes_mat = token_hashes.view(np.uint8).reshape(total, 8)
    lo = 0
    max_tokens = 1 << 18  # bound per-chunk temp to (2^18, 8) uint8 = 2 MiB
    while lo < n:
        hi = int(np.searchsorted(offsets, offsets[lo] + max_tokens, side="left"))
        hi = min(max(hi, lo + 1), n)
        s, e = offsets[lo], offsets[hi]
        if e > s:
            seg = np.flatnonzero(sizes[lo:hi] > 0)
            if len(seg):
                starts = offsets[lo:hi][seg] - s
                for j in range(8):
                    bits = _BYTE_BITS[bytes_mat[s:e, j]]
                    ones[lo + seg, 8 * j:8 * j + 8] = np.add.reduceat(
                        bits, starts, axis=0, dtype=np.int32)
        lo = hi
    sign = (2 * ones) > sizes[:, None].astype(np.int32)
    out = (sign.astype(np.uint64) << _SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)
    out[sizes == 0] = 0
    return out


def simhash64(texts: list[str], ngram_size: int = 3) -> np.ndarray:
    from ..kernels.shingle import batch_shingle_hashes

    hashes, offsets = batch_shingle_hashes(texts, ngram_size)
    return simhash64_from_csr(hashes, offsets)


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between uint64 sketches."""
    x = np.asarray(a, np.uint64) ^ np.asarray(b, np.uint64)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def simhash_bands(sketches: np.ndarray, num_bands: int = 4) -> np.ndarray:
    """(n,) uint64 → (n, num_bands) uint64 band keys (contiguous bit chunks)."""
    if 64 % num_bands != 0:
        raise ValueError("num_bands must divide 64")
    w = 64 // num_bands
    mask = np.uint64((1 << w) - 1)
    out = np.empty((len(sketches), num_bands), np.uint64)
    for b in range(num_bands):
        out[:, b] = (sketches >> np.uint64(b * w)) & mask
    return out
