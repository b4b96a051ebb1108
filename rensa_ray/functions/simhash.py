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


def simhash64_from_csr(token_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """CSR token hashes → (n,) uint64 simhash; empty doc → 0."""
    token_hashes = np.asarray(token_hashes, dtype=np.uint64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    out = np.zeros(n, np.uint64)
    total = len(token_hashes)
    if total == 0:
        return out
    sizes = offsets[1:] - offsets[:-1]
    # tokens are doc-contiguous (CSR): segmented sums via reduceat, chunked
    # over docs to bound the (T, 64) bit matrix (~32 MiB per chunk)
    acc = np.zeros((n, 64), np.int64)
    lo = 0
    max_tokens = 1 << 18
    while lo < n:
        hi = int(np.searchsorted(offsets, offsets[lo] + max_tokens, side="left"))
        hi = min(max(hi, lo + 1), n)
        s, e = offsets[lo], offsets[hi]
        if e > s:
            bits = ((token_hashes[s:e, None] >> _SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
            contrib = 2 * bits - 1
            seg = np.flatnonzero(sizes[lo:hi] > 0)
            if len(seg):
                acc[lo + seg] = np.add.reduceat(contrib, (offsets[lo:hi][seg] - s), axis=0)
        lo = hi
    sign = acc > 0
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
