"""Vendored mini-oracle: an INDEPENDENT datasketch-style MinHash+LSH.

The reference's headline accuracy metric compares its kept sets against the
``datasketch`` library (README.md:27-31: mean kept-set Jaccard 0.987219,
flag-mismatch rate 0.010717; lane benchmarks/full_benchmark.py:402-501).
That package is absent in this environment, so this module reimplements the
*published* datasketch algorithm from scratch as a cross-check oracle:

- token hash: first 4 bytes of SHA-1, little-endian (datasketch
  ``sha1_hash32``),
- permutations: ``(a*h + b) mod p`` with the Mersenne prime ``p = 2^61-1``,
  ``a, b`` drawn from ``numpy.random.RandomState(seed)`` exactly as
  datasketch draws them, masked to 32 bits,
- LSH: band the signature; a doc is flagged iff some band bucket was
  already occupied at insert time (first-wins arrival order).

Nothing here shares code or constants with the main engine (fxhash64 /
Xoshiro / R-MinHash), which is what makes it usable as an accuracy oracle:
agreement between two unrelated hash families is evidence the pipeline's
candidate generation is right, not that the same bug lives in both.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def sha1_hash32(data: bytes) -> int:
    """First 4 bytes of SHA-1 as little-endian uint32 (datasketch semantics)."""
    return int.from_bytes(hashlib.sha1(data).digest()[:4], "little")


class MiniDatasketchMinHash:
    """Scalar datasketch-equivalent MinHash (oracle use only; not fast)."""

    def __init__(self, num_perm: int = 128, seed: int = 1):
        self.num_perm = num_perm
        rs = np.random.RandomState(seed)
        # datasketch draws (a, b) per permutation in this order
        self._ab = [(int(rs.randint(1, _MERSENNE, dtype=np.uint64)),
                     int(rs.randint(0, _MERSENNE, dtype=np.uint64)))
                    for _ in range(num_perm)]
        self.hashvalues = [_MAX_HASH] * num_perm

    def update_batch(self, tokens) -> None:
        for tok in tokens:
            h = sha1_hash32(tok.encode("utf-8") if isinstance(tok, str) else tok)
            for k, (a, b) in enumerate(self._ab):
                v = ((a * h + b) % _MERSENNE) & _MAX_HASH
                if v < self.hashvalues[k]:
                    self.hashvalues[k] = v

    def digest(self) -> list[int]:
        return list(self.hashvalues)


def one_shot_flags_and_kept(token_sets, num_perm: int = 128,
                            num_bands: int = 8, seed: int = 1
                            ) -> tuple[list[bool], list[int]]:
    """One-shot LSH over documents in order → (symmetric flags, kept ids).

    ``flags[i]`` is True iff doc i shares some band bucket with ANY other
    doc (symmetric — both members of a colliding pair are flagged, the
    reference's ``simple_one_shot_flags`` semantics).  ``kept`` is the
    first-wins survivor set: docs whose buckets were all unoccupied by
    EARLIER docs — the shape of the reference's datasketch dedup lane.
    """
    band_size = num_perm // num_bands
    buckets: list[dict[tuple, list[int]]] = [dict() for _ in range(num_bands)]
    sigs = []
    kept: list[int] = []
    for i, toks in enumerate(token_sets):
        mh = MiniDatasketchMinHash(num_perm, seed)
        mh.update_batch(toks)
        sig = mh.digest()
        sigs.append(sig)
        hit_earlier = False
        for b in range(num_bands):
            key = tuple(sig[b * band_size:(b + 1) * band_size])
            members = buckets[b].setdefault(key, [])
            if members:
                hit_earlier = True
            members.append(i)
        if not hit_earlier:
            kept.append(i)
    flags = [any(len(buckets[b][tuple(sigs[i][b * band_size:(b + 1) * band_size])]) >= 2
                 for b in range(num_bands))
             for i in range(len(token_sets))]
    return flags, kept


def kept_set_jaccard(kept_a, kept_b) -> float:
    """|A ∩ B| / |A ∪ B| of two kept-id sets (reference's accuracy metric,
    benchmarks/full_benchmark.py:656-660)."""
    a, b = set(kept_a), set(kept_b)
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)
