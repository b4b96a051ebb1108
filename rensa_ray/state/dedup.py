"""Streaming add-if-unique deduplicators (reference src/inline_dedup/*).

Arrival-order first-wins semantics, exactly like the reference: ``add``
returns True (and stores) iff the key is new AND no stored signature is
within ``threshold`` signature-Jaccard.  ``RMinHashDeduplicator`` prunes
candidates with an embedded LSH index; ``CMinHashDeduplicator`` scans.

The Ray-side streaming stage wrapping these lives in
``rensa_ray.state.stream``.
"""

from __future__ import annotations

import numpy as np

from .lsh import RMinHashLSH
from .minhash import CMinHash, RMinHash, token_hashes_of


def default_num_bands(threshold: float, num_perm: int) -> int:
    """Band-count heuristic (src/inline_dedup/rminhash.rs:15-48): ≥0.9→4,
    ≥0.8→8, ≥0.7→16, ≥0.5→32, else num_perm/2 — adjusted down to divide
    num_perm."""
    if threshold >= 0.9:
        nb = 4
    elif threshold >= 0.8:
        nb = 8
    elif threshold >= 0.7:
        nb = 16
    elif threshold >= 0.5:
        nb = 32
    else:
        nb = max(num_perm // 2, 1)
    nb = min(nb, num_perm)
    while num_perm % nb != 0:
        nb -= 1
    return nb


def _coerce_rmin(value, num_perm: int, seed: int) -> RMinHash:
    """Accept an RMinHash or a raw token list (src/inline_dedup/rminhash.rs:93-168)."""
    if isinstance(value, RMinHash):
        return value
    mh = RMinHash(num_perm, seed)
    mh.update_token_hashes(token_hashes_of(value))
    return mh


class RMinHashDeduplicator:
    """src/inline_dedup/rminhash.rs:192-406."""

    def __init__(self, threshold: float, num_perm: int, use_lsh: bool = True,
                 num_bands: int | None = None, seed: int = 42):
        if not (0.0 < threshold <= 1.0):
            raise ValueError("threshold must be in (0, 1]")
        if num_perm <= 0:
            raise ValueError("num_perm must be greater than 0")
        self.threshold = threshold
        self.num_perm = num_perm
        self.seed = seed
        self.use_lsh = use_lsh
        self._entries: dict[str, tuple[int, RMinHash]] = {}
        self._by_id: dict[int, str] = {}
        self._next_id = 0
        if use_lsh:
            nb = num_bands if num_bands is not None else default_num_bands(
                threshold, num_perm)
            if num_perm % nb != 0:
                raise ValueError("num_perm must be divisible by num_bands")
            self._lsh: RMinHashLSH | None = RMinHashLSH(threshold, num_perm, nb)
        else:
            self._lsh = None

    # ----------------------------------------------------------------- api
    def _candidates(self, mh: RMinHash):
        if self._lsh is not None:
            for cid in self._lsh.query(mh):
                key = self._by_id.get(cid)
                if key is not None:
                    yield self._entries[key][1]
        else:
            for _, stored in self._entries.values():
                yield stored

    def is_duplicate(self, key: str, value) -> bool:
        """Duplicate iff key already present OR any candidate's signature
        Jaccard ≥ threshold (src/inline_dedup/rminhash.rs:253-290)."""
        if key in self._entries:
            return True
        mh = _coerce_rmin(value, self.num_perm, self.seed)
        return any(mh.jaccard(c) >= self.threshold for c in self._candidates(mh))

    def add(self, key: str, value) -> bool:
        """Store iff unique; returns True when added (first-wins)."""
        if key in self._entries:
            return False
        mh = _coerce_rmin(value, self.num_perm, self.seed)
        if any(mh.jaccard(c) >= self.threshold for c in self._candidates(mh)):
            return False
        idx = self._next_id
        self._next_id += 1
        self._entries[key] = (idx, mh)
        self._by_id[idx] = key
        if self._lsh is not None:
            self._lsh.insert(idx, mh)
        return True

    def add_pairs(self, pairs) -> list[bool]:
        return [self.add(k, v) for k, v in pairs]

    def is_duplicate_pairs(self, pairs) -> list[bool]:
        return [self.is_duplicate(k, v) for k, v in pairs]

    def get_duplicate_sets(self, pairs) -> list[list[str]]:
        """Group the given (key, value) pairs into duplicate sets against a
        scratch index (first key of each set is the retained representative)."""
        scratch = RMinHashDeduplicator(
            self.threshold, self.num_perm, self.use_lsh,
            num_bands=self._lsh.num_bands if self._lsh is not None else None,
            seed=self.seed)  # same banding as add()/is_duplicate()
        sets: dict[str, list[str]] = {}
        for key, value in pairs:
            mh = _coerce_rmin(value, self.num_perm, self.seed)
            rep = None
            if scratch._lsh is not None:
                for cid in scratch._lsh.query(mh):
                    ck = scratch._by_id.get(cid)
                    if ck is not None and mh.jaccard(
                            scratch._entries[ck][1]) >= self.threshold:
                        rep = ck
                        break
            else:
                for ck, (_, stored) in scratch._entries.items():
                    if mh.jaccard(stored) >= self.threshold:
                        rep = ck
                        break
            if rep is None:
                scratch.add(key, mh)
                sets[key] = [key]
            else:
                sets[rep].append(key)
        return list(sets.values())

    def remove(self, key: str) -> bool:
        entry = self._entries.pop(key, None)
        if entry is None:
            return False
        idx, _ = entry
        del self._by_id[idx]
        if self._lsh is not None:
            self._lsh.remove(idx)
        return True

    def clear(self) -> None:
        self._entries.clear()
        self._by_id.clear()
        if self._lsh is not None:
            self._lsh = RMinHashLSH(self.threshold, self.num_perm,
                                    self._lsh.num_bands)

    def __len__(self) -> int:
        return len(self._entries)

    def len(self) -> int:
        return len(self._entries)

    def is_empty(self) -> bool:
        return not self._entries


class CMinHashDeduplicator:
    """src/inline_dedup/cminhash.rs:163-321 — no LSH, O(n) scan; learns
    num_perm from the first add when not given."""

    def __init__(self, threshold: float, num_perm: int | None = None,
                 seed: int = 42):
        if not (0.0 < threshold <= 1.0):
            raise ValueError("threshold must be in (0, 1]")
        self.threshold = threshold
        self.num_perm = num_perm
        self.seed = seed
        self._entries: dict[str, CMinHash] = {}

    def _coerce(self, value) -> CMinHash:
        if isinstance(value, CMinHash):
            if self.num_perm is not None and value.num_perm != self.num_perm:
                raise ValueError(
                    f"num_perm mismatch: deduplicator is {self.num_perm}, "
                    f"minhash is {value.num_perm}")
            return value
        if self.num_perm is None:
            raise ValueError("num_perm unknown: add a CMinHash first or set num_perm")
        mh = CMinHash(self.num_perm, self.seed)
        mh.update(value)  # the canonical sketch fold — one implementation
        return mh

    def is_duplicate(self, key: str, value) -> bool:
        if key in self._entries:
            return True
        if not self._entries:
            return False
        mh = self._coerce(value)
        return any(mh.jaccard(s) >= self.threshold for s in self._entries.values())

    def add(self, key: str, value) -> bool:
        if key in self._entries:
            return False
        if isinstance(value, CMinHash) and self.num_perm is None:
            self.num_perm = value.num_perm
        mh = self._coerce(value)
        if any(mh.jaccard(s) >= self.threshold for s in self._entries.values()):
            return False
        self._entries[key] = mh
        return True

    def add_pairs(self, pairs) -> list[bool]:
        return [self.add(k, v) for k, v in pairs]

    def is_duplicate_pairs(self, pairs) -> list[bool]:
        return [self.is_duplicate(k, v) for k, v in pairs]

    def remove(self, key: str) -> bool:
        return self._entries.pop(key, None) is not None

    def clear(self) -> None:
        self._entries.clear()

    def __len__(self) -> int:
        return len(self._entries)

    def len(self) -> int:
        return len(self._entries)

    def is_empty(self) -> bool:
        return not self._entries
