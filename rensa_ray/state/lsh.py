"""Reference-API-compatible in-memory LSH index (``RMinHashLSH``).

Semantics mirror src/lsh/index.rs + src/lsh/py.rs: ``num_bands`` hash
tables keyed by the FxHash band polynomial; ``query`` returns the deduped
union of bucket members in first-seen order; ``query_duplicate_flags``
flags keys sharing any bucket; the one-shot matrix path reproduces
``simple_one_shot_flags`` (src/lsh/one_shot.rs:294-332) exactly — including
back-flagging the first occupant of a colliding bucket.

This is the *in-memory* API for parity tests and modest corpora; the
distributed formulation is the band-table shuffle in
``rensa_ray.pipelines.dedup``.
"""

from __future__ import annotations

import numpy as np

from ..kernels.hashing import band_hash
from ..stages.band import band_hashes_matrix, validate_bands
from .minhash import RMinHash, RMinHashDigestMatrix


def _as_matrix(matrix) -> np.ndarray:
    if isinstance(matrix, RMinHashDigestMatrix):
        return matrix.matrix
    return np.asarray(matrix, dtype=np.uint32)


class RMinHashLSH:
    """LSH index over R-MinHash signatures (src/lsh/py.rs:21-318)."""

    def __init__(self, threshold: float, num_perm: int, num_bands: int):
        if not (0.0 < threshold <= 1.0):
            raise ValueError("threshold must be in (0, 1]")
        if num_perm <= 0:
            raise ValueError("num_perm must be greater than 0")
        self.band_size = validate_bands(num_perm, num_bands)
        self.threshold = threshold
        self.num_perm = num_perm
        self.num_bands = num_bands
        # band_id -> {band_hash -> [keys]}; plus reverse map for removal
        self._tables: list[dict[int, list[int]]] = [dict() for _ in range(num_bands)]
        self._key_bands: dict[int, list[int]] = {}

    # ------------------------------------------------------------- helpers
    def _band_hashes_sig(self, sig: np.ndarray) -> list[int]:
        bs = self.band_size
        return [band_hash(sig[b * bs : (b + 1) * bs])
                for b in range(self.num_bands)]

    def _sig_of(self, minhash: RMinHash) -> np.ndarray:
        if minhash.num_perm != self.num_perm:
            # message shape mirrors the reference (tests/test_rensa.py:829-866)
            raise ValueError(
                f"MinHash has {minhash.num_perm} permutations, "
                f"expected {self.num_perm}")
        return minhash._sig

    # -------------------------------------------------------------- insert
    def insert(self, key: int, minhash: RMinHash) -> None:
        """Re-insert removes the previous entry first (src/lsh/py.rs:42-62)."""
        if key in self._key_bands:
            self.remove(key)
        hashes = self._band_hashes_sig(self._sig_of(minhash))
        for b, h in enumerate(hashes):
            self._tables[b].setdefault(h, []).append(key)
        self._key_bands[key] = hashes

    def insert_pairs(self, pairs) -> None:
        for key, mh in pairs:
            self.insert(key, mh)

    insert_many = insert_pairs

    def insert_matrix(self, keys, matrix) -> None:
        mat = _as_matrix(matrix)
        bh = band_hashes_matrix(mat, self.num_bands)  # (n, B)
        for i, key in enumerate(keys):
            key = int(key)
            if key in self._key_bands:
                self.remove(key)
            hashes = [int(h) for h in bh[i]]
            for b, h in enumerate(hashes):
                self._tables[b].setdefault(h, []).append(key)
            self._key_bands[key] = hashes

    # --------------------------------------------------------------- query
    def query(self, minhash: RMinHash) -> list[int]:
        """Union of bucket members, deduped, first-seen order
        (src/lsh/index.rs:100-121)."""
        seen: dict[int, None] = {}
        for b, h in enumerate(self._band_hashes_sig(self._sig_of(minhash))):
            for key in self._tables[b].get(h, ()):
                seen.setdefault(key, None)
        return list(seen)

    def query_duplicate_flags(self, minhashes) -> list[bool]:
        """flag = query has >1 distinct candidate key, or 1 candidate that is
        not itself unknowable here — reference: >=1 existing distinct key
        (src/lsh/index.rs:123-143: any bucket with >=1 member)."""
        out = []
        for mh in minhashes:
            found = False
            for b, h in enumerate(self._band_hashes_sig(self._sig_of(mh))):
                if self._tables[b].get(h):
                    found = True
                    break
            out.append(found)
        return out

    def query_duplicate_flags_matrix(self, matrix) -> list[bool]:
        mat = _as_matrix(matrix)
        bh = band_hashes_matrix(mat, self.num_bands)
        out = []
        for i in range(len(mat)):
            out.append(any(self._tables[b].get(int(bh[i, b]))
                           for b in range(self.num_bands)))
        return out

    def insert_matrix_and_query_duplicate_flags(self, keys, matrix) -> list[bool]:
        """One-pass insert+flag (src/lsh/py.rs:118-162): a row is flagged if
        any of its band buckets was non-empty at insert time; the previous
        lone occupant from the same call is back-flagged."""
        mat = _as_matrix(matrix)
        bh = band_hashes_matrix(mat, self.num_bands)
        n = len(mat)
        flags = np.zeros(n, dtype=bool)
        pos_of_key: dict[int, int] = {}
        for i, key in enumerate(keys):
            key = int(key)
            pos_of_key[key] = i
            if key in self._key_bands:
                # re-insert: drop the stale bucket entries FIRST so ghost
                # occupants can't flag later rows (src/lsh/py.rs:135-138)
                self.remove(key)
            hit = False
            hashes = [int(h) for h in bh[i]]
            for b, h in enumerate(hashes):
                bucket = self._tables[b].setdefault(h, [])
                if bucket:
                    hit = True
                    if len(bucket) == 1:
                        prev = bucket[0]
                        if prev in pos_of_key:
                            flags[pos_of_key[prev]] = True
                bucket.append(key)
            self._key_bands[key] = hashes
            flags[i] |= hit
        return flags.tolist()

    def query_duplicate_flags_matrix_one_shot(self, matrix) -> list[bool]:
        """Batch-dedup workhorse (src/lsh/one_shot.rs:294-332 simple path).

        No permanent insertion.  Per band: every row whose band hash collides
        with another row of the matrix (both directions) or with a
        pre-existing index entry is flagged.
        """
        mat = _as_matrix(matrix)
        n = len(mat)
        flags = np.zeros(n, dtype=bool)
        if n == 0:
            return []
        bh = band_hashes_matrix(mat, self.num_bands)
        for b in range(self.num_bands):
            col = bh[:, b]
            order = np.argsort(col, kind="stable")
            s = col[order]
            boundary = np.ones(n, dtype=bool)
            boundary[1:] = s[1:] != s[:-1]
            gid = np.cumsum(boundary) - 1
            counts = np.bincount(gid)
            dup_rows = order[counts[gid] >= 2]
            flags[dup_rows] = True
            if self._tables[b]:
                # collide with pre-seeded index entries
                uniq_pos = np.flatnonzero(boundary)
                for p in uniq_pos:
                    if int(s[p]) in self._tables[b]:
                        flags[order[p : p + int(counts[gid[p]])]] = True
        return flags.tolist()

    # --------------------------------------------------------------- admin
    def remove(self, key: int) -> None:
        hashes = self._key_bands.pop(key, None)
        if hashes is None:
            return
        for b, h in enumerate(hashes):
            bucket = self._tables[b].get(h)
            if bucket is not None:
                try:
                    bucket.remove(key)
                except ValueError:
                    pass
                if not bucket:
                    del self._tables[b][h]

    def is_similar(self, a: RMinHash, b: RMinHash) -> bool:
        return a.jaccard(b) >= self.threshold

    def __len__(self) -> int:
        return len(self._key_bands)

    def __getstate__(self):
        return self.__dict__

    def __setstate__(self, state):
        self.__dict__.update(state)
