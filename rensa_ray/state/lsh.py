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

import os

import numpy as np

from ..kernels.hashing import band_hash, band_hash_matrix
from ..stages.band import band_hashes_matrix, validate_bands
from .minhash import RMinHash, RMinHashDigestMatrix


def _as_matrix(matrix) -> np.ndarray:
    if isinstance(matrix, RMinHashDigestMatrix):
        return matrix.matrix
    return np.asarray(matrix, dtype=np.uint32)


def _checked_matrix(matrix, num_perm: int) -> np.ndarray:
    """ensure_digest_len for the matrix paths (src/lsh/index.rs:60-68): a
    wrong-width matrix that happens to divide num_bands would otherwise be
    silently banded at the wrong band_size."""
    mat = _as_matrix(matrix)
    if mat.ndim != 2 or mat.shape[1] != num_perm:
        width = mat.shape[1] if mat.ndim == 2 else mat.shape
        raise ValueError(
            f"MinHash has {width} permutations but LSH expects {num_perm}")
    return mat


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
        # one-shot sparse-verify telemetry (src/lsh.rs:72-75)
        self.last_one_shot_sparse_verify_checks = 0
        self.last_one_shot_sparse_verify_passes = 0

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
        """Keys must be ints (reference extracts usize and raises TypeError,
        src/lsh/py.rs:52-62; pinned by tests/test_rensa.py:820-826)."""
        for key, mh in pairs:
            if not isinstance(key, (int, np.integer)) or isinstance(key, bool):
                raise TypeError(
                    f"LSH keys must be non-negative integers, got {type(key).__name__}")
            if key < 0:  # the reference extracts usize: negatives rejected
                raise TypeError(
                    f"LSH keys must be non-negative integers, got {int(key)}")
            self.insert(int(key), mh)

    def insert_many(self, minhashes, start_key: int = 0) -> None:
        """Sequential keys ``start_key + offset`` (src/lsh/py.rs:72-84)."""
        for off, mh in enumerate(minhashes):
            self.insert(start_key + off, mh)

    def insert_matrix(self, keys, matrix) -> None:
        mat = _checked_matrix(matrix, self.num_perm)
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

    def query_all(self, minhashes) -> list[list[int]]:
        """Per-query candidate lists (src/lsh/py.rs:208-227); validates every
        item's width like the reference's ensure_digest_len."""
        return [self.query(mh) for mh in minhashes]

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
        mat = _checked_matrix(matrix, self.num_perm)
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
        mat = _checked_matrix(matrix, self.num_perm)
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
        """Batch-dedup workhorse (src/lsh/one_shot.rs:78-185).

        No permanent insertion.  Simple path (plain digests): per band, every
        row whose band hash collides with another row of the matrix (both
        directions) or with a pre-existing index entry is flagged.  When the
        matrix carries a rho sidecar, the full recall/precision machinery
        runs instead: band FOLDING (pairs of bands hash as one, halving the
        false-positive rate of the multi-probe sketch), the sparse-row
        ≥2-band rule, the sparse-verify mini-signature gate, and the
        mid-length recall rescue — see ``_one_shot_rho_flags``.
        """
        sidecar = getattr(matrix, "rho_sidecar", None)
        mat = _checked_matrix(matrix, self.num_perm)
        n = len(mat)
        if n == 0:
            self.last_one_shot_sparse_verify_checks = 0
            self.last_one_shot_sparse_verify_passes = 0
            return []
        if sidecar is not None:
            return self._one_shot_rho_flags(mat, sidecar)
        self.last_one_shot_sparse_verify_checks = 0
        self.last_one_shot_sparse_verify_passes = 0
        return self._simple_one_shot_flags(
            mat, self.num_bands, self.band_size, check_tables=True).tolist()

    def _simple_one_shot_flags(self, mat: np.ndarray, eff_bands: int,
                               eff_size: int, check_tables: bool) -> np.ndarray:
        """simple_one_shot_flags (src/lsh/one_shot.rs:294-332) over
        ``eff_bands`` effective bands of ``eff_size`` u32 values each.
        Existing-index collisions apply only at fold 1 (``check_tables``)."""
        n = len(mat)
        flags = np.zeros(n, dtype=bool)
        for b in range(eff_bands):
            col = band_hash_matrix(mat[:, b * eff_size:(b + 1) * eff_size])
            order = np.argsort(col, kind="stable")
            s = col[order]
            boundary = np.ones(n, dtype=bool)
            boundary[1:] = s[1:] != s[:-1]
            gid = np.cumsum(boundary) - 1
            counts = np.bincount(gid)
            flags[order[counts[gid] >= 2]] = True
            if check_tables and self._tables[b]:
                uniq_pos = np.flatnonzero(boundary)
                for p in uniq_pos:
                    if int(s[p]) in self._tables[b]:
                        flags[order[p: p + int(counts[gid[p]])]] = True
        return flags

    def _one_shot_rho_flags(self, mat: np.ndarray, sidecar) -> list[bool]:
        """Full rho one-shot path (src/lsh/one_shot.rs:78-185).

        Per effective (folded) band, a row earns a band match when its bucket
        collides (subject to the sparse-verify gate); a row is flagged when
        its match count reaches its requirement (1, or ≥2 for sparse rows).
        Mid-length rows with zero folded matches get one unfolded re-scan
        (recall rescue).  Bucket scan order is ascending row index, matching
        the reference's matrix iteration order.
        """
        from ..kernels.rho import (
            _env_float_clamped,
            _env_int_clamped,
            sparse_verify_similarity,
        )

        n, B = len(mat), self.num_bands
        has_existing = any(self._tables[b] for b in range(B))

        # band_folding_config (one_shot.rs:187-206)
        fold = _env_int_clamped("RENSA_RHO_BAND_FOLD", 2, 1, max(B, 1)) \
            if not has_existing else 1
        if B % fold != 0:
            fold = 1
        eff_bands, eff_size = B // fold, self.band_size * fold

        occ = sidecar.sparse_occupancy_threshold
        sparse_req = _env_int_clamped(
            "RENSA_RHO_SPARSE_REQUIRED_BAND_MATCHES", 2, 1, max(eff_bands, 1))
        non_empty = np.asarray(sidecar.non_empty_counts, np.int64)
        required = np.where(non_empty < occ, sparse_req, 1).astype(np.int64)
        any_sparse = bool((required > 1).any())

        sv_enabled = (os.environ.get("RENSA_RHO_SPARSE_VERIFY_ENABLE", "1")
                      != "0") and sidecar.sparse_verify_perm > 0
        sv_threshold = _env_float_clamped(
            "RENSA_RHO_SPARSE_VERIFY_THRESHOLD", 0.75, 0.0, 1.0)
        sv_max_cand = _env_int_clamped(
            "RENSA_RHO_SPARSE_VERIFY_MAX_CANDIDATES", 16, 1, 512)
        rescue_enabled = (fold > 1 and not has_existing and os.environ.get(
            "RENSA_RHO_RECALL_RESCUE_ENABLE", "1") != "0")

        if not any_sparse and not sv_enabled and not rescue_enabled:
            self.last_one_shot_sparse_verify_checks = 0
            self.last_one_shot_sparse_verify_passes = 0
            return self._simple_one_shot_flags(
                mat, eff_bands, eff_size, check_tables=(fold == 1)).tolist()

        is_sparse = required > 1
        active = np.asarray(sidecar.sparse_active, bool) \
            if sidecar.sparse_verify_perm > 0 else np.zeros(n, bool)
        sigs = sidecar.sparse_signatures

        def pair_passes(r: int, o: int) -> bool:
            # sparse_verify_pair_passes (one_shot.rs:435-451): a missing
            # signature on either side passes trivially
            if not (active[r] and active[o]):
                return True
            return sparse_verify_similarity(sigs[r], sigs[o]) >= sv_threshold

        counts = np.zeros(n, dtype=np.int64)
        sv_checks = sv_passes = 0
        for b in range(eff_bands):
            col = band_hash_matrix(mat[:, b * eff_size:(b + 1) * eff_size])
            if has_existing and fold == 1 and self._tables[b]:
                # NOTE: an existing-index hit AND an in-matrix bucket
                # collision in the SAME band each add 1 — faithful to the
                # reference (one_shot.rs scan_effective_band increments for
                # the table hit, then again via collisions_by_hash), so a
                # sparse row CAN reach required=2 inside one band; keep it.
                for r in range(n):
                    if int(col[r]) in self._tables[b]:
                        counts[r] += 1
            order = np.argsort(col, kind="stable")
            s = col[order]
            boundary = np.ones(n, dtype=bool)
            boundary[1:] = s[1:] != s[:-1]
            gid = np.cumsum(boundary) - 1
            gsize = np.bincount(gid)
            in_dup = gsize[gid] >= 2
            if not sv_enabled:
                counts[order[in_dup]] += 1
                continue
            # per COLLIDING bucket only (skipping singleton buckets here,
            # not inside the loop, keeps the all-unique batch fully
            # vectorized), members ascending by row index
            for p in np.flatnonzero(boundary & in_dup):
                g = int(gid[p])
                members = np.sort(order[p: p + int(gsize[g])])
                if not is_sparse[members].any():
                    counts[members] += 1  # dense bucket: everyone matches
                    continue
                for r in members:
                    checked, matched = 0, False
                    for o in members:
                        if o == r:
                            continue
                        if not (is_sparse[r] or is_sparse[o]):
                            matched = True
                            break
                        if checked >= sv_max_cand:
                            break
                        checked += 1
                        sv_checks += 1
                        if pair_passes(int(r), int(o)):
                            sv_passes += 1
                            matched = True
                            break
                    if matched:
                        counts[r] += 1

        if rescue_enabled:
            self._apply_recall_rescue(mat, counts, required, sidecar)

        self.last_one_shot_sparse_verify_checks = sv_checks
        self.last_one_shot_sparse_verify_passes = sv_passes
        return (counts >= required).tolist()

    def _apply_recall_rescue(self, mat: np.ndarray, counts: np.ndarray,
                             required: np.ndarray, sidecar) -> None:
        """apply_recall_rescue (src/lsh/one_shot.rs:492-577): zero-match
        non-sparse rows in the mid-length token window are re-scanned at
        UNFOLDED band granularity; ≥2 colliding unfolded bands flags them."""
        from ..kernels.rho import _env_int_clamped

        n, B = len(mat), self.num_bands
        rmin = _env_int_clamped("RENSA_RHO_RECALL_RESCUE_MIN_TOKENS",
                                17, 1, 65_536)
        rmax = max(_env_int_clamped("RENSA_RHO_RECALL_RESCUE_MAX_TOKENS",
                                    96, 1, 65_536), rmin)
        rreq = _env_int_clamped(
            "RENSA_RHO_RECALL_RESCUE_REQUIRED_BAND_MATCHES", 2, 1, max(B, 1))
        src = np.asarray(sidecar.source_token_counts, np.int64)
        cand = (counts == 0) & (required == 1) & (src >= rmin) & (src <= rmax)
        if not cand.any():
            return
        rescue_counts = np.zeros(n, dtype=np.int64)
        bh = band_hashes_matrix(mat, B)
        for b in range(B):
            col = bh[:, b]
            order = np.argsort(col, kind="stable")
            s = col[order]
            boundary = np.ones(n, dtype=bool)
            boundary[1:] = s[1:] != s[:-1]
            gid = np.cumsum(boundary) - 1
            gsize = np.bincount(gid)
            rescue_counts[order[gsize[gid] >= 2]] += 1
        hit = cand & (rescue_counts >= rreq)
        counts[hit] = required[hit]

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
