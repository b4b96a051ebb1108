"""MinHash sketch kernels: batched R-MinHash and C-MinHash over CSR token sets.

The native input layout is CSR — a flat ``uint64`` token-hash array plus row
offsets — which is exactly a pyarrow ``list<uint64>`` array's
(values, offsets) representation (reference: the flat fast path
src/rminhash/pipeline.rs:294-368, exposed as
``digest_matrix_from_flat_token_hashes`` in src/rminhash/py.rs:298-316).

Semantics (bit-exact vs the reference):

- R-MinHash slot k of a document = min over token hashes h of
  ``((a_k*h + b_k) >> 32) as u32``; empty document → all ``u32::MAX``
  (src/rminhash.rs:104-112, src/simd/dispatch.rs:197-345).
- C-MinHash slot k = min over h of ``pi_c*(sigma_a*h + sigma_b) + (pi_c*k +
  pi_d)`` in wrapping u64; empty → all ``u64::MAX``; the u32 digest view is
  ``v >> 32`` (src/cminhash/core.rs:104-222, src/cminhash/py.rs:155-167).
- Duplicate tokens are harmless (min-fold) and order is irrelevant, so we
  deduplicate token hashes per batch (np.unique) and share the permuted
  matrix across documents — the same result, far less work on zipfian text.

Scalar reference implementations (``rmin_digest_scalar`` / ``cmin_digest_scalar``)
are the parity ground truth for tests.
"""

from __future__ import annotations

import numpy as np

from .hashing import CMinParams, U64, _M64, build_rmin_permutations, permute_hash

RMIN_EMPTY = np.uint32(0xFFFFFFFF)
CMIN_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)
_N32 = np.uint64(32)

# Bound the (tokens × num_perm) broadcast tile to ~64 MiB of u64.
_TOKEN_TILE_ELEMS = 8 * 1024 * 1024


def validate_offsets(offsets: np.ndarray, total: int) -> None:
    """CSR offset validation (src/rminhash/pipeline.rs:273-292)."""
    offsets = np.asarray(offsets)
    if len(offsets) == 0 or offsets[0] != 0 or offsets[-1] != total:
        raise ValueError(
            "row_offsets must start at 0, be non-decreasing, and end at token_hashes length"
        )
    if len(offsets) > 1 and (np.diff(offsets) < 0).any():
        raise ValueError(
            "row_offsets must start at 0, be non-decreasing, and end at token_hashes length"
        )


def segmented_min(values: np.ndarray, offsets: np.ndarray, empty_value) -> np.ndarray:
    """Per-segment column-wise min of a (T, P) matrix; empty segments → empty_value.

    ``offsets`` is an (n+1,) int array with offsets[0]==0, offsets[-1]==T.
    Uses ``np.minimum.reduceat`` over the starts of non-empty segments (empty
    segments contribute no rows, so non-empty starts are exact boundaries).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    p = values.shape[1]
    out = np.full((n, p), empty_value, dtype=values.dtype)
    sizes = offsets[1:] - offsets[:-1]
    nonempty = np.flatnonzero(sizes > 0)
    if len(nonempty) == 0:
        return out
    starts = offsets[:-1][nonempty]
    out[nonempty] = np.minimum.reduceat(values, starts, axis=0)
    return out


def _sampled_unique_ratio(hashes: np.ndarray, cap: int = 4096) -> float:
    """Cheap redundancy probe: unique ratio of an every-k-th subsample."""
    step = max(len(hashes) // cap, 1)
    s = hashes[::step]
    return len(np.unique(s)) / max(len(s), 1)


def _digest_tile_elems() -> int:
    """Token hashes per L2 tile (u64 src + u64 tmp + u32 col ≈ 20 B each;
    64k → ~1.3 MiB working set). Override with ``RENSA_DIGEST_TILE``."""
    import os

    try:
        v = int(os.environ.get("RENSA_DIGEST_TILE", "65536"))
    except ValueError:
        v = 65536
    return max(v, 1024)


def rmin_digest_matrix(token_hashes: np.ndarray, offsets: np.ndarray,
                       num_perm: int, seed: int,
                       perms: tuple[np.ndarray, np.ndarray] | None = None,
                       cache: "AdaptivePermutationCache | None" = None) -> np.ndarray:
    """R-MinHash signatures for n CSR documents → (n, num_perm) uint32.

    Cache-tiled permutation-at-a-time formulation: the batch is split into
    document-aligned tiles of ``RENSA_DIGEST_TILE`` token hashes (default
    64k ≈ 512 KiB — resident in one core's L2), and all ``num_perm``
    multiply/shift/``np.minimum.reduceat`` passes run against the hot tile
    before moving on.  The untiled variant streams the full flat array from
    DRAM once PER SLOT (128 × batch bytes of traffic — measured
    bandwidth-bound at ~22 GB/s/core); tiling cuts DRAM reads to one pass
    total and measures ~1.5× faster single-core, more under multi-worker
    bandwidth contention.  Still ~17× faster than the (tokens × num_perm)
    broadcast tile and faster than unique+gather on typical web batches,
    where shingles are ~93% unique and the gather pass costs more than the
    ≤7% of multiplies it saves.  A sampled redundancy probe keeps the
    unique+gather path for pathological batches (e.g. one boilerplate doc
    repeated) where U ≪ T.
    """
    from .hashing import tune_allocator

    tune_allocator()
    token_hashes = np.asarray(token_hashes, dtype=np.uint64)
    offsets = np.asarray(offsets, dtype=np.int64)
    validate_offsets(offsets, len(token_hashes))
    if cache is not None and cache.max_hashes > 0:
        return _rmin_digest_matrix_cached(token_hashes, offsets, num_perm, cache)
    a, b = perms if perms is not None else build_rmin_permutations(num_perm, seed)
    n = len(offsets) - 1
    out = np.full((n, num_perm), RMIN_EMPTY, dtype=np.uint32)
    total = len(token_hashes)
    if total == 0 or n == 0:
        return out
    sizes = offsets[1:] - offsets[:-1]
    nonempty = np.flatnonzero(sizes > 0)
    if len(nonempty) == 0:
        return out
    starts = offsets[:-1][nonempty]
    use_unique = _sampled_unique_ratio(token_hashes) < 0.7
    # slot-major accumulation into preallocated buffers: row-contiguous
    # writes (the (doc, slot) strided scatter cost ~25% of the loop) and no
    # per-slot temporaries; final transpose restores (n, P) layout
    out_t = np.full((num_perm, n), RMIN_EMPTY, dtype=np.uint32)
    if use_unique:
        src, inv = np.unique(token_hashes, return_inverse=True)
        all_ne = len(nonempty) == n
        tmp = np.empty(len(src), np.uint64)
        col = np.empty(total, np.uint32)
        php = np.empty(len(src), np.uint32)
        red = np.empty(len(starts), np.uint32)
        for p in range(num_perm):
            np.multiply(src, a[p], out=tmp)
            np.add(tmp, b[p], out=tmp)
            np.right_shift(tmp, _N32, out=tmp)
            php[:] = tmp.view(np.uint32)[::2]  # LE low word == (v>>32) u32
            np.take(php, inv, out=col)
            np.minimum.reduceat(col, starts, out=red)
            if all_ne:
                out_t[p] = red
            else:
                out_t[p][nonempty] = red
        return np.ascontiguousarray(out_t.T)
    # Document-aligned L2 tiles; a single over-tile document degrades to a
    # one-doc tile (correct, just not cache-resident).
    tile = _digest_tile_elems()
    tmp = np.empty(min(total, tile * 2), np.uint64)
    col = np.empty(min(total, tile * 2), np.uint32)
    doc_lo = 0
    while doc_lo < n:
        doc_hi = doc_lo
        tok_lo = offsets[doc_lo]
        while doc_hi < n and (offsets[doc_hi + 1] - tok_lo) <= tile:
            doc_hi += 1
        if doc_hi == doc_lo:
            doc_hi = doc_lo + 1
        tok_hi = int(offsets[doc_hi])
        src = token_hashes[tok_lo:tok_hi]
        m = len(src)
        if m == 0:
            doc_lo = doc_hi
            continue
        if m > len(tmp):
            tmp = np.empty(m, np.uint64)
            col = np.empty(m, np.uint32)
        ne = np.flatnonzero(sizes[doc_lo:doc_hi] > 0)
        st = offsets[doc_lo:doc_hi][ne] - tok_lo
        t, c = tmp[:m], col[:m]
        red = np.empty(len(st), np.uint32)
        all_ne = len(ne) == doc_hi - doc_lo
        for p in range(num_perm):
            np.multiply(src, a[p], out=t)
            np.add(t, b[p], out=t)
            np.right_shift(t, _N32, out=t)
            c[:] = t.view(np.uint32)[::2]  # LE low word == (v>>32) u32
            np.minimum.reduceat(c, st, out=red)
            if all_ne:
                out_t[p, doc_lo:doc_hi] = red
            else:
                out_t[p, doc_lo:doc_hi][ne] = red
        doc_lo = doc_hi
    return np.ascontiguousarray(out_t.T)


class AdaptivePermutationCache:
    """Per-worker memoization of hot-token permuted rows
    (src/rminhash/permutation_cache.rs:4-107).

    Web shingles are zipfian: a small set of token hashes dominates
    occurrences.  For those, the P-wide permuted row ``((a*h+b)>>32) u32``
    is computed once and re-used, replacing P multiplies per occurrence
    with a P-wide gather.  The cache only changes SPEED — signatures are
    bit-identical either way — so the adaptive policy (promote after
    ``min_frequency`` sightings, cap at ``max_hashes`` rows) is kept
    semantically but implemented with sorted numpy arrays instead of the
    reference's per-token hash-map probes.

    Off by default like the reference (DEFAULT_MAX_PERM_CACHE_HASHES=0,
    src/rminhash.rs:61-64); enable with ``RENSA_MAX_PERM_CACHE_HASHES``
    (clamped to 200_000) and tune ``RENSA_PERM_CACHE_MIN_FREQUENCY``.
    Intended as actor-pool signer state — one cache per worker process,
    warm across batches (stages/sign.py MinHashSigner.__init__).
    """

    MAX_MAX_HASHES = 200_000  # src/rminhash.rs:64

    def __init__(self, a: np.ndarray, b: np.ndarray, max_hashes: int,
                 min_frequency: int = 3):
        self.a, self.b = a, b
        self.max_hashes = min(max(int(max_hashes), 0), self.MAX_MAX_HASHES)
        self.min_frequency = max(int(min_frequency), 1)
        self.max_tracked = max(self.max_hashes * 4, 8_192)
        P = len(a)
        self.keys = np.empty(0, np.uint64)            # sorted
        self.cols = np.empty(0, np.int64)             # keys[i] → _buf column
        # slot-major (P, capacity) growable buffer in INSERTION order: the
        # hot path reads one contiguous row per permutation slot, and
        # promotion appends columns in place — keeping the matrix key-sorted
        # instead was a whole-cache copy per promotion (measured 64 MB/batch
        # at K=126k, 10-20× the kernel itself); (K, P) row-major would need
        # a 2-D transpose per batch (16 ms per 11k×128 — likewise more than
        # the whole plain kernel)
        self._buf = np.empty((P, 1024), np.uint32)
        self.n_cols = 0
        self.cand_keys = np.empty(0, np.uint64)       # sorted
        self.cand_counts = np.empty(0, np.int64)

    @classmethod
    def from_env(cls, a: np.ndarray, b: np.ndarray) -> "AdaptivePermutationCache | None":
        import os

        try:
            max_hashes = int(os.environ.get("RENSA_MAX_PERM_CACHE_HASHES", "0"))
        except ValueError:
            max_hashes = 0
        if max_hashes <= 0:
            return None
        try:
            min_freq = int(os.environ.get("RENSA_PERM_CACHE_MIN_FREQUENCY", "3"))
        except ValueError:
            min_freq = 3
        return cls(a, b, max_hashes, min_freq)

    def lookup(self, uniq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(hit_mask, cache_row_index) for sorted-unique ``uniq``."""
        pos = np.searchsorted(self.keys, uniq)
        posc = np.minimum(pos, max(len(self.keys) - 1, 0))
        hit = (self.keys[posc] == uniq) if len(self.keys) else \
            np.zeros(len(uniq), bool)
        return hit, posc

    def observe_and_promote(self, miss_uniq: np.ndarray,
                            miss_occurrences: np.ndarray) -> None:
        """Count sightings of missed tokens; promote ≥min_frequency ones.

        Promotion appends columns to the insertion-ordered buffer (amortized
        O(1) per column via capacity doubling) and np.inserts into the
        sorted (keys, cols) index — no whole-cache copies."""
        if len(miss_uniq) == 0 or self.n_cols >= self.max_hashes:
            return
        pos = np.searchsorted(self.cand_keys, miss_uniq)
        posc = np.minimum(pos, max(len(self.cand_keys) - 1, 0))
        known = (self.cand_keys[posc] == miss_uniq) if len(self.cand_keys) \
            else np.zeros(len(miss_uniq), bool)
        self.cand_counts[posc[known]] += miss_occurrences[known]
        new = ~known
        room = self.max_tracked - len(self.cand_keys)
        if new.any() and room > 0:
            nk = miss_uniq[new][:room]
            # np.insert keeps cand_keys sorted in one O(C+new) pass
            ins = np.searchsorted(self.cand_keys, nk)
            self.cand_keys = np.insert(self.cand_keys, ins, nk)
            self.cand_counts = np.insert(self.cand_counts, ins,
                                         miss_occurrences[new][:room])
        ready = np.flatnonzero(self.cand_counts >= self.min_frequency)
        if len(ready) == 0:
            return
        budget = self.max_hashes - self.n_cols
        promote = self.cand_keys[ready[:budget]]
        if len(promote) == 0:
            return
        B, n = len(promote), self.n_cols
        if n + B > self._buf.shape[1]:
            cap = max(2 * self._buf.shape[1], n + B)
            grown = np.empty((self._buf.shape[0], min(cap, self.max_hashes)),
                             np.uint32)
            grown[:, :n] = self._buf[:, :n]
            self._buf = grown
        self._buf[:, n:n + B] = _permute_u32_chunked(promote, self.a, self.b).T
        self.n_cols = n + B
        ins = np.searchsorted(self.keys, promote)
        self.keys = np.insert(self.keys, ins, promote)
        self.cols = np.insert(self.cols, ins, n + np.arange(B))
        keep = np.ones(len(self.cand_counts), bool)
        keep[ready[:budget]] = False
        self.cand_keys = self.cand_keys[keep]
        self.cand_counts = self.cand_counts[keep]


def _rmin_digest_matrix_cached(token_hashes: np.ndarray, offsets: np.ndarray,
                               num_perm: int,
                               cache: AdaptivePermutationCache) -> np.ndarray:
    """Unique+gather formulation with a warm cross-batch row cache."""
    n = len(offsets) - 1
    out = np.full((n, num_perm), RMIN_EMPTY, dtype=np.uint32)
    if len(token_hashes) == 0:
        return out
    uniq, inv = np.unique(token_hashes, return_inverse=True)
    hit, posc = cache.lookup(uniq)
    hit_idx, miss_idx = np.flatnonzero(hit), np.flatnonzero(~hit)
    hit_pos = cache.cols[posc[hit_idx]]
    H, M, U = len(hit_idx), len(miss_idx), len(uniq)
    # snapshot BEFORE observe_and_promote: a capacity grow rebinds the
    # buffer (existing column indices never change, appends only)
    rows_t = cache._buf
    miss_t = None
    if M:
        miss_t = np.ascontiguousarray(
            _permute_u32_chunked(uniq[miss_idx], cache.a, cache.b).T)  # (P, M)
        occ = np.bincount(inv, minlength=U)[miss_idx]
        cache.observe_and_promote(uniq[miss_idx], occ.astype(np.int64))
    sizes = offsets[1:] - offsets[:-1]
    nonempty = np.flatnonzero(sizes > 0)
    if len(nonempty) == 0:
        return out
    starts = offsets[:-1][nonempty]
    # repack uniq values as [hits..., misses...] so per-slot assembly writes
    # two contiguous slices; remap inv once to the packed layout
    lut = np.empty(U, np.int64)
    lut[hit_idx] = np.arange(H)
    lut[miss_idx] = H + np.arange(M)
    inv2 = lut[inv]
    # slot-major: per slot, one contiguous gather out of the (P, K) cache
    # + the precomputed miss columns, then one T-wide gather + reduceat —
    # no 2-D transpose anywhere (a (U, P) row-major assembly + transpose
    # measured slower than the whole uncached kernel)
    out_t = np.full((num_perm, n), RMIN_EMPTY, dtype=np.uint32)
    all_ne = len(nonempty) == n
    col_u = np.empty(U, np.uint32)
    col = np.empty(len(inv2), np.uint32)
    red = np.empty(len(starts), np.uint32)
    for p in range(num_perm):
        if H:
            np.take(rows_t[p], hit_pos, out=col_u[:H])
        if miss_t is not None:
            col_u[H:] = miss_t[p]
        np.take(col_u, inv2, out=col)
        np.minimum.reduceat(col, starts, out=red)
        if all_ne:
            out_t[p] = red
        else:
            out_t[p][nonempty] = red
    return np.ascontiguousarray(out_t.T)


def _permute_u32_chunked(uniq: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """((a*h+b) >> 32) u32 matrix for unique hashes, chunked to bound memory."""
    num_perm = len(a)
    out = np.empty((len(uniq), num_perm), dtype=np.uint32)
    step = max(_TOKEN_TILE_ELEMS // max(num_perm, 1), 1024)
    for s in range(0, len(uniq), step):
        h = uniq[s : s + step]
        full = h[:, None] * a[None, :] + b[None, :]
        out[s : s + step] = (full >> _N32).astype(np.uint32)
    return out


def cmin_digest_matrix(token_hashes: np.ndarray, offsets: np.ndarray,
                       num_perm: int, seed: int,
                       params: CMinParams | None = None) -> np.ndarray:
    """C-MinHash u64 signatures for n CSR documents → (n, num_perm) uint64."""
    from .hashing import tune_allocator

    tune_allocator()
    token_hashes = np.asarray(token_hashes, dtype=np.uint64)
    offsets = np.asarray(offsets, dtype=np.int64)
    validate_offsets(offsets, len(token_hashes))
    p = params if params is not None else CMinParams(num_perm, seed)
    n = len(offsets) - 1
    out = np.full((n, num_perm), CMIN_EMPTY, dtype=np.uint64)
    if len(token_hashes) == 0 or n == 0:
        return out
    sizes = offsets[1:] - offsets[:-1]
    nonempty = np.flatnonzero(sizes > 0)
    if len(nonempty) == 0:
        return out
    starts = offsets[:-1][nonempty]
    use_unique = _sampled_unique_ratio(token_hashes) < 0.7
    if use_unique:
        src, inv = np.unique(token_hashes, return_inverse=True)
    else:
        src, inv = token_hashes, None
    sigma = U64(p.sigma_a) * src + U64(p.sigma_b)
    base = U64(p.pi_c) * sigma
    pi_pre = p.pi_precomputed()  # (P,)
    # slot-at-a-time 1-D passes, slot-major output (see rmin_digest_matrix)
    out_t = np.full((num_perm, n), CMIN_EMPTY, dtype=np.uint64)
    if use_unique:
        all_ne = len(nonempty) == n
        col = np.empty(len(token_hashes), np.uint64)
        vk = np.empty(len(src), np.uint64)
        red = np.empty(len(starts), np.uint64)
        for k in range(num_perm):
            np.add(base, pi_pre[k], out=vk)
            np.take(vk, inv, out=col)
            np.minimum.reduceat(col, starts, out=red)
            if all_ne:
                out_t[k] = red
            else:
                out_t[k][nonempty] = red
        return np.ascontiguousarray(out_t.T)
    # Document-aligned L2 tiles over the precomputed base array (same
    # rationale + knob as rmin_digest_matrix).
    tile = _digest_tile_elems()
    total = len(token_hashes)
    vk = np.empty(min(total, tile * 2), np.uint64)
    doc_lo = 0
    while doc_lo < n:
        doc_hi = doc_lo
        tok_lo = offsets[doc_lo]
        while doc_hi < n and (offsets[doc_hi + 1] - tok_lo) <= tile:
            doc_hi += 1
        if doc_hi == doc_lo:
            doc_hi = doc_lo + 1
        tok_hi = int(offsets[doc_hi])
        bt = base[tok_lo:tok_hi]
        m = len(bt)
        if m == 0:
            doc_lo = doc_hi
            continue
        if m > len(vk):
            vk = np.empty(m, np.uint64)
        ne = np.flatnonzero(sizes[doc_lo:doc_hi] > 0)
        st = offsets[doc_lo:doc_hi][ne] - tok_lo
        v = vk[:m]
        red = np.empty(len(st), np.uint64)
        all_ne = len(ne) == doc_hi - doc_lo
        for k in range(num_perm):
            np.add(bt, pi_pre[k], out=v)
            np.minimum.reduceat(v, st, out=red)
            if all_ne:
                out_t[k, doc_lo:doc_hi] = red
            else:
                out_t[k, doc_lo:doc_hi][ne] = red
        doc_lo = doc_hi
    return np.ascontiguousarray(out_t.T)


def cmin_digest_u32(digest_u64: np.ndarray) -> np.ndarray:
    """32-bit digest view of a C-MinHash u64 signature (v >> 32)."""
    return (np.asarray(digest_u64, dtype=np.uint64) >> _N32).astype(np.uint32)


def jaccard_from_signatures(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of equal signature slots (src/rminhash.rs:266-294)."""
    sig_a = np.asarray(sig_a)
    sig_b = np.asarray(sig_b)
    if sig_a.shape != sig_b.shape:
        raise ValueError(
            f"num_perm mismatch: left is {sig_a.shape[-1]}, right is {sig_b.shape[-1]}"
        )
    if sig_a.size == 0:
        return 0.0
    return float(np.mean(sig_a == sig_b))


def pairwise_jaccard(sigs_a: np.ndarray, sigs_b: np.ndarray) -> np.ndarray:
    """Row-wise signature Jaccard for two aligned (n, P) matrices → (n,) float64."""
    return np.mean(sigs_a == sigs_b, axis=1)


# ---------------------------------------------------------------------------
# scalar reference paths (parity ground truth for tests)
# ---------------------------------------------------------------------------

def rmin_digest_scalar(token_hashes, num_perm: int, seed: int) -> list[int]:
    """Straight transliteration of the reference per-document min-fold."""
    a, b = build_rmin_permutations(num_perm, seed)
    sig = [0xFFFFFFFF] * num_perm
    for h in token_hashes:
        h = int(h)
        for k in range(num_perm):
            v = permute_hash(h, int(a[k]), int(b[k]))
            if v < sig[k]:
                sig[k] = v
    return sig


def cmin_digest_scalar(token_hashes, num_perm: int, seed: int) -> list[int]:
    """Scalar C-MinHash (src/cminhash/core.rs:104-222)."""
    p = CMinParams(num_perm, seed)
    sig = [_M64] * num_perm
    pi_pre = [((p.pi_c * k) + p.pi_d) & _M64 for k in range(num_perm)]
    for h in token_hashes:
        sigma = (p.sigma_a * int(h) + p.sigma_b) & _M64
        base = (p.pi_c * sigma) & _M64
        for k in range(num_perm):
            v = (base + pi_pre[k]) & _M64
            if v < sig[k]:
                sig[k] = v
    return sig


# ---------------------------------------------------------------------------
# One-permutation hashing (OPH) — the O(tokens + num_perm) scale path
# ---------------------------------------------------------------------------
#
# The reference ships "rho", an O(tokens) multi-probe sketch, as its
# speed-vs-recall alternative to the standard O(tokens × num_perm) digest
# (src/rho.rs; explicitly non-parity with the standard path).  Our analogue
# is one-permutation hashing with rotation densification (Li, Owen, Zhang
# 2012; Shrivastava & Li 2014): each token lands in ONE of num_perm buckets,
# each bucket keeps the min mixed hash, and empty buckets borrow circularly
# from the nearest filled bucket to their right.  Like rho, OPH digests are
# NOT comparable with R-MinHash digests — use one algo per pipeline.

_OPH_SEED_MIX = np.uint64(0x9E3779B97F4A7C15)


def _oph_mix(h: np.ndarray, seed: int) -> np.ndarray:
    """SplitMix64 finalizer over (hash ^ f(seed)) — decorrelates runs."""
    with np.errstate(over="ignore"):  # u64 wrapping is the point
        z = np.asarray(h, np.uint64) ^ (np.uint64(seed) * _OPH_SEED_MIX)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def oph_digest_scalar(token_hashes, num_perm: int, seed: int) -> list[int]:
    """Scalar OPH reference (parity ground truth for the batch kernel)."""
    sig = [int(CMIN_EMPTY)] * num_perm
    for h in token_hashes:
        z = int(_oph_mix(np.uint64(int(h)), seed))
        k = z % num_perm
        if z < sig[k]:
            sig[k] = z
    # rotation densification: empty bucket k copies the nearest filled
    # bucket at (k + j) % num_perm, smallest j > 0
    filled = [v != int(CMIN_EMPTY) for v in sig]
    if not any(filled):
        return sig
    out = list(sig)
    for k in range(num_perm):
        if not filled[k]:
            j = 1
            while not filled[(k + j) % num_perm]:
                j += 1
            out[k] = sig[(k + j) % num_perm]
    return out


def oph_digest_matrix(token_hashes: np.ndarray, offsets: np.ndarray,
                      num_perm: int, seed: int) -> np.ndarray:
    """OPH signatures for n CSR documents → (n, num_perm) uint64.

    One pass over tokens (sort by doc·P+bucket, reduceat-min), then a fully
    vectorized circular fill-right densification.  Empty docs stay all
    sentinel (same convention as C-MinHash).
    """
    from .hashing import tune_allocator

    tune_allocator()
    token_hashes = np.asarray(token_hashes, dtype=np.uint64)
    offsets = np.asarray(offsets, dtype=np.int64)
    validate_offsets(offsets, len(token_hashes))
    n = len(offsets) - 1
    P = num_perm
    out = np.full((n, P), CMIN_EMPTY, dtype=np.uint64)
    if len(token_hashes) == 0 or n == 0:
        return out
    sizes = offsets[1:] - offsets[:-1]
    doc_of = np.repeat(np.arange(n, dtype=np.int64), sizes)
    z = _oph_mix(token_hashes, seed)
    bucket = (z % np.uint64(P)).astype(np.int64)
    slot = doc_of * P + bucket
    order = np.argsort(slot, kind="stable")
    slot_s, z_s = slot[order], z[order]
    starts = np.flatnonzero(np.concatenate([[True], slot_s[1:] != slot_s[:-1]]))
    mins = np.minimum.reduceat(z_s, starts)
    out.reshape(-1)[slot_s[starts]] = mins
    # densification: for each row, empty slots take the value of the nearest
    # filled slot to the RIGHT (circular).  Scan right-to-left over the row
    # tiled twice to resolve the wrap-around in one vectorized pass.
    filled = out != CMIN_EMPTY
    any_filled = filled.any(axis=1)
    if not filled.all():  # any empty slot anywhere
        twice = np.concatenate([out, out], axis=1)            # (n, 2P)
        f2 = np.concatenate([filled, filled], axis=1)
        # index of the next filled column at or after j, scanned from right
        idx = np.where(f2, np.arange(2 * P)[None, :], 2 * P + 1)
        nxt = np.minimum.accumulate(idx[:, ::-1], axis=1)[:, ::-1]
        take = np.clip(nxt[:, :P], 0, 2 * P - 1)
        dens = np.take_along_axis(twice, take, axis=1)
        rows = any_filled & ~filled.all(axis=1)
        out[rows] = np.where(filled[rows], out[rows], dens[rows])
    return out
