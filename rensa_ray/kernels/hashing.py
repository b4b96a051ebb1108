"""Bit-exact hash / PRNG kernels.

These reproduce the reference's math exactly so that LSH collisions — and
therefore duplicate flags and cluster assignments — are reproducible:

- ``fxhash64``            — FxHasher-compatible token hash
                            (reference: src/utils.rs:129-185, rustc-hash 2.x
                            ``hash_bytes`` + final multiply/rotate).
- ``fxhash64_flat``       — the same hash vectorized with numpy over many
                            variable-length byte strings stored in one flat
                            buffer (grouped by length; the reference gets its
                            speed from Rust+SIMD, we get ours from batching).
- ``splitmix64`` / ``Xoshiro256PlusPlus`` — rand_xoshiro 0.7-compatible PRNG;
                            ``seed_from_u64`` uses SplitMix64 seeding
                            (reference: src/rminhash.rs:142 via rand_xoshiro).
- ``build_rmin_permutations`` — (a|1, b) pairs (src/rminhash.rs:138-150).
- ``CMinParams``          — sigma/pi parameters (src/cminhash.rs:69-86).
- ``permute_hash`` / ``permute_hash_matrix`` — ((a*h+b) >> 32) as u32
                            (src/utils.rs:189-191).
- ``band_hash`` / ``band_hash_matrix`` — FxHasher polynomial over u32 bands
                            (src/utils.rs:195-223).

All wrapping u64 arithmetic; numpy unsigned ints wrap natively.  Scalar
(python-int) versions exist for every kernel and are the ground truth for the
vectorized versions' parity tests.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

if sys.byteorder != "little":  # pragma: no cover
    # several hot kernels read u64 halves via reinterpret views
    # (tmp.view(np.uint32)[::2] == v >> 32 only on LE); on a big-endian host
    # those would produce silently wrong signatures while the scalar parity
    # path stayed right — fail loudly instead
    raise RuntimeError(
        "rensa_ray's vectorized hash kernels assume a little-endian host; "
        "big-endian platforms are not supported")

import numpy as np

_M64 = (1 << 64) - 1

_ALLOCATOR_TUNED = False


def tune_allocator() -> None:
    """Raise glibc's mmap threshold so large numpy temporaries are reused.

    This sandbox's VM makes first-touch page faults extremely slow; by default
    glibc mmap()s allocations >128KiB and munmap()s them on free, so every
    batch re-faults hundreds of MB (measured 4-10x slowdown on the permute
    broadcast).  With the threshold raised, freed blocks stay on the heap free
    list and are reused.  Safe no-op on non-glibc platforms.  Called lazily
    from the hot kernels so every Ray worker process self-tunes.
    """
    global _ALLOCATOR_TUNED
    if _ALLOCATOR_TUNED:
        return
    _ALLOCATOR_TUNED = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD = -3
    except Exception:
        pass

# rustc-hash 2.x constants (reference src/utils.rs:2-17, 64-bit target).
_K = 0xF1357AEA2E62A9C5
_ROTATE = 26
_SEED1 = 0x243F6A8885A308D3
_SEED2 = 0x13198A2E03707344
_PREVENT_TRIVIAL_ZERO_COLLAPSE = 0xA4093822299F31D0

U64 = np.uint64
_NK = U64(_K)
_NSEED1 = U64(_SEED1)
_NSEED2 = U64(_SEED2)
_NPTZC = U64(_PREVENT_TRIVIAL_ZERO_COLLAPSE)
_N32 = U64(32)
_M32 = U64(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# scalar kernels (python ints, masked to 64 bits)
# ---------------------------------------------------------------------------

def _rotl64(v: int, r: int) -> int:
    return ((v << r) | (v >> (64 - r))) & _M64


def _multiply_mix(x: int, y: int) -> int:
    full = x * y
    return (full & _M64) ^ (full >> 64)


def _hash_bytes(data: bytes) -> int:
    ln = len(data)
    s0 = _SEED1
    s1 = _SEED2
    if ln <= 16:
        if ln >= 8:
            s0 ^= int.from_bytes(data[0:8], "little")
            s1 ^= int.from_bytes(data[ln - 8 : ln], "little")
        elif ln >= 4:
            s0 ^= int.from_bytes(data[0:4], "little")
            s1 ^= int.from_bytes(data[ln - 4 : ln], "little")
        elif ln > 0:
            lo = data[0]
            mid = data[ln // 2]
            hi = data[ln - 1]
            s0 ^= lo
            s1 ^= (hi << 8) | mid
    else:
        off = 0
        while off < ln - 16:
            x = int.from_bytes(data[off : off + 8], "little")
            y = int.from_bytes(data[off + 8 : off + 16], "little")
            t = _multiply_mix(s0 ^ x, _PREVENT_TRIVIAL_ZERO_COLLAPSE ^ y)
            s0 = s1
            s1 = t
            off += 16
        s0 ^= int.from_bytes(data[ln - 16 : ln - 8], "little")
        s1 ^= int.from_bytes(data[ln - 8 : ln], "little")
    return _multiply_mix(s0, s1) ^ ln


def fxhash64(data: bytes) -> int:
    """FxHasher-compatible u64 hash of a byte string (scalar)."""
    compressed = _hash_bytes(bytes(data))
    return _rotl64((compressed * _K) & _M64, _ROTATE)


def band_hash(band) -> int:
    """FxHasher polynomial over a sequence of u32 values (scalar).

    Packs pairs of u32 into u64 writes exactly like the reference
    (src/utils.rs:195-223); remainder values written as u32.
    """
    h = 0
    i = 0
    n = len(band)
    while i + 4 <= n:
        val1 = (int(band[i]) | (int(band[i + 1]) << 32)) & _M64
        val2 = (int(band[i + 2]) | (int(band[i + 3]) << 32)) & _M64
        h = ((h + val1) * _K) & _M64
        h = ((h + val2) * _K) & _M64
        i += 4
    while i < n:
        h = ((h + int(band[i])) * _K) & _M64
        i += 1
    return _rotl64(h, _ROTATE)


def permute_hash(h: int, a: int, b: int) -> int:
    """One R-MinHash permutation: ((a*h + b) >> 32) as u32 (scalar)."""
    return ((a * h + b) & _M64) >> 32


def splitmix64_next(state: int) -> tuple[int, int]:
    """One SplitMix64 step; returns (new_state, output)."""
    state = (state + 0x9E3779B97F4A7C15) & _M64
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    z ^= z >> 31
    return state, z


class Xoshiro256PlusPlus:
    """xoshiro256++ with rand_xoshiro-compatible SplitMix64 u64 seeding."""

    __slots__ = ("s",)

    def __init__(self, seed: int):
        state = seed & _M64
        s = []
        for _ in range(4):
            state, z = splitmix64_next(state)
            s.append(z)
        self.s = s

    def next_u64(self) -> int:
        s = self.s
        result = (_rotl64((s[0] + s[3]) & _M64, 23) + s[0]) & _M64
        t = (s[1] << 17) & _M64
        s[2] ^= s[0]
        s[3] ^= s[1]
        s[1] ^= s[2]
        s[0] ^= s[3]
        s[2] ^= t
        s[3] = _rotl64(s[3], 45)
        return result


def build_rmin_permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a|1, b) permutation pairs as uint64 arrays (src/rminhash.rs:138-150)."""
    if num_perm <= 0:
        raise ValueError("num_perm must be greater than 0")
    rng = Xoshiro256PlusPlus(seed)
    a = np.empty(num_perm, dtype=np.uint64)
    b = np.empty(num_perm, dtype=np.uint64)
    for i in range(num_perm):
        a[i] = rng.next_u64() | 1
        b[i] = rng.next_u64()
    return a, b


@dataclass(frozen=True)
class CMinParams:
    """C-MinHash sigma/pi parameters (src/cminhash.rs:60-86)."""

    num_perm: int
    seed: int
    sigma_a: int = field(init=False, default=0)
    sigma_b: int = field(init=False, default=0)
    pi_c: int = field(init=False, default=0)
    pi_d: int = field(init=False, default=0)

    def __post_init__(self):
        if self.num_perm <= 0:
            raise ValueError("num_perm must be greater than 0")
        rng = Xoshiro256PlusPlus(self.seed)
        object.__setattr__(self, "sigma_a", rng.next_u64() | 1)
        object.__setattr__(self, "sigma_b", rng.next_u64())
        object.__setattr__(self, "pi_c", rng.next_u64() | 1)
        object.__setattr__(self, "pi_d", rng.next_u64())

    def pi_precomputed(self) -> np.ndarray:
        """pi_c * k + pi_d for k in 0..num_perm (src/cminhash/core.rs:38-46)."""
        k = np.arange(self.num_perm, dtype=np.uint64)
        return U64(self.pi_c) * k + U64(self.pi_d)


# ---------------------------------------------------------------------------
# vectorized kernels
# ---------------------------------------------------------------------------

def _mulmix_vec(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized multiply_mix: lo64(x*y) ^ hi64(x*y) via 32-bit limbs."""
    lo = x * y
    xl = x & _M32
    xh = x >> _N32
    yl = y & _M32
    yh = y >> _N32
    ll = xl * yl
    lh = xl * yh
    hl = xh * yl
    hh = xh * yh
    carry = ((ll >> _N32) + (lh & _M32) + (hl & _M32)) >> _N32
    hi = hh + (lh >> _N32) + (hl >> _N32) + carry
    return lo ^ hi


def rotl64_vec(v: np.ndarray, r: int) -> np.ndarray:
    return (v << U64(r)) | (v >> U64(64 - r))


def _read_u64_cols(m: np.ndarray, off: int) -> np.ndarray:
    """Little-endian u64 read at a fixed column offset of a (k, L) u8 matrix."""
    sub = np.ascontiguousarray(m[:, off : off + 8])
    return sub.view("<u8").reshape(len(m)).astype(np.uint64, copy=False)


def _read_u32_cols(m: np.ndarray, off: int) -> np.ndarray:
    sub = np.ascontiguousarray(m[:, off : off + 4])
    return sub.view("<u4").reshape(len(m)).astype(np.uint64)


def _hash_bytes_fixed_len(m: np.ndarray) -> np.ndarray:
    """Vectorized _hash_bytes for k byte strings of identical length L."""
    k, ln = m.shape
    s0 = np.full(k, _NSEED1, dtype=np.uint64)
    s1 = np.full(k, _NSEED2, dtype=np.uint64)
    if ln <= 16:
        if ln >= 8:
            s0 ^= _read_u64_cols(m, 0)
            s1 ^= _read_u64_cols(m, ln - 8)
        elif ln >= 4:
            s0 ^= _read_u32_cols(m, 0)
            s1 ^= _read_u32_cols(m, ln - 4)
        elif ln > 0:
            s0 ^= m[:, 0].astype(np.uint64)
            s1 ^= (m[:, ln - 1].astype(np.uint64) << U64(8)) | m[:, ln // 2].astype(np.uint64)
    else:
        off = 0
        while off < ln - 16:
            x = _read_u64_cols(m, off)
            y = _read_u64_cols(m, off + 8)
            t = _mulmix_vec(s0 ^ x, _NPTZC ^ y)
            s0 = s1
            s1 = t
            off += 16
        s0 = s0 ^ _read_u64_cols(m, ln - 16)
        s1 = s1 ^ _read_u64_cols(m, ln - 8)
    return _mulmix_vec(s0, s1) ^ U64(ln)


def _gather_u64le(view64: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Little-endian u64 read at arbitrary byte positions of a padded buffer.

    ``view64`` is the buffer viewed as ``<u8`` words with ≥8 bytes of zero
    padding past every valid ``pos``; an unaligned read is two aligned loads
    shift-combined (shift-by-64 is avoided via the sh==0 select)."""
    w = pos >> 3
    sh = (pos.astype(np.uint64) & U64(7)) << U64(3)
    lo = view64[w]
    hi = view64[w + 1]
    # (hi<<1)<<(63-sh) == hi<<(64-sh) for sh>0 and 0 for sh==0 — branch-free
    return (lo >> sh) | ((hi << U64(1)) << (U64(63) - sh))


def fxhash64_flat(flat: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized fxhash64 over variable-length slices of one flat u8 buffer.

    ``flat`` is a uint8 array; item i is ``flat[starts[i] : starts[i]+lengths[i]]``.
    All reads are unaligned u64 gathers at data-dependent offsets, so items
    need NO length grouping: the four length regimes of the scalar hash
    (<4, <8, ≤16, >16 bytes) each run as one masked vector pass, and the
    >16 chaining loop iterates with a shrinking live set.  ~6× faster than
    the per-length (k, L) byte-matrix formulation on word-shingle input
    (no k×L index matrix, no per-8-byte-column reassembly).
    """
    tune_allocator()
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    flat = np.ascontiguousarray(flat, dtype=np.uint8)
    starts = np.asarray(starts, dtype=np.int64)
    ln = np.asarray(lengths, dtype=np.int64)
    # pad so view64[w+1] is valid for every in-range byte position
    fp = np.concatenate([flat, np.zeros(16, np.uint8)])
    view64 = fp[: (len(fp) // 8) * 8].view("<u8")

    s0 = np.full(n, _NSEED1, dtype=np.uint64)
    s1 = np.full(n, _NSEED2, dtype=np.uint64)
    m_tiny = (ln > 0) & (ln < 4)
    if m_tiny.any():
        idx = np.flatnonzero(m_tiny)
        st, l = starts[idx], ln[idx]
        s0[idx] ^= fp[st].astype(np.uint64)
        s1[idx] ^= ((fp[st + l - 1].astype(np.uint64) << U64(8))
                    | fp[st + l // 2].astype(np.uint64))
    m_u32 = (ln >= 4) & (ln < 8)
    if m_u32.any():
        idx = np.flatnonzero(m_u32)
        st, l = starts[idx], ln[idx]
        s0[idx] ^= _gather_u64le(view64, st) & _M32
        s1[idx] ^= _gather_u64le(view64, st + l - 4) & _M32
    m_u64 = (ln >= 8) & (ln <= 16)
    if m_u64.any():
        idx = np.flatnonzero(m_u64)
        st, l = starts[idx], ln[idx]
        s0[idx] ^= _gather_u64le(view64, st)
        s1[idx] ^= _gather_u64le(view64, st + l - 8)
    m_one = (ln > 16) & (ln <= 32)
    if m_one.any():
        # single chaining iteration, straight-line (the dominant regime for
        # word trigrams): s0 = seed2 ^ tail0, s1 = mulmix(seed1^x, C^y) ^ tail1
        idx = np.flatnonzero(m_one)
        st, l = starts[idx], ln[idx]
        t = _mulmix_vec(_NSEED1 ^ _gather_u64le(view64, st),
                        _NPTZC ^ _gather_u64le(view64, st + 8))
        s0[idx] = _NSEED2 ^ _gather_u64le(view64, st + l - 16)
        s1[idx] = t ^ _gather_u64le(view64, st + l - 8)
    m_long = ln > 32
    if m_long.any():
        idx = np.flatnonzero(m_long)
        st, l = starts[idx], ln[idx]
        a0 = np.full(len(idx), _NSEED1, dtype=np.uint64)
        a1 = np.full(len(idx), _NSEED2, dtype=np.uint64)
        off = np.zeros(len(idx), dtype=np.int64)
        live = np.arange(len(idx))
        while len(live):
            live = live[off[live] < l[live] - 16]
            if not len(live):
                break
            p = st[live] + off[live]
            x = _gather_u64le(view64, p)
            y = _gather_u64le(view64, p + 8)
            t = _mulmix_vec(a0[live] ^ x, _NPTZC ^ y)
            a0[live] = a1[live]
            a1[live] = t
            off[live] += 16
        a0 ^= _gather_u64le(view64, st + l - 16)
        a1 ^= _gather_u64le(view64, st + l - 8)
        s0[idx], s1[idx] = a0, a1
    h = _mulmix_vec(s0, s1) ^ ln.astype(np.uint64)
    return rotl64_vec(h * _NK, _ROTATE)


def _fxhash64_flat_grouped(flat: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Previous per-length-group formulation — kept as an independent
    implementation for randomized parity tests of ``fxhash64_flat``."""
    tune_allocator()
    n = len(starts)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    flat = np.ascontiguousarray(flat, dtype=np.uint8)
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    order = np.argsort(lengths, kind="stable")
    ls = lengths[order]
    bounds = np.flatnonzero(np.diff(ls)) + 1
    group_starts = np.concatenate([[0], bounds, [n]])
    for g in range(len(group_starts) - 1):
        lo, hi = group_starts[g], group_starts[g + 1]
        idx = order[lo:hi]
        ln = int(ls[lo])
        if ln == 0:
            m = np.empty((hi - lo, 0), dtype=np.uint8)
        else:
            m = flat[starts[idx][:, None] + np.arange(ln)]
        h = _hash_bytes_fixed_len(m)
        out[idx] = rotl64_vec(h * _NK, _ROTATE)
    return out


def fxhash64_bytes_list(items: list[bytes]) -> np.ndarray:
    """Vectorized fxhash64 over a python list of byte strings."""
    if not items:
        return np.empty(0, dtype=np.uint64)
    lengths = np.fromiter((len(b) for b in items), count=len(items), dtype=np.int64)
    starts = np.zeros(len(items), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    flat = np.frombuffer(b"".join(items), dtype=np.uint8)
    return fxhash64_flat(flat, starts, lengths)


def permute_hash_matrix(hashes: np.ndarray, a: np.ndarray, b: np.ndarray,
                        out: np.ndarray | None = None) -> np.ndarray:
    """(T, P) u32 matrix of permuted hashes: ((a*h + b) >> 32) as u32."""
    hashes = np.asarray(hashes, dtype=np.uint64)
    full = hashes[:, None] * a[None, :] + b[None, :]
    res = (full >> _N32).astype(np.uint32)
    if out is not None:
        out[:] = res
        return out
    return res


def band_hash_matrix(bands: np.ndarray) -> np.ndarray:
    """Vectorized band_hash over a (n, band_size) uint32 matrix → (n,) uint64."""
    bands = np.asarray(bands, dtype=np.uint32)
    n, bs = bands.shape
    h = np.zeros(n, dtype=np.uint64)
    i = 0
    while i + 4 <= bs:
        val1 = bands[:, i].astype(np.uint64) | (bands[:, i + 1].astype(np.uint64) << _N32)
        val2 = bands[:, i + 2].astype(np.uint64) | (bands[:, i + 3].astype(np.uint64) << _N32)
        h = (h + val1) * _NK
        h = (h + val2) * _NK
        i += 4
    while i < bs:
        h = (h + bands[:, i].astype(np.uint64)) * _NK
        i += 1
    return rotl64_vec(h, _ROTATE)


def splitmix64_stream(seed: int, n: int) -> np.ndarray:
    """Vectorized stateless SplitMix64 stream: out[i] = mix(seed + (i+1)*GAMMA).

    Counter-mode form of SplitMix64 (identical mixer constants to
    ``splitmix64_next``); any worker regenerates the stream from (seed, n).
    Used for deterministic auxiliary randomness (e.g. LSH hyperplanes).
    """
    gamma = np.uint64(0x9E3779B97F4A7C15)
    idx = np.arange(1, n + 1, dtype=np.uint64)
    z = np.uint64(seed) + idx * gamma
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))
