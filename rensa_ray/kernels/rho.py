"""Rho multi-probe sketch — bit-parity with the reference's fast path.

The rho sketch (src/rminhash/rho.rs) is the reference's O(tokens) answer to
the O(tokens x num_perm) R-MinHash digest: each token hash is mixed with
SplitMix64 and scattered into ``probes`` buckets of a ``num_perm``-wide row
(keeping the min high-32-bits per bucket), with three adaptive recall aids:

- per-row TOKEN BUDGET (src/rminhash/rho.rs:108-130): short rows (<=32
  tokens) hash everything; medium rows (<=96) midpoint-sample 64 tokens;
  long rows sample max(num_perm/9, 15).  Sampling uses the deterministic
  MidpointSampler (rho.rs:297-341) so any two engines pick the same tokens.
- a SPARSE SIDECAR (rho.rs:466-491): rows that filled fewer than
  ~(56*num_perm+64)/128 buckets are marked sparse and carry a small
  8-permutation classic-MinHash verify signature for downstream precision
  gating (src/lsh/one_shot.rs sparse-verify).
- optional adaptive PROBES and DENSIFY passes (env-gated, default off;
  rho.rs:161-210, 535-577).

All integer math reproduces the Rust bit-for-bit (SplitMix64 finalizer,
mix_u32, wrapping u32/u64 ops), so a digest built here hashes into the same
LSH bands as the reference's.

Scalar functions are the transcription ground truth; the ``*_matrix``
kernels are the vectorized equivalents used by the Ray stages, tested equal
on random CSR inputs (tests/test_rho.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1
EMPTY_BUCKET = 0xFFFFFFFF  # u32::MAX (src/rminhash.rs:86)

# src/rminhash/rho.rs:517-522
RHO_SALTS = (0x517CC1B727220A95, 0x6EED0E9DA4D94A4F,
             0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9)
_SPARSE_SEED_XOR = 0x243F6A8885A308D3      # rho.rs:590
_SPARSE_SEED_MUL = 0x9E3779B97F4A7C15      # rho.rs:591

# defaults/clamps: src/rminhash.rs:65-86
DEFAULT_RHO_PROBES = 4
MIN_RHO_PROBES, MAX_RHO_PROBES = 1, 4
DEFAULT_RHO_TOKEN_BUDGET_MIN = 15
MAX_RHO_TOKEN_BUDGET = 4096
DEFAULT_RHO_SHORT_FULL_TOKEN_THRESHOLD = 32
DEFAULT_RHO_MEDIUM_TOKEN_THRESHOLD = 96
MIN_RHO_MEDIUM_TOKEN_THRESHOLD, MAX_RHO_MEDIUM_TOKEN_THRESHOLD = 33, 65_536
DEFAULT_RHO_MEDIUM_TOKEN_BUDGET = 64
MIN_RHO_MEDIUM_TOKEN_BUDGET = 1
DEFAULT_RHO_SPARSE_OCCUPANCY_THRESHOLD_BASE = 56
MIN_RHO_SPARSE_OCC_BASE, MAX_RHO_SPARSE_OCC_BASE = 1, 512
DEFAULT_RHO_SPARSE_VERIFY_PERM = 8
MIN_RHO_SPARSE_VERIFY_PERM, MAX_RHO_SPARSE_VERIFY_PERM = 1, 64
DEFAULT_RHO_LONG_DOC_FACTOR = 4
MIN_RHO_LONG_DOC_THRESHOLD, MAX_RHO_LONG_DOC_THRESHOLD = 64, 8192


def _env_int_clamped(key: str, default: int, lo: int, hi: int) -> int:
    """src/env.rs read_env_usize_clamped: unparsable -> default, else clamp."""
    raw = os.environ.get(key)
    if raw is None:
        return default
    try:
        return min(max(int(raw), lo), hi)
    except ValueError:
        return default


def _env_float_clamped(key: str, default: float, lo: float, hi: float) -> float:
    """src/env.rs read_env_f64_clamped."""
    raw = os.environ.get(key)
    if raw is None:
        return default
    try:
        return min(max(float(raw), lo), hi)
    except ValueError:
        return default


def splitmix64(value: int) -> int:
    """SplitMix64 step+finalize of a VALUE (src/rminhash/rho.rs:33-39)."""
    value = (value + 0x9E3779B97F4A7C15) & _M64
    value = ((value ^ (value >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    value = ((value ^ (value >> 27)) * 0x94D049BB133111EB) & _M64
    return value ^ (value >> 31)


def splitmix64_vec(value: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):  # u64 wrapping is the point
        z = np.asarray(value, np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def mix_u32(value: int) -> int:
    """32-bit finalizer (src/rminhash/rho.rs:41-48)."""
    value &= _M32
    value ^= value >> 16
    value = (value * 0x7FEB352D) & _M32
    value ^= value >> 15
    value = (value * 0x846CA68B) & _M32
    return (value ^ (value >> 16)) & _M32


def mix_u32_vec(value: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):  # u32 wrapping is the point
        z = np.asarray(value, np.uint32)
        z = z ^ (z >> np.uint32(16))
        z = z * np.uint32(0x7FEB352D)
        z = z ^ (z >> np.uint32(15))
        z = z * np.uint32(0x846CA68B)
        return z ^ (z >> np.uint32(16))


# ---------------------------------------------------------------------------
# Midpoint sampler (src/rminhash/rho.rs:297-341)
# ---------------------------------------------------------------------------

def midpoint_sample_indices_scalar(total: int, limit: int) -> list[int]:
    """Iterative transcription of MidpointSampler::new + next."""
    denom = limit * 2
    total_div = total // limit
    total_rem = total - total_div * limit
    q = total_div // 2
    r = total_rem if (total_div & 1) == 0 else limit + total_rem
    step_div, step_mod = total_div, total_rem * 2
    out = []
    for _ in range(limit):
        out.append(q)
        r += step_mod
        q += step_div
        if r >= denom:
            r -= denom
            q += 1
    return out


def _midpoint_indices_closed_form(total_arr, limit_arr, k) -> np.ndarray:
    """Vectorized sampler: index_k = q0 + k*step + carries.

    The iterative sampler adds ``step_mod`` to r each step and emits a +1
    carry whenever r wraps past ``denom``; since step_mod < denom the carry
    count after k steps is exactly floor((r0 + k*step_mod)/denom), giving
    the closed form used here (verified against the iterative sampler in
    tests/test_rho.py).
    """
    total = np.asarray(total_arr, np.int64)
    limit = np.asarray(limit_arr, np.int64)
    denom = limit * 2
    total_div = total // limit
    total_rem = total - total_div * limit
    q0 = total_div // 2
    r0 = np.where((total_div & 1) == 0, total_rem, limit + total_rem)
    return q0 + k * total_div + (r0 + k * (total_rem * 2)) // denom


# ---------------------------------------------------------------------------
# Config (env surface mirrors RhoSketchConfig::from_env, rho.rs:212-254)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RhoParams:
    probes: int
    default_token_budget: int | None     # None = hash every token
    has_token_budget_override: bool
    medium_token_threshold: int
    medium_token_budget: int
    sparse_occupancy_threshold: int
    sparse_verify_perm: int              # 0 = sparse verify disabled
    densify_enabled: bool
    adaptive_probes_enabled: bool
    long_doc_threshold: int

    @classmethod
    def from_env(cls, num_perm: int, probes: int = DEFAULT_RHO_PROBES) -> "RhoParams":
        probes = min(max(probes, MIN_RHO_PROBES), MAX_RHO_PROBES)
        default_budget: int | None = max(num_perm // 9, DEFAULT_RHO_TOKEN_BUDGET_MIN)
        override = "RENSA_RHO_TOKEN_BUDGET" in os.environ
        if override:
            raw = os.environ["RENSA_RHO_TOKEN_BUDGET"]
            try:
                v = int(raw)
                if v < 0:
                    raise ValueError  # usize parse failure in the reference
                clamped = min(v, MAX_RHO_TOKEN_BUDGET)
                default_budget = None if clamped == 0 else clamped
            except ValueError:
                # unparsable/negative -> keep the computed default BUT
                # override stays True (reference: map_or(Some(default_budget),
                # ...) with rho_token_budget_env_override_is_set() =
                # var_os().is_some(), rho.rs:55-75) — the medium/short
                # regimes are skipped even for an unparsable value,
                # deliberately matching that quirk
                pass
        if override:
            med_thresh, med_budget = 0, 0
        else:
            med_thresh = _env_int_clamped(
                "RENSA_RHO_MEDIUM_TOKEN_THRESHOLD",
                DEFAULT_RHO_MEDIUM_TOKEN_THRESHOLD,
                MIN_RHO_MEDIUM_TOKEN_THRESHOLD, MAX_RHO_MEDIUM_TOKEN_THRESHOLD)
            med_budget = _env_int_clamped(
                "RENSA_RHO_MEDIUM_TOKEN_BUDGET",
                DEFAULT_RHO_MEDIUM_TOKEN_BUDGET,
                MIN_RHO_MEDIUM_TOKEN_BUDGET, MAX_RHO_TOKEN_BUDGET)
        occ_base = _env_int_clamped(
            "RENSA_RHO_SPARSE_OCCUPANCY_THRESHOLD",
            DEFAULT_RHO_SPARSE_OCCUPANCY_THRESHOLD_BASE,
            MIN_RHO_SPARSE_OCC_BASE, MAX_RHO_SPARSE_OCC_BASE)
        occ = min(max((occ_base * num_perm + 64) // 128, 1), max(num_perm, 1))
        if os.environ.get("RENSA_RHO_SPARSE_VERIFY_ENABLE", "1") != "0":
            sv_perm = _env_int_clamped(
                "RENSA_RHO_SPARSE_VERIFY_PERM", DEFAULT_RHO_SPARSE_VERIFY_PERM,
                MIN_RHO_SPARSE_VERIFY_PERM,
                min(MAX_RHO_SPARSE_VERIFY_PERM, max(num_perm, 1)))
        else:
            sv_perm = 0
        # adaptive probes + densify are opt-IN (rho.rs:161-168, 203-210:
        # is_some_and(!= "0") — unset defaults to "0" here, i.e. disabled)
        adaptive = os.environ.get("RENSA_RHO_ADAPTIVE_PROBES", "0") != "0"
        densify = os.environ.get("RENSA_RHO_DENSIFY", "0") != "0"
        long_default = min(max(num_perm * DEFAULT_RHO_LONG_DOC_FACTOR,
                               MIN_RHO_LONG_DOC_THRESHOLD),
                           MAX_RHO_LONG_DOC_THRESHOLD)
        long_thresh = _env_int_clamped(
            "RENSA_RHO_LONG_DOC_THRESHOLD", long_default,
            MIN_RHO_LONG_DOC_THRESHOLD, MAX_RHO_LONG_DOC_THRESHOLD)
        return cls(probes=probes, default_token_budget=default_budget,
                   has_token_budget_override=override,
                   medium_token_threshold=med_thresh,
                   medium_token_budget=med_budget,
                   sparse_occupancy_threshold=occ, sparse_verify_perm=sv_perm,
                   densify_enabled=densify, adaptive_probes_enabled=adaptive,
                   long_doc_threshold=long_thresh)

    def row_token_budget(self, source_token_count: int) -> int | None:
        """Per-row adaptive budget (rho.rs:108-130); None = hash all."""
        if self.has_token_budget_override:
            return self.default_token_budget
        if source_token_count <= DEFAULT_RHO_SHORT_FULL_TOKEN_THRESHOLD:
            return None
        if source_token_count <= self.medium_token_threshold:
            return self.medium_token_budget
        return self.default_token_budget

    def row_probes(self, source_token_count: int, num_perm: int) -> int:
        """effective_rho_probes (rho.rs:186-201)."""
        if self.probes <= 1 or not self.adaptive_probes_enabled:
            return self.probes
        if source_token_count >= self.long_doc_threshold:
            return self.probes
        return max(self.probes - 1, 1)


@dataclass
class RhoSidecar:
    """Per-row recall/precision metadata (RhoDigestSidecar, matrix.rs)."""

    non_empty_counts: np.ndarray        # (n,) uint16, saturating
    source_token_counts: np.ndarray     # (n,) uint16, saturating
    sparse_occupancy_threshold: int
    sparse_verify_perm: int
    sparse_active: np.ndarray           # (n,) uint8
    sparse_signatures: np.ndarray       # (n, sparse_verify_perm) uint32


def _saturate_u16(values: np.ndarray) -> np.ndarray:
    return np.minimum(np.asarray(values, np.int64), 0xFFFF).astype(np.uint16)


def sparse_verify_seed(seed: int, index: int) -> int:
    """rho.rs:587-593."""
    return splitmix64(
        (seed ^ _SPARSE_SEED_XOR ^ ((index * _SPARSE_SEED_MUL) & _M64)) & _M64)


def sparse_verify_signature_scalar(token_hashes, seed: int, perm: int) -> list[int]:
    """rho.rs:595-613 — ``perm``-wide classic min over splitmix-mixed tokens."""
    sig = [_M32] * perm
    if len(token_hashes) == 0:
        return sig
    for i in range(perm):
        ps = sparse_verify_seed(seed, i)
        sig[i] = min(splitmix64(int(h) ^ ps) >> 32 for h in token_hashes)
    return sig


def rho_digest_scalar(token_hashes, num_perm: int, seed: int,
                      probes: int = DEFAULT_RHO_PROBES,
                      params: RhoParams | None = None,
                      source_token_count: int | None = None,
                      limit_tokens_for_sidecar: bool = True):
    """Ground-truth scalar rho row → (digest list, non_empty, used_hashes).

    Mirrors compute_rho_digest_from_token_hashes_into + the budget/probe
    selection the streaming builder does per row (rho.rs:1088-1132).
    ``limit_tokens_for_sidecar`` chooses which token list the sparse-verify
    signature sees: the budget-limited one (streaming/token-set builders) or
    the full row (flat CSR builder, rho.rs:1281-1300 passes the full slice).
    """
    if params is None:
        params = RhoParams.from_env(num_perm, probes)
    hashes = [int(h) & _M64 for h in token_hashes]
    src = len(hashes) if source_token_count is None else source_token_count
    budget = params.row_token_budget(src)
    row_probes = params.row_probes(src, num_perm)
    if budget is not None and budget > 0 and len(hashes) > budget:
        used = [hashes[i] for i in midpoint_sample_indices_scalar(len(hashes), budget)]
    else:
        used = hashes
    row = [EMPTY_BUCKET] * num_perm
    pow2 = num_perm & (num_perm - 1) == 0
    for h in used:
        mixed = splitmix64(h ^ seed ^ RHO_SALTS[0])
        for p in range(row_probes):
            bucket = mixed & (num_perm - 1) if pow2 else mixed % num_perm
            row[bucket] = min(row[bucket], mixed >> 32)
            if p + 1 < row_probes:
                mixed = splitmix64(mixed ^ RHO_SALTS[(p + 1) & 3])
    if params.densify_enabled:
        densify_rho_row_scalar(row, seed)
    non_empty = sum(1 for v in row if v != EMPTY_BUCKET)
    return row, non_empty, (used if limit_tokens_for_sidecar else hashes)


def densify_rho_row_scalar(row: list[int], seed: int) -> None:
    """rho.rs:535-577 in place."""
    n = len(row)
    if n == 0 or all(v == EMPTY_BUCKET for v in row):
        return
    next_non_empty = [n] * n
    nxt = n
    for rev in range(2 * n - 1, -1, -1):
        i = rev % n
        if row[i] != EMPTY_BUCKET:
            nxt = i
        if rev < n:
            next_non_empty[i] = nxt
    snapshot = list(row)
    for i in range(n):
        if snapshot[i] != EMPTY_BUCKET:
            continue
        cand = next_non_empty[i]
        if cand < n:
            value = snapshot[cand]
            probe = cand - i if cand >= i else n - i + cand
            im = (i * 0x9E3779B9) & _M32
            pm = (probe * 0x85EBCA6B) & _M32
            sm = ((seed & _M32) * 0xC2B2AE35) & _M32
            row[i] = mix_u32(value ^ im ^ pm ^ sm)
        else:
            row[i] = mix_u32((seed & _M32) ^ ((i * 0x27D4EB2D) & _M32))


def _densify_rho_matrix(out: np.ndarray, seed: int) -> None:
    """Vectorized densify_rho_row over every row of (n, P) uint32 ``out``."""
    n, P = out.shape
    filled = out != np.uint32(EMPTY_BUCKET)
    rows = filled.any(axis=1) & ~filled.all(axis=1)
    if not rows.any():
        return
    sub = out[rows]
    f2 = np.concatenate([filled[rows], filled[rows]], axis=1)
    idx = np.where(f2, np.arange(2 * P)[None, :], 2 * P + 1)
    nxt = np.minimum.accumulate(idx[:, ::-1], axis=1)[:, ::-1][:, :P]
    cand = nxt % P           # circular next-filled column at/after j
    value = np.take_along_axis(sub, cand, axis=1)
    j = np.arange(P)[None, :]
    probe = (cand - j) % P
    with np.errstate(over="ignore"):
        im = j.astype(np.uint32) * np.uint32(0x9E3779B9)
        pm = probe.astype(np.uint32) * np.uint32(0x85EBCA6B)
    sm = np.uint32(((seed & _M32) * 0xC2B2AE35) & _M32)
    dens = mix_u32_vec(value ^ im ^ pm ^ sm)
    empty = ~filled[rows]
    sub[empty] = dens[empty]
    out[rows] = sub


def rho_digest_matrix(token_hashes: np.ndarray, offsets: np.ndarray,
                      num_perm: int, seed: int,
                      probes: int = DEFAULT_RHO_PROBES,
                      params: RhoParams | None = None,
                      limit_tokens_for_sidecar: bool = True
                      ) -> tuple[np.ndarray, RhoSidecar]:
    """Vectorized rho digests for n CSR rows → ((n, P) uint32, sidecar).

    One sort+reduceat scatter-min over all (row, bucket) probe writes; the
    midpoint sampling, probe chaining and sparse sidecar are computed with
    flat per-row-parameter arrays — no Python loop over rows.
    """
    from .hashing import tune_allocator
    from .sketch import validate_offsets

    tune_allocator()
    token_hashes = np.asarray(token_hashes, dtype=np.uint64)
    offsets = np.asarray(offsets, dtype=np.int64)
    validate_offsets(offsets, len(token_hashes))
    n = len(offsets) - 1
    P = num_perm
    if params is None:
        params = RhoParams.from_env(num_perm, probes)
    out = np.full((n, P), EMPTY_BUCKET, dtype=np.uint32)
    sizes = offsets[1:] - offsets[:-1]
    src_counts = _saturate_u16(sizes)

    # ---- per-row budget + probes (vectorized row_token_budget/row_probes)
    budget = np.full(n, -1 if params.default_token_budget is None
                     else params.default_token_budget, np.int64)
    if not params.has_token_budget_override:
        budget[sizes <= params.medium_token_threshold] = params.medium_token_budget
        budget[sizes <= DEFAULT_RHO_SHORT_FULL_TOKEN_THRESHOLD] = -1
    take = np.where((budget > 0) & (sizes > budget), budget, sizes)
    if params.probes <= 1 or not params.adaptive_probes_enabled:
        row_probes = np.full(n, params.probes, np.int64)
    else:
        row_probes = np.where(sizes >= params.long_doc_threshold,
                              params.probes, max(params.probes - 1, 1))

    total_take = int(take.sum())
    if total_take:
        new_off = np.zeros(n + 1, np.int64)
        np.cumsum(take, out=new_off[1:])
        doc_of = np.repeat(np.arange(n, dtype=np.int64), take)
        k = np.arange(total_take, dtype=np.int64) - new_off[doc_of]
        sampled_rows = take < sizes
        if sampled_rows.any():
            idx = k.copy()
            m = sampled_rows[doc_of]
            idx[m] = _midpoint_indices_closed_form(
                sizes[doc_of[m]], take[doc_of[m]], k[m])
        else:
            idx = k
        used = token_hashes[offsets[:-1][doc_of] + idx]

        # ---- probe chain: one scatter-min per probe level, masked by row_probes
        slots_parts, vals_parts = [], []
        mixed = splitmix64_vec(used ^ np.uint64(seed) ^ np.uint64(RHO_SALTS[0]))
        pow2 = P & (P - 1) == 0
        max_probes = int(row_probes.max())
        for p in range(max_probes):
            live = row_probes[doc_of] > p
            m_live = mixed[live] if not live.all() else mixed
            d_live = doc_of[live] if not live.all() else doc_of
            bucket = (m_live & np.uint64(P - 1) if pow2
                      else m_live % np.uint64(P)).astype(np.int64)
            slots_parts.append(d_live * P + bucket)
            vals_parts.append((m_live >> np.uint64(32)).astype(np.uint32))
            if p + 1 < max_probes:  # the final re-mix is never read
                mixed = splitmix64_vec(mixed ^ np.uint64(RHO_SALTS[(p + 1) & 3]))
        slot = np.concatenate(slots_parts)
        val = np.concatenate(vals_parts)
        order = np.argsort(slot, kind="stable")
        slot_s, val_s = slot[order], val[order]
        starts = np.flatnonzero(
            np.concatenate([[True], slot_s[1:] != slot_s[:-1]]))
        out.reshape(-1)[slot_s[starts]] = np.minimum.reduceat(val_s, starts)
    else:
        used = token_hashes[:0]
        new_off = np.zeros(n + 1, np.int64)
        doc_of = np.zeros(0, np.int64)

    if params.densify_enabled:
        _densify_rho_matrix(out, seed)
    non_empty = _saturate_u16((out != np.uint32(EMPTY_BUCKET)).sum(axis=1))

    # ---- sparse sidecar
    sv_perm = params.sparse_verify_perm
    sparse = (non_empty.astype(np.int64)
              < params.sparse_occupancy_threshold).astype(np.uint8)
    if sv_perm > 0:
        sigs = np.full((n, sv_perm), EMPTY_BUCKET, dtype=np.uint32)
        sp_rows = np.flatnonzero(sparse)
        if len(sp_rows):
            if limit_tokens_for_sidecar:
                sc_tok, sc_off, sc_doc = used, new_off, doc_of
            else:
                sc_tok = token_hashes
                sc_off = offsets
                sc_doc = np.repeat(np.arange(n, dtype=np.int64), sizes)
            in_sp = sparse[sc_doc].astype(bool)
            tok_sp = sc_tok[in_sp]
            sp_sizes = (sc_off[1:] - sc_off[:-1])[sp_rows]
            sp_off = np.zeros(len(sp_rows) + 1, np.int64)
            np.cumsum(sp_sizes, out=sp_off[1:])
            if len(tok_sp):
                from .sketch import segmented_min
                cols = np.empty((len(tok_sp), sv_perm), np.uint32)
                for i in range(sv_perm):
                    ps = np.uint64(sparse_verify_seed(seed, i))
                    cols[:, i] = (splitmix64_vec(tok_sp ^ ps)
                                  >> np.uint64(32)).astype(np.uint32)
                sigs[sp_rows] = segmented_min(cols, sp_off,
                                              np.uint32(EMPTY_BUCKET))
    else:
        sigs = np.zeros((n, 0), dtype=np.uint32)

    sidecar = RhoSidecar(
        non_empty_counts=non_empty, source_token_counts=src_counts,
        sparse_occupancy_threshold=params.sparse_occupancy_threshold,
        sparse_verify_perm=sv_perm, sparse_active=sparse,
        sparse_signatures=sigs)
    return out, sidecar


def sparse_verify_similarity(sig_a, sig_b) -> float:
    """Equal-slot ratio (src/lsh/config.rs:126-140)."""
    a = np.asarray(sig_a)
    b = np.asarray(sig_b)
    if len(a) == 0 or len(a) != len(b):
        return 0.0
    return float((a == b).sum()) / len(a)
