"""Rho fast-path tests: scalar↔vectorized parity, sampler closed form,
densify, sparse sidecar, env knobs, and the one-shot recall/precision
machinery (band folding, sparse ≥2-band rule, sparse-verify gate, recall
rescue) — semantics transcribed from src/rminhash/rho.rs and
src/lsh/one_shot.rs.
"""

import pickle
import random

import numpy as np
import pytest

from rensa_ray.kernels import rho as R
from rensa_ray.state.lsh import RMinHashLSH
from rensa_ray.state.minhash import RMinHash


def _random_csr(rng, n_rows, max_len, lo_len=0):
    sizes = [rng.randint(lo_len, max_len) for _ in range(n_rows)]
    flat = np.array([rng.getrandbits(64) for _ in range(sum(sizes))],
                    dtype=np.uint64)
    offsets = np.zeros(n_rows + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    return flat, offsets


# --- midpoint sampler ------------------------------------------------------

def test_midpoint_sampler_closed_form_matches_iterative():
    for total, limit in [(33, 15), (100, 15), (97, 64), (65, 64), (200, 14),
                         (4096, 15), (1000, 999), (50, 1), (7, 3)]:
        it = R.midpoint_sample_indices_scalar(total, limit)
        cf = R._midpoint_indices_closed_form(
            np.full(limit, total), np.full(limit, limit),
            np.arange(limit, dtype=np.int64))
        assert it == cf.tolist(), (total, limit)
        assert all(0 <= i < total for i in it)
        assert it == sorted(set(it))  # strictly increasing, in range


# --- mixers ---------------------------------------------------------------

def test_mixers_scalar_vs_vector():
    rng = random.Random(7)
    v64 = np.array([rng.getrandbits(64) for _ in range(257)], np.uint64)
    assert (R.splitmix64_vec(v64) ==
            np.array([R.splitmix64(int(x)) for x in v64], np.uint64)).all()
    v32 = np.array([rng.getrandbits(32) for _ in range(257)], np.uint32)
    assert (R.mix_u32_vec(v32) ==
            np.array([R.mix_u32(int(x)) for x in v32], np.uint32)).all()


# --- digest parity ---------------------------------------------------------

@pytest.mark.parametrize("num_perm", [64, 128, 100])
def test_rho_matrix_matches_scalar(num_perm):
    rng = random.Random(num_perm)
    # rows crossing every budget regime: empty, short (<=32), medium
    # (<=96), long (budget-sampled)
    flat, offsets = _random_csr(rng, 60, 300)
    mat, sc = R.rho_digest_matrix(flat, offsets, num_perm, seed=42)
    for i in range(len(offsets) - 1):
        row_tok = flat[offsets[i]:offsets[i + 1]]
        row, non_empty, used = R.rho_digest_scalar(row_tok, num_perm, seed=42)
        assert mat[i].tolist() == row, f"row {i}"
        assert int(sc.non_empty_counts[i]) == non_empty
        assert int(sc.source_token_counts[i]) == len(row_tok)
        sparse = non_empty < sc.sparse_occupancy_threshold
        assert bool(sc.sparse_active[i]) == sparse
        if sparse and sc.sparse_verify_perm:
            want = R.sparse_verify_signature_scalar(
                used, 42, sc.sparse_verify_perm)
            assert sc.sparse_signatures[i].tolist() == want


def test_rho_flat_builder_sidecar_uses_full_row():
    # the flat CSR builder hands the FULL row to the sparse-verify signature
    # (rho.rs:1281-1300); the token-set builders hand the budget-limited one
    rng = random.Random(3)
    flat, offsets = _random_csr(rng, 8, 250, lo_len=120)
    _, sc_full = R.rho_digest_matrix(flat, offsets, 128, 42,
                                     limit_tokens_for_sidecar=False)
    for i in range(8):
        row_tok = flat[offsets[i]:offsets[i + 1]]
        if sc_full.sparse_active[i] and sc_full.sparse_verify_perm:
            want = R.sparse_verify_signature_scalar(
                row_tok, 42, sc_full.sparse_verify_perm)
            assert sc_full.sparse_signatures[i].tolist() == want


def test_rho_budget_regimes():
    params = R.RhoParams.from_env(128)
    assert params.row_token_budget(10) is None          # short: hash all
    assert params.row_token_budget(32) is None
    assert params.row_token_budget(33) == 64            # medium budget
    assert params.row_token_budget(96) == 64
    assert params.row_token_budget(97) == max(128 // 9, 15)  # long


def test_rho_env_knobs(monkeypatch):
    monkeypatch.setenv("RENSA_RHO_TOKEN_BUDGET", "0")   # 0 = hash everything
    p = R.RhoParams.from_env(128)
    assert p.default_token_budget is None and p.has_token_budget_override
    assert p.row_token_budget(10_000) is None
    monkeypatch.setenv("RENSA_RHO_TOKEN_BUDGET", "999999")
    p = R.RhoParams.from_env(128)
    assert p.default_token_budget == R.MAX_RHO_TOKEN_BUDGET
    monkeypatch.setenv("RENSA_RHO_TOKEN_BUDGET", "junk")  # unparsable → default
    p = R.RhoParams.from_env(128)
    assert p.default_token_budget == max(128 // 9, 15)
    monkeypatch.delenv("RENSA_RHO_TOKEN_BUDGET")
    monkeypatch.setenv("RENSA_RHO_SPARSE_VERIFY_ENABLE", "0")
    p = R.RhoParams.from_env(128)
    assert p.sparse_verify_perm == 0


def test_rho_densify_scalar_vs_matrix(monkeypatch):
    monkeypatch.setenv("RENSA_RHO_DENSIFY", "1")
    rng = random.Random(11)
    flat, offsets = _random_csr(rng, 30, 20)  # short rows → sparse digests
    mat, _ = R.rho_digest_matrix(flat, offsets, 64, 7)
    for i in range(30):
        row, _, _ = R.rho_digest_scalar(flat[offsets[i]:offsets[i + 1]], 64, 7)
        assert mat[i].tolist() == row


def test_rho_adaptive_probes(monkeypatch):
    monkeypatch.setenv("RENSA_RHO_ADAPTIVE_PROBES", "1")
    rng = random.Random(13)
    flat, offsets = _random_csr(rng, 20, 700)
    mat, _ = R.rho_digest_matrix(flat, offsets, 128, 9)
    for i in range(20):
        row, _, _ = R.rho_digest_scalar(flat[offsets[i]:offsets[i + 1]], 128, 9)
        assert mat[i].tolist() == row, f"row {i}"


def test_rho_jaccard_quality():
    # rho digests of 80%-overlapping sets agree on far more buckets than
    # digests of disjoint sets (sanity: the sketch carries similarity signal)
    rng = random.Random(17)
    base = [rng.getrandbits(64) for _ in range(200)]
    near = base[:160] + [rng.getrandbits(64) for _ in range(40)]
    far = [rng.getrandbits(64) for _ in range(200)]
    sets = [base, near, far]
    flat = np.array([h for s in sets for h in s], np.uint64)
    offsets = np.array([0, 200, 400, 600], np.int64)
    mat, _ = R.rho_digest_matrix(flat, offsets, 128, 42)
    both_near = (mat[0] != R.EMPTY_BUCKET) & (mat[1] != R.EMPTY_BUCKET)
    both_far = (mat[0] != R.EMPTY_BUCKET) & (mat[2] != R.EMPTY_BUCKET)
    agree_near = (mat[0] == mat[1])[both_near].mean()
    agree_far = (mat[0] == mat[2])[both_far].mean()
    assert agree_near > 0.4 > agree_far


# --- state API builders -----------------------------------------------------

def test_digest_matrix_rho_builders_and_pickle():
    sets = [["a", "b", "c"], ["a", "b", "c"], [f"t{i}" for i in range(500)]]
    m = RMinHash.digest_matrix_from_token_sets_rho(sets, 128, seed=42)
    assert m.matrix.shape == (3, 128)
    assert m.rho_sidecar is not None
    assert m.get_rho_source_token_counts() == [3, 3, 500]
    assert m.get_rho_sparse_occupancy_threshold() == (56 * 128 + 64) // 128
    assert m.get_rho_non_empty_counts()[0] <= 12  # 3 tokens × ≤4 probes
    assert m.get_rho_sparse_row_rate() > 0
    assert m.rho_sparse_verify_signature(0) is not None  # sparse row
    m2 = pickle.loads(pickle.dumps(m))
    assert (m2.matrix == m.matrix).all()
    assert (m2.rho_sidecar.sparse_signatures ==
            m.rho_sidecar.sparse_signatures).all()

    # prehashed + flat entry points agree with the token-set one
    hashes = [[1, 2, 3], [1, 2, 3], list(range(1000, 1500))]
    ma = RMinHash.digest_matrix_from_token_hash_sets_rho(hashes, 128)
    flat = np.array([h for s in hashes for h in s], np.uint64)
    off = np.array([0, 3, 6, 506], np.int64)
    mb = RMinHash.digest_matrix_from_flat_token_hashes_rho(flat, off, 128)
    assert (ma.matrix == mb.matrix).all()


# --- one-shot machinery -----------------------------------------------------

def _lsh(num_perm=128, num_bands=16):
    return RMinHashLSH(threshold=0.8, num_perm=num_perm, num_bands=num_bands)


def test_one_shot_rho_exact_dups_flagged():
    sets = ([["x", "y", "z", "w"]] * 2
            + [[f"u{i}{j}" for j in range(50)] for i in range(6)])
    m = RMinHash.digest_matrix_from_token_sets_rho(sets, 128)
    flags = _lsh().query_duplicate_flags_matrix_one_shot(m)
    assert flags[:2] == [True, True]
    assert not any(flags[2:])


def test_one_shot_rho_sparse_requires_two_bands():
    """A sparse row colliding in exactly ONE folded band must NOT be flagged
    (required ≥2, one_shot.rs:208-227); dense rows keep the any-band rule."""
    lsh = _lsh(num_perm=128, num_bands=16)  # fold 2 → 8 effective bands
    n, P = 4, 128
    rng = np.random.default_rng(5)
    mat = rng.integers(0, 2**32, size=(n, P), dtype=np.uint32)
    # rows 0,1: share effective band 0 (cols 0..16) only
    mat[1, :16] = mat[0, :16]
    # rows 2,3: dense, also share only effective band 0
    mat[3, :16] = mat[2, :16]
    occ = (56 * P + 64) // 128
    non_empty = np.array([occ - 1, occ - 1, P, P], np.uint16)  # 0,1 sparse
    sc = R.RhoSidecar(
        non_empty_counts=non_empty,
        source_token_counts=np.array([200, 200, 200, 200], np.uint16),
        sparse_occupancy_threshold=occ, sparse_verify_perm=0,
        sparse_active=(non_empty < occ).astype(np.uint8),
        sparse_signatures=np.zeros((n, 0), np.uint32))
    from rensa_ray.state.minhash import RMinHashDigestMatrix
    flags = lsh.query_duplicate_flags_matrix_one_shot(
        RMinHashDigestMatrix(mat, rho_sidecar=sc))
    assert flags == [False, False, True, True]
    # two folded-band collisions clear the sparse bar
    mat2 = mat.copy()
    mat2[1, 16:32] = mat2[0, 16:32]
    flags2 = lsh.query_duplicate_flags_matrix_one_shot(
        RMinHashDigestMatrix(mat2, rho_sidecar=sc))
    assert flags2[:2] == [True, True]


def test_one_shot_rho_sparse_verify_gate():
    """Sparse pairs with dissimilar verify signatures are rejected; similar
    ones pass (one_shot.rs:436-451, threshold 0.75)."""
    lsh = _lsh(num_perm=128, num_bands=16)
    n, P = 2, 128
    rng = np.random.default_rng(6)
    mat = rng.integers(0, 2**32, size=(n, P), dtype=np.uint32)
    mat[1, :32] = mat[0, :32]  # two folded-band collisions (≥ sparse bar)
    occ = (56 * P + 64) // 128
    base = dict(
        non_empty_counts=np.array([occ - 1, occ - 1], np.uint16),
        source_token_counts=np.array([20, 20], np.uint16),
        sparse_occupancy_threshold=occ, sparse_verify_perm=8,
        sparse_active=np.array([1, 1], np.uint8))
    from rensa_ray.state.minhash import RMinHashDigestMatrix
    sig_same = np.tile(np.arange(8, dtype=np.uint32), (2, 1))
    sc = R.RhoSidecar(sparse_signatures=sig_same, **base)
    m = RMinHashDigestMatrix(mat, rho_sidecar=sc)
    assert lsh.query_duplicate_flags_matrix_one_shot(m) == [True, True]
    assert lsh.last_one_shot_sparse_verify_checks > 0
    assert lsh.last_one_shot_sparse_verify_passes > 0
    sig_diff = sig_same.copy()
    sig_diff[1] += 100  # 0/8 slots agree < 0.75
    sc2 = R.RhoSidecar(sparse_signatures=sig_diff, **base)
    m2 = RMinHashDigestMatrix(mat, rho_sidecar=sc2)
    assert lsh.query_duplicate_flags_matrix_one_shot(m2) == [False, False]
    assert lsh.last_one_shot_sparse_verify_passes == 0


def test_one_shot_rho_recall_rescue():
    """Mid-length rows (17..96 tokens) with zero FOLDED matches but ≥2
    UNFOLDED band collisions are rescued (one_shot.rs:492-577)."""
    lsh = _lsh(num_perm=128, num_bands=16)
    n, P, bs = 2, 128, 8
    rng = np.random.default_rng(7)
    mat = rng.integers(0, 2**32, size=(n, P), dtype=np.uint32)
    # share unfolded bands 0 and 2 but differ in 1 and 3 → folded bands
    # (0,1) and (2,3) both differ; rescue sees 2 unfolded collisions
    mat[1, 0 * bs:1 * bs] = mat[0, 0 * bs:1 * bs]
    mat[1, 2 * bs:3 * bs] = mat[0, 2 * bs:3 * bs]
    occ = (56 * P + 64) // 128
    sc = R.RhoSidecar(
        non_empty_counts=np.array([P, P], np.uint16),  # dense: required=1
        source_token_counts=np.array([50, 50], np.uint16),
        sparse_occupancy_threshold=occ, sparse_verify_perm=0,
        sparse_active=np.zeros(n, np.uint8),
        sparse_signatures=np.zeros((n, 0), np.uint32))
    from rensa_ray.state.minhash import RMinHashDigestMatrix
    m = RMinHashDigestMatrix(mat, rho_sidecar=sc)
    assert lsh.query_duplicate_flags_matrix_one_shot(m) == [True, True]
    # out of the token window → no rescue
    sc_long = R.RhoSidecar(
        non_empty_counts=np.array([P, P], np.uint16),
        source_token_counts=np.array([500, 500], np.uint16),
        sparse_occupancy_threshold=occ, sparse_verify_perm=0,
        sparse_active=np.zeros(n, np.uint8),
        sparse_signatures=np.zeros((n, 0), np.uint32))
    m2 = RMinHashDigestMatrix(mat, rho_sidecar=sc_long)
    assert lsh.query_duplicate_flags_matrix_one_shot(m2) == [False, False]


def test_one_shot_rho_existing_entries_disable_fold():
    """A non-empty pre-existing index forces fold=1 + per-band table checks
    (one_shot.rs:192-199): a row matching an INSERTED key's band is flagged."""
    lsh = _lsh(num_perm=128, num_bands=16)
    seed_sets = [[f"s{i}" for i in range(100)]]
    seeded = RMinHash.digest_matrix_from_token_sets_rho(seed_sets, 128)
    lsh.insert_matrix([7], seeded)
    m = RMinHash.digest_matrix_from_token_sets_rho(
        seed_sets + [[f"q{i}" for i in range(80)]], 128)
    flags = lsh.query_duplicate_flags_matrix_one_shot(m)
    assert flags == [True, False]


def test_one_shot_plain_matrix_unchanged():
    """Non-rho matrices keep the simple path (regression)."""
    sets = [["a", "b", "c", "d"]] * 2 + [[f"z{i}" for i in range(40)]]
    m = RMinHash.digest_matrix_from_token_sets(sets, 128)
    flags = _lsh().query_duplicate_flags_matrix_one_shot(m)
    assert flags == [True, True, False]
