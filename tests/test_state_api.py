"""Parity tests for the reference-API-compatible state classes.

Mirrors the reference's own test strategy (tests/test_rensa.py,
tests/test_inline_dedup.py): batch == scalar, char-iteration semantics,
pickle round-trips, LSH insert/query/one-shot, deduplicator lifecycles.
No Ray needed — these are in-memory objects.
"""

from __future__ import annotations

import pickle

import numpy as np
import pytest

from rensa_ray.kernels.shingle import tokenize_to_ngrams
from rensa_ray.kernels.sketch import cmin_digest_scalar, rmin_digest_scalar
from rensa_ray.state import (
    CMinHash,
    CMinHashDeduplicator,
    RMinHash,
    RMinHashDeduplicator,
    RMinHashLSH,
    default_num_bands,
    token_hashes_of,
)

# docs 0/1 are true near-dups (signature jaccard ≈ 0.98 at seed 42 —
# deterministic, verified to collide at 8 bands × 16 rows); doc 2 disjoint.
DOCS = [
    " ".join(f"w{i}" for i in range(120)),
    " ".join(f"w{i}" for i in range(119)) + " zz",
    " ".join(f"v{i}" for i in range(120)),
    "",
]
TOKEN_SETS = [tokenize_to_ngrams(d) for d in DOCS]


# ------------------------------------------------------------------ RMinHash

def test_rminhash_update_matches_scalar_kernel():
    for toks in TOKEN_SETS:
        mh = RMinHash(64, seed=42)
        mh.update(toks)
        want = rmin_digest_scalar(token_hashes_of(toks), 64, 42)
        assert mh.digest() == want


def test_rminhash_str_iterates_into_chars():
    # reference-pinned behavior (tests/test_rensa.py:162-175)
    a = RMinHash(32, 1)
    a.update("abc")
    b = RMinHash(32, 1)
    b.update(["a", "b", "c"])
    assert a.digest() == b.digest()


def test_rminhash_bytes_is_single_token():
    a = RMinHash(32, 1)
    a.update(b"abc")
    b = RMinHash(32, 1)
    b.update(["abc"])  # str token with same bytes
    assert a.digest() == b.digest()


def test_rminhash_invalid():
    with pytest.raises(ValueError):
        RMinHash(0, 42)
    with pytest.raises(TypeError):
        RMinHash(16, 1).update([123])


def test_rminhash_jaccard_and_mismatch():
    a, b = RMinHash(128, 42), RMinHash(128, 42)
    a.update(TOKEN_SETS[0])
    b.update(TOKEN_SETS[1])
    j = a.jaccard(b)
    assert 0.0 < j < 1.0
    c = RMinHash(64, 42)
    with pytest.raises(ValueError):
        a.jaccard(c)
    # identical docs → jaccard 1
    d = RMinHash(128, 42)
    d.update(TOKEN_SETS[0])
    assert a.jaccard(d) == 1.0


def test_rminhash_batch_builders_match_incremental():
    mat = RMinHash.digest_matrix_from_token_sets(TOKEN_SETS, 64, 7)
    assert (mat.rows, mat.num_perm) == (len(TOKEN_SETS), 64)
    for i, toks in enumerate(TOKEN_SETS):
        mh = RMinHash(64, 7)
        mh.update(toks)
        assert mat.row(i) == mh.digest()
    objs = RMinHash.from_token_sets(TOKEN_SETS, 64, 7)
    assert [o.digest() for o in objs] == mat.matrix.tolist()
    digs = RMinHash.digests_from_token_sets(TOKEN_SETS, 64, 7)
    assert digs == mat.matrix.tolist()


def test_rminhash_prehashed_and_flat_paths_match():
    hash_sets = RMinHash.hash_token_sets(TOKEN_SETS)
    m1 = RMinHash.digest_matrix_from_token_sets(TOKEN_SETS, 32, 9)
    m2 = RMinHash.digest_matrix_from_token_hash_sets(hash_sets, 32, 9)
    flat = np.concatenate([np.asarray(h, np.uint64) for h in hash_sets])
    offsets = np.zeros(len(hash_sets) + 1, np.int64)
    np.cumsum([len(h) for h in hash_sets], out=offsets[1:])
    m3 = RMinHash.digest_matrix_from_flat_token_hashes(flat, offsets, 32, 9)
    byte_sets = [[t.encode() for t in s] for s in TOKEN_SETS]
    m4 = RMinHash.digest_matrix_from_token_byte_sets(byte_sets, 32, 9)
    assert (m1.matrix == m2.matrix).all()
    assert (m1.matrix == m3.matrix).all()
    assert (m1.matrix == m4.matrix).all()
    with pytest.raises(ValueError):
        # does not start at 0
        RMinHash.digest_matrix_from_flat_token_hashes(flat, offsets[1:], 32, 9)


def test_rminhash_pickle_roundtrip():
    mh = RMinHash(64, 3)
    mh.update(TOKEN_SETS[0])
    mh2 = pickle.loads(pickle.dumps(mh))
    assert mh2.digest() == mh.digest()
    mh2.update(TOKEN_SETS[1])  # still updatable (permutations rebuilt)
    mh3 = RMinHash(64, 3)
    mh3.update(TOKEN_SETS[0])
    mh3.update(TOKEN_SETS[1])
    assert mh2.digest() == mh3.digest()


# ------------------------------------------------------------------ CMinHash

def test_cminhash_update_matches_scalar_kernel():
    for toks in TOKEN_SETS:
        mh = CMinHash(64, seed=42)
        mh.update(toks)
        want = cmin_digest_scalar(token_hashes_of(toks), 64, 42)
        assert mh.digest_u64() == want
        assert mh.digest() == [v >> 32 for v in want]


def test_cminhash_batch_builders():
    d64 = CMinHash.digests64_from_token_sets(TOKEN_SETS, 32, 5)
    d32 = CMinHash.digests_from_token_sets(TOKEN_SETS, 32, 5)
    for i, toks in enumerate(TOKEN_SETS):
        mh = CMinHash(32, 5)
        mh.update(toks)
        assert d64[i] == mh.digest_u64()
        assert d32[i] == mh.digest()
    hash_sets = [token_hashes_of(s).tolist() for s in TOKEN_SETS]
    d64h = CMinHash.digests64_from_token_hash_sets(hash_sets, 32, 5)
    assert d64h == d64
    objs = CMinHash.from_token_sets(TOKEN_SETS, 32, 5)
    assert [o.digest_u64() for o in objs] == d64


def test_cminhash_pickle():
    mh = CMinHash(64, 3)
    mh.update(TOKEN_SETS[0])
    mh2 = pickle.loads(pickle.dumps(mh))
    assert mh2.digest_u64() == mh.digest_u64()


# ---------------------------------------------------------------------- LSH

def _mh(toks, num_perm=128, seed=42):
    m = RMinHash(num_perm, seed)
    m.update(toks)
    return m


def test_lsh_validation():
    with pytest.raises(ValueError):
        RMinHashLSH(0.0, 128, 8)
    with pytest.raises(ValueError):
        RMinHashLSH(0.8, 128, 7)  # not divisible
    with pytest.raises(ValueError):
        RMinHashLSH(0.8, 0, 1)
    with pytest.raises(ValueError):
        RMinHashLSH(0.8, 128, 256)


def test_lsh_insert_query_remove():
    lsh = RMinHashLSH(0.8, 128, 8)
    m0, m1, m2 = (_mh(TOKEN_SETS[i]) for i in range(3))
    lsh.insert(0, m0)
    lsh.insert(1, m1)
    lsh.insert(2, m2)
    assert len(lsh) == 3
    cands = lsh.query(m0)
    assert 0 in cands and 1 in cands and 2 not in cands
    assert lsh.is_similar(m0, m1)
    lsh.remove(1)
    assert 1 not in lsh.query(m0)
    # re-insert replaces silently
    lsh.insert(0, m2)
    assert 0 in lsh.query(m2)


def test_lsh_matrix_paths_match_scalar():
    mat = RMinHash.digest_matrix_from_token_sets(TOKEN_SETS[:3], 128, 42)
    lsh_a = RMinHashLSH(0.8, 128, 8)
    lsh_a.insert_matrix([0, 1, 2], mat)
    lsh_b = RMinHashLSH(0.8, 128, 8)
    for i in range(3):
        lsh_b.insert(i, _mh(TOKEN_SETS[i]))
    for i in range(3):
        assert sorted(lsh_a.query(_mh(TOKEN_SETS[i]))) == sorted(
            lsh_b.query(_mh(TOKEN_SETS[i])))
    flags = lsh_b.query_duplicate_flags_matrix(mat)
    assert flags == [True, True, True]  # all present in the index


def test_lsh_one_shot_flags():
    # docs 0/1 are near-dups (collide on some band); doc 2 unique; empty doc 3
    mat = RMinHash.digest_matrix_from_token_sets(TOKEN_SETS[:3], 128, 42)
    lsh = RMinHashLSH(0.8, 128, 8)
    flags = lsh.query_duplicate_flags_matrix_one_shot(mat)
    assert flags[0] and flags[1] and not flags[2]
    assert len(lsh) == 0  # one-shot does not insert
    # pre-seeded index: doc 2 collides with itself in the index
    lsh.insert(99, _mh(TOKEN_SETS[2]))
    flags2 = lsh.query_duplicate_flags_matrix_one_shot(mat)
    assert flags2 == [True, True, True]


def test_lsh_insert_matrix_and_flags_back_flags_first():
    mat = RMinHash.digest_matrix_from_token_sets(
        [TOKEN_SETS[0], TOKEN_SETS[2], TOKEN_SETS[0]], 128, 42)
    lsh = RMinHashLSH(0.8, 128, 8)
    flags = lsh.insert_matrix_and_query_duplicate_flags([10, 11, 12], mat)
    assert flags == [True, False, True]  # row 0 back-flagged by row 2


def test_noncontiguous_buffer_rejected():
    """Expert input path: non-C-contiguous memoryviews raise TypeError
    (reference tests/test_rensa.py:136-147)."""
    import pytest

    m = RMinHash(num_perm=32, seed=42)
    bad = memoryview(bytearray(b"abcd"))[::2]
    with pytest.raises(TypeError, match="C-contiguous"):
        m.update(bad)
    with pytest.raises(TypeError, match="C-contiguous"):
        m.update([bad])
    # contiguous memoryview == its bytes, direct or in a list
    a, b = RMinHash(32, 42), RMinHash(32, 42)
    a.update([memoryview(b"abc")])
    b.update([b"abc"])
    assert a.digest() == b.digest()


def test_invalid_token_type_rejected():
    import pytest

    m = RMinHash(num_perm=32, seed=42)
    with pytest.raises(TypeError, match="each item must be"):
        m.update([123])


def test_lsh_num_perm_mismatch_message():
    import pytest

    lsh = RMinHashLSH(0.7, 16, 4)
    m8 = RMinHash(num_perm=8, seed=99)
    with pytest.raises(ValueError, match="MinHash has 8 permutations"):
        lsh.insert(1, m8)


def test_lsh_insert_matrix_and_flags_reinsert_drops_stale_entries():
    """Re-inserting a key removes its stale bucket entries first
    (src/lsh/py.rs:135-138) — a ghost occupant must not flag later rows."""
    m_a = RMinHash.digest_matrix_from_token_sets([TOKEN_SETS[0]], 128, 42)
    m_b = RMinHash.digest_matrix_from_token_sets([TOKEN_SETS[2]], 128, 42)
    lsh = RMinHashLSH(0.8, 128, 8)
    assert lsh.insert_matrix_and_query_duplicate_flags([7], m_a) == [False]
    # key 7 moves to content B: its content-A buckets must be vacated
    assert lsh.insert_matrix_and_query_duplicate_flags([7], m_b) == [False]
    # a fresh key with content A would be wrongly flagged by a ghost entry
    assert lsh.insert_matrix_and_query_duplicate_flags([8], m_a) == [False]
    # key 7's new home (content B) does flag a matching new row
    assert lsh.insert_matrix_and_query_duplicate_flags([9], m_b) == [True]
    assert len(lsh) == 3


# -------------------------------------------------------------- deduplicators

def test_default_num_bands_heuristic():
    assert default_num_bands(0.95, 128) == 4
    assert default_num_bands(0.8, 128) == 8
    assert default_num_bands(0.7, 128) == 16
    assert default_num_bands(0.5, 128) == 32
    assert default_num_bands(0.3, 128) == 64
    assert 120 % default_num_bands(0.8, 120) == 0


def test_rmin_deduplicator_lifecycle():
    d = RMinHashDeduplicator(0.8, 128, use_lsh=True, seed=42)
    assert d.add("a", _mh(TOKEN_SETS[0]))
    assert not d.add("a", _mh(TOKEN_SETS[2]))      # key dup
    assert not d.add("b", _mh(TOKEN_SETS[1]))      # near-dup of a
    assert d.add("c", _mh(TOKEN_SETS[2]))          # unique
    assert d.is_duplicate("zz", _mh(TOKEN_SETS[0]))
    assert not d.is_duplicate("zz", _mh(["totally", "new", "words"]))
    assert len(d) == 2 and not d.is_empty()
    assert d.remove("a") and not d.remove("a")
    assert d.add("b", _mh(TOKEN_SETS[1]))          # no longer a dup
    d.clear()
    assert d.is_empty() and len(d) == 0


def test_rmin_deduplicator_no_lsh_matches_lsh():
    docs = TOKEN_SETS[:3] + [["x", "y", "z"]]
    d1 = RMinHashDeduplicator(0.8, 128, use_lsh=True, seed=42)
    d2 = RMinHashDeduplicator(0.8, 128, use_lsh=False, seed=42)
    r1 = [d1.add(str(i), _mh(t)) for i, t in enumerate(docs)]
    r2 = [d2.add(str(i), _mh(t)) for i, t in enumerate(docs)]
    assert r1 == r2


def test_rmin_deduplicator_token_inputs_match_minhash_inputs():
    d1 = RMinHashDeduplicator(0.8, 128, seed=42)
    d2 = RMinHashDeduplicator(0.8, 128, seed=42)
    flags1 = d1.add_pairs([(str(i), _mh(t)) for i, t in enumerate(TOKEN_SETS)])
    flags2 = d2.add_pairs([(str(i), t) for i, t in enumerate(TOKEN_SETS)])
    assert flags1 == flags2


def test_rmin_get_duplicate_sets():
    d = RMinHashDeduplicator(0.8, 128, seed=42)
    sets = d.get_duplicate_sets(
        [("a", TOKEN_SETS[0]), ("b", TOKEN_SETS[1]), ("c", TOKEN_SETS[2])])
    as_sets = sorted(tuple(sorted(s)) for s in sets)
    assert as_sets == [("a", "b"), ("c",)]


def test_cmin_deduplicator():
    d = CMinHashDeduplicator(0.8, seed=42)
    m0, m1, m2 = (CMinHash(128, 42) for _ in range(3))
    m0.update(TOKEN_SETS[0])
    m1.update(TOKEN_SETS[1])
    m2.update(TOKEN_SETS[2])
    assert d.add("a", m0)
    assert d.num_perm == 128  # learned
    assert not d.add("b", m1)
    assert d.add("c", m2)
    with pytest.raises(ValueError):
        d.add("x", CMinHash(64, 42))
    assert d.remove("a")
    d.clear()
    assert d.is_empty()


def test_dedup_validation():
    with pytest.raises(ValueError):
        RMinHashDeduplicator(1.5, 128)
    with pytest.raises(ValueError):
        RMinHashDeduplicator(0.8, 128, num_bands=7)
    with pytest.raises(ValueError):
        CMinHashDeduplicator(0.0)


def test_state_objects_pickle_roundtrip():
    """Parity with the reference's serde state (src/rminhash/py.rs:421-443):
    every state object survives pickle (what Ray does when shipping actors /
    closures) with identical behavior after restore."""
    import pickle

    from rensa_ray.state.dedup import RMinHashDeduplicator
    from rensa_ray.state.lsh import RMinHashLSH
    from rensa_ray.state.minhash import CMinHash, RMinHash

    m = RMinHash(128, 42)
    m.update(["alpha", "beta", "gamma"])
    m2 = pickle.loads(pickle.dumps(m))
    assert m2.digest() == m.digest()
    m2.update(["delta"])
    m.update(["delta"])
    assert m2.digest() == m.digest()

    c = CMinHash(128, 42)
    c.update(["alpha", "beta"])
    c2 = pickle.loads(pickle.dumps(c))
    assert c2.digest() == c.digest()

    lsh = RMinHashLSH(threshold=0.8, num_perm=128, num_bands=8)
    lsh.insert(1, m)
    lsh2 = pickle.loads(pickle.dumps(lsh))
    assert lsh2.query(m) == lsh.query(m)

    d = RMinHashDeduplicator(threshold=0.8, num_perm=128, use_lsh=True)
    assert d.add("k1", m)
    d2 = pickle.loads(pickle.dumps(d))
    assert not d2.add("k1-dup", m)   # restored state still detects the dup
    assert len(d2) == 1


def test_lsh_query_all_and_insert_pairs_validation():
    """query_all (src/lsh/py.rs:208-227) + insert_pairs key typing
    (tests/test_rensa.py:820-826) + insert_many sequential keys."""
    lsh = RMinHashLSH(threshold=0.7, num_perm=16, num_bands=4)
    m0, m1 = _mh(TOKEN_SETS[0], num_perm=16), _mh(TOKEN_SETS[1], num_perm=16)
    lsh.insert_pairs([(0, m0), (1, m1)])
    res = lsh.query_all([m0, m1])
    assert 0 in res[0] and 1 in res[1]
    assert res == [lsh.query(m0), lsh.query(m1)]  # element-wise = query()
    with pytest.raises(TypeError):
        lsh.insert_pairs([("bad-key", m0)])
    with pytest.raises(ValueError, match="permutations"):
        lsh.query_all([m0, _mh(TOKEN_SETS[0], num_perm=8)])
    lsh2 = RMinHashLSH(threshold=0.7, num_perm=16, num_bands=4)
    lsh2.insert_many([m0, m1], start_key=10)
    assert 10 in lsh2.query(m0) and 11 in lsh2.query(m1)
    assert sorted(lsh2._key_bands) == [10, 11]


def test_flat_builders_reject_non_contiguous():
    """Expert flat inputs reject strided buffers instead of silently copying
    (src/rminhash/pipeline.rs:208-210)."""
    flat = np.arange(20, dtype=np.uint64)
    off = np.array([0, 10], np.int64)
    with pytest.raises(ValueError, match="C-contiguous"):
        RMinHash.digest_matrix_from_flat_token_hashes(flat[::2], off, 16)
    with pytest.raises(ValueError, match="C-contiguous"):
        RMinHash.digest_matrix_from_flat_token_hashes_rho(flat[::2], off, 16)
    with pytest.raises(ValueError, match="C-contiguous"):
        RMinHash.digest_matrix_from_flat_token_hashes(
            flat[:10], np.array([0, 5, 10], np.int64)[::2], 16)
    # contiguous copies still work (lists, contiguous views)
    m = RMinHash.digest_matrix_from_flat_token_hashes(list(range(10)), off, 16)
    assert m.rows == 1


def test_lsh_matrix_paths_validate_width():
    """ensure_digest_len parity for the MATRIX paths: a 64-wide matrix
    against a 128-perm index previously banded silently at the wrong
    band_size (corrupt inserts, garbage flags)."""
    lsh = RMinHashLSH(threshold=0.5, num_perm=128, num_bands=16)
    bad = np.zeros((4, 64), np.uint32)
    with pytest.raises(ValueError, match="64 permutations"):
        lsh.insert_matrix([0, 1, 2, 3], bad)
    with pytest.raises(ValueError, match="64 permutations"):
        lsh.query_duplicate_flags_matrix(bad)
    with pytest.raises(ValueError, match="64 permutations"):
        lsh.query_duplicate_flags_matrix_one_shot(bad)
    with pytest.raises(ValueError, match="64 permutations"):
        lsh.insert_matrix_and_query_duplicate_flags([0, 1, 2, 3], bad)
    assert len(lsh) == 0  # nothing corrupt was stored


def test_lsh_insert_pairs_rejects_negative_keys():
    """The reference extracts usize — negatives raise, never store."""
    lsh = RMinHashLSH(threshold=0.5, num_perm=128, num_bands=16)
    mh = RMinHash(128, 1)
    mh.update(["a", "b", "c"])
    with pytest.raises(TypeError, match="non-negative"):
        lsh.insert_pairs([(-5, mh)])
    assert len(lsh) == 0
