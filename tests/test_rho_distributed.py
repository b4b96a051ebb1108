"""Distributed rho flags lane vs the scalar one-shot oracle.

``duplicate_flags_rho`` must reproduce
``RMinHashLSH.query_duplicate_flags_matrix_one_shot`` on the rho digest
matrix of the whole corpus (empty pre-existing index) — fold, sparse
≥2-band rule, sparse-verify gate and recall rescue included.  Ids are
assigned in row order so the bounded sparse-verify candidate scan visits
partners in the same order in both implementations.
"""

import numpy as np
import pyarrow as pa
import pytest

from rensa_ray.pipelines.dedup import DedupConfig
from rensa_ray.pipelines.rho_dedup import duplicate_flags_rho
from rensa_ray.state.lsh import RMinHashLSH
from rensa_ray.state.minhash import RMinHash

CFG = DedupConfig(num_perm=128, num_bands=16, threshold=0.8, seed=42,
                  ngram_size=3, num_parts=8, batch_size=64, concurrency=2)


def make_corpus():
    """Docs exercising every rho regime: exact dups (long + SHORT/sparse),
    near dups, mid-length rescue-window docs, uniques, adversarial blanks."""
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    for _ in range(100):                       # unique, mixed lengths
        words = rng.choice(vocab, size=int(rng.integers(5, 120)))
        docs.append(" ".join(words))
    docs += docs[:20]                          # exact dups (all regimes)
    for i in range(20, 50):                    # near dups: one-word edit
        words = docs[i].split()
        words[int(rng.integers(0, len(words)))] = "edited"
        docs.append(" ".join(words))
    docs += ["tiny", "tiny", "a b", "a b c"]   # sparse exact dups + shorts
    docs += ["", "   "]                        # empty
    return docs


def scalar_oracle(docs, cfg, expect_sv_exercised=False):
    from rensa_ray.kernels.shingle import shingle_hashes_scalar
    sets = [shingle_hashes_scalar(t, cfg.ngram_size) for t in docs]
    flat = np.concatenate([np.asarray(s, np.uint64) for s in sets]) \
        if any(len(s) for s in sets) else np.empty(0, np.uint64)
    off = np.zeros(len(sets) + 1, np.int64)
    np.cumsum([len(s) for s in sets], out=off[1:])
    m = RMinHash.digest_matrix_from_flat_token_hashes_rho(
        flat, off, cfg.num_perm, cfg.seed)
    lsh = RMinHashLSH(threshold=cfg.threshold, num_perm=cfg.num_perm,
                      num_bands=cfg.num_bands)
    flags = lsh.query_duplicate_flags_matrix_one_shot(m)
    if expect_sv_exercised:
        # the parity corpus must actually drive the sparse-verify gate
        # (both passes AND rejections), else the test proves less than
        # it claims (observed: ~314 checks, ~218 passes)
        assert lsh.last_one_shot_sparse_verify_checks > 50
        assert 0 < lsh.last_one_shot_sparse_verify_passes \
            < lsh.last_one_shot_sparse_verify_checks
    return flags


def _run_parity(ray_session, cfg, expect_sv=False):
    import ray.data
    docs = make_corpus()
    want = scalar_oracle(docs, cfg, expect_sv_exercised=expect_sv)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
        "text": pa.array(docs)}))
    got = duplicate_flags_rho(ds, cfg).to_pandas().sort_values("doc_id")
    assert len(got) == len(docs)
    mism = [i for i in range(len(docs))
            if bool(got["is_dup"].iloc[i]) != want[i]]
    assert mism == [], f"flag mismatches at {mism[:10]}"


def test_rho_flags_match_scalar_one_shot(ray_session):
    _run_parity(ray_session, CFG, expect_sv=True)


def test_rho_flags_match_scalar_sv_disabled(ray_session, monkeypatch):
    monkeypatch.setenv("RENSA_RHO_SPARSE_VERIFY_ENABLE", "0")
    _run_parity(ray_session, CFG)


def test_rho_flags_match_scalar_no_rescue(ray_session, monkeypatch):
    monkeypatch.setenv("RENSA_RHO_RECALL_RESCUE_ENABLE", "0")
    _run_parity(ray_session, CFG)


def test_rho_flags_match_scalar_fold1(ray_session, monkeypatch):
    monkeypatch.setenv("RENSA_RHO_BAND_FOLD", "1")
    _run_parity(ray_session, CFG)


def test_rho_flags_task_pool(ray_session):
    cfg = DedupConfig(num_perm=128, num_bands=16, num_parts=4,
                      batch_size=64, concurrency=None)
    _run_parity(ray_session, cfg)


def test_rho_flags_pathological_sparse_bucket(ray_session):
    """Web-scale worst case: thousands of identical SHORT (sparse) docs in
    one bucket must all be flagged via the vectorized equal-svsig pass —
    no quadratic scan, bounded wall time."""
    import time

    import ray.data as rd

    n_dup, n_uniq = 4000, 200
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(400)]
    docs = ["same tiny doc"] * n_dup + [
        " ".join(rng.choice(vocab, size=int(rng.integers(40, 90))))
        for _ in range(n_uniq)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
        "text": pa.array(docs)}))
    cfg = DedupConfig(num_perm=128, num_bands=16, num_parts=4,
                      batch_size=512, concurrency=None)
    t0 = time.time()
    got = duplicate_flags_rho(ds, cfg).to_pandas().sort_values("doc_id")
    wall = time.time() - t0
    assert got["is_dup"].iloc[:n_dup].all()       # every clone flagged
    assert wall < 60, f"pathological bucket took {wall:.0f}s"


def test_rho_scan_horizon_divergence_is_a_recall_superset(ray_session):
    """Pins the documented scan-order/horizon divergence (rho_dedup.py module
    docstring) as a tested contract.

    Fixture: Y = X + one appended word whose extra shingle loses every main
    sketch probe (digest(Y) == digest(X), so X and Y share every folded
    bucket) but wins 4 of 8 sparse-verify slots (sv similarity 0.5 < 0.75,
    the gate REJECTS X↔Y pairs).  With 20 copies of X ahead of 2 copies of
    Y, the reference's 16-candidate row-order scan exhausts its horizon on
    failing X partners before either Y reaches its identical twin → the
    scalar one-shot misses the true Y-Y duplicate pair.  The distributed
    lane's vectorized equal-svsig pass ignores the horizon by design and
    flags both Ys.  The divergence is therefore a strict recall SUPERSET on
    >max_candidates straddling buckets — never a lost flag."""
    import ray.data as rd

    from rensa_ray.kernels.rho import RhoParams, sparse_verify_similarity
    from rensa_ray.kernels.shingle import shingle_hashes_scalar

    X = " ".join(f"x23w{i}" for i in range(15))
    Y = X + " z3515"
    docs = [X] * 20 + [Y] * 2

    # --- fixture invariants (fail fast if kernels ever change) ----------
    sets = [shingle_hashes_scalar(t, CFG.ngram_size) for t in docs]
    flat = np.concatenate([np.asarray(s, np.uint64) for s in sets])
    off = np.zeros(len(sets) + 1, np.int64)
    np.cumsum([len(s) for s in sets], out=off[1:])
    m = RMinHash.digest_matrix_from_flat_token_hashes_rho(
        flat, off, CFG.num_perm, CFG.seed)
    mat = np.asarray(m.matrix)
    sc = m.rho_sidecar
    assert (mat[20] == mat[0]).all()            # Y collides with X everywhere
    assert sc.sparse_active[:22].all()          # every row is sparse
    sim = sparse_verify_similarity(sc.sparse_signatures[0],
                                   sc.sparse_signatures[20])
    assert sim < 0.75                           # the gate rejects X↔Y
    assert RhoParams.from_env(CFG.num_perm).sparse_verify_perm > 0

    # --- the reference's bounded row-order scan misses the Y-Y pair -----
    lsh = RMinHashLSH(threshold=CFG.threshold, num_perm=CFG.num_perm,
                      num_bands=CFG.num_bands)
    scalar = lsh.query_duplicate_flags_matrix_one_shot(m)
    assert scalar[:20] == [True] * 20
    assert scalar[20:] == [False, False]        # horizon exhausted on X's

    # --- the distributed lane flags the true pair (superset, no losses) -
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
        "text": pa.array(docs)}))
    got = duplicate_flags_rho(ds, CFG).to_pandas().sort_values("doc_id")
    assert got["is_dup"].iloc[:20].all()
    assert got["is_dup"].iloc[20:].all()        # the documented divergence
