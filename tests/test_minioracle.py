"""Cross-family accuracy check: our MinHash dedup vs the vendored
datasketch-style oracle (independent SHA-1 / Mersenne-prime hash family).

Mirrors the reference's headline accuracy lane (datasketch comparison,
benchmarks/full_benchmark.py:402-501; README.md:27-31 reports mean kept-set
Jaccard 0.987 and flag-mismatch rate 0.011 on real datasets).  Different
hash families collide on different borderline pairs, so we assert the same
*order* of agreement, not equality.
"""

import numpy as np

from rensa_ray.functions.minioracle import (
    kept_set_jaccard,
    one_shot_flags_and_kept,
)
from rensa_ray.kernels.shingle import tokenize_to_ngrams


def _corpus(n_unique=150, n_exact=40, n_near=40, seed=11):
    # near-dups are single-word edits of 100-200-word docs (shingle jaccard
    # ≈0.97-0.99): high enough on the 8x16-band s-curve that BOTH hash
    # families flag them w.h.p., so residual disagreement measures the
    # pipeline rather than banding noise
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i}" for i in range(600)]
    docs = [" ".join(rng.choice(vocab, size=int(rng.integers(100, 200))))
            for _ in range(n_unique)]
    for i in range(n_exact):
        docs.append(docs[i])
    for i in range(n_near):
        words = docs[n_exact + i].split()
        words[int(rng.integers(0, len(words)))] = "edited"
        docs.append(" ".join(words))
    return docs


def test_kept_sets_agree_with_datasketch_style_oracle(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from rensa_ray.pipelines.dedup import DedupConfig, dedup, duplicate_flags

    docs = _corpus()
    token_sets = [tokenize_to_ngrams(t, 3) for t in docs]

    # oracle lane: first-wins one-shot over the independent hash family
    ds_flags, ds_kept = one_shot_flags_and_kept(token_sets, 128, 8, seed=1)

    cfg = DedupConfig(num_perm=128, num_bands=8, seed=42, num_parts=8,
                      batch_size=64, concurrency=2)
    t = pa.table({"doc_id": pa.array(np.arange(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ds = rd.from_arrow(t).repartition(4)
    kept = dedup(ds, cfg).to_pandas()["doc_id"].tolist()
    flags = (duplicate_flags(ds, cfg).to_pandas()
             .sort_values("doc_id")["is_dup"].tolist())

    jac = kept_set_jaccard(kept, ds_kept)
    mismatch = float(np.mean(np.asarray(flags) != np.asarray(ds_flags)))
    # reference reports 0.987 / 0.011 vs real datasketch; same order here
    assert jac >= 0.95, f"kept-set jaccard {jac:.4f} vs oracle"
    assert mismatch <= 0.03, f"flag mismatch rate {mismatch:.4f}"

    # exact duplicates must be removed under BOTH families
    n_unique = 150
    exact_dups = set(range(n_unique, n_unique + 40))
    assert not (exact_dups & set(kept))
    assert not (exact_dups & set(ds_kept))


def test_vendored_oracle_matches_real_datasketch_bitwise():
    """Where the real ``datasketch`` package is installed, the vendored
    oracle must be BIT-EQUAL to it: same SHA-1 token hash, same
    RandomState(seed) permutation draw, same (a*h+b) mod Mersenne-61
    masked to 32 bits.  Skipped in this container (package absent) — in a
    richer environment this closes the B5 third-party cross-check loop
    (reference benchmarks/full_benchmark.py:402-501)."""
    import pytest

    ds_lib = pytest.importorskip("datasketch")

    from rensa_ray.functions.minioracle import MiniDatasketchMinHash

    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(300)]
    for seed in (1, 7, 42):
        for _ in range(5):
            toks = list(rng.choice(vocab, size=int(rng.integers(1, 80))))
            real = ds_lib.MinHash(num_perm=64, seed=seed)
            real.update_batch([t.encode("utf-8") for t in toks])
            mini = MiniDatasketchMinHash(num_perm=64, seed=seed)
            mini.update_batch(toks)
            assert mini.digest() == [int(v) for v in real.hashvalues]


def test_engine_agrees_with_real_datasketch_lsh(ray_session):
    """Reference headline lane with the REAL third-party library (kept-set
    Jaccard + flag-mismatch vs datasketch MinHashLSH, first-wins arrival
    order) — the same protocol as the vendored-oracle test above it.
    Skipped where datasketch is absent."""
    import pytest

    ds_lib = pytest.importorskip("datasketch")

    import pyarrow as pa
    import ray.data as rd

    from rensa_ray.pipelines.dedup import DedupConfig, dedup, duplicate_flags

    docs = _corpus()
    token_sets = [tokenize_to_ngrams(t, 3) for t in docs]

    lsh = ds_lib.MinHashLSH(threshold=0.8, num_perm=128, params=(8, 16))
    real_flags, real_kept = [], []
    for i, toks in enumerate(token_sets):
        m = ds_lib.MinHash(num_perm=128, seed=1)
        m.update_batch([t.encode("utf-8") for t in toks])
        hit = bool(lsh.query(m))
        real_flags.append(hit)
        if not hit:
            real_kept.append(i)
            lsh.insert(i, m)

    cfg = DedupConfig(num_perm=128, num_bands=8, seed=42, num_parts=8,
                      batch_size=64, concurrency=2)
    t = pa.table({"doc_id": pa.array(np.arange(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ds = rd.from_arrow(t).repartition(4)
    kept = dedup(ds, cfg).to_pandas()["doc_id"].tolist()
    flags = (duplicate_flags(ds, cfg).to_pandas()
             .sort_values("doc_id")["is_dup"].tolist())

    jac = kept_set_jaccard(kept, real_kept)
    mismatch = float(np.mean(np.asarray(flags) != np.asarray(real_flags)))
    assert jac >= 0.95, f"kept-set jaccard {jac:.4f} vs real datasketch"
    assert mismatch <= 0.03, f"flag mismatch rate {mismatch:.4f}"
