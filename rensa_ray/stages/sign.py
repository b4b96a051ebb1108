"""Signature stages — stateful actor-pool callables for ``map_batches``.

The signer holds the (seed-derived) permutation constants and emits one
MinHash signature row per input document.  Setup runs once per actor in
``__init__``; ``__call__`` is fully vectorized per batch.

Reference semantics: ``RMinHash.digest_matrix_from_token_sets`` and the
C-MinHash batch builders (src/rminhash/pipeline.rs:370-640,
src/cminhash/batch.rs:127-191), with the benchmark shingler
(benchmarks/full_benchmark.py:306-310) fused in front.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.hashing import CMinParams, build_rmin_permutations
from ..kernels.shingle import batch_shingle_hashes
from ..kernels.sketch import cmin_digest_matrix, oph_digest_matrix, rmin_digest_matrix

SIG_COL = "sig"


def sig_to_arrow(sig: np.ndarray) -> pa.FixedSizeListArray:
    """(n, P) signature matrix → Arrow fixed_size_list column (zero-copy)."""
    n, p = sig.shape
    values = pa.array(sig.reshape(-1), type=pa.from_numpy_dtype(sig.dtype))
    return pa.FixedSizeListArray.from_arrays(values, p)


def sig_from_arrow(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Arrow fixed_size_list column → (n, P) numpy matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    p = col.type.list_size
    return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, p)


class MinHashSigner:
    """Actor-pool signature stage: (id, text) batches → (id, sig) batches.

    Args:
        num_perm: signature width (reference default 128).
        seed: permutation seed — any worker rebuilds identical permutations
            from (num_perm, seed), which is what makes the stage stateless
            across retries (src/rminhash.rs:121-134).
        ngram_size: word-shingle width (3 = reference benchmark default).
        algo: "rmin" (u32 digests), "cmin" (u64 digests), or "oph"
            (one-permutation hashing, u64 digests — the O(tokens+num_perm)
            scale path, ~8× faster than rmin; NOT digest-compatible with
            the other algos, mirror of the reference's rho speed path).
        id_col / text_col: input column names; only ``id_col`` and ``sig``
            are emitted (keep payload columns out of the shuffle).
    """

    def __init__(self, num_perm: int = 128, seed: int = 42, ngram_size: int = 3,
                 algo: str = "rmin", id_col: str = "doc_id", text_col: str = "text",
                 emit_token_count: bool = False):
        if algo not in ("rmin", "cmin", "oph"):
            raise ValueError(f"unknown algo {algo!r}")
        self.num_perm = num_perm
        self.seed = seed
        self.ngram_size = ngram_size
        self.algo = algo
        self.id_col = id_col
        self.text_col = text_col
        # emit per-doc shingle counts next to the signature — the sparsity
        # signal for the OPH recall-rescue rules (pipelines.dedup
        # duplicate_flags_oph_rescued)
        self.emit_token_count = emit_token_count
        if algo == "rmin":
            self._perms = build_rmin_permutations(num_perm, seed)
            self._params = None
        elif algo == "cmin":
            self._perms = None
            self._params = CMinParams(num_perm, seed)
        else:  # oph needs no precomputed state (mixer is seed-derived)
            self._perms = None
            self._params = None
        # per-actor hot-token permutation cache, env-gated and OFF by
        # default like the reference (RENSA_MAX_PERM_CACHE_HASHES,
        # src/rminhash/permutation_cache.rs + src/rminhash.rs:61-64);
        # warm across batches because the signer is actor-pool state
        self._cache = None
        if algo == "rmin":
            from ..kernels.sketch import AdaptivePermutationCache

            self._cache = AdaptivePermutationCache.from_env(*self._perms)

    def _digest(self, hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        if self.algo == "rmin":
            return rmin_digest_matrix(hashes, offsets, self.num_perm, self.seed,
                                      perms=self._perms, cache=self._cache)
        if self.algo == "oph":
            return oph_digest_matrix(hashes, offsets, self.num_perm, self.seed)
        return cmin_digest_matrix(hashes, offsets, self.num_perm, self.seed,
                                  params=self._params)

    def sign_texts(self, texts: list[str]) -> np.ndarray:
        hashes, offsets = batch_shingle_hashes(texts, self.ngram_size)
        return self._digest(hashes, offsets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        texts = ["" if t is None else t for t in texts]
        hashes, offsets = batch_shingle_hashes(texts, self.ngram_size)
        sig = self._digest(hashes, offsets)
        cols = {self.id_col: batch[self.id_col], SIG_COL: sig_to_arrow(sig)}
        if self.emit_token_count:
            cols["n_tok"] = pa.array(
                (offsets[1:] - offsets[:-1]).astype(np.int32))
        return pa.table(cols)


class RhoSigner:
    """Rho fast-path signature stage: (id, text) → (id, sig, n_tok, sparse[, svsig]).

    The rho sketch (src/rminhash/rho.rs) is O(tokens): each shingle hash is
    SplitMix64-mixed into ``probes`` buckets of a ``num_perm``-wide row.  The
    stage emits the sidecar columns the one-shot recall/precision rules need
    downstream (pipelines.dedup.duplicate_flags_rho):

    - ``n_tok``  — u16-saturating source shingle count (rescue window test);
    - ``sparse`` — row filled < occupancy-threshold buckets (≥2-band rule);
    - ``svsig``  — 8-perm verify mini-signature, fixed_size_list<u32>
      (sparse-verify gate; omitted when verification is env-disabled).

    Env knobs (``RENSA_RHO_*``) are read once per actor in ``__init__`` via
    ``RhoParams.from_env`` — identical names/defaults to the reference
    (src/rminhash/rho.rs:55-210).
    """

    def __init__(self, num_perm: int = 128, seed: int = 42, ngram_size: int = 3,
                 probes: int = 4, id_col: str = "doc_id", text_col: str = "text",
                 params=None):
        from ..kernels.rho import RhoParams

        self.num_perm = num_perm
        self.seed = seed
        self.ngram_size = ngram_size
        self.id_col = id_col
        self.text_col = text_col
        # prefer DRIVER-resolved params (a frozen dataclass, ships in the
        # actor constructor args): on a real cluster worker processes may
        # have been started with a different RENSA_RHO_* environment than
        # the driver, and sketch params MUST match the scan config the
        # driver derived (pipelines/rho_dedup.py) or the sparse-verify gate
        # silently degrades
        self.params = params if params is not None \
            else RhoParams.from_env(num_perm, probes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.rho import rho_digest_matrix

        texts = batch[self.text_col].to_pylist()
        texts = ["" if t is None else t for t in texts]
        hashes, offsets = batch_shingle_hashes(texts, self.ngram_size)
        sig, sc = rho_digest_matrix(hashes, offsets, self.num_perm, self.seed,
                                    params=self.params)
        cols = {
            self.id_col: batch[self.id_col],
            SIG_COL: sig_to_arrow(sig),
            "n_tok": pa.array(sc.source_token_counts.astype(np.int32)),
            "sparse": pa.array(sc.sparse_active.astype(bool)),
        }
        if sc.sparse_verify_perm > 0:
            cols["svsig"] = sig_to_arrow(sc.sparse_signatures)
        return pa.table(cols)


class TokenHasher:
    """Tokenize-only stage: text → ``token_hashes: list<uint64>`` (reference
    ``RMinHash.hash_token_sets``, src/rminhash/py.rs:175-182).  Useful to
    share shingling between R- and C-MinHash stages."""

    def __init__(self, ngram_size: int = 3, id_col: str = "doc_id", text_col: str = "text"):
        self.ngram_size = ngram_size
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        texts = ["" if t is None else t for t in texts]
        hashes, offsets = batch_shingle_hashes(texts, self.ngram_size)
        col = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       pa.array(hashes, pa.uint64()))
        return pa.table({self.id_col: batch[self.id_col], "token_hashes": col})
