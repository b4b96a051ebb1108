"""Reference-API-compatible MinHash objects (incremental + batch builders).

Mirrors the six-class Python surface of the reference (src/lib.rs:35-43)
with identical math, so parity tests can compare signatures, Jaccard
estimates and LSH behavior 1:1:

- ``RMinHash``  — src/rminhash/py.rs:102-401: ``update`` folds token hashes
  into a running per-slot min of ``((a*h+b) >> 32) as u32``; documents are
  iterables of tokens; a single bytes-like object is ONE token; a top-level
  ``str`` iterates Python-style into characters (pinned by the reference's
  tests/test_rensa.py:162-175).
- ``CMinHash``  — src/cminhash/py.rs + core.rs:104-222: two-stage circulant
  permutation, u64 slots, u32 digest view is ``v >> 32``.
- Batch builders (``digest_matrix_from_token_sets`` etc., reference
  src/rminhash/py.rs:124-367) reuse the vectorized kernels from
  ``rensa_ray.kernels.sketch``.

These classes are the *in-memory* API; the distributed pipelines in
``rensa_ray.pipelines`` are the scale path.
"""

from __future__ import annotations

import numpy as np

from ..kernels.hashing import (
    CMinParams,
    U64,
    build_rmin_permutations,
    fxhash64,
    fxhash64_bytes_list,
)
from ..kernels.rho import rho_digest_matrix
from ..kernels.sketch import (
    CMIN_EMPTY,
    RMIN_EMPTY,
    cmin_digest_matrix,
    jaccard_from_signatures,
    rmin_digest_matrix,
    validate_offsets,
)

_N32 = np.uint64(32)


def token_hashes_of(document) -> np.ndarray:
    """Document → uint64 token-hash array (reference src/py_input.rs:11-81).

    A bytes-like object at top level is a single token; otherwise the
    document is iterated (strings iterate into characters, matching Python
    and the reference's pinned behavior).
    """
    if isinstance(document, (bytes, bytearray, memoryview)):
        return np.array([fxhash64(_buffer_bytes(document))], dtype=np.uint64)
    items = []
    for tok in document:
        if isinstance(tok, str):
            items.append(tok.encode("utf-8"))
        elif isinstance(tok, (bytes, bytearray, memoryview)):
            items.append(_buffer_bytes(tok))
        else:
            raise TypeError(
                "each item must be str or a bytes-like object, "
                f"got {type(tok).__name__}")
    return fxhash64_bytes_list(items)


def _contiguous_flat(values, label: str, dtype) -> np.ndarray:
    """Expert flat-input validation: buffer-backed inputs must be
    C-contiguous (reference parse_flat_token_hashes rejects strided
    exporters instead of silently copying, src/rminhash/pipeline.rs:208-210)."""
    arr = np.asarray(values)
    if not arr.flags["C_CONTIGUOUS"]:
        raise ValueError(
            f"{label}: flat buffer inputs must be C-contiguous")
    return np.asarray(arr, dtype=dtype)


def _buffer_bytes(buf) -> bytes:
    """Bytes of a buffer; non-C-contiguous memoryviews are rejected, matching
    the reference's expert-input validation (src/py_input/buffer.rs;
    tests/test_rensa.py:136-147)."""
    if isinstance(buf, memoryview) and not buf.c_contiguous:
        raise TypeError("buffer must be C-contiguous")
    return bytes(buf)


def _hash_token_sets(token_sets) -> list[list[int]]:
    return [token_hashes_of(doc).tolist() for doc in token_sets]


def _csr_from_sets(token_sets, prehashed: bool = False):
    rows = [np.asarray(s, dtype=np.uint64) if prehashed else token_hashes_of(s)
            for s in token_sets]
    offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=offsets[1:])
    flat = (np.concatenate(rows) if rows else np.empty(0, np.uint64))
    return flat, offsets


class RMinHashDigestMatrix:
    """Compact row-major signature matrix (src/rminhash/matrix.rs:1-9).

    ``rho_sidecar`` (a ``kernels.rho.RhoSidecar``) is attached by the rho
    builders; the LSH one-shot path reads it for the sparse ≥2-band rule,
    sparse-verify gating and recall rescue (src/rminhash/matrix.rs:16-79).
    """

    __slots__ = ("matrix", "rho_sidecar")

    def __init__(self, matrix: np.ndarray, rho_sidecar=None):
        self.matrix = np.ascontiguousarray(matrix)
        self.rho_sidecar = rho_sidecar

    @property
    def rows(self) -> int:
        return self.matrix.shape[0]

    @property
    def num_perm(self) -> int:
        return self.matrix.shape[1]

    def row(self, i: int) -> list[int]:
        return self.matrix[i].tolist()

    def as_numpy(self) -> np.ndarray:
        return self.matrix

    def to_rows(self) -> list[list[int]]:
        """Row-wise python lists (src/rminhash/py.rs:33-39)."""
        return self.matrix.tolist()

    # -- rho sidecar accessors (src/rminhash/py.rs:42-79) --------------------
    def get_rho_non_empty_counts(self) -> list[int] | None:
        sc = self.rho_sidecar
        return None if sc is None else sc.non_empty_counts.tolist()

    def get_rho_source_token_counts(self) -> list[int] | None:
        sc = self.rho_sidecar
        return None if sc is None else sc.source_token_counts.tolist()

    def get_rho_sparse_occupancy_threshold(self) -> int | None:
        sc = self.rho_sidecar
        return None if sc is None else sc.sparse_occupancy_threshold

    def get_rho_sparse_row_rate(self) -> float | None:
        sc = self.rho_sidecar
        if sc is None or len(sc.sparse_active) == 0:
            return None if sc is None else 0.0
        return float(sc.sparse_active.sum()) / len(sc.sparse_active)

    def rho_sparse_verify_signature(self, i: int) -> np.ndarray | None:
        """Verify signature of row ``i`` if it is sparse, else None
        (src/rminhash/matrix.rs:63-79)."""
        sc = self.rho_sidecar
        if sc is None or sc.sparse_verify_perm == 0 or not sc.sparse_active[i]:
            return None
        return sc.sparse_signatures[i]

    def __getstate__(self):
        return {"matrix": self.matrix, "rho_sidecar": self.rho_sidecar}

    def __setstate__(self, state):
        self.matrix = state["matrix"]
        self.rho_sidecar = state.get("rho_sidecar")


class RMinHash:
    """Incremental R-MinHash (src/rminhash/py.rs:102-116, 379-401)."""

    def __init__(self, num_perm: int, seed: int = 42):
        if num_perm <= 0:
            raise ValueError("num_perm must be greater than 0")
        self.num_perm = num_perm
        self.seed = seed
        self._a, self._b = build_rmin_permutations(num_perm, seed)
        self._sig = np.full(num_perm, RMIN_EMPTY, dtype=np.uint32)

    def update(self, document) -> None:
        hashes = token_hashes_of(document)
        if len(hashes) == 0:
            return
        uniq = np.unique(hashes)
        phi = ((uniq[:, None] * self._a[None, :] + self._b[None, :]) >> _N32
               ).astype(np.uint32)
        np.minimum(self._sig, phi.min(axis=0), out=self._sig)

    def update_token_hashes(self, hashes) -> None:
        """Pre-hashed expert path (src/rminhash/py.rs:250-265 semantics)."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        if len(hashes) == 0:
            return
        phi = ((hashes[:, None] * self._a[None, :] + self._b[None, :]) >> _N32
               ).astype(np.uint32)
        np.minimum(self._sig, phi.min(axis=0), out=self._sig)

    def digest(self) -> list[int]:
        return self._sig.tolist()

    def digest_np(self) -> np.ndarray:
        return self._sig.copy()

    def jaccard(self, other: "RMinHash") -> float:
        return jaccard_from_signatures(self._sig, other._sig)

    # -- pickle (signatures are the durable state; permutations rebuild from
    #    (num_perm, seed) — reference src/rminhash/py.rs:421-455) ------------
    def __getstate__(self):
        return {"num_perm": self.num_perm, "seed": self.seed,
                "sig": self._sig.tobytes()}

    def __setstate__(self, state):
        self.__init__(state["num_perm"], state["seed"])
        self._sig = np.frombuffer(state["sig"], dtype=np.uint32).copy()

    # -- batch builders ------------------------------------------------------
    @classmethod
    def from_token_sets(cls, token_sets, num_perm: int, seed: int = 42
                        ) -> list["RMinHash"]:
        mat = cls.digest_matrix_from_token_sets(token_sets, num_perm, seed)
        out = []
        for i in range(mat.rows):
            mh = cls(num_perm, seed)
            mh._sig = mat.matrix[i].copy()
            out.append(mh)
        return out

    @classmethod
    def digests_from_token_sets(cls, token_sets, num_perm: int, seed: int = 42
                                ) -> list[list[int]]:
        return cls.digest_matrix_from_token_sets(
            token_sets, num_perm, seed).matrix.tolist()

    @classmethod
    def digest_matrix_from_token_sets(cls, token_sets, num_perm: int,
                                      seed: int = 42) -> RMinHashDigestMatrix:
        flat, offsets = _csr_from_sets(token_sets)
        return RMinHashDigestMatrix(
            rmin_digest_matrix(flat, offsets, num_perm, seed))

    @classmethod
    def hash_token_sets(cls, token_sets) -> list[list[int]]:
        return _hash_token_sets(token_sets)

    @classmethod
    def digest_matrix_from_token_hash_sets(cls, token_hash_sets, num_perm: int,
                                           seed: int = 42) -> RMinHashDigestMatrix:
        flat, offsets = _csr_from_sets(token_hash_sets, prehashed=True)
        return RMinHashDigestMatrix(
            rmin_digest_matrix(flat, offsets, num_perm, seed))

    @classmethod
    def digest_matrix_from_flat_token_hashes(cls, token_hashes, row_offsets,
                                             num_perm: int, seed: int = 42
                                             ) -> RMinHashDigestMatrix:
        flat = _contiguous_flat(token_hashes, "token_hashes", np.uint64)
        offsets = _contiguous_flat(row_offsets, "row_offsets", np.int64)
        validate_offsets(offsets, len(flat))
        return RMinHashDigestMatrix(
            rmin_digest_matrix(flat, offsets, num_perm, seed))

    @classmethod
    def digest_matrix_from_token_byte_sets(cls, token_byte_sets, num_perm: int,
                                           seed: int = 42) -> RMinHashDigestMatrix:
        flat, offsets = _csr_from_sets(token_byte_sets)
        return RMinHashDigestMatrix(
            rmin_digest_matrix(flat, offsets, num_perm, seed))

    # -- rho fast-path builders (src/rminhash/py.rs:222-343) -----------------
    # The rho sketch is O(tokens) with a recall/precision sidecar; digests
    # are NOT comparable with R-MinHash digests.  The token-set builders
    # limit the sidecar's token list by the row budget (streaming builder
    # semantics, rho.rs:1088-1132); the flat builder hands the sidecar the
    # full row (rho.rs:1281-1300).
    @classmethod
    def digest_matrix_from_token_sets_rho(cls, token_sets, num_perm: int,
                                          seed: int = 42, probes: int = 4
                                          ) -> RMinHashDigestMatrix:
        flat, offsets = _csr_from_sets(token_sets)
        mat, sidecar = rho_digest_matrix(flat, offsets, num_perm, seed, probes)
        return RMinHashDigestMatrix(mat, rho_sidecar=sidecar)

    @classmethod
    def digest_matrix_from_token_hash_sets_rho(cls, token_hash_sets,
                                               num_perm: int, seed: int = 42,
                                               probes: int = 4
                                               ) -> RMinHashDigestMatrix:
        flat, offsets = _csr_from_sets(token_hash_sets, prehashed=True)
        mat, sidecar = rho_digest_matrix(flat, offsets, num_perm, seed, probes)
        return RMinHashDigestMatrix(mat, rho_sidecar=sidecar)

    @classmethod
    def digest_matrix_from_flat_token_hashes_rho(cls, token_hashes, row_offsets,
                                                 num_perm: int, seed: int = 42,
                                                 probes: int = 4
                                                 ) -> RMinHashDigestMatrix:
        flat = _contiguous_flat(token_hashes, "token_hashes", np.uint64)
        offsets = _contiguous_flat(row_offsets, "row_offsets", np.int64)
        validate_offsets(offsets, len(flat))
        mat, sidecar = rho_digest_matrix(flat, offsets, num_perm, seed,
                                         probes, limit_tokens_for_sidecar=False)
        return RMinHashDigestMatrix(mat, rho_sidecar=sidecar)


class CMinHash:
    """Incremental C-MinHash (src/cminhash/py.rs, core src/cminhash/core.rs)."""

    def __init__(self, num_perm: int, seed: int = 42):
        if num_perm <= 0:
            raise ValueError("num_perm must be greater than 0")
        self.num_perm = num_perm
        self.seed = seed
        self._params = CMinParams(num_perm, seed)
        self._pi_pre = self._params.pi_precomputed()
        self._sig = np.full(num_perm, CMIN_EMPTY, dtype=np.uint64)

    def update(self, document) -> None:
        hashes = token_hashes_of(document)
        if len(hashes) == 0:
            return
        uniq = np.unique(hashes)
        sigma = U64(self._params.sigma_a) * uniq + U64(self._params.sigma_b)
        base = U64(self._params.pi_c) * sigma
        phi = base[:, None] + self._pi_pre[None, :]
        np.minimum(self._sig, phi.min(axis=0), out=self._sig)

    def digest(self) -> list[int]:
        """u32 digest view: v >> 32 (src/cminhash/py.rs:155-167)."""
        return (self._sig >> _N32).astype(np.uint32).tolist()

    def digest_u64(self) -> list[int]:
        return self._sig.tolist()

    def jaccard(self, other: "CMinHash") -> float:
        return jaccard_from_signatures(self._sig, other._sig)

    def __getstate__(self):
        return {"num_perm": self.num_perm, "seed": self.seed,
                "sig": self._sig.tobytes()}

    def __setstate__(self, state):
        self.__init__(state["num_perm"], state["seed"])
        self._sig = np.frombuffer(state["sig"], dtype=np.uint64).copy()

    @classmethod
    def from_token_sets(cls, token_sets, num_perm: int, seed: int = 42
                        ) -> list["CMinHash"]:
        flat, offsets = _csr_from_sets(token_sets)
        mat = cmin_digest_matrix(flat, offsets, num_perm, seed)
        out = []
        for i in range(len(mat)):
            mh = cls(num_perm, seed)
            mh._sig = mat[i].copy()
            out.append(mh)
        return out

    @classmethod
    def digests_from_token_sets(cls, token_sets, num_perm: int, seed: int = 42
                                ) -> list[list[int]]:
        flat, offsets = _csr_from_sets(token_sets)
        mat = cmin_digest_matrix(flat, offsets, num_perm, seed)
        return (mat >> _N32).astype(np.uint32).tolist()

    @classmethod
    def digests64_from_token_sets(cls, token_sets, num_perm: int, seed: int = 42
                                  ) -> list[list[int]]:
        flat, offsets = _csr_from_sets(token_sets)
        return cmin_digest_matrix(flat, offsets, num_perm, seed).tolist()

    @classmethod
    def digests64_from_token_hash_sets(cls, token_hash_sets, num_perm: int,
                                       seed: int = 42) -> list[list[int]]:
        flat, offsets = _csr_from_sets(token_hash_sets, prehashed=True)
        return cmin_digest_matrix(flat, offsets, num_perm, seed).tolist()
