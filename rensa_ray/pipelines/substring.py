"""Substring (consecutive-run) duplicate detection — the suffix-array lane.

The north-star names "suffix-array substring" dedup alongside MinHash and
SimHash.  A literal distributed suffix array over 10^12 documents is not a
Ray-Data-shaped computation; the standard large-scale equivalent (used by
training-data dedup pipelines in the literature, e.g. Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better", and MOSS-style
winnowing, Schleimer et al. SIGMOD 2003) is fixed-length rolling-hash
fingerprinting of token windows:

- ``substring_dup_pairs`` — EXACT: doc pairs sharing at least one run of
  ``min_len`` consecutive (lowercased) words.  Every in-document window of
  ``min_len`` words is fingerprinted with a polynomial rolling hash over
  the words' fxhash64 values; windows shuffle by fingerprint; co-located
  equal fingerprints emit pairs.  Semantics are exactly "share an L-token
  substring" (up to 2^-64 hash collisions), so a DuckDB L-gram self-join
  oracle reproduces it row-for-row.
- ``substring_dup_pairs_winnowed`` — the scale path: per document only the
  winnowed fingerprints (each ``window``-wide stretch of positions keeps
  its minimum) enter the shuffle, cutting shuffle volume ~window×.
  Guarantee (robust winnowing): any shared run of at least
  ``min_len + window - 1`` words still produces a shared kept fingerprint,
  so recall is 1.0 above that length; detected pairs are always a subset
  of the exact lane's.

Both lanes accept ``max_df`` (drop fingerprints whose posting list exceeds
it — boilerplate runs) like the n-gram join; default None keeps exactness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.shingle import batch_shingle_hashes
from .common import np_col, pairs_within_runs, partitionwise, run_ids

# odd multiplier (Knuth LCG constant) — invertible mod 2^64, so rolling
# windows difference out of one wrapping prefix sum
_RK = np.uint64(6364136223846793005)
_RK_INV = np.uint64(pow(6364136223846793005, -1, 1 << 64))


def _window_hashes(word_hashes: np.ndarray, offsets: np.ndarray, min_len: int
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CSR word hashes → (win_hash, doc_idx, pos) for every in-doc window.

    ``H_t = sum_j w[t+j] * K^j  (mod 2^64)`` via one wrapping prefix sum:
    with ``S_t = sum_{u<t} w_u * K^u``, ``H_t = (S_{t+L} - S_t) * K^-t``.
    """
    total = len(word_hashes)
    n = len(offsets) - 1
    if total == 0 or n == 0:
        e = np.empty(0, np.uint64)
        return e, np.empty(0, np.int64), np.empty(0, np.int64)
    L = min_len
    with np.errstate(over="ignore"):
        kpow = np.empty(total, np.uint64)
        kinv = np.empty(total, np.uint64)
        kpow[0] = kinv[0] = 1
        if total > 1:
            np.cumprod(np.full(total - 1, _RK, np.uint64), out=kpow[1:])
            np.cumprod(np.full(total - 1, _RK_INV, np.uint64), out=kinv[1:])
        S = np.zeros(total + 1, np.uint64)
        np.cumsum(word_hashes * kpow, out=S[1:])
        sizes = offsets[1:] - offsets[:-1]
        doc_of = np.repeat(np.arange(n, dtype=np.int64), sizes)
        pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], sizes)
        valid = (sizes[doc_of] - pos) >= L
        vt = np.flatnonzero(valid)
        H = (S[vt + L] - S[vt]) * kinv[vt]
    return H, doc_of[vt], pos[vt]


def _winnow_keep(H: np.ndarray, doc_idx: np.ndarray, window: int) -> np.ndarray:
    """Robust winnowing: keep positions that are the minimum of some
    ``window``-wide stretch of consecutive positions WITHIN one document.
    Returns a boolean keep mask aligned to H (positions are doc-contiguous).
    """
    total = len(H)
    keep = np.zeros(total, bool)
    if total == 0:
        return keep
    if window <= 1:
        keep[:] = True
        return keep
    from numpy.lib.stride_tricks import sliding_window_view

    # doc boundaries in the (doc-contiguous) position stream
    starts = np.flatnonzero(np.concatenate(
        [[True], doc_idx[1:] != doc_idx[:-1]]))
    ends = np.concatenate([starts[1:], [total]])
    for s, e in zip(starts, ends):
        m = e - s
        if m <= window:
            keep[s + int(np.argmin(H[s:e]))] = True
            continue
        w = sliding_window_view(H[s:e], window)
        mins = s + np.arange(m - window + 1) + w.argmin(axis=1)
        keep[np.unique(mins)] = True
    return keep


def _fingerprints(sf_dir: str, min_len: int, winnow: int | None):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def _emit(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch["text"].to_pylist()]
        words, offsets = batch_shingle_hashes(texts, 1)
        H, didx, _pos = _window_hashes(words, offsets, min_len)
        if winnow is not None:
            k = _winnow_keep(H, didx, winnow)
            H, didx = H[k], didx[k]
        ids = np_col(batch, "doc_id")
        if len(H) == 0:
            return pa.table({"fp": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64())})
        # distinct (fingerprint, doc) within the batch
        order = np.lexsort((H, didx))
        d_s, h_s = didx[order], H[order]
        first = np.ones(len(h_s), bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        return pa.table({"fp": pa.array(h_s[first], pa.uint64()),
                         "doc_id": pa.array(ids[d_s[first]], pa.int64())})

    return ds.map_batches(_emit, batch_format="pyarrow", batch_size=1024)


def _pairs_from_fingerprints(fp_ds, num_parts: int, max_df: int | None):
    def _co(g: pa.Table) -> pa.Table:
        fp = np_col(g, "fp").astype(np.uint64)
        ids = np_col(g, "doc_id")
        order, gid, counts = run_ids(fp, ids.astype(np.uint64), n_group_keys=1)
        ids_s = ids[order]
        # distinct (fp, doc): a doc may emit one fp from several batches
        first = np.ones(len(gid), bool)
        first[1:] = (gid[1:] != gid[:-1]) | (ids_s[1:] != ids_s[:-1])
        ids_s = ids_s[first]
        gid_u = gid[first]
        counts = np.bincount(gid_u, minlength=len(counts))
        if max_df is not None and (counts > max_df).any():
            keep_rows = (counts <= max_df)[gid_u]
            ids_s = ids_s[keep_rows]
            counts = counts[counts <= max_df]
        ii, jj = pairs_within_runs(counts)
        if len(ii) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"id_a": z, "id_b": z})
        a, b = ids_s[ii], ids_s[jj]
        o2, g2, _ = run_ids(a.astype(np.uint64), b.astype(np.uint64))
        f2 = np.ones(len(g2), bool)
        f2[1:] = g2[1:] != g2[:-1]
        return pa.table({"id_a": pa.array(a[o2][f2], pa.int64()),
                         "id_b": pa.array(b[o2][f2], pa.int64())})

    partial = partitionwise(fp_ds, _co, "fp", num_parts)

    def _distinct(g: pa.Table) -> pa.Table:
        a = np_col(g, "id_a").astype(np.uint64)
        b = np_col(g, "id_b").astype(np.uint64)
        if len(a) == 0:
            return pa.table({"id_a": g["id_a"], "id_b": g["id_b"]})
        o, gg, _ = run_ids(a, b)
        f = np.ones(len(gg), bool)
        f[1:] = gg[1:] != gg[:-1]
        return pa.table({"id_a": pa.array(a[o][f].astype(np.int64)),
                         "id_b": pa.array(b[o][f].astype(np.int64))})

    return partitionwise(partial, _distinct, "id_a", num_parts)


def substring_dup_pairs(sf_dir: str, min_len: int = 10, num_parts: int = 32,
                        max_df: int | None = None):
    """Exact lane: (id_a < id_b) sharing ≥ min_len consecutive words."""
    return _pairs_from_fingerprints(
        _fingerprints(sf_dir, min_len, winnow=None), num_parts, max_df)


def substring_dup_pairs_winnowed(sf_dir: str, min_len: int = 10,
                                 window: int = 8, num_parts: int = 32,
                                 max_df: int | None = None):
    """Scale lane: winnowed fingerprints (~window× less shuffle volume);
    guaranteed to catch shared runs of ≥ min_len + window - 1 words."""
    return _pairs_from_fingerprints(
        _fingerprints(sf_dir, min_len, winnow=window), num_parts, max_df)
