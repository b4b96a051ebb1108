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

Span-level (ExactSubstr) dedup — Lee et al.'s actual output shape, which
token positions of each doc are covered by a duplicated run:

- ``substring_dup_spans`` — EXACT global coverage: every window fingerprint
  shuffles WITH its position and multiplicity (>=2 occurrences anywhere,
  including elsewhere in the same doc, marks all its positions); a second
  doc-keyed shuffle unions the [pos, pos+L) intervals per doc.  Equivalent
  to suffix-array coverage because every position inside a duplicated run
  of length l >= L lies in some duplicated L-window, and the union of those
  windows is exactly the run.  DuckDB-oracle-paired.
- ``substring_dup_spans_sa`` — the ZERO-SHUFFLE lane: each Ray partition
  builds a real suffix array (kernels.suffix, prefix doubling + rank-table
  LCPs) over its concatenated docs and extracts coverage locally —
  partition-local duplicates only, a strict subset of the exact lane
  (equal when candidate docs are co-partitioned, e.g. after a bucketing
  stage or in the single-partition case; pinned in tests).
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

    # doc boundaries in the (doc-contiguous) position stream.  Positions are
    # doc-contiguous, so a window starting at global t with >= window
    # positions left in ITS doc never crosses a boundary — one global
    # sliding argmin over valid starts replaces the per-document python
    # loop (which dominated on many-small-docs batches).
    starts = np.flatnonzero(np.concatenate(
        [[True], doc_idx[1:] != doc_idx[:-1]]))
    sizes = np.diff(np.concatenate([starts, [total]]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, sizes)
    rem = np.repeat(sizes, sizes) - pos
    t = np.flatnonzero(rem >= window)
    if len(t):
        # pad (window-1) u64::MAX sentinels between docs so ONE contiguous
        # sliding argmin covers every document — rows starting in padding
        # are computed but never consumed, and valid rows contain no
        # padding, so no fancy-index window copies are ever materialized
        n_docs = len(sizes)
        pad = window - 1
        P = np.full(total + n_docs * pad, np.iinfo(np.uint64).max, np.uint64)
        ppos = np.arange(total, dtype=np.int64) + np.repeat(
            np.arange(n_docs, dtype=np.int64) * pad, sizes)
        P[ppos] = H
        am = sliding_window_view(P, window).argmin(axis=1)
        keep[t + am[ppos[t]]] = True
    # docs shorter than one window keep their single minimum (first
    # occurrence, matching np.argmin's tie rule)
    short = sizes < window
    if short.any():
        docmin = np.minimum.reduceat(H, starts)
        cand = np.flatnonzero((H == np.repeat(docmin, sizes))
                              & np.repeat(short, sizes))
        cdoc = np.repeat(np.arange(len(sizes)), sizes)[cand]
        first = np.concatenate([[True], cdoc[1:] != cdoc[:-1]])
        keep[cand[first]] = True
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


def _window_fp_rows(ds, min_len: int):
    """(doc_id, text) dataset → (fp, doc_id, pos) rows for EVERY in-doc
    window of ``min_len`` words (positions kept, multiplicity preserved —
    unlike ``_fingerprints``, which dedupes per doc for the pairs lanes)."""

    def _emit(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch["text"].to_pylist()]
        words, offsets = batch_shingle_hashes(texts, 1)
        H, didx, pos = _window_hashes(words, offsets, min_len)
        ids = np_col(batch, "doc_id")
        return pa.table({"fp": pa.array(H, pa.uint64()),
                         "doc_id": pa.array(ids[didx], pa.int64()),
                         "pos": pa.array(pos.astype(np.int32), pa.int32())})

    return ds.map_batches(_emit, batch_format="pyarrow", batch_size=1024)


def _dup_position_rows(wins, num_parts: int, pad_name: str, pad_fn):
    """Fingerprint-keyed shuffle → (doc_id, pos, <pad>) rows of every window
    whose fingerprint occurs >= 2 times globally (same-doc repeats count).
    ``pad_fn(k)`` builds the extra column so the result unions cleanly with
    each lane's per-doc marker rows."""

    def _dup_positions(g: pa.Table) -> pa.Table:
        fp = np_col(g, "fp").astype(np.uint64)
        ids = np_col(g, "doc_id")
        pos = np_col(g, "pos")
        order, gid, counts = run_ids(fp)
        dup = counts[gid] >= 2
        return pa.table({"doc_id": pa.array(ids[order][dup], pa.int64()),
                         "pos": pa.array(pos[order][dup], pa.int32()),
                         pad_name: pad_fn(int(dup.sum()))})

    return partitionwise(wins, _dup_positions, "fp", num_parts)


def _span_output(ids: np.ndarray, n_tok: np.ndarray,
                 dup_tok: np.ndarray) -> pa.Table:
    ratio = np.where(n_tok > 0, dup_tok / np.maximum(n_tok, 1), 0.0)
    return pa.table({
        "doc_id": pa.array(ids.astype(np.int64)),
        "n_tokens": pa.array(n_tok.astype(np.int64)),
        "dup_tokens": pa.array(dup_tok.astype(np.int64)),
        "dup_ratio": pa.array(ratio.astype(np.float64)),
    })


def substring_dup_spans(sf_dir: str, min_len: int = 10, num_parts: int = 32):
    """EXACT span-level (ExactSubstr) dedup stats, globally.

    Per doc: how many token positions are covered by a run of >= min_len
    words occurring >= 2 times anywhere in the corpus (other docs or
    elsewhere in the same doc).  Two keyed shuffles: windows group by
    fingerprint (multiplicity >= 2 -> every occurrence's (doc, pos) flows
    on), then by doc for the interval union.  Output:
    (doc_id, n_tokens, dup_tokens, dup_ratio) for EVERY document.
    """
    import ray.data as rd

    L = min_len
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    wins = _window_fp_rows(ds, L)
    dup_rows = _dup_position_rows(
        wins, num_parts, "n_tok",
        lambda k: pa.array(np.zeros(k, np.int32), pa.int32()))

    def _markers(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch["text"].to_pylist()]
        _w, offsets = batch_shingle_hashes(texts, 1)
        sizes = (offsets[1:] - offsets[:-1]).astype(np.int32)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "pos": pa.array(np.full(len(batch), -1, np.int32), pa.int32()),
            "n_tok": pa.array(sizes, pa.int32())})

    markers = ds.map_batches(_markers, batch_format="pyarrow",
                             batch_size=1024)

    def _union(g: pa.Table) -> pa.Table:
        ids = np_col(g, "doc_id").astype(np.int64)
        pos = np_col(g, "pos").astype(np.int64)
        ntk = np_col(g, "n_tok").astype(np.int64)
        if len(ids) == 0:
            return _span_output(np.empty(0, np.int64), np.empty(0, np.int64),
                                np.empty(0, np.int64))
        order, gid, counts = run_ids(ids.astype(np.uint64))
        ids_s, pos_s, ntk_s = ids[order], pos[order], ntk[order]
        n_docs = len(counts)
        n_of = np.zeros(n_docs, np.int64)
        np.maximum.at(n_of, gid, ntk_s)           # marker rows carry n_tok
        first = np.zeros(len(gid), bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        base = np.zeros(n_docs + 1, np.int64)
        np.cumsum(n_of, out=base[1:])
        diff = np.zeros(base[-1] + 1, np.int64)
        m = pos_s >= 0                            # dup-position rows
        starts = base[gid[m]] + pos_s[m]
        np.add.at(diff, starts, 1)
        np.add.at(diff, starts + L, -1)           # windows fit by construction
        cov = (np.cumsum(diff[:-1]) > 0) if base[-1] else np.zeros(0, bool)
        dup_tok = np.bincount(
            np.repeat(np.arange(n_docs), n_of), weights=cov,
            minlength=n_docs).astype(np.int64) if base[-1] else \
            np.zeros(n_docs, np.int64)
        return _span_output(ids_s[first], n_of, dup_tok)

    return partitionwise(dup_rows.union(markers), _union, "doc_id", num_parts)


def substring_dedup_cut(sf_dir: str, min_len: int = 10, num_parts: int = 32):
    """ExactSubstr REWRITE over the documents table (see
    ``substring_dedup_cut_ds``)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return substring_dedup_cut_ds(ds, min_len=min_len, num_parts=num_parts)


def substring_dedup_cut_ds(ds, min_len: int = 10, num_parts: int = 32):
    """ExactSubstr REWRITE: drop every token covered by a duplicated run of
    >= min_len words (both/all occurrences — the deterministic variant of
    Lee et al.'s span cutting) and re-join the survivors.

    Output (doc_id, clean_text, n_tokens, removed_tokens) for every doc;
    ``clean_text`` is whitespace-normalized lowercase (the tokenizer's
    canonical form — the only form in which "token position" is
    well-defined).  Shape: the spans lanes' fingerprint-multiplicity
    shuffle, then ONE doc-keyed shuffle carrying the corpus text once (the
    op rewrites every document, so output ~ input size by nature).
    ``ds`` must carry (doc_id, text) — a Dataset input so tier pipelines
    can chain the cut after earlier dedup tiers.
    """
    L = min_len
    wins = _window_fp_rows(ds, L)
    dup_rows = _dup_position_rows(
        wins, num_parts, "text", lambda k: pa.array([None] * k, pa.string()))

    def _doc_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "pos": pa.array(np.full(len(batch), -1, np.int32), pa.int32()),
            "text": batch["text"].cast(pa.string())})

    docs = ds.map_batches(_doc_rows, batch_format="pyarrow", batch_size=1024)

    def _cut(g: pa.Table) -> pa.Table:
        ids = np_col(g, "doc_id").astype(np.int64)
        pos = np_col(g, "pos").astype(np.int64)
        texts = g["text"].to_pylist()
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "clean_text": pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64()),
                             "removed_tokens": pa.array([], pa.int64())})
        order = np.lexsort((pos, ids))
        ids_s, pos_s = ids[order], pos[order]
        first = np.zeros(len(ids_s), bool)
        first[0] = True
        first[1:] = ids_s[1:] != ids_s[:-1]
        starts = np.flatnonzero(first)
        ends = np.concatenate([starts[1:], [len(ids_s)]])
        out_ids, out_txt, out_n, out_rm = [], [], [], []
        for s, e in zip(starts, ends):
            # the doc's text row sorts first (pos == -1, exactly one)
            t = texts[order[s]]
            words = ("" if t is None else t).lower().split()
            n = len(words)
            p = pos_s[s + 1: e]                # dup window starts, ascending
            if len(p):
                diff = np.zeros(n + 1, np.int64)
                np.add.at(diff, p, 1)
                np.add.at(diff, p + L, -1)
                cov = np.cumsum(diff[:-1]) > 0
                kept = [w for w, c in zip(words, cov) if not c]
                removed = int(cov.sum())
            else:
                kept, removed = words, 0
            out_ids.append(int(ids_s[s]))
            out_txt.append(" ".join(kept))
            out_n.append(n)
            out_rm.append(removed)
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "clean_text": pa.array(out_txt, pa.string()),
                         "n_tokens": pa.array(out_n, pa.int64()),
                         "removed_tokens": pa.array(out_rm, pa.int64())})

    return partitionwise(dup_rows.union(docs), _cut, "doc_id", num_parts)


def substring_dup_spans_sa(sf_dir: str, min_len: int = 10,
                           batch_size: int = 1024,
                           override_num_blocks: int | None = None):
    """Zero-shuffle suffix-array lane: per Ray partition, build a real
    suffix array over the concatenated docs (kernels.suffix) and extract
    duplicated-run coverage locally.

    Detects duplicates within a partition only — per-doc dup_tokens is a
    SUBSET of ``substring_dup_spans`` (equal when candidate docs are
    co-partitioned, e.g. single partition or after content bucketing);
    self-repetition within a doc is always caught.  This is the Lee et al.
    single-machine model applied per shard: no shuffle, O(n log^2 n) per
    partition, the 100-TB shape when paired with a bucketing stage.
    """
    import ray.data as rd

    from ..kernels.suffix import duplicated_coverage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"],
                         override_num_blocks=override_num_blocks)

    def _cov(batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch["text"].to_pylist()]
        words, offsets = batch_shingle_hashes(texts, 1)
        covered = duplicated_coverage(words, offsets, min_len)
        sizes = (offsets[1:] - offsets[:-1]).astype(np.int64)
        n = len(sizes)
        dup_tok = np.bincount(
            np.repeat(np.arange(n), sizes), weights=covered,
            minlength=n).astype(np.int64) if len(covered) else \
            np.zeros(n, np.int64)
        return _span_output(np_col(batch, "doc_id").astype(np.int64),
                            sizes, dup_tok)

    return ds.map_batches(_cov, batch_format="pyarrow", batch_size=batch_size)
