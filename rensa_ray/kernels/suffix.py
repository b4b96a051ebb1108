"""Suffix-array kernel for substring-level dedup (the Lee et al. lane).

The north-star names "suffix-array substring" dedup alongside MinHash and
SimHash (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better" — their ExactSubstr dedup marks every token position covered
by a duplicated run of >= min_len tokens).  This module is the in-memory
kernel: a fully vectorized prefix-doubling suffix array (O(n log^2 n),
numpy lexsort per round), adjacent-suffix LCPs recovered from the saved
rank tables (O(n log n), no Kasai-style sequential loop), and the
duplicated-coverage extraction over a document batch.

Documents are concatenated with UNIQUE separator symbols (one fresh symbol
per boundary), so no common prefix can span documents and separators never
match anything — LCP intervals are separator-free by construction.

Scale shape: the kernel runs per Ray partition/batch (zero shuffle — the
pipelines.substring SA lane), or the same coverage semantics run globally
through a window-fingerprint multiplicity shuffle (the exact lane); the
kernel is also what a bucketed-SA formulation would call per bucket.
"""

from __future__ import annotations

import numpy as np


def suffix_array_with_levels(t: np.ndarray):
    """Suffix array of integer sequence ``t`` via prefix doubling.

    Returns (sa, levels): ``sa[k]`` = start of the k-th smallest suffix;
    ``levels`` = [(plen, rank_array), ...] where ``rank_array[i]`` is the
    rank of the length-``plen`` prefix of the suffix starting at ``i``
    (exactly the doubling snapshots, kept for the LCP computation).
    """
    t = np.asarray(t)
    n = len(t)
    if n == 0:
        return np.empty(0, np.int64), []
    order = np.argsort(t, kind="stable")
    rank = np.empty(n, np.int64)
    ts = t[order]
    boundary = np.empty(n, np.int64)
    boundary[0] = 0
    boundary[1:] = (ts[1:] != ts[:-1]).astype(np.int64)
    rank[order] = np.cumsum(boundary)
    levels = [(1, rank)]
    k = 1
    while k < n and rank[order[-1]] != n - 1:
        key2 = np.full(n, -1, np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r_s, k_s = rank[order], key2[order]
        boundary[0] = 0
        boundary[1:] = ((r_s[1:] != r_s[:-1]) | (k_s[1:] != k_s[:-1])).astype(np.int64)
        new = np.empty(n, np.int64)
        new[order] = np.cumsum(boundary)
        rank = new
        k <<= 1
        levels.append((k, rank))
    return order, levels


def suffix_array(t: np.ndarray) -> np.ndarray:
    return suffix_array_with_levels(t)[0]


def lcp_adjacent(sa: np.ndarray, levels) -> np.ndarray:
    """LCP of each adjacent suffix pair in ``sa`` from the rank snapshots.

    Greedy binary descent, vectorized over ALL pairs at once: at prefix
    length ``plen`` (descending powers of two), pairs whose current suffix
    remainders share a length-``plen`` prefix advance both cursors by
    ``plen`` and accumulate it.  O(n log n) total, no per-position loop.
    """
    m = len(sa) - 1
    if m <= 0:
        return np.empty(0, np.int64)
    n = len(levels[0][1])
    i = sa[:-1].copy()
    j = sa[1:].copy()
    lcp = np.zeros(m, np.int64)
    for plen, rank in reversed(levels):
        live = (i < n) & (j < n)
        eq = np.zeros(m, bool)
        eq[live] = rank[i[live]] == rank[j[live]]
        lcp[eq] += plen
        i[eq] += plen
        j[eq] += plen
    return lcp


def duplicated_coverage(word_hashes: np.ndarray, offsets: np.ndarray,
                        min_len: int) -> np.ndarray:
    """Boolean mask over the CSR token stream: position covered by a run of
    >= ``min_len`` tokens that occurs >= 2 times in the batch (any doc,
    including elsewhere in the same doc — the ExactSubstr rule).

    Suffix-array formulation: concatenate docs with unique separators,
    build SA + adjacent LCPs, and for every adjacent pair with
    ``lcp >= min_len`` mark ``[sa[t], sa[t]+lcp)`` and ``[sa[t+1],
    sa[t+1]+lcp)``.  Any repeated substring of length L >= min_len at
    positions p, q makes every adjacent SA pair between their suffixes
    share an LCP >= L, so the union of adjacent-pair intervals equals the
    union over ALL repeated runs — no pair enumeration needed.
    """
    word_hashes = np.asarray(word_hashes, np.uint64)
    offsets = np.asarray(offsets, np.int64)
    total = len(word_hashes)
    n_docs = len(offsets) - 1
    covered = np.zeros(total, bool)
    if total == 0 or min_len <= 0:
        return covered
    # remap hashes to compact ids so unique separator symbols can follow
    _, compact = np.unique(word_hashes, return_inverse=True)
    n_sym = int(compact.max()) + 1 if total else 0
    sizes = offsets[1:] - offsets[:-1]
    # interleave: doc0 tokens, sep0, doc1 tokens, sep1, ...
    m = total + n_docs
    seq = np.empty(m, np.int64)
    sep_pos = offsets[1:] + np.arange(n_docs)          # separator slots
    tok_pos = np.arange(total) + np.repeat(np.arange(n_docs), sizes)
    seq[tok_pos] = compact
    seq[sep_pos] = n_sym + np.arange(n_docs)           # unique, never equal
    sa, levels = suffix_array_with_levels(seq)
    lcp = lcp_adjacent(sa, levels)
    hit = lcp >= min_len
    if hit.any():
        starts = np.concatenate([sa[:-1][hit], sa[1:][hit]])
        lens = np.concatenate([lcp[hit], lcp[hit]])
        diff = np.zeros(m + 1, np.int64)
        np.add.at(diff, starts, 1)
        np.add.at(diff, starts + lens, -1)
        cov_seq = np.cumsum(diff[:-1]) > 0
        covered = cov_seq[tok_pos]
    return covered
