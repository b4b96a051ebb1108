"""Tokenization / word-shingling kernels.

Canonical semantics (reference benchmarks/full_benchmark.py:306-310):

    tokens = [t for t in text.lower().split() if t]
    if ngram_size <= 1 or len(tokens) < ngram_size: shingles = tokens
    else: shingles = [" ".join(tokens[i:i+ngram_size]) for i in ...]

The vectorized batch path exploits the fact that after whitespace
normalization (``" ".join(text.lower().split())``) every shingle's UTF-8
bytes are a contiguous substring of the normalized document: we build ONE
flat byte buffer for the whole batch, find word boundaries with a single
numpy scan for the space byte 0x20 (UTF-8 multi-byte sequences never contain
it), and hand (start, length) slices to the vectorized fxhash64.  Python-level
work is one ``str.lower().split()`` + join per document (C-speed); everything
per-token is numpy.
"""

from __future__ import annotations

import numpy as np

from .hashing import fxhash64, fxhash64_flat


def tokenize_to_ngrams(text: str, ngram_size: int = 3) -> list[str]:
    """Scalar reference shingler (benchmarks/full_benchmark.py:306-310)."""
    tokens = [t for t in text.lower().split() if t]
    if ngram_size <= 1 or len(tokens) < ngram_size:
        return tokens
    return [" ".join(tokens[i : i + ngram_size]) for i in range(len(tokens) - ngram_size + 1)]


def shingle_hashes_scalar(text: str, ngram_size: int = 3) -> list[int]:
    """Scalar path: fxhash64 of each shingle's UTF-8 bytes (parity ground truth)."""
    return [fxhash64(s.encode("utf-8")) for s in tokenize_to_ngrams(text, ngram_size)]


def batch_shingle_hashes(texts, ngram_size: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized batch shingler → CSR (token_hashes uint64, offsets int64).

    ``offsets`` has length ``len(texts) + 1``; document i's shingle hashes are
    ``token_hashes[offsets[i]:offsets[i+1]]``.  Bit-identical to
    ``shingle_hashes_scalar`` per document (order included).
    """
    n = len(texts)
    offsets = np.zeros(n + 1, dtype=np.int64)
    if n == 0:
        return np.empty(0, dtype=np.uint64), offsets

    norm = [" ".join(t.lower().split()).encode("utf-8") for t in texts]
    doc_lens = np.fromiter((len(b) for b in norm), count=n, dtype=np.int64)
    doc_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(doc_lens, out=doc_starts[1:])
    flat = np.frombuffer(b"".join(norm), dtype=np.uint8)

    # Word boundaries: spaces are exactly the single separators inside each doc.
    spaces = np.flatnonzero(flat == 0x20)
    space_doc = np.searchsorted(doc_starts, spaces, side="right") - 1
    spaces_per_doc = np.bincount(space_doc, minlength=n) if len(spaces) else np.zeros(n, np.int64)
    n_words = np.where(doc_lens > 0, spaces_per_doc + 1, 0).astype(np.int64)

    nonempty = doc_lens > 0
    # Sorted merge of word starts (doc start + char-after-space) and word ends.
    word_starts = np.sort(np.concatenate([doc_starts[:-1][nonempty], spaces + 1]))
    word_ends = np.sort(np.concatenate([spaces, doc_starts[1:][nonempty]]))
    # word_offsets[i] = index of doc i's first word in word_starts
    word_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_words, out=word_offsets[1:])

    if ngram_size <= 1:
        n_shingles = n_words
    else:
        n_shingles = np.where(n_words >= ngram_size, n_words - (ngram_size - 1), n_words)
    np.cumsum(n_shingles, out=offsets[1:])
    total = int(offsets[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), offsets

    # Ragged ranges: for each doc d, shingle j (j in 0..n_shingles[d]) maps to
    # word index word_offsets[d] + j; its span ends at word j + span_d - 1
    # where span_d = ngram_size for full n-grams else 1 (unigram fallback).
    doc_of_shingle = np.repeat(np.arange(n, dtype=np.int64), n_shingles)
    # local shingle index j within each doc
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_shingles)
    w = word_offsets[doc_of_shingle] + j
    if ngram_size <= 1:
        span = np.ones(total, dtype=np.int64)
    else:
        span = np.where(n_words[doc_of_shingle] >= ngram_size, ngram_size, 1)
    s = word_starts[w]
    e = word_ends[w + span - 1]
    return fxhash64_flat(flat, s, e - s), offsets
