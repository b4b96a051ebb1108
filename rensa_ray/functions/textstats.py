"""Text analysis functions: token counts, quality scores, language ID,
document fingerprints, content hashes.

These are the large-scale-training-pipeline operators layered on top of the
dedup engine.  All operate on batches (lists/arrays of documents) and return
numpy arrays / python lists ready for Arrow columns; no Ray imports.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..kernels.hashing import fxhash64_bytes_list

_NK = np.uint64(0xF1357AEA2E62A9C5)


def md5_hex(texts: list[str]) -> list[str]:
    """Lowercase hex md5 of each text's UTF-8 bytes (== DuckDB ``md5(text)``)."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def token_counts(texts: list[str], ngram_size: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """(n_tokens, n_shingles) per doc.  Tokens = ``text.split()``; shingle
    count follows the reference rule (short docs fall back to unigrams,
    benchmarks/full_benchmark.py:306-310)."""
    n_tokens = np.fromiter((len(t.split()) for t in texts), count=len(texts),
                           dtype=np.int64)
    if ngram_size <= 1:
        return n_tokens, n_tokens.copy()
    n_shingles = np.where(n_tokens >= ngram_size, n_tokens - (ngram_size - 1), n_tokens)
    return n_tokens, n_shingles


_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on",
           "with", "as", "was", "at", "by", "an", "be", "this", "are"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "eine",
           "mit", "von", "den", "im", "für", "auf", "des", "zu", "sich"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "dans",
           "que", "qui", "pour", "pas", "sur", "avec", "au", "ce"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "en",
           "que", "por", "con", "para", "no", "se", "del", "al"},
}


def quality_scores(texts: list[str]) -> dict[str, np.ndarray]:
    """Heuristic quality features per doc: word count, mean word length,
    English-stopword ratio, alphanumeric character ratio."""
    n = len(texts)
    word_count = np.zeros(n, np.int64)
    mean_word_len = np.zeros(n, np.float64)
    stop_ratio = np.zeros(n, np.float64)
    alnum_ratio = np.zeros(n, np.float64)
    en_stop = _STOPWORDS["en"]
    for i, t in enumerate(texts):
        words = t.lower().split()
        word_count[i] = len(words)
        if words:
            mean_word_len[i] = sum(len(w) for w in words) / len(words)
            stop_ratio[i] = sum(1 for w in words if w in en_stop) / len(words)
        if t:
            alnum_ratio[i] = sum(1 for c in t if c.isalnum()) / len(t)
    return {"word_count": word_count, "mean_word_len": mean_word_len,
            "stopword_ratio": stop_ratio, "alnum_ratio": alnum_ratio}


def lang_id(texts: list[str]) -> list[str]:
    """Tiny n-gram/stopword heuristic language ID over {en,de,fr,es,zh,unk}.

    CJK codepoint share decides "zh"; otherwise the language whose stopword
    profile matches most tokens wins (ties → "unk").  A deterministic,
    dependency-free stand-in for a real model; the Ray-side plumbing (batch
    shape, column contract) is the part that matters at scale.
    """
    out = []
    langs = list(_STOPWORDS)
    for t in texts:
        if not t.strip():
            out.append("unk")
            continue
        cjk = sum(1 for c in t if "一" <= c <= "鿿")
        if cjk / max(len(t), 1) > 0.1:
            out.append("zh")
            continue
        words = t.lower().split()
        scores = [(sum(1 for w in words if w in _STOPWORDS[lg]), lg) for lg in langs]
        best, lg = max(scores)
        second = sorted(s for s, _ in scores)[-2] if len(scores) > 1 else 0
        out.append(lg if best > 0 and best > second else "unk")
    return out


def doc_fingerprints(texts: list[str]) -> np.ndarray:
    """64-bit rolling polynomial fingerprint of the normalized word sequence.

    fp(doc) = fold over word hashes h_i of (fp * K + h_i) mod 2^64 — order
    sensitive (unlike MinHash), so it distinguishes permuted documents.
    Vectorized via precomputed K powers + segmented sums.
    """
    from ..kernels.shingle import batch_shingle_hashes

    hashes, offsets = batch_shingle_hashes(texts, ngram_size=1)  # word hashes
    n = len(texts)
    out = np.zeros(n, np.uint64)
    if len(hashes) == 0:
        return out
    sizes = offsets[1:] - offsets[:-1]
    max_len = int(sizes.max())
    kpow = np.empty(max_len, np.uint64)
    if max_len:
        kpow[0] = 1
        for j in range(1, max_len):
            kpow[j] = kpow[j - 1] * _NK
    # per token: h_i * K^(n_doc-1-i); segmented sum per doc
    doc_of = np.repeat(np.arange(n), sizes)
    local = np.arange(len(hashes)) - np.repeat(offsets[:-1], sizes)
    exp = (sizes[doc_of] - 1 - local).astype(np.int64)
    terms = hashes * kpow[exp]
    nonempty = np.flatnonzero(sizes > 0)
    if len(nonempty):
        out[nonempty] = np.add.reduceat(terms, offsets[:-1][nonempty])
    return out


def content_hash_u64(texts: list[str]) -> np.ndarray:
    """fxhash64 of the raw UTF-8 text — the exact-dedup key."""
    return fxhash64_bytes_list([t.encode("utf-8") for t in texts])


# GPT-2-style pre-tokenizer pattern: contractions, letter runs, digit runs,
# other-symbol runs, whitespace runs — a deterministic stand-in for a real
# BPE vocab (counts pre-merge word pieces).  Compiled once per process.
import re

_BPE_SPLIT = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+",
    re.UNICODE)


def bpe_token_counts(texts: list[str]) -> np.ndarray:
    """Per-doc count of GPT-2-style pre-tokens (BPE-ish regex split)."""
    pat = _BPE_SPLIT
    return np.fromiter((len(pat.findall(t)) for t in texts),
                       count=len(texts), dtype=np.int64)
