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
from ..kernels.shingle import batch_shingle_hashes

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


_LANGS = tuple(_STOPWORDS)  # ("en", "de", "fr", "es")


def _stop_hashes():
    """fxhash64 of each stopword (lazy; sorted for searchsorted membership)."""
    global _STOP_HASHES
    try:
        return _STOP_HASHES
    except NameError:
        _STOP_HASHES = {
            lg: np.sort(fxhash64_bytes_list([w.encode("utf-8") for w in ws]))
            for lg, ws in _STOPWORDS.items()}
        return _STOP_HASHES


def _codepoints(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated texts → (uint32 codepoint array, per-doc int64 offsets)."""
    from ..kernels.hashing import tune_allocator

    tune_allocator()  # this sandbox page-faults fresh mmaps at ~20 MB/s
    joined = "".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = np.fromiter((len(t) for t in texts), count=len(texts), dtype=np.int64)
    offsets = np.zeros(len(texts) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    return cp, offsets


_ASCII_ALNUM = np.fromiter((chr(c).isalnum() for c in range(128)), count=128,
                           dtype=bool)
_ASCII_SPACE = np.fromiter((chr(c).isspace() for c in range(128)), count=128,
                           dtype=bool)


def _char_class_masks(cp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(is_alnum, is_space) per codepoint: ASCII via a 128-entry table,
    non-ASCII via one Python ``str`` check per UNIQUE codepoint (web text is
    overwhelmingly ASCII, so the fallback touches a handful of values)."""
    is_ascii = cp < 128
    cpa = np.where(is_ascii, cp, 0)
    alnum = _ASCII_ALNUM[cpa] & is_ascii
    space = _ASCII_SPACE[cpa] & is_ascii
    rest = cp[~is_ascii]
    if len(rest):
        u = np.unique(rest)
        ua = np.fromiter((chr(c).isalnum() for c in u), count=len(u), dtype=bool)
        us = np.fromiter((chr(c).isspace() for c in u), count=len(u), dtype=bool)
        idx = np.searchsorted(u, rest)
        alnum[~is_ascii] = ua[idx]
        space[~is_ascii] = us[idx]
    return alnum, space


def _segsum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-segment sums via prefix sums (empty segments → 0)."""
    cs = np.zeros(len(values) + 1, np.int64)
    np.cumsum(values, out=cs[1:])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def quality_scores(texts: list[str]) -> dict[str, np.ndarray]:
    """Heuristic quality features per doc: word count, mean word length,
    English-stopword ratio, alphanumeric character ratio.

    Fully vectorized: character classes over a flat codepoint buffer,
    stopword membership over the vectorized word-hash kernel (the shingler
    lowercases, so ``ngram_size=1`` hashes are lowered-word fxhash64s).
    ``mean_word_len = nonspace_chars / word_count`` — identical to averaging
    ``len(w)`` over ``text.split()``, which partitions the non-whitespace
    characters exactly.
    """
    n = len(texts)
    cp, offs = _codepoints(texts)
    alnum, space = _char_class_masks(cp)
    sizes = offs[1:] - offs[:-1]

    hashes, hoffs = batch_shingle_hashes(texts, 1)
    word_count = hoffs[1:] - hoffs[:-1]
    nonspace_cnt = _segsum(~space, offs)
    alnum_cnt = _segsum(alnum, offs)
    stop_cnt = _segsum(np.isin(hashes, _stop_hashes()["en"]), hoffs)

    zf = np.zeros(n, np.float64)
    has_w = word_count > 0
    mean_word_len = np.divide(nonspace_cnt, word_count, out=zf.copy(), where=has_w)
    stop_ratio = np.divide(stop_cnt, word_count, out=zf.copy(), where=has_w)
    alnum_ratio = np.divide(alnum_cnt, sizes, out=zf.copy(), where=sizes > 0)
    return {"word_count": word_count.astype(np.int64),
            "mean_word_len": mean_word_len,
            "stopword_ratio": stop_ratio, "alnum_ratio": alnum_ratio}


def lang_id(texts: list[str]) -> list[str]:
    """Tiny stopword-profile heuristic language ID over {en,de,fr,es,zh,unk}.

    CJK codepoint share decides "zh"; otherwise the language with strictly
    the most stopword matches wins (ties / zero matches → "unk").  A
    deterministic, dependency-free stand-in for a real model; vectorized
    over the batch (membership via word hashes, CJK via codepoint ranges).
    """
    n = len(texts)
    if n == 0:
        return []
    cp, offs = _codepoints(texts)
    sizes = offs[1:] - offs[:-1]
    cjk_cnt = _segsum((cp >= 0x4E00) & (cp <= 0x9FFF), offs)
    is_zh = cjk_cnt > 0.1 * np.maximum(sizes, 1)

    hashes, hoffs = batch_shingle_hashes(texts, 1)
    word_count = hoffs[1:] - hoffs[:-1]
    sh = _stop_hashes()
    scores = np.stack([_segsum(np.isin(hashes, sh[lg]), hoffs) for lg in _LANGS])
    top2 = np.sort(scores, axis=0)[-2:]
    second, best = top2[0], top2[1]
    best_idx = np.argmax(scores, axis=0)
    lang_arr = np.array(_LANGS)
    out = np.where((best > 0) & (best > second), lang_arr[best_idx], "unk")
    out = np.where(is_zh, "zh", out)
    out = np.where(word_count == 0, "unk", out)  # empty/whitespace-only
    return out.tolist()


# Rolling-fingerprint constants: multipliers < 2^20 keep every fold step's
# product < 2^52, so BOTH numpy uint64 math and DuckDB BIGINT math compute
# them exactly — the fingerprint is SQL-oracle-checkable (see __ray_entry__).
_FP_P1, _FP_P2 = np.uint64(1000003), np.uint64(131)      # char-level mults
_FP_K1, _FP_K2 = np.uint64(1000033), np.uint64(137)      # word-level mults
_FP_M32 = np.uint64(0xFFFFFFFF)


def _rolling32(values: np.ndarray, offsets: np.ndarray, mult: np.uint64
               ) -> np.ndarray:
    """Per-segment polynomial fold ``h = (h*mult + v) mod 2^32``, vectorized
    as ``sum v_i * mult^(L-1-i) mod 2^32`` via precomputed powers + reduceat.
    Terms are masked to 32 bits before the segment sum, so sums stay exact
    in uint64 for segments up to 2^32 elements."""
    n = len(offsets) - 1
    out = np.zeros(n, np.uint64)
    total = len(values)
    if total == 0:
        return out
    sizes = offsets[1:] - offsets[:-1]
    max_len = int(sizes.max())
    mpow = np.empty(max_len, np.uint64)
    if max_len:
        mpow[0] = 1
        for j in range(1, max_len):
            mpow[j] = (mpow[j - 1] * mult) & _FP_M32
    doc_of = np.repeat(np.arange(n), sizes)
    local = np.arange(total) - np.repeat(offsets[:-1], sizes)
    exp = (sizes[doc_of] - 1 - local).astype(np.int64)
    terms = (np.asarray(values, np.uint64) * mpow[exp]) & _FP_M32
    nonempty = np.flatnonzero(sizes > 0)
    if len(nonempty):
        out[nonempty] = np.add.reduceat(terms, offsets[:-1][nonempty]) & _FP_M32
    return out


def doc_fingerprints(texts: list[str]) -> np.ndarray:
    """Order-sensitive 64-bit rolling fingerprint of the word sequence.

    Two independent 32-bit polynomial folds packed as ``(fp1 << 32) | fp2``:
    per word ``h = fold over codepoints of (h*P + cp) mod 2^32``, per doc
    ``fp = fold over word hashes of (fp*K + h) mod 2^32``.  Order sensitive
    (unlike MinHash), so it distinguishes permuted documents; empty doc → 0.
    Constants < 2^20 make the identical computation exact in DuckDB BIGINT,
    so the operator is oracle-checked end-to-end.
    """
    n = len(texts)
    cp, offs = _codepoints(texts)
    out = np.zeros(n, np.uint64)
    if len(cp) == 0:
        return out
    _, space = _char_class_masks(cp)
    nonspace = ~space
    # word segmentation over the concatenated buffer (reset at doc starts)
    prev_is_space = np.empty(len(cp), bool)
    prev_is_space[0] = True
    prev_is_space[1:] = space[:-1]
    sizes_c = offs[1:] - offs[:-1]
    prev_is_space[offs[:-1][sizes_c > 0]] = True
    wstart = nonspace & prev_is_space
    widx = np.flatnonzero(nonspace)
    if len(widx) == 0:
        return out
    word_id = np.cumsum(wstart)[widx] - 1          # 0-based word index
    n_words = int(word_id[-1]) + 1
    w_offsets = np.zeros(n_words + 1, np.int64)
    np.add.at(w_offsets, word_id + 1, 1)
    np.cumsum(w_offsets, out=w_offsets)
    cpw = cp[widx].astype(np.uint64)
    h1 = _rolling32(cpw, w_offsets, _FP_P1)
    h2 = _rolling32(cpw, w_offsets, _FP_P2)
    # per-doc CSR over word hashes
    wc = _segsum(wstart, offs)
    d_offsets = np.zeros(n + 1, np.int64)
    np.cumsum(wc, out=d_offsets[1:])
    fp1 = _rolling32(h1, d_offsets, _FP_K1)
    fp2 = _rolling32(h2, d_offsets, _FP_K2)
    return (fp1 << np.uint64(32)) | fp2


def content_hash_u64(texts: list[str]) -> np.ndarray:
    """fxhash64 of the raw UTF-8 text — the exact-dedup key."""
    return fxhash64_bytes_list([t.encode("utf-8") for t in texts])


# GPT-2-style pre-tokenizer pattern: contractions, letter runs, digit runs,
# other-symbol runs, whitespace runs — a deterministic stand-in for a real
# BPE vocab (counts pre-merge word pieces).  Compiled once per process.
# RE2-compatible on purpose (no lookahead, ASCII classes) so the identical
# pattern runs in DuckDB regexp_extract_all as the SQL oracle.
import re

BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
_BPE_SPLIT = re.compile(BPE_PATTERN)


def bpe_token_counts(texts: list[str]) -> np.ndarray:
    """Per-doc count of GPT-2-style pre-tokens (BPE-ish regex split)."""
    pat = _BPE_SPLIT
    return np.fromiter((len(pat.findall(t)) for t in texts),
                       count=len(texts), dtype=np.int64)


def repetition_stats(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Gopher-style repetition features, vectorized over the batch.

    Returns (dup_word_frac, top_bigram_frac) float64 arrays:
    ``1 - distinct_words/words`` (0.0 for empty docs) and ``count of the most
    frequent word bigram / total bigrams`` (0.0 when < 2 words).  One lexsort
    over the batch's flattened word array (and one over the bigram pairs)
    replaces any per-doc Python; bigrams compare as (w[i], w[i+1]) pairs,
    exact because words cannot contain the separator.
    """
    n = len(texts)
    words_per = [t.lower().split() for t in texts]
    n_words = np.fromiter((len(w) for w in words_per), np.int64, n)
    flat = [w for ws in words_per for w in ws]
    dup_word_frac = np.zeros(n, np.float64)
    top_bigram_frac = np.zeros(n, np.float64)
    if flat:
        arr = np.array(flat)
        gid = np.repeat(np.arange(n, dtype=np.int64), n_words)
        order = np.lexsort((arr, gid))
        gs, ws = gid[order], arr[order]
        newrun = np.ones(len(gs), bool)
        newrun[1:] = (gs[1:] != gs[:-1]) | (ws[1:] != ws[:-1])
        nd = np.bincount(gs[newrun], minlength=n)
        nz = n_words > 0
        dup_word_frac[nz] = 1.0 - nd[nz].astype(np.float64) / n_words[nz]
        if len(arr) > 1:
            valid = gid[:-1] == gid[1:]
            if valid.any():
                bg_a, bg_b = arr[:-1][valid], arr[1:][valid]
                bgid = gid[:-1][valid]
                o2 = np.lexsort((bg_b, bg_a, bgid))
                g2, a2, b2 = bgid[o2], bg_a[o2], bg_b[o2]
                nr = np.ones(len(g2), bool)
                nr[1:] = ((g2[1:] != g2[:-1]) | (a2[1:] != a2[:-1])
                          | (b2[1:] != b2[:-1]))
                rid = np.cumsum(nr) - 1
                run_counts = np.bincount(rid)
                run_doc = g2[nr]
                mx = np.zeros(n, np.int64)
                np.maximum.at(mx, run_doc, run_counts)
                has = mx > 0
                top_bigram_frac[has] = (mx[has].astype(np.float64)
                                        / (n_words[has] - 1))
    return dup_word_frac, top_bigram_frac
