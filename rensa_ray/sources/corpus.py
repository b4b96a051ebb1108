"""Deterministic synthetic Common-Crawl-style web corpus (FIXTURES.md F1).

Schema matches BASELINE.json ``input_hint``:

    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

``html`` is a fixed deterministic wrapper around ``text`` and
``extract_text_from_html`` inverts it byte-identically (the per-row invariant:
extracted text per url == generated text).  A sidecar ground-truth table
records each doc's planted cluster root and its TRUE word-3-gram Jaccard to
the root, giving exact dup-pair recall measurement at any threshold.

Content plan (seed-deterministic, no external data):
  ~60% unique zipfian docs, ~20% exact duplicates, ~15% near-duplicate
  clusters (word edits targeting Jaccard bands around 0.8), ~5% adversarial
  (empty / tiny / boilerplate-prefix / exotic UTF-8).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HTML_PREFIX = b'<html><head><title>t</title></head><body><p>'
HTML_SUFFIX = b"</p></body></html>"

_EPOCH_2026 = np.datetime64("2026-01-01T00:00:00", "us")


def wrap_html(text: str) -> bytes:
    return HTML_PREFIX + text.encode("utf-8") + HTML_SUFFIX


def extract_text_from_html(html: bytes) -> str:
    """Inverse of ``wrap_html`` — byte-identical extraction."""
    if not (html.startswith(HTML_PREFIX) and html.endswith(HTML_SUFFIX)):
        raise ValueError("not a corpus-wrapped html payload")
    return html[len(HTML_PREFIX) : len(html) - len(HTML_SUFFIX)].decode("utf-8")


def _zipf_vocab(rng: np.random.Generator, size: int = 8000) -> np.ndarray:
    return np.array([f"w{i}" for i in range(size)])


def _shingles(words: list[str], n: int = 3) -> set[str]:
    if len(words) < n:
        return set(words)
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def generate_corpus(n_docs: int = 10_000, seed: int = 42,
                    snapshot_dup_frac: float = 0.0):
    """Returns (corpus: pa.Table, truth: pa.Table).

    truth columns: url, root_url, kind(unique|exact|near|adv|snapshot),
    true_jaccard_to_root (word-3-gram Jaccard vs the cluster root's text).

    ``snapshot_dup_frac`` > 0 additionally plants crawl re-captures: that
    fraction of base docs gains 1-3 EXTRA rows with the same text, a later
    ``warc_ts`` and the same url decorated with tracking params
    (utm_*/fbclid) — the rows ``keep_latest_snapshot`` must collapse to one
    per canonical url.  The default 0.0 leaves the corpus byte-identical
    to previous releases (every existing fixture/benchmark is pinned on it).
    """
    rng = np.random.default_rng(seed)
    vocab = _zipf_vocab(rng)
    nv = len(vocab)
    # zipfian word distribution
    ranks = np.arange(1, nv + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()

    n_unique = int(n_docs * 0.60)
    n_exact = int(n_docs * 0.20)
    # the adversarial floor (6) can exceed tiny corpora: clamp so the four
    # parts always sum to EXACTLY n_docs (a negative n_near was previously
    # ignored by the loop, silently over-producing documents)
    n_adv = max(0, min(max(int(n_docs * 0.05), 6),
                       n_docs - n_unique - n_exact))
    n_near = n_docs - n_unique - n_exact - n_adv

    texts: list[str] = []
    kinds: list[str] = []
    roots: list[int] = []
    jaccs: list[float] = []

    def _add(text: str, kind: str, root: int | None, jac: float):
        texts.append(text)
        kinds.append(kind)
        roots.append(len(texts) - 1 if root is None else root)
        jaccs.append(jac)

    # unique base docs
    for _ in range(n_unique):
        n_words = int(rng.integers(30, 400))
        words = vocab[rng.choice(nv, size=n_words, p=probs)]
        _add(" ".join(words), "unique", None, 1.0)

    # exact duplicates of earlier unique docs
    for _ in range(n_exact):
        src = int(rng.integers(0, n_unique))
        _add(texts[src], "exact", src, 1.0)

    # near duplicates: clusters of 2-8 edits of a base doc
    jband = [0.95, 0.9, 0.85, 0.8, 0.7, 0.5]
    added = 0
    while added < n_near:
        src = int(rng.integers(0, n_unique))
        base_words = texts[src].split()
        base_sh = _shingles(base_words)
        csize = int(rng.integers(1, 8))
        for _ in range(min(csize, n_near - added)):
            target = jband[int(rng.integers(0, len(jband)))]
            # each edited word kills ~ngram shingles: edits ≈ |S|(1-j)/(1+j)/n
            k = max(1, int(round(len(base_sh) * (1 - target) / (1 + target) / 3)))
            words = list(base_words)
            for _ in range(k):
                op = int(rng.integers(0, 3))
                pos = int(rng.integers(0, max(len(words), 1)))
                w = str(vocab[int(rng.choice(nv, p=probs))])
                if op == 0 and len(words) > 4:
                    del words[min(pos, len(words) - 1)]
                elif op == 1:
                    words.insert(pos, w)
                elif words:
                    words[min(pos, len(words) - 1)] = w
            text = " ".join(words)
            jac = _jaccard(base_sh, _shingles(words))
            _add(text, "near", src, jac)
            added += 1

    # adversarial
    adv_samples = ["", "   ", "one", "one two",
                   "common boilerplate prefix " * 4 + "tail",
                   "ünïcödé tökens   mixed 　 whitespace"]
    for i in range(n_adv):
        if i < len(adv_samples):
            _add(adv_samples[i], "adv", None, 1.0)
        else:
            n_words = int(rng.integers(1, 4))
            words = vocab[rng.choice(nv, size=n_words, p=probs)]
            _add(" ".join(words), "adv", None, 1.0)

    n = len(texts)
    # deterministic shuffle so duplicates aren't adjacent on disk
    perm = rng.permutation(n)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)

    urls = np.array([f"https://example-{inv[i]:08d}.test/p/{kinds[i][0]}" for i in range(n)])
    lang_pool = np.array(["en"] * 17 + ["de", "fr", "es"])
    langs = lang_pool[rng.integers(0, len(lang_pool), size=n)]
    ts = _EPOCH_2026 + (inv * np.timedelta64(1, "s")).astype("timedelta64[us]")

    order = np.argsort(inv, kind="stable")  # rows ordered by shuffled position
    corpus = pa.table({
        "url": pa.array(urls[order]),
        "warc_ts": pa.array(ts[order]),
        "html": pa.array([wrap_html(texts[i]) for i in order], pa.binary()),
        "text": pa.array([texts[i] for i in order]),
        "lang": pa.array(langs[order]),
    })
    truth = pa.table({
        "url": pa.array(urls[order]),
        "root_url": pa.array([urls[roots[i]] for i in order]),
        "kind": pa.array([kinds[i] for i in order]),
        "true_jaccard_to_root": pa.array([jaccs[i] for i in order], pa.float64()),
    })
    if snapshot_dup_frac > 0:
        corpus, truth = _plant_snapshot_recaptures(
            corpus, truth, snapshot_dup_frac, seed)
    return corpus, truth


def _plant_snapshot_recaptures(corpus: pa.Table, truth: pa.Table,
                               frac: float, seed: int) -> tuple[pa.Table, pa.Table]:
    """Append 1-3 re-capture rows for ``frac`` of the corpus: same text,
    strictly later warc_ts, url decorated with tracking query params that
    ``canonicalize_url`` strips — so the canonical-url group's LATEST
    capture is always a planted row, never the base row.  Deterministic in
    ``seed``; rows are shuffled back in so re-captures aren't disk-adjacent.
    """
    rng = np.random.default_rng(seed + 991)
    n = corpus.num_rows
    k = int(n * frac)
    if k == 0:
        return corpus, truth
    base_rows = rng.choice(n, size=k, replace=False)
    urls = corpus["url"].to_pylist()
    ts = corpus["warc_ts"].to_numpy(zero_copy_only=False)
    texts = corpus["text"].to_pylist()
    htmls = corpus["html"].to_pylist()
    langs = corpus["lang"].to_pylist()
    n_extra = rng.integers(1, 4, size=k)
    r_url, r_ts, r_text, r_html, r_lang, r_root = [], [], [], [], [], []
    for row, ne in zip(base_rows, n_extra):
        row = int(row)
        for cap in range(int(ne)):
            # each decoration canonicalizes back to the base url
            r_url.append(f"{urls[row]}?utm_source=feed&fbclid=c{cap}x{row}")
            r_ts.append(ts[row] + np.timedelta64((cap + 1) * 3600, "s"))
            r_text.append(texts[row])
            r_html.append(htmls[row])
            r_lang.append(langs[row])
            r_root.append(urls[row])
    extra = pa.table({
        "url": pa.array(r_url, pa.string()),
        "warc_ts": pa.array(np.array(r_ts, dtype="datetime64[us]"),
                            pa.timestamp("us")),
        "html": pa.array(r_html, pa.binary()),
        "text": pa.array(r_text, pa.string()),
        "lang": pa.array(r_lang, pa.string()),
    })
    extra_truth = pa.table({
        "url": extra["url"],
        "root_url": pa.array(r_root, pa.string()),
        "kind": pa.array(["snapshot"] * len(r_url), pa.string()),
        "true_jaccard_to_root": pa.array([1.0] * len(r_url), pa.float64()),
    })
    corpus = pa.concat_tables([corpus, extra])
    truth = pa.concat_tables([truth, extra_truth])
    perm = pa.array(rng.permutation(corpus.num_rows))
    return corpus.take(perm), truth.take(perm)


def write_corpus(out_dir: str, n_docs: int = 10_000, seed: int = 42,
                 n_shards: int = 8,
                 snapshot_dup_frac: float = 0.0) -> tuple[str, str]:
    """Write a sharded corpus + truth sidecar; returns (corpus_dir, truth_path).

    Sharded layout (one file per shard) is what makes downstream runs
    resumable / partition-parallel.
    """
    import os

    import pyarrow.parquet as pq

    corpus, truth = generate_corpus(n_docs, seed,
                                    snapshot_dup_frac=snapshot_dup_frac)
    cdir = os.path.join(out_dir, "corpus")
    os.makedirs(cdir, exist_ok=True)
    n = corpus.num_rows
    per = (n + n_shards - 1) // n_shards
    for s in range(n_shards):
        shard = corpus.slice(s * per, per)
        if shard.num_rows:
            pq.write_table(shard, os.path.join(cdir, f"part-{s:05d}.parquet"))
    tpath = os.path.join(out_dir, "truth.parquet")
    pq.write_table(truth, tpath)
    return cdir, tpath


def _gen_shard(args) -> str:
    out_dir, shard, n_docs, seed = args
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    corpus, truth = generate_corpus(n_docs, seed=seed + 7919 * shard)
    # shard-unique urls (the generator indexes from 0 in every shard)
    prefix = f"https://s{shard:04d}-"
    fix = lambda col: pc.replace_substring(col, "https://", prefix)
    corpus = corpus.set_column(0, "url", fix(corpus["url"]))
    truth = truth.set_column(0, "url", fix(truth["url"]))
    truth = truth.set_column(1, "root_url", fix(truth["root_url"]))
    cpath = os.path.join(out_dir, "corpus", f"part-{shard:05d}.parquet")
    tpath = os.path.join(out_dir, "truth", f"part-{shard:05d}.parquet")
    pq.write_table(corpus, cpath)
    pq.write_table(truth, tpath)
    return cpath


def write_corpus_parallel(out_dir: str, n_docs: int = 1_000_000, seed: int = 42,
                          n_shards: int = 64, n_procs: int = 16
                          ) -> tuple[str, str]:
    """Sharded parallel corpus generation for large benchmark inputs.

    Each shard is generated independently from ``seed + 7919·shard`` —
    deterministic, but duplicate clusters only span WITHIN a shard (the
    aggregate dup-rate mix matches ``generate_corpus``).  Urls are suffixed
    with the shard id so they stay globally unique.  ~n_procs× faster than
    the monolithic generator; use for throughput/scaling corpora, use
    ``write_corpus`` when cross-shard duplicate structure matters.
    """
    import multiprocessing as mp
    import os

    os.makedirs(os.path.join(out_dir, "corpus"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "truth"), exist_ok=True)
    per = (n_docs + n_shards - 1) // n_shards
    jobs = [(out_dir, s, per, seed) for s in range(n_shards)]
    with mp.get_context("spawn").Pool(n_procs) as pool:
        pool.map(_gen_shard, jobs)
    return os.path.join(out_dir, "corpus"), os.path.join(out_dir, "truth")
