"""Text/table operators over the driver testdata schema.

Each function takes ``sf_dir`` and returns a Ray Dataset / pyarrow Table whose
column names exactly match the paired SQL in ``__ray_entry__.oracle_sql()``.
Wide operations use the partition-wise idiom (pipelines.common) with pyarrow
``group_by`` (C++) inside each partition; small-cardinality aggregations use
Ray's builtin groupby aggregates.

Whitespace convention: token/shingle lanes split on UNICODE whitespace
(python ``str.split()`` / Arrow ``utf8_split_whitespace``), matching the
reference's Rust ``split_whitespace`` — the byte-parity requirement.  The
paired SQL oracles use RE2's ASCII-only ``'\\s+'``; the two agree on the
ASCII-whitespace testdata domain, and NBSP-class divergence is confined to
lanes where it cannot change dedup decisions.  The one lane where the
whitespace set DOES decide drops — ``normalized_exact_dedup_kept`` — uses
``normalize_ws`` (ASCII, RE2-exact) instead, pinned byte-exact to its
oracle on NBSP input.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textstats import md5_hex, token_counts
from ..kernels.hashing import fxhash64_bytes_list
from .common import np_col, partitionwise

DEFAULT_PARTS = 16


def _docs(sf_dir: str, columns: list[str]):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _events(sf_dir: str, columns: list[str]):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


# RE2's '\s' (DuckDB regexp_replace) is ASCII-only — [\t\n\v\f\r ] — while
# python's str.split() also splits on unicode whitespace (NBSP, ideographic
# space, …), which would silently disagree with every paired
# `regexp_replace(..., '\s+', ' ', 'g')` oracle on real crawl text.  One
# definition with RE2 semantics, shared by every normalization lane.
_ASCII_WS_RE = re.compile(r"[\t\n\x0b\x0c\r ]+")


def normalize_ws(text: str | None) -> str:
    """Canonical normalization: lowercase + ASCII-whitespace collapse
    (None→"").  Byte-equal to DuckDB's
    ``trim(regexp_replace(lower(coalesce(text,'')), '\\s+', ' ', 'g'))``."""
    return _ASCII_WS_RE.sub(" ", ("" if text is None else text).lower()).strip(" ")


def _content_key(batch: pa.Table, carry: tuple[str, ...],
                 texts: list[str] | None = None) -> pa.Table:
    """(carried cols…, text_md5, __key=fxhash64(md5 hex)) — THE content key
    every exact-dup / per-source op shuffles on.  One definition so the key
    scheme (None→"" null convention, md5-hex encoding) can never silently
    diverge between lanes.  Pass ``texts`` to key on a derived form (e.g.
    normalized text) under the same scheme."""
    if texts is None:
        texts = ["" if t is None else t for t in batch["text"].to_pylist()]
    md5s = md5_hex(texts)
    key = fxhash64_bytes_list([m.encode() for m in md5s])
    cols: dict = {c: batch[c] for c in carry}
    cols["text_md5"] = pa.array(md5s, pa.string())
    cols["__key"] = pa.array(key, pa.uint64())
    return pa.table(cols)


def _with_md5(batch: pa.Table) -> pa.Table:
    return _content_key(batch, ("doc_id",))


def exact_dup_groups(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Exact-duplicate text groups (size >= 2): text_md5, keep_id, group_size."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(_with_md5, batch_format="pyarrow")

    def _groups(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g, "text_md5").aggregate(
            [("doc_id", "min"), ("doc_id", "count")])
        agg = agg.rename_columns(["text_md5", "keep_id", "group_size"])
        return agg.filter(pc.greater_equal(agg["group_size"], 2))

    out = partitionwise(ds, _groups, "__key", num_parts)
    return out.map_batches(
        lambda b: pa.table({"text_md5": b["text_md5"], "keep_id": b["keep_id"],
                            "group_size": b["group_size"].cast(pa.int64())}),
        batch_format="pyarrow")


def _kept_min_by_md5(g: pa.Table) -> pa.Table:
    """Keep-first election shared by the exact-dedup kept lanes: min doc_id
    per distinct content key."""
    agg = pa.TableGroupBy(g, "text_md5").aggregate([("doc_id", "min")])
    return pa.table({"doc_id": agg["doc_id_min"]})


def exact_dedup_kept(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """One kept doc (min doc_id) per distinct text: doc_id."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(_with_md5, batch_format="pyarrow")

    return partitionwise(ds, _kept_min_by_md5, "__key", num_parts)


def exact_dup_pairs(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """All pairs (id_a < id_b) sharing identical text."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(_with_md5, batch_format="pyarrow")

    def _pairs(g: pa.Table) -> pa.Table:
        from .common import pairs_within_runs, run_ids

        key = np_col(g, "__key").astype(np.uint64)
        ids = np_col(g, "doc_id")
        md5s = g["text_md5"].to_numpy(zero_copy_only=False)
        order, gid, counts = run_ids(key, ids.astype(np.uint64), n_group_keys=1)
        ids_s = ids[order]
        # fixed-width U32 view makes the collision re-check a C-speed compare
        md5_s = md5s[order].astype("U32")
        i_idx, j_idx = pairs_within_runs(counts)
        if len(i_idx):
            # fxhash64 partition key may (rarely) collide: re-check md5
            ok = md5_s[i_idx] == md5_s[j_idx]
            i_idx, j_idx = i_idx[ok], j_idx[ok]
        return pa.table({"id_a": pa.array(ids_s[i_idx], pa.int64()),
                         "id_b": pa.array(ids_s[j_idx], pa.int64())})

    return partitionwise(ds, _pairs, "__key", num_parts)


def normalized_exact_dedup_kept(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Exact dedup keyed on NORMALIZED text (lowercase + whitespace
    collapse, the canonical ``text_normalize`` convention): one kept doc
    (min doc_id) per distinct normalized form → (doc_id).

    The "fuzzy-exact" tier real web pipelines run between byte-exact and
    MinHash dedup: re-crawls that differ only in case or whitespace
    reflow collapse here at exact-dedup cost (one 16-byte-key shuffle) —
    no shingling, no signatures.  Normalization (``normalize_ws``: RE2
    ASCII-whitespace semantics, NOT str.split — NBSP and other unicode
    whitespace are content, matching the SQL oracle) happens batch-local;
    only the md5 of the normalized form crosses the wire under the shared
    ``_content_key`` scheme.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _norm_key(batch: pa.Table) -> pa.Table:
        return _content_key(
            batch, ("doc_id",),
            texts=[normalize_ws(t) for t in batch["text"].to_pylist()])

    keyed = ds.map_batches(_norm_key, batch_format="pyarrow")
    return partitionwise(keyed, _kept_min_by_md5, "__key", num_parts)


def soft_dedup_weights(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Soft deduplication: every doc survives, downweighted by its
    duplicate-cluster multiplicity → (doc_id, cluster_size, weight) with
    weight = round6(1 / cluster_size).

    The reweight-don't-drop alternative to hard dedup (SoftDeDup-style
    training-data reweighting): a sampler drawing docs proportional to
    ``weight`` sees each distinct normalized form with equal total mass,
    so boilerplate-heavy sources lose influence without discarding the
    (possibly unique) docs that carry the duplicates.  Clusters are the
    same normalized-text equality groups as ``normalized_exact_dedup_kept``
    (``normalize_ws`` + shared ``_content_key`` scheme), so the two lanes
    are consistent tiers of one policy: hard keep-first vs soft reweight.

    One 16-byte-content-key shuffle; cluster sizes are computed with all
    of a form's rows co-located and every row is emitted back out of the
    same partition — no join, no second shuffle, no driver state.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _norm_key(batch: pa.Table) -> pa.Table:
        return _content_key(
            batch, ("doc_id",),
            texts=[normalize_ws(t) for t in batch["text"].to_pylist()])

    keyed = ds.map_batches(_norm_key, batch_format="pyarrow")

    def _weights(g: pa.Table) -> pa.Table:
        md5s = g["text_md5"].to_numpy(zero_copy_only=False).astype("U32")
        ids = np_col(g, "doc_id")
        order = np.argsort(md5s, kind="stable")
        md5_s, ids_s = md5s[order], ids[order]
        boundary = np.ones(len(md5_s), bool)
        boundary[1:] = md5_s[1:] != md5_s[:-1]
        gid = np.cumsum(boundary) - 1
        counts = np.bincount(gid)
        cs = counts[gid].astype(np.int64)
        w = np.floor(1.0 / cs * 1e6 + 0.5) / 1e6
        return pa.table({"doc_id": pa.array(ids_s, pa.int64()),
                         "cluster_size": pa.array(cs, pa.int64()),
                         "weight": pa.array(w, pa.float64())})

    return partitionwise(keyed, _weights, "__key", num_parts)


def dup_line_fraction(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Per-doc corpus-level duplicate-line fraction → (doc_id, n_lines,
    dup_lines, dup_line_frac round-6).

    The RefinedWeb/MassiveText corpus-dedup signal that complements the
    WITHIN-doc ``doc_repetition_stats``: a NON-BLANK line position counts
    as duplicated when its exact line text occurs in ≥ 2 DISTINCT
    documents anywhere in the corpus (cross-source, unlike the per-source
    ``strip_boilerplate_lines``).  Blank lines are formatting, not
    content — they are excluded from numerator AND denominator so an
    ordinary multi-paragraph doc isn't scored as duplicated for its
    paragraph breaks; a doc with no non-blank lines reports (0, 0, 0.0).
    High fractions mark boilerplate shells and syndicated pages — the
    docs a line-level filter would gut.

    Two keyed shuffles, both streaming: explode to (doc_id, line) keyed on
    fxhash64(line) — distinct-doc df per line is computed with all of a
    line's rows co-located (grouping is by the full line string, so hash
    collisions cannot merge distinct lines) and reduced to per-doc PARTIAL
    (n, dup) counts before leaving the partition — then a doc_id-keyed sum
    of the ≤ num_parts partials per doc.  Line content never crosses the
    second shuffle.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _explode(b: pa.Table) -> pa.Table:
        ids = np_col(b, "doc_id")
        texts = b["text"].to_pylist()
        lines_per = [("" if t is None else t).split("\n") for t in texts]
        n_lines = np.fromiter((len(ls) for ls in lines_per), np.int64,
                              len(texts))
        flat = [ln for ls in lines_per for ln in ls]
        did = np.repeat(ids, n_lines)
        key = fxhash64_bytes_list([ln.encode("utf-8") for ln in flat])
        return pa.table({"doc_id": pa.array(did, pa.int64()),
                         "line": pa.array(flat, pa.string()),
                         "__key": pa.array(key, pa.uint64())})

    exploded = ds.map_batches(_explode, batch_format="pyarrow")

    def _partials(g: pa.Table) -> pa.Table:
        # distinct-doc df per line (a doc repeating a line counts once);
        # blank lines still FLOW (they keep all-blank docs present in the
        # output) but count in neither n_part nor dup_part
        dis = pa.TableGroupBy(
            g.select(["line", "doc_id"]),
            ["line", "doc_id"]).aggregate([]).group_by(
            ["line"]).aggregate([("doc_id", "count")])
        dis = dis.rename_columns(["line", "df"])
        j = g.select(["doc_id", "line"]).join(dis, ["line"])
        nonblank = pc.not_equal(j["line"], "")
        dup = pc.cast(pc.and_(pc.greater_equal(j["df"], 2), nonblank),
                      pa.int64())
        per = pa.table({"doc_id": j["doc_id"], "__dup": dup,
                        "__nb": pc.cast(nonblank, pa.int64())}).group_by(
            ["doc_id"]).aggregate([("__dup", "sum"), ("__nb", "sum")])
        return per.rename_columns(["doc_id", "dup_part", "n_part"])

    partial = partitionwise(exploded, _partials, "__key", num_parts)

    def _sum(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g, "doc_id").aggregate(
            [("n_part", "sum"), ("dup_part", "sum")])
        n = np_col(agg, "n_part_sum").astype(np.float64)
        dup = np_col(agg, "dup_part_sum").astype(np.float64)
        frac = np.zeros(len(n))
        np.divide(dup, n, out=frac, where=n > 0)
        frac = np.floor(frac * 1e6 + 0.5) / 1e6
        return pa.table({"doc_id": agg["doc_id"],
                         "n_lines": agg["n_part_sum"].cast(pa.int64()),
                         "dup_lines": agg["dup_part_sum"].cast(pa.int64()),
                         "dup_line_frac": pa.array(frac, pa.float64())})

    return partitionwise(partial, _sum, "doc_id", num_parts)


def doc_token_counts(sf_dir: str):
    """Per-doc whitespace token count and reference-rule 3-gram shingle count."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _count(b: pa.Table) -> pa.Table:
        n_tok, n_sh = token_counts(
            ["" if t is None else t for t in b["text"].to_pylist()])
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "n_shingles": pa.array(n_sh, pa.int64())})

    return ds.map_batches(_count, batch_format="pyarrow")


def doc_stats_by_lang(sf_dir: str):
    """lang, n_docs, total_chars, avg_chars (round 6)."""
    from ray.data.aggregate import Count, Sum

    ds = _docs(sf_dir, ["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(Count(alias_name="n_docs"),
                                       Sum("n_chars", alias_name="total_chars"))

    def _avg(b: pa.Table) -> pa.Table:
        avg = np.round(np_col(b, "total_chars") / np_col(b, "n_docs"), 6)
        return b.append_column("avg_chars", pa.array(avg, pa.float64()))

    return out.map_batches(_avg, batch_format="pyarrow")


def filter_english_long(sf_dir: str, min_chars: int = 500):
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    return ds.map_batches(
        lambda b: b.filter(pc.and_(pc.equal(b["lang"], "en"),
                                   pc.greater_equal(b["n_chars"], min_chars))
                           ).select(["doc_id", "n_chars"]),
        batch_format="pyarrow")


def top_longest(sf_dir: str, k: int = 20):
    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(k)


def length_histogram(sf_dir: str):
    """bucket_lo = (n_chars // 100) * 100, n_docs."""
    from ray.data.aggregate import Count

    ds = _docs(sf_dir, ["n_chars"])
    bucketed = ds.map_batches(
        lambda b: pa.table({"bucket_lo": pc.multiply(
            pc.divide(b["n_chars"], 100), 100)}),
        batch_format="pyarrow")
    return bucketed.groupby("bucket_lo").aggregate(Count(alias_name="n_docs"))


def lang_counts(sf_dir: str):
    from ray.data.aggregate import Count

    return _docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n_docs"))


def _tokens_list(b: pa.Table, lower: bool = False):
    """trim → (lower) → whitespace-split token lists for the text column —
    THE tokenization every token lane and its SQL oracle share (DuckDB
    ``string_split_regex(trim([lower(]text[)]), '\\s+')``).  Empty or
    whitespace-only docs yield [''] (callers filter the empty token or
    length-gate)."""
    t = pc.fill_null(b["text"], "")
    if lower:
        t = pc.utf8_lower(t)
    return pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t))


def _token_count_table(b: pa.Table, lower: bool = False) -> pa.Table:
    """(token, cnt) exact per-batch counts — Arrow C++ end to end (split →
    flatten → hash groupby), empty tokens filtered.  The map-side combiner
    of every token-count lane (the old np.unique path copied every token
    into a numpy U-string array and sorted it)."""
    flat = pc.list_flatten(_tokens_list(b, lower))
    cnt = pa.TableGroupBy(pa.table({"token": flat}), "token").aggregate(
        [("token", "count")]).rename_columns(["token", "cnt"])
    return cnt.filter(pc.not_equal(cnt["token"], ""))


def _ragged_gram_positions(lens: np.ndarray, n: int) -> np.ndarray:
    """Start positions of every word n-gram in the FLATTENED token array
    given per-doc token counts ``lens``; docs shorter than ``n`` contribute
    nothing.  Shared by the n-gram/bigram exploders."""
    starts = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    ng = np.maximum(lens - (n - 1), 0)
    total = int(ng.sum())
    if total == 0:
        return np.empty(0, np.int64)
    doc_of = np.repeat(np.arange(len(lens)), ng)
    g0 = np.cumsum(ng) - ng
    return starts[doc_of] + (np.arange(total, dtype=np.int64) - g0[doc_of])


def _explode_token_counts(b: pa.Table) -> pa.Table:
    """Per-batch partial: (token, cnt, __key) — map-side pre-aggregation."""
    cnt = _token_count_table(b)
    key = fxhash64_bytes_list(
        [u.encode() for u in cnt["token"].to_pylist()])
    return pa.table({"token": cnt["token"],
                     "cnt": cnt["cnt"].cast(pa.int64()),
                     "__key": pa.array(key, pa.uint64())})


def _sum_by_token(g: pa.Table) -> pa.Table:
    agg = pa.TableGroupBy(g, "token").aggregate([("cnt", "sum")])
    return agg.rename_columns(["token", "cnt"])


def top_tokens(sf_dir: str, k: int = 20, num_parts: int = DEFAULT_PARTS):
    """Top-k tokens by global count (ties → token asc)."""
    ds = _docs(sf_dir, ["text"]).map_batches(_explode_token_counts,
                                             batch_format="pyarrow")
    summed = partitionwise(ds, _sum_by_token, "__key", num_parts)
    return summed.sort(["cnt", "token"], descending=[True, False]).limit(k)


def distinct_token_count(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    ds = _docs(sf_dir, ["text"]).map_batches(_explode_token_counts,
                                             batch_format="pyarrow")
    summed = partitionwise(ds, _sum_by_token, "__key", num_parts)
    n = summed.count()
    return pa.table({"n_distinct": pa.array([n], pa.int64())})


def total_token_count(sf_dir: str):
    ds = doc_token_counts(sf_dir)
    total = ds.sum("n_tokens") or 0  # Dataset.sum is None over zero rows
    return pa.table({"total_tokens": pa.array([int(total)], pa.int64())})


def doc_bpe_token_counts(sf_dir: str):
    """Per-doc GPT-2-style pre-token count: (doc_id, n_bpe_tokens)."""
    from ..functions.textstats import bpe_token_counts

    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"],
                            "n_bpe_tokens": pa.array(bpe_token_counts(
                                ["" if t is None else t
                                 for t in b["text"].to_pylist()]))}),
        batch_format="pyarrow", batch_size=2048)


def doc_quality(sf_dir: str):
    """Per-doc heuristic quality features (word_count, mean_word_len,
    stopword_ratio, alnum_ratio) — actor-pool batch stage."""
    from ..functions.textstats import quality_scores

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _q(b: pa.Table) -> pa.Table:
        qs = quality_scores(["" if t is None else t for t in b["text"].to_pylist()])
        cols = {"doc_id": b["doc_id"]}
        cols.update({k: pa.array(v) for k, v in qs.items()})
        return pa.table(cols)

    return ds.map_batches(_q, batch_format="pyarrow", batch_size=2048)


def doc_lang_pred(sf_dir: str):
    """Heuristic language-ID per doc: (doc_id, lang_pred)."""
    from ..functions.textstats import lang_id

    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"],
                            "lang_pred": pa.array(lang_id(
                                ["" if t is None else t
                                 for t in b["text"].to_pylist()]), pa.string())}),
        batch_format="pyarrow", batch_size=2048)


def doc_fingerprint(sf_dir: str):
    """Order-sensitive 64-bit rolling fingerprint per doc: (doc_id, fp)."""
    from ..functions.textstats import doc_fingerprints

    ds = _docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"],
                            "fp": pa.array(doc_fingerprints(
                                ["" if t is None else t
                                 for t in b["text"].to_pylist()]), pa.uint64())}),
        batch_format="pyarrow", batch_size=2048)


def doc_repetition_stats(sf_dir: str):
    """Gopher-style per-doc repetition features: (doc_id, dup_word_frac,
    top_bigram_frac).

    ``dup_word_frac``  = 1 - distinct_words / words (0.0 for empty docs);
    ``top_bigram_frac`` = count of the most frequent word bigram / total
    bigrams (0.0 when < 2 words).  Boilerplate-heavy web pages score high on
    both — the standard repetition gates from the Gopher quality rules.

    Fully vectorized: one lexsort over the batch's flattened word array (and
    one over the bigram pairs) replaces any per-doc Python; bigrams are
    compared as (word_i, word_{i+1}) pairs, which is exact because words
    cannot contain the separator.
    """
    from ..functions.textstats import repetition_stats

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _rep(b: pa.Table) -> pa.Table:
        dup_word_frac, top_bigram_frac = repetition_stats(
            ["" if t is None else t for t in b["text"].to_pylist()])
        return pa.table({"doc_id": b["doc_id"],
                         "dup_word_frac": pa.array(dup_word_frac, pa.float64()),
                         "top_bigram_frac": pa.array(top_bigram_frac, pa.float64())})

    return ds.map_batches(_rep, batch_format="pyarrow", batch_size=2048)


def text_normalize(sf_dir: str):
    """Canonical text normalization: lowercase + ASCII-whitespace collapse
    (``normalize_ws`` — RE2 semantics, byte-equal to the SQL oracle's
    regexp_replace; the shingler's str.split() additionally splits unicode
    whitespace for reference parity), exposed as a standalone
    (doc_id, norm_text) operator so downstream stages can share one
    normalized column instead of re-normalizing per stage."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _n(b: pa.Table) -> pa.Table:
        norm = [normalize_ws(t) for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"],
                         "norm_text": pa.array(norm, pa.string())})

    return ds.map_batches(_n, batch_format="pyarrow")


def hash_sample(sf_dir: str, pct: int = 10):
    """Deterministic content-hash sampling: keep docs whose md5(text) bucket
    (mod 100) falls below ``pct``.  The standard reproducible way to draw a
    fixed fraction of a 100-TB corpus — no RNG state, stable across reruns
    and cluster sizes, and any node can evaluate membership independently."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    pct_i = int(pct)

    def _s(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        keep = np.fromiter(
            (int(h[:15], 16) % 100 < pct_i for h in md5_hex(
                ["" if t is None else t for t in texts])),
            bool, len(texts))
        return pa.table({"doc_id": b["doc_id"].filter(pa.array(keep))})

    return ds.map_batches(_s, batch_format="pyarrow")


# PII patterns (RE2 syntax — both pyarrow.compute and DuckDB run RE2, so the
# Ray kernel and the SQL oracle replace the exact same spans).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9() .-]{6,}[0-9]"


def doc_pii_redact(sf_dir: str):
    """PII redaction: replace email addresses with ``<EMAIL>`` and phone-like
    number runs with ``<PHONE>``; emit per-doc match counts.

    Fully vectorized — both the counting and the replacement are Arrow C++
    regex kernels (RE2) over the batch's string column; no Python per row.
    Emails are redacted before phones so a digit run inside an address can't
    be double-counted.  Output: (doc_id, redacted_text, n_emails, n_phones).
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _r(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b["text"], "")
        n_em = pc.count_substring_regex(t, PII_EMAIL_RE)
        t = pc.replace_substring_regex(t, PII_EMAIL_RE, "<EMAIL>")
        n_ph = pc.count_substring_regex(t, PII_PHONE_RE)
        t = pc.replace_substring_regex(t, PII_PHONE_RE, "<PHONE>")
        return pa.table({"doc_id": b["doc_id"], "redacted_text": t,
                         "n_emails": n_em.cast(pa.int64()),
                         "n_phones": n_ph.cast(pa.int64())})

    return ds.map_batches(_r, batch_format="pyarrow")


def decontaminate_flags(sf_dir: str | None = None, ngram_size: int = 5,
                        eval_mod: int = 97, *, train_ds=None, eval_ds=None,
                        id_col: str = "doc_id", text_col: str = "text",
                        eval_text_col: str | None = None):
    """Benchmark decontamination: flag training docs sharing any word
    ``ngram_size``-gram with a held-out eval set.

    Two modes, one broadcast design:

    - **two-table** (production shape): pass ``train_ds`` and ``eval_ds``
      explicitly — the eval benchmarks are their own table (any dataset with
      ``eval_text_col``, defaulting to ``text_col``); every training row is
      flagged.
    - **id-slice stand-in** (the driver-oracle mode): pass ``sf_dir`` only;
      the eval side is the ``doc_id % eval_mod == 0`` slice of the documents
      table and the output covers the complementary training slice.

    The standard pre-training hygiene step (GPT-3 App. C / PaLM style): the
    eval side is tiny versus the corpus, so its n-gram set is collected once,
    deduplicated, and broadcast via ``ray.put``; every flag task then does a
    vectorized ``searchsorted`` membership test over its batch's CSR shingle
    hashes — no shuffle at all, the scale-correct shape for a 100-TB train
    table vs a benchmark suite.  Short docs (< ngram_size words) fall back to
    unigrams, matching the canonical shingler (kernels/shingle.py).

    Output: (doc_id, is_contaminated) over training docs.
    """
    import ray

    from ..kernels.shingle import batch_shingle_hashes

    two_table = eval_ds is not None
    if two_table:
        if train_ds is None:
            if sf_dir is None:
                raise ValueError("two-table mode needs train_ds or sf_dir")
            train_ds = _docs(sf_dir, [id_col, text_col])
    else:
        if sf_dir is None:
            raise ValueError("pass sf_dir (id-slice mode) or eval_ds")
        train_ds = _docs(sf_dir, [id_col, text_col])

    ev_col = eval_text_col if eval_text_col is not None else text_col

    # Pass 1: eval n-gram hash set (the bounded small side by nature).
    def _grams_of(b: pa.Table, mask=None, col: str = text_col) -> pa.Table:
        texts = b[col].to_pylist()
        if mask is not None:
            texts = [t for t, keep in zip(texts, mask) if keep]
        texts = ["" if t is None else t for t in texts]
        if not texts:
            return pa.table({"h": pa.array([], pa.uint64())})
        h, _ = batch_shingle_hashes(texts, ngram_size)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    if two_table:
        gram_src = eval_ds.map_batches(lambda b: _grams_of(b, col=ev_col),
                                       batch_format="pyarrow")
    else:
        def _eval_slice_grams(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy(zero_copy_only=False)
            return _grams_of(b, mask=ids % eval_mod == 0)

        gram_src = train_ds.map_batches(_eval_slice_grams,
                                        batch_format="pyarrow")
    # Arrow batches, not take_all(): a realistic eval suite yields millions
    # of gram hashes — per-row Python dicts would cost GBs on the driver
    parts = [b["h"].to_numpy(zero_copy_only=False)
             for b in gram_src.iter_batches(batch_format="pyarrow",
                                            batch_size=None)]
    ev = (np.unique(np.concatenate(parts).astype(np.uint64))
          if parts else np.empty(0, np.uint64))
    ref = ray.put(ev)

    def _flag(b: pa.Table) -> pa.Table:
        grams = ray.get(ref)  # zero-copy plasma read, shared per node
        ids = b[id_col].to_numpy(zero_copy_only=False)
        if two_table:
            m = np.ones(len(ids), dtype=bool)
        else:
            m = ids % eval_mod != 0
        texts = ["" if t is None else t
                 for t, keep in zip(b[text_col].to_pylist(), m) if keep]
        h, offs = batch_shingle_hashes(texts, ngram_size)
        if len(grams) and len(h):
            idx = np.searchsorted(grams, h)
            idx[idx == len(grams)] = 0
            hit = grams[idx] == h
        else:
            hit = np.zeros(len(h), dtype=bool)
        c = np.zeros(len(h) + 1, dtype=np.int64)
        np.cumsum(hit, out=c[1:])
        contaminated = (c[offs[1:]] - c[offs[:-1]]) > 0
        # keep the caller's id column name AND dtype — production id columns
        # (e.g. webdedup's fxhash64 uid) are uint64 and overflow int64
        return pa.table({id_col: b[id_col].filter(pa.array(m)),
                         "is_contaminated": pa.array(contaminated)})

    return train_ds.map_batches(_flag, batch_format="pyarrow")


def doc_compression_ratio(sf_dir: str, level: int = 6):
    """Per-doc zlib compression ratio (compressed/raw bytes) — the classic
    cheap repetitiveness signal for web-corpus filtering: machine-generated
    or boilerplate pages compress far below prose, so a low ratio (or an
    extreme high one on binary junk) gates the doc out.  Pure map, no
    shuffle; the loop is zlib C time, not Python.  Ratio is 0.0 for empty
    docs.  Output: (doc_id, raw_bytes, compression_ratio).
    """
    import zlib

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _ratio(b: pa.Table) -> pa.Table:
        raws = [("" if t is None else t).encode("utf-8")
                for t in b["text"].to_pylist()]
        sizes = np.array([len(r) for r in raws], np.int64)
        comp = np.array([len(zlib.compress(r, level)) if r else 0
                         for r in raws], np.int64)
        ratio = np.divide(comp, sizes, out=np.zeros(len(raws)),
                          where=sizes > 0)
        return pa.table({"doc_id": b["doc_id"],
                         "raw_bytes": pa.array(sizes),
                         "compression_ratio": pa.array(ratio, pa.float64())})

    return ds.map_batches(_ratio, batch_format="pyarrow")


def top_docs_per_lang(sf_dir: str, k: int = 3, num_parts: int = DEFAULT_PARTS):
    """Group-wise top-k: the k longest docs per language, ranked.

    One keyed shuffle on lang; inside each partition a single lexsort by
    (lang, -n_chars, doc_id) plus a run-position mask picks the top k —
    no per-group Python, deterministic ties (doc_id ascending).
    Output: (lang, doc_id, n_chars, rank).
    """
    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def _key(b: pa.Table) -> pa.Table:
        key = fxhash64_bytes_list(
            [("" if v is None else v).encode() for v in b["lang"].to_pylist()])
        return b.append_column("__key", pa.array(key, pa.uint64()))

    keyed = ds.map_batches(_key, batch_format="pyarrow")

    def _topk(g: pa.Table) -> pa.Table:
        ids = np_col(g, "doc_id").astype(np.int64)
        nch = np_col(g, "n_chars").astype(np.int64)
        lang_key = np_col(g, "__key").astype(np.uint64)
        order = np.lexsort((ids, -nch, lang_key))
        lk = lang_key[order]
        new_grp = np.ones(len(lk), dtype=bool)
        new_grp[1:] = lk[1:] != lk[:-1]
        # rank = position within the group's sorted run
        grp_start = np.maximum.accumulate(
            np.where(new_grp, np.arange(len(lk)), 0))
        rank = np.arange(len(lk)) - grp_start + 1
        keep = rank <= k
        sel = order[keep]
        return pa.table({"lang": g["lang"].take(pa.array(sel, pa.int64())),
                         "doc_id": pa.array(ids[sel]),
                         "n_chars": pa.array(nch[sel]),
                         "rank": pa.array(rank[keep].astype(np.int64))})

    return partitionwise(keyed, _topk, "__key", num_parts)


def _exact_quantile_values(sf_dir: str, qs) -> list[float | None]:
    """Exact corpus-wide ``quantile_cont(n_chars, q)`` values, computed
    distributively: each block emits its (value, count) histogram (bounded
    by the distinct value count, not the row count); the driver merges the
    tiny histograms and evaluates the interpolated order statistics — no
    global sort of the data."""
    ds = _docs(sf_dir, ["n_chars"])

    def _hist(b: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(b, "n_chars").aggregate([("n_chars", "count")])
        return agg.rename_columns(["value", "cnt"])

    merged: dict[int, int] = {}
    for blk in (ds.map_batches(_hist, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow", batch_size=None)):
        for v, c in zip(np_col(blk, "value"), np_col(blk, "cnt")):
            merged[int(v)] = merged.get(int(v), 0) + int(c)
    values = np.array(sorted(merged), dtype=np.float64)
    counts = np.array([merged[int(v)] for v in values], dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        # quantiles of nothing — null per q, matching DuckDB quantile_cont
        return [None for _ in qs]

    def _q(q: float) -> float:
        # quantile_cont: linear interpolation at h = (n-1)*q between
        # order statistics x_{floor(h)} and x_{floor(h)+1} (0-indexed)
        h = (n - 1) * q
        lo_i, frac = int(np.floor(h)), h - np.floor(h)
        x_lo = values[np.searchsorted(cum, lo_i + 1)]
        x_hi = values[np.searchsorted(cum, min(lo_i + 2, n))]
        return float(x_lo + frac * (x_hi - x_lo))

    return [_q(q) for q in qs]


def length_percentiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.99)):
    """Exact corpus-wide percentiles of n_chars (DuckDB ``quantile_cont``
    semantics, see ``_exact_quantile_values``).  Output: one row
    (p25, p50, p75, p99)."""
    vals = _exact_quantile_values(sf_dir, qs)
    return pa.table({f"p{int(q * 100)}": pa.array([v], pa.float64())
                     for q, v in zip(qs, vals)})


def filter_length_band(sf_dir: str, lo_q: float = 0.25, hi_q: float = 0.75):
    """Docs whose n_chars lies inside the corpus [P_lo, P_hi] quantile band:
    (doc_id, n_chars) — the standard outlier trim before quality scoring
    (too-short docs are fragments, too-long ones are concatenation junk).

    The band edges are exact distributed quantiles (tiny driver histogram
    fold, no global sort); the filter itself is a pure map — at 100 TB the
    op costs one metadata-light pass for the histogram plus one streaming
    filter pass.
    """
    lo, hi = _exact_quantile_values(sf_dir, (lo_q, hi_q))
    ds = _docs(sf_dir, ["doc_id", "n_chars"])
    if lo is None:
        # empty corpus → no band; ds is already empty.  Return it rather
        # than a pyarrow.Table so the return type is a Dataset either way.
        return ds
    return ds.map_batches(
        lambda b: b.filter(
            pc.and_(pc.greater_equal(pc.cast(b["n_chars"], pa.float64()), lo),
                    pc.less_equal(pc.cast(b["n_chars"], pa.float64()), hi))),
        batch_format="pyarrow")


def chunk_documents(sf_dir: str, max_tokens: int = 64, overlap: int = 16):
    """Split documents into overlapping fixed-token-window chunks —
    the standard context-window prep for training/embedding pipelines.

    Chunk i of a doc covers whitespace tokens
    ``[i*stride, min(i*stride + max_tokens, n))`` with
    ``stride = max_tokens - overlap``; a doc emits
    ``ceil(max(n - overlap, 1) / stride)`` chunks, so no chunk starts inside
    the previous chunk's tail overlap.  Pure per-row map (flat_map layout,
    no shuffle); chunk text is single-space-normalized so both sides of the
    oracle agree byte-for-byte.

    Output: (doc_id, chunk_id, chunk_text, n_tokens).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _chunks(b: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        cid_out: list[int] = []
        txt_out: list[str] = []
        ntok_out: list[int] = []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            toks = ("" if t is None else t).split()
            n = len(toks)
            if n == 0:
                continue
            n_chunks = -(-max(n - overlap, 1) // stride)
            for i in range(n_chunks):
                a, z = i * stride, min(i * stride + max_tokens, n)
                ids_out.append(did)
                cid_out.append(i)
                txt_out.append(" ".join(toks[a:z]))
                ntok_out.append(z - a)
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "chunk_id": pa.array(cid_out, pa.int64()),
                         "chunk_text": pa.array(txt_out, pa.string()),
                         "n_tokens": pa.array(ntok_out, pa.int64())})

    return ds.map_batches(_chunks, batch_format="pyarrow")


def approx_distinct_tokens(sf_dir: str, p: int = 14):
    """Approximate distinct whitespace-token count via HyperLogLog —
    the shuffle-free sketch lane beside the exact ``distinct_token_count``
    (which must all-to-all every token at 100 TB).  Per-block 2^p-byte
    register rows max-fold on the driver; relative error ~1.04/sqrt(2^p)
    (0.8% at p=14).  Output: one row (approx_distinct).
    """
    from ..kernels.hll import approx_distinct

    ds = _docs(sf_dir, ["text"])

    def _hashes(b: pa.Table) -> np.ndarray:
        toks = pc.list_flatten(
            pc.utf8_split_whitespace(pc.fill_null(b["text"], "")))
        toks = toks.filter(pc.not_equal(toks, ""))
        return np.asarray(
            fxhash64_bytes_list([t.encode("utf-8")
                                 for t in toks.to_pylist()]),
            dtype=np.uint64)

    est = approx_distinct(ds, _hashes, p=p)
    return pa.table({"approx_distinct": pa.array([int(round(est))],
                                                 pa.int64())})


def events_asof_join(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "click",
                     num_parts: int = DEFAULT_PARTS):
    """As-of join: each ``left_type`` event gets the user's most recent
    ``right_type`` event at-or-before its timestamp (NULL if none) —
    the temporal join Ray Data has no native operator for.

    One keyed shuffle on user_id; the partition kernel is a fully
    vectorized merge: both sides lexsorted by (user, ts, side) with the
    right side ordered first at timestamp ties (ts >= semantics), then a
    single ``np.maximum.accumulate`` forward-fill finds each left row's
    latest preceding right row; rows whose fill crosses a user boundary are
    nulled by a user-equality check.  O(n log n) per partition, no per-user
    Python.  The partitioning assumption: all events of one user fit one
    partition (user activity streams are bounded; salt per time-range if a
    single entity's history outgrows a worker).

    Output: (event_id, user_id, ts, prior_event_id, prior_value).
    """
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])

    def _pick(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array([left_type, right_type]))
        b = b.filter(keep)
        return pa.table({
            "event_id": b["event_id"],
            "ts": b["ts"],
            "user_id": b["user_id"],
            "value": b["value"],
            "__is_left": pc.equal(b["event_type"], left_type),
        })

    slim = ds.map_batches(_pick, batch_format="pyarrow")

    def _asof(g: pa.Table) -> pa.Table:
        users = np_col(g, "user_id").astype(np.int64)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_left = np_col(g, "__is_left").astype(bool)
        eid = np_col(g, "event_id").astype(np.int64)
        val = np_col(g, "value").astype(np.float64)
        n = len(users)
        # right rows sort before left rows at equal (user, ts): ties count.
        # event_id is the innermost key so duplicate (user, ts) right rows
        # break ties DETERMINISTICALLY: the forward-fill picks the max
        # event_id among them (DuckDB ASOF leaves this unspecified — the
        # oracle dedupes its right side per (user, ts) with arg_max to the
        # same rule)
        order = np.lexsort((eid, is_left, ts, users))
        tag = is_left[order]
        # forward-fill the SORT POSITION of the latest right row seen
        fill = np.maximum.accumulate(
            np.where(tag, -1, np.arange(n, dtype=np.int64)))
        sel = np.flatnonzero(tag)            # left rows, in sorted order
        left_rows = order[sel]
        prior_pos = fill[sel]
        prior_rows = order[np.maximum(prior_pos, 0)]
        # a fill that crossed into another user's run is not a match
        ok = (prior_pos >= 0) & (users[prior_rows] == users[left_rows])
        null_mask = ~ok
        return pa.table({
            "event_id": pa.array(eid[left_rows]),
            "user_id": pa.array(users[left_rows]),
            "ts": pa.array(ts[left_rows], pa.int64()).cast(g["ts"].type),
            "prior_event_id": pa.array(eid[prior_rows], mask=null_mask),
            "prior_value": pa.array(val[prior_rows], mask=null_mask),
        })

    return partitionwise(slim, _asof, "user_id", num_parts)


def events_range_join(sf_dir: str, left_type: str = "purchase",
                      right_type: str = "click", window_minutes: int = 60,
                      num_parts: int = DEFAULT_PARTS):
    """Range join: every (left, right) event pair of one user with the right
    event inside ``[left.ts - window, left.ts]`` — the banded temporal join
    (each purchase paired with all clicks of the preceding hour).

    Same one-shuffle shape as ``events_asof_join``: partition by user, sort
    both sides by (user, ts); each left row's match set is a contiguous run
    bounded by two vectorized ``searchsorted`` calls over a composite
    (user, ts) key, expanded with a ragged repeat/arange — no per-row Python,
    no cross joins.  Fan-out is bounded by events-per-user-per-window (the
    documented partitioning assumption; cap the window for adversarial
    entities).

    Output: (event_id, match_event_id, gap_seconds).
    """
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def _pick(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array([left_type, right_type]))
        b = b.filter(keep)
        return pa.table({
            "event_id": b["event_id"],
            "ts": b["ts"],
            "user_id": b["user_id"],
            "__is_left": pc.equal(b["event_type"], left_type),
        })

    slim = ds.map_batches(_pick, batch_format="pyarrow")
    win_us = np.int64(window_minutes) * 60_000_000

    def _range(g: pa.Table) -> pa.Table:
        users = np_col(g, "user_id").astype(np.int64)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_left = np_col(g, "__is_left").astype(bool)
        eid = np_col(g, "event_id").astype(np.int64)
        empty = pa.table({"event_id": pa.array([], pa.int64()),
                          "match_event_id": pa.array([], pa.int64()),
                          "gap_seconds": pa.array([], pa.float64())})
        if len(users) == 0 or not is_left.any() or is_left.all():
            return empty
        # RANK-based composite key (user_rank, ts_rank): both sides' ts are
        # ranked over the union of right timestamps and the query bounds, so
        # the composite stays < n_users * (3n + 1) — fits int64 for ANY
        # user-id space and time span (the previous user<<48 packing silently
        # collided user ids >= 2^16)
        r = ~is_left
        r_order = np.lexsort((ts[r], users[r]))
        r_users = users[r][r_order]
        r_ts = ts[r][r_order]
        r_eid = eid[r][r_order]
        l_users, l_ts, l_eid = users[is_left], ts[is_left], eid[is_left]
        lo_ts = l_ts - win_us
        uniq_ts = np.unique(np.concatenate([r_ts, lo_ts, l_ts]))
        uniq_u = np.unique(users)
        M = np.int64(len(uniq_ts) + 1)
        # guard in PYTHON ints: the numpy int64 product would wrap (warn,
        # not raise) and let genuinely overflowed composite keys through
        if int(len(uniq_u)) * int(M) >= np.iinfo(np.int64).max:
            raise ValueError("events_range_join partition too large for the "
                             "rank composite — raise num_parts")
        r_key = (np.searchsorted(uniq_u, r_users).astype(np.int64) * M
                 + np.searchsorted(uniq_ts, r_ts))
        l_urank = np.searchsorted(uniq_u, l_users).astype(np.int64) * M
        # window [l.ts - win, l.ts], both ends inclusive
        lo = np.searchsorted(r_key, l_urank + np.searchsorted(uniq_ts, lo_ts),
                             side="left")
        hi = np.searchsorted(r_key, l_urank + np.searchsorted(uniq_ts, l_ts),
                             side="right")
        cnt = hi - lo
        out_left = np.repeat(np.arange(len(l_eid)), cnt)
        # ragged [lo_i, hi_i) ranges flattened
        out_right = np.repeat(lo, cnt) + (
            np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt))
        gap = (l_ts[out_left] - r_ts[out_right]) / 1e6
        return pa.table({
            "event_id": pa.array(l_eid[out_left]),
            "match_event_id": pa.array(r_eid[out_right]),
            "gap_seconds": pa.array(gap, pa.float64()),
        })

    return partitionwise(slim, _range, "user_id", num_parts)


def doc_tfidf(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Per-(doc, token) TF-IDF scores: (doc_id, token, tf, tfidf) with
    tfidf = tf * ln(N / df), N = corpus doc count, df = docs containing the
    token.

    One keyed shuffle total: the explode stage computes per-doc term counts
    with Arrow C++ kernels (lower → split_whitespace → flatten → groupby),
    then a single hash-partition on the token co-locates every (doc, token)
    row of a token, so df, idf, and the final score are all computed inside
    the partition kernel — no df broadcast, no second shuffle.  N comes from
    parquet metadata (no extra pass).
    """
    import ray.data as rd

    from .common import explode_doc_token_tf, tf_df_weight

    ds = _docs(sf_dir, ["doc_id", "text"])
    n_docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).count()

    exploded = ds.map_batches(explode_doc_token_tf, batch_format="pyarrow")

    def _score(g: pa.Table) -> pa.Table:
        j, tfv, w = tf_df_weight(g, n_docs)
        return pa.table({"doc_id": j["doc_id"], "token": j["token"],
                         "tf": pa.array(tfv),
                         "tfidf": pa.array(w, pa.float64())})

    return partitionwise(exploded, _score, "__key", num_parts)


def events_by_type(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _events(sf_dir, ["event_type", "value"])
    out = ds.groupby("event_type").aggregate(Count(alias_name="n_events"),
                                             Sum("value", alias_name="sum_value"))
    return out.map_batches(
        lambda b: pa.table({"event_type": b["event_type"],
                            "n_events": b["n_events"],
                            "total_value": pa.array(
                                np.round(np_col(b, "sum_value"), 4), pa.float64())}),
        batch_format="pyarrow")


def user_sessions(sf_dir: str, gap_minutes: int = 30, num_parts: int = DEFAULT_PARTS):
    """Sessionize events per user (a new session starts after a ``gap_minutes``
    silence): user_id, n_sessions, n_events.

    Windowed/stateful aggregate expressed as one hash-partitioned shuffle on
    user_id + a vectorized sort/diff kernel per partition — the same shape a
    streaming watermark-window would take in micro-batches.
    """
    ds = _events(sf_dir, ["user_id", "ts"])
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def _sessions(g: pa.Table) -> pa.Table:
        uid = np_col(g, "user_id")
        ts = g["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        if len(uid) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"user_id": z, "n_sessions": z, "n_events": z})
        order = np.lexsort((ts, uid))
        u_s, t_s = uid[order], ts[order]
        new_user = np.zeros(len(u_s), bool)
        new_user[0] = True
        new_user[1:] = u_s[1:] != u_s[:-1]
        gap = np.zeros(len(u_s), bool)
        gap[1:] = (t_s[1:] - t_s[:-1]) > gap_us
        starts = new_user | gap
        gid = np.cumsum(new_user) - 1
        n_users = gid[-1] + 1
        n_sessions = np.zeros(n_users, np.int64)
        np.add.at(n_sessions, gid, starts.astype(np.int64))
        n_events = np.bincount(gid, minlength=n_users).astype(np.int64)
        return pa.table({"user_id": pa.array(u_s[new_user], pa.int64()),
                         "n_sessions": pa.array(n_sessions),
                         "n_events": pa.array(n_events)})

    return partitionwise(ds, _sessions, "user_id", num_parts)


def events_hourly(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _events(sf_dir, ["event_type", "ts"])
    trunc = ds.map_batches(
        lambda b: pa.table({"event_type": b["event_type"],
                            "hour": pc.floor_temporal(b["ts"], unit="hour")}),
        batch_format="pyarrow")
    return trunc.groupby(["event_type", "hour"]).aggregate(Count(alias_name="n_events"))


# ------------------------------------------------------------------ source ops

def dup_stats_by_source(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Per-source duplication report: (source, n_docs, n_dup_docs, dup_frac).

    A doc is "dup" iff its exact text appears ≥ 2 times CORPUS-WIDE (any
    source) — the curation question "which crawl/source is feeding me
    duplicates".  One content-key shuffle computes global text counts with
    every same-text row co-located; the per-source rollup is a tiny second
    aggregate.
    """
    from ray.data.aggregate import Count, Sum

    ds = _docs(sf_dir, ["source", "text"]).map_batches(
        lambda b: _content_key(b, ("source",)), batch_format="pyarrow")

    def _flag(g: pa.Table) -> pa.Table:
        cnt = pa.TableGroupBy(g, "text_md5").aggregate([("text_md5", "count")])
        cnt = cnt.rename_columns(["text_md5", "cnt"])
        joined = g.select(["source", "text_md5"]).join(cnt, "text_md5")
        return pa.table({
            "source": joined["source"],
            "is_dup": pc.cast(pc.greater_equal(joined["cnt"], 2), pa.int64())})

    flagged = partitionwise(ds, _flag, "__key", num_parts)
    agg = flagged.groupby("source").aggregate(
        Count(alias_name="n_docs"), Sum("is_dup", alias_name="n_dup_docs"))
    return agg.map_batches(
        lambda b: pa.table({
            "source": b["source"],
            "n_docs": b["n_docs"].cast(pa.int64()),
            "n_dup_docs": b["n_dup_docs"].cast(pa.int64()),
            "dup_frac": pc.divide(b["n_dup_docs"].cast(pa.float64()),
                                  b["n_docs"].cast(pa.float64()))}),
        batch_format="pyarrow")


def cross_source_overlap(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Texts shared across sources: (source_a < source_b, n_shared_texts),
    counting DISTINCT texts present in both.  Same content-key shuffle as
    the exact-dup family; per-text source fan-out is bounded by the (small)
    source cardinality, so pair emission is never quadratic in doc count.
    """

    def _key(batch: pa.Table) -> pa.Table:
        # NULL-source rows can't belong to a (source_a, source_b) pair;
        # dropping them here matches the oracle (a.source < b.source is
        # never true for NULL) and keeps the pair kernel's sort str-only.
        return _content_key(batch.filter(pc.is_valid(batch["source"])),
                            ("source",))

    ds = _docs(sf_dir, ["source", "text"]).map_batches(
        _key, batch_format="pyarrow")

    def _pairs(g: pa.Table) -> pa.Table:
        from .common import pairs_within_runs

        empty = pa.table({"source_a": pa.array([], pa.string()),
                          "source_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        # distinct (text, source), then source pairs within each text run
        dedup = pa.TableGroupBy(g, ["text_md5", "source"]).aggregate(
            [("__key", "min")])  # __key is a function of text_md5
        if dedup.num_rows == 0:
            return empty
        key = dedup["__key_min"].to_numpy(zero_copy_only=False)
        md5s = dedup["text_md5"].to_numpy(zero_copy_only=False).astype("U32")
        src = dedup["source"].to_numpy(zero_copy_only=False)
        o = np.argsort(key, kind="stable")
        key_s, md5_s, src_s = key[o], md5s[o], src[o]
        runs = np.ones(len(key_s), bool)
        runs[1:] = key_s[1:] != key_s[:-1]
        counts = np.bincount(np.cumsum(runs) - 1)
        ii, jj = pairs_within_runs(counts)
        if len(ii):
            ok = md5_s[ii] == md5_s[jj]  # defuse 2^-64 key collisions
            ii, jj = ii[ok], jj[ok]
        if len(ii) == 0:
            return empty
        a, b = src_s[ii], src_s[jj]
        swap = a > b
        part = pa.table({"source_a": pa.array(np.where(swap, b, a), pa.string()),
                         "source_b": pa.array(np.where(swap, a, b), pa.string())})
        cnt = pa.TableGroupBy(part, ["source_a", "source_b"]).aggregate(
            [("source_a", "count")])
        return cnt.rename_columns(["source_a", "source_b", "n"])

    partial = partitionwise(ds, _pairs, "__key", num_parts)
    from ray.data.aggregate import Sum

    agg = partial.groupby(["source_a", "source_b"]).aggregate(
        Sum("n", alias_name="n_shared_texts"))
    return agg.map_batches(
        lambda b: pa.table({"source_a": b["source_a"],
                            "source_b": b["source_b"],
                            "n_shared_texts":
                                b["n_shared_texts"].cast(pa.int64())}),
        batch_format="pyarrow")


def doc_token_entropy(sf_dir: str):
    """Unigram Shannon entropy (natural log, lowercased whitespace tokens)
    per doc: (doc_id, n_tokens, entropy round 6).  Empty docs → (0, 0.0).

    Gopher-style repetition/quality signal: boilerplate and keyword-stuffed
    pages score far below prose of the same length.  Pure per-batch map —
    each row holds its whole doc, so no shuffle.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _entropy(b: pa.Table) -> pa.Table:
        ids = np_col(b, "doc_id")
        toks = pc.utf8_split_whitespace(
            pc.utf8_lower(pc.fill_null(b["text"], "")))
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        doc_of = np.repeat(np.arange(len(ids)), lens)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, doc_of = flat.filter(pa.array(nonempty)), doc_of[nonempty]
        n = len(ids)
        n_tok = np.bincount(doc_of, minlength=n).astype(np.int64)
        ent = np.zeros(n, np.float64)
        if len(doc_of):
            h = fxhash64_bytes_list(
                [t.encode("utf-8") for t in flat.to_pylist()])
            order = np.lexsort((h, doc_of))
            d_s, h_s = doc_of[order], h[order]
            runs = np.ones(len(d_s), bool)
            runs[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
            c = np.bincount(np.cumsum(runs) - 1).astype(np.float64)
            cdoc = d_s[np.flatnonzero(runs)]
            clnc = np.zeros(n, np.float64)
            np.add.at(clnc, cdoc, c * np.log(c))
            nz = n_tok > 0
            ent[nz] = np.log(n_tok[nz]) - clnc[nz] / n_tok[nz]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(n_tok),
                         "entropy": pa.array(np.round(ent, 6))})

    return ds.map_batches(_entropy, batch_format="pyarrow")


def doc_format_gates(sf_dir: str):
    """Gopher format-rule signals (Rae et al. 2021 §A1.1) per doc:
    (doc_id, n_words, mean_word_len, frac_alpha_words, n_lines,
    frac_bullet_lines, frac_ellipsis_lines), fracs round-6.

    The FORMAT complement to the repetition gates
    (``doc_repetition_stats``): machine-generated and listicle/navigation
    pages fail on word shape (mean word length outside [3, 10], low
    alphabetic-word fraction) or line shape (> 90% bullet lines, > 30%
    ellipsis-ending lines) even when their n-gram repetition looks fine.
    Thresholds are the caller's; this lane emits the raw signals so one
    scan serves any gate combination.

    Pure per-batch map (each row holds its whole doc, no shuffle), all
    Arrow C++/numpy kernels: whitespace split + utf8_length for word
    shape, one line split + ltrim/rtrim regex/suffix matches for line
    shape.  ``n_lines`` counts non-blank lines (space-trim ≠ '', matching
    the SQL oracle's trim semantics); blank lines can be neither bullets
    nor ellipses, so they are excluded from the denominators.
    """
    ds = _docs(sf_dir, ["doc_id", "text"])

    def _gates(b: pa.Table) -> pa.Table:
        ids = np_col(b, "doc_id")
        n = len(ids)
        text = pc.fill_null(b["text"], "")

        # word shape ----------------------------------------------------
        toks = pc.utf8_split_whitespace(text)
        tlens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        doc_of = np.repeat(np.arange(n), tlens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, doc_of = flat.filter(pa.array(keep)), doc_of[keep]
        n_words = np.bincount(doc_of, minlength=n).astype(np.int64)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        alpha = pc.match_substring_regex(
            flat, "[a-zA-Z]").to_numpy(zero_copy_only=False)
        len_sum = np.zeros(n, np.float64)
        alpha_ct = np.zeros(n, np.float64)
        if len(doc_of):
            np.add.at(len_sum, doc_of, wlen.astype(np.float64))
            np.add.at(alpha_ct, doc_of, alpha.astype(np.float64))

        # line shape ----------------------------------------------------
        lines = pc.split_pattern(text, pattern="\n")
        llens = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        lflat = pc.list_flatten(lines)
        ldoc = np.repeat(np.arange(n), llens)
        nonblank = pc.not_equal(
            pc.utf8_trim(lflat, " "), "").to_numpy(zero_copy_only=False)
        lflat, ldoc = lflat.filter(pa.array(nonblank)), ldoc[nonblank]
        n_lines = np.bincount(ldoc, minlength=n).astype(np.int64)
        bullet = pc.match_substring_regex(
            pc.utf8_ltrim(lflat, " "),
            "^[-*•]").to_numpy(zero_copy_only=False)
        rt = pc.utf8_rtrim(lflat, " ")
        ellipsis = pc.or_(
            pc.ends_with(rt, pattern="..."),
            pc.ends_with(rt, pattern="…")).to_numpy(zero_copy_only=False)
        bullet_ct = np.zeros(n, np.float64)
        ell_ct = np.zeros(n, np.float64)
        if len(ldoc):
            np.add.at(bullet_ct, ldoc, bullet.astype(np.float64))
            np.add.at(ell_ct, ldoc, ellipsis.astype(np.float64))

        def _frac(num, den):
            out = np.zeros(n, np.float64)
            np.divide(num, den, out=out, where=den > 0)
            return np.floor(out * 1e6 + 0.5) / 1e6

        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(n_words),
            "mean_word_len": pa.array(
                _frac(len_sum, n_words.astype(np.float64))),
            "frac_alpha_words": pa.array(
                _frac(alpha_ct, n_words.astype(np.float64))),
            "n_lines": pa.array(n_lines),
            "frac_bullet_lines": pa.array(
                _frac(bullet_ct, n_lines.astype(np.float64))),
            "frac_ellipsis_lines": pa.array(
                _frac(ell_ct, n_lines.astype(np.float64)))})

    return ds.map_batches(_gates, batch_format="pyarrow")


def doc_length_zscore_by_lang(sf_dir: str):
    """Per-language standardized length: (doc_id, lang, z round 6) with
    z = (n_chars - mean_lang) / stddev_pop_lang; single-doc / constant
    languages → 0.0.

    The grouped-standardization shape every feature pipeline needs: the
    per-lang moments are a TINY aggregate (lang cardinality), broadcast
    via ``ray.put`` into a pure map — no per-doc shuffle.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    sq = ds.map_batches(
        lambda b: pa.table({
            "lang": b["lang"],
            "x": b["n_chars"].cast(pa.float64()),
            "x2": pc.multiply(b["n_chars"].cast(pa.float64()),
                              b["n_chars"].cast(pa.float64()))}),
        batch_format="pyarrow")
    stats = sq.groupby("lang").aggregate(
        Count(alias_name="n"), Sum("x", alias_name="sx"),
        Sum("x2", alias_name="sx2")).take_all()  # lang cardinality — tiny
    moments = {}
    for r in stats:
        n, sx, sx2 = r["n"], r["sx"], r["sx2"]
        mu = sx / n
        var = max(sx2 / n - mu * mu, 0.0)
        moments[r["lang"]] = (mu, var ** 0.5)
    m_ref = ray.put(moments)

    def _z(b: pa.Table) -> pa.Table:
        mo = ray.get(m_ref)
        langs = b["lang"].to_numpy(zero_copy_only=False)
        x = np_col(b, "n_chars").astype(np.float64)
        # factorize once per batch: dict lookups only per UNIQUE lang
        # (tiny cardinality), then vectorized gather per row
        uniq, inv = np.unique(langs, return_inverse=True)
        mu_u = np.array([mo[la][0] for la in uniq], np.float64)
        sd_u = np.array([mo[la][1] for la in uniq], np.float64)
        mu, sd = mu_u[inv], sd_u[inv]
        z = np.where(sd > 0, (x - mu) / np.where(sd > 0, sd, 1.0), 0.0)
        return pa.table({"doc_id": b["doc_id"], "lang": b["lang"],
                         "z": pa.array(np.round(z, 6))})

    return ds.map_batches(_z, batch_format="pyarrow")


def doc_dup_ngram_fraction(sf_dir: str, ngram_size: int = 3,
                           num_parts: int = DEFAULT_PARTS):
    """Per-doc duplicate-n-gram fraction — the Gopher/Dolma corpus-level
    repetition signal: (doc_id, n_grams, dup_frac round 6) where dup_frac
    is the fraction of the doc's n-gram OCCURRENCES whose n-gram appears in
    ≥ 2 distinct docs corpus-wide.

    Map side pre-aggregates (gram, doc) position counts, shuffle 1 on the
    gram hash computes each gram's distinct-doc frequency with its full
    posting co-located (no pair emission — per-DOC partials only, so
    boilerplate grams cost O(df), never O(df²)), shuffle 2 is a tiny
    per-doc sum.  Gram identity is the fxhash64 of the shingle (the
    ngram_jaccard_pairs-accepted 2⁻⁶⁴ collision class); tokenization
    matches the oracle: lower/trim/whitespace-split, docs shorter than
    ``ngram_size`` tokens fall back to unigrams.
    """
    from ..kernels.shingle import batch_shingle_hashes

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _explode(b: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in b["text"].to_pylist()]
        hashes, offsets = batch_shingle_hashes(texts, ngram_size)
        ids = np_col(b, "doc_id").astype(np.int64)
        doc_idx = np.repeat(np.arange(len(ids)), offsets[1:] - offsets[:-1])
        if len(hashes) == 0:
            return pa.table({"gram": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64()),
                             "npos": pa.array([], pa.int64())})
        # combiner: per-(doc, gram) position counts
        from .common import run_ids

        order, gid, counts = run_ids(hashes, doc_idx.astype(np.uint64))
        first = np.zeros(len(gid), bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        return pa.table({
            "gram": pa.array(hashes[order][first], pa.uint64()),
            "doc_id": pa.array(ids[doc_idx[order][first]], pa.int64()),
            "npos": pa.array(counts, pa.int64())})

    exploded = ds.map_batches(_explode, batch_format="pyarrow")

    def _df_partials(g: pa.Table) -> pa.Table:
        gram = np_col(g, "gram").astype(np.uint64)
        ids = np_col(g, "doc_id").astype(np.int64)
        npos = np_col(g, "npos").astype(np.int64)
        if len(gram) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "pos": z, "dup_pos": z})
        from .common import run_ids

        # every (gram, doc) row of a gram is co-located; rows are already
        # distinct per (gram, doc) from the map combiner
        order, gid, counts = run_ids(gram, ids.astype(np.uint64),
                                     n_group_keys=1)
        dup = (counts >= 2)[gid]  # gram appears in ≥2 distinct docs
        ids_s, npos_s = ids[order], npos[order]
        # per-doc partial sums inside the partition
        uniq, inv = np.unique(ids_s, return_inverse=True)
        pos = np.zeros(len(uniq), np.int64)
        np.add.at(pos, inv, npos_s)
        dpos = np.zeros(len(uniq), np.int64)
        np.add.at(dpos, inv, np.where(dup, npos_s, 0))
        return pa.table({"doc_id": pa.array(uniq, pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         "dup_pos": pa.array(dpos, pa.int64())})

    partial = partitionwise(exploded, _df_partials, "gram", num_parts)

    def _per_doc(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g, "doc_id").aggregate(
            [("pos", "sum"), ("dup_pos", "sum")])
        agg = agg.rename_columns(["doc_id", "pos", "dup_pos"])
        pos = np_col(agg, "pos").astype(np.float64)
        dpos = np_col(agg, "dup_pos").astype(np.float64)
        return pa.table({
            "doc_id": agg["doc_id"],
            "n_grams": agg["pos"].cast(pa.int64()),
            "dup_frac": pa.array(np.round(dpos / pos, 6), pa.float64())})

    return partitionwise(partial, _per_doc, "doc_id", num_parts)


def doc_idf_rarity(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Per-doc token rarity: (doc_id, n_distinct_tokens, mean_idf round 6)
    with idf = ln(N / df) over the doc's DISTINCT lowercased tokens — the
    quality signal that separates natural prose (mid-rarity) from keyword
    stuffing (high) and boilerplate (low).

    Same one-keyed-shuffle plan as ``doc_tfidf`` (df computed with each
    token's rows co-located, N from parquet metadata), plus a tiny second
    per-doc aggregate.
    """
    import ray.data as rd

    ds = _docs(sf_dir, ["doc_id", "text"])
    n_docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).count()

    def _distinct(b: pa.Table) -> pa.Table:
        toks = _tokens_list(b, lower=True)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        ids = np.repeat(np_col(b, "doc_id"), lens)
        tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "token": flat})
        tbl = tbl.filter(pc.not_equal(tbl["token"], ""))
        dis = pa.TableGroupBy(tbl, ["doc_id", "token"]).aggregate(
            [("token", "count")]).select(["doc_id", "token"])
        key = fxhash64_bytes_list(
            [t.encode("utf-8") for t in dis["token"].to_pylist()])
        return dis.append_column("__key", pa.array(key, pa.uint64()))

    exploded = ds.map_batches(_distinct, batch_format="pyarrow")

    def _idf(g: pa.Table) -> pa.Table:
        df_t = pa.TableGroupBy(g, "token").aggregate([("doc_id", "count")])
        df_t = df_t.rename_columns(["token", "df"])
        j = g.select(["doc_id", "token"]).join(df_t, "token")
        idf = np.log(float(n_docs) / np_col(j, "df").astype(np.float64))
        return pa.table({"doc_id": j["doc_id"],
                         "idf": pa.array(idf, pa.float64())})

    partial = partitionwise(exploded, _idf, "__key", num_parts)

    def _per_doc(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g, "doc_id").aggregate(
            [("idf", "sum"), ("idf", "count")])
        agg = agg.rename_columns(["doc_id", "s", "n"])
        s = np_col(agg, "s").astype(np.float64)
        n = np_col(agg, "n").astype(np.float64)
        return pa.table({
            "doc_id": agg["doc_id"],
            "n_distinct_tokens": agg["n"].cast(pa.int64()),
            "mean_idf": pa.array(np.round(s / n, 6), pa.float64())})

    return partitionwise(partial, _per_doc, "doc_id", num_parts)


def stratified_sample_by_lang(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Language-balanced corpus sample: the min-language-count docs per
    language, chosen deterministically by (md5(text), doc_id) rank —
    (doc_id, lang).  The standard re-balancing step before training-mix
    assembly: every language contributes exactly the same number of docs,
    selection is content-hash-ordered (reproducible across runs and
    partitionings, no RNG state to ship).

    The per-lang target is a tiny driver aggregate (lang cardinality);
    selection is one keyed shuffle on lang + the group-top-k run-position
    kernel (no per-group Python).
    """
    from ray.data.aggregate import Count

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])
    # the target pre-pass reads ONLY lang — counting over `ds` would drag
    # every document body through the count shuffle
    counts = _docs(sf_dir, ["lang"]).groupby("lang").aggregate(
        Count(alias_name="n")).take_all()  # lang cardinality — tiny
    if not counts:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "lang": pa.array([], pa.string())})
    target = min(r["n"] for r in counts)

    def _key(b: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in b["text"].to_pylist()]
        langs = [("" if v is None else v) for v in b["lang"].to_pylist()]
        key = fxhash64_bytes_list([v.encode() for v in langs])
        return pa.table({
            "doc_id": b["doc_id"], "lang": b["lang"],
            "h": pa.array(md5_hex(texts), pa.string()),
            "__key": pa.array(key, pa.uint64())})

    keyed = ds.map_batches(_key, batch_format="pyarrow")

    def _take(g: pa.Table) -> pa.Table:
        ids = np_col(g, "doc_id").astype(np.int64)
        lang_key = np_col(g, "__key").astype(np.uint64)
        h = g["h"].to_numpy(zero_copy_only=False).astype("U32")
        order = np.lexsort((ids, h, lang_key))
        lk = lang_key[order]
        new_grp = np.ones(len(lk), dtype=bool)
        new_grp[1:] = lk[1:] != lk[:-1]
        grp_start = np.maximum.accumulate(
            np.where(new_grp, np.arange(len(lk)), 0))
        rank = np.arange(len(lk)) - grp_start + 1
        sel = order[rank <= target]
        return pa.table({"doc_id": pa.array(ids[sel]),
                         "lang": g["lang"].take(pa.array(sel, pa.int64()))})

    return partitionwise(keyed, _take, "__key", num_parts)


def top_ngrams(sf_dir: str, k: int = 20, ngram_size: int = 3,
               num_parts: int = DEFAULT_PARTS):
    """Top-k word n-grams by corpus count (ties → gram asc): (ngram, cnt).
    Docs with fewer than ``ngram_size`` tokens contribute nothing; tokens
    are lowercased (the n-gram vocabulary/boilerplate-phrase report).

    Gram strings are built with Arrow C++ kernels (split → flatten → take
    at shifted ragged positions → element-wise join); each batch
    pre-aggregates its gram counts (combiner) before the single keyed
    shuffle; the global top-k is a sort+limit over the (bounded) per-gram
    sums.
    """
    ds = _docs(sf_dir, ["text"])

    def _explode(b: pa.Table) -> pa.Table:
        empty = pa.table({"ngram": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64()),
                          "__key": pa.array([], pa.uint64())})
        toks = _tokens_list(b, lower=True)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).combine_chunks()
        pos = _ragged_gram_positions(lens, ngram_size)
        if len(pos) == 0:
            return empty
        parts = [flat.take(pa.array(pos + i, pa.int64()))
                 for i in range(ngram_size)]
        grams = pc.binary_join_element_wise(*parts, " ")
        cnt = pa.TableGroupBy(pa.table({"ngram": grams}), "ngram").aggregate(
            [("ngram", "count")]).rename_columns(["ngram", "cnt"])
        key = fxhash64_bytes_list(
            [s.encode("utf-8") for s in cnt["ngram"].to_pylist()])
        return pa.table({"ngram": cnt["ngram"],
                         "cnt": cnt["cnt"].cast(pa.int64()),
                         "__key": pa.array(key, pa.uint64())})

    exploded = ds.map_batches(_explode, batch_format="pyarrow")

    def _sum(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g, "ngram").aggregate([("cnt", "sum")])
        return agg.rename_columns(["ngram", "cnt"])

    summed = partitionwise(exploded, _sum, "__key", num_parts)
    return summed.sort(["cnt", "ngram"], descending=[True, False]).limit(k)


def dedup_savings(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """One-row exact-dedup savings report — the headline curation metric
    "what does dedup buy": (n_docs, n_kept, n_dup_docs, total_tokens,
    kept_tokens, savings_frac round 6), where kept = the min-doc_id
    representative of each distinct text and tokens follow the
    doc_token_counts whitespace rule.

    One content-key shuffle; each partition folds its text groups to a
    single partial row (n_docs, n_groups, token sums), so the driver
    reduce is ≤ num_parts rows regardless of corpus size.
    """
    from ..functions.textstats import token_counts

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _key(b: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in b["text"].to_pylist()]
        nt, _ = token_counts(texts)
        out = _content_key(b, ("doc_id",))
        return out.append_column("nt", pa.array(nt, pa.int64()))

    keyed = ds.map_batches(_key, batch_format="pyarrow")

    def _fold(g: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.array([], pa.int64()) for c in
                          ("n_docs", "n_groups", "total_tokens",
                           "kept_tokens")})
        if g.num_rows == 0:
            return empty
        agg = pa.TableGroupBy(g, "text_md5").aggregate(
            [("doc_id", "min"), ("doc_id", "count"), ("nt", "sum")])
        agg = agg.rename_columns(["text_md5", "keep_id", "n", "nt_sum"])
        j = agg.join(g.select(["doc_id", "nt"]).rename_columns(
            ["keep_id", "kept_nt"]), "keep_id")
        return pa.table({
            "n_docs": pa.array([int(pc.sum(j["n"]).as_py())], pa.int64()),
            "n_groups": pa.array([j.num_rows], pa.int64()),
            "total_tokens": pa.array(
                [int(pc.sum(j["nt_sum"]).as_py() or 0)], pa.int64()),
            "kept_tokens": pa.array(
                [int(pc.sum(j["kept_nt"]).as_py() or 0)], pa.int64())})

    partials = partitionwise(keyed, _fold, "__key", num_parts)
    rows = partials.take_all()  # ≤ num_parts single-row partials
    n_docs = sum(r["n_docs"] for r in rows)
    n_kept = sum(r["n_groups"] for r in rows)
    total = sum(r["total_tokens"] for r in rows)
    kept = sum(r["kept_tokens"] for r in rows)
    frac = round(1.0 - kept / total, 6) if total else None
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_kept": pa.array([n_kept], pa.int64()),
        "n_dup_docs": pa.array([n_docs - n_kept], pa.int64()),
        "total_tokens": pa.array([total], pa.int64()),
        "kept_tokens": pa.array([kept], pa.int64()),
        "savings_frac": pa.array([frac], pa.float64())})


def pmi_bigrams(sf_dir: str, k: int = 20, min_count: int = 5,
                num_parts: int = DEFAULT_PARTS):
    """Top-k adjacent-token bigrams by PMI (collocation mining for
    tokenizer/vocab design): (bigram, cnt, pmi round 6) with
    pmi = ln((c_xy·T²)/(P·c_x·c_y)), T = token positions, P = bigram
    positions, gated on c_xy ≥ ``min_count``.

    Unigram + bigram count tables are one keyed shuffle each (vocab-bounded
    aggregates, materialized once — never the corpus).  The word-count
    attachment is adaptive: a vocab up to RENSA_RAY_PMI_BROADCAST_VOCAB
    (default 2M) rows is broadcast ONCE via ``ray.put`` and both counts
    attach in a single pure map (zero join shuffles); a larger vocab falls
    back to two union-mark-partition joins (the events join idiom, no
    broadcast).  The top-k is a bounded sort/limit over the min_count-gated
    survivors.
    """
    import ray.data as rd

    ds = _docs(sf_dir, ["text"])

    def _uni(b: pa.Table) -> pa.Table:
        cnt = _token_count_table(b, lower=True)
        key = fxhash64_bytes_list(
            [u.encode() for u in cnt["token"].to_pylist()])
        return pa.table({"token": cnt["token"],
                         "cnt": cnt["cnt"].cast(pa.int64()),
                         "__key": pa.array(key, pa.uint64())})

    def _big(b: pa.Table) -> pa.Table:
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64()),
                          "__key": pa.array([], pa.uint64())})
        toks = _tokens_list(b, lower=True)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).combine_chunks()
        pos = _ragged_gram_positions(lens, 2)
        if len(pos) == 0:
            return empty
        t = pa.table({"w1": flat.take(pa.array(pos, pa.int64())),
                      "w2": flat.take(pa.array(pos + 1, pa.int64()))})
        cnt = pa.TableGroupBy(t, ["w1", "w2"]).aggregate([("w1", "count")])
        cnt = cnt.rename_columns(["w1", "w2", "cnt"])
        key = fxhash64_bytes_list(
            [f"{a} {b_}".encode() for a, b_ in
             zip(cnt["w1"].to_pylist(), cnt["w2"].to_pylist())])
        return pa.table({"w1": cnt["w1"], "w2": cnt["w2"],
                         "cnt": cnt["cnt"].cast(pa.int64()),
                         "__key": pa.array(key, pa.uint64())})

    def _sum_tokens(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g, "token").aggregate([("cnt", "sum")])
        return agg.rename_columns(["token", "cnt"])

    def _sum_bigrams(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g, ["w1", "w2"]).aggregate([("cnt", "sum")])
        return agg.rename_columns(["w1", "w2", "cnt"])

    # vocab-bounded aggregate tables; materialized because each is consumed
    # more than once (totals + joins / gate) — never the raw corpus.  The
    # UNGATED bigram aggregate is materialized so P (ALL bigram positions)
    # folds from it directly: at 100 TB that is a few-hundred-GB object
    # store table vs a second full corpus tokenize pass — ~300× cheaper.
    uni = partitionwise(ds.map_batches(_uni, batch_format="pyarrow"),
                        _sum_tokens, "__key", num_parts).materialize()
    big_all = partitionwise(ds.map_batches(_big, batch_format="pyarrow"),
                            _sum_bigrams, "__key", num_parts).materialize()
    t_total = float(uni.sum("cnt") or 0)
    p_total = float(big_all.sum("cnt") or 0)
    # min_count gate BEFORE the joins: the survivors are tiny
    big = big_all.map_batches(
        lambda bt: bt.filter(pc.greater_equal(bt["cnt"], min_count)),
        batch_format="pyarrow")

    def _mark(word_col):
        def _m(bt: pa.Table) -> pa.Table:
            key = fxhash64_bytes_list(
                [w.encode() for w in bt[word_col].to_pylist()])
            return bt.append_column("__key", pa.array(key, pa.uint64()))
        return _m

    def _join_on(word_col: str, cnt_out: str):
        def _j(g: pa.Table) -> pa.Table:
            bigs = g.filter(pc.equal(g["side"], 0)).drop_columns(
                ["side", "ucnt"])
            unis = g.filter(pc.equal(g["side"], 1)).select(["word", "ucnt"])
            j = bigs.join(unis, "word")
            j = j.rename_columns(
                [cnt_out if c == "ucnt" else c for c in j.column_names])
            return j
        return _j

    def _as_union(big_ds, word_col, carry_cols):
        # mark bigram rows side=0 keyed by the join word; unigram side=1
        def _b(bt: pa.Table) -> pa.Table:
            cols = {"word": bt[word_col], "side": pa.array(
                np.zeros(len(bt), np.int8))}
            for c in carry_cols:
                cols[c] = bt[c]
            cols["ucnt"] = pa.array([None] * len(bt), pa.int64())
            t = pa.table(cols)
            key = fxhash64_bytes_list(
                [w.encode() for w in bt[word_col].to_pylist()])
            return t.append_column("__key", pa.array(key, pa.uint64()))

        def _u(bt: pa.Table) -> pa.Table:
            n = len(bt)
            cols = {"word": bt["token"],
                    "side": pa.array(np.ones(n, np.int8))}
            for c in carry_cols:
                typ = pa.int64() if c not in ("w1", "w2", "other") else pa.string()
                cols[c] = pa.array([None] * n, typ)
            cols["ucnt"] = bt["cnt"].cast(pa.int64())
            t = pa.table(cols)
            key = fxhash64_bytes_list(
                [w.encode() for w in bt["token"].to_pylist()])
            return t.append_column("__key", pa.array(key, pa.uint64()))

        return big_ds.map_batches(_b, batch_format="pyarrow").union(
            uni.map_batches(_u, batch_format="pyarrow"))

    import os

    import ray

    broadcast_max = int(os.environ.get("RENSA_RAY_PMI_BROADCAST_VOCAB",
                                       "2000000"))
    if uni.count() <= broadcast_max:
        # small-side broadcast: the whole unigram count table fits a
        # worker's heap, so ship it ONCE via ray.put and attach both word
        # counts in a single pure map — zero join shuffles
        parts = [bt for bt in uni.iter_batches(batch_format="pyarrow",
                                               batch_size=None)]
        vocab = pa.concat_tables(parts) if parts else pa.table(
            {"token": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64())})
        toks = vocab["token"].to_numpy(zero_copy_only=False).astype("U")
        cnts = vocab["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        vorder = np.argsort(toks)
        v_ref = ray.put((toks[vorder], cnts[vorder]))

        def _attach_and_score(bt: pa.Table) -> pa.Table:
            if bt.num_rows == 0:
                return pa.table({"bigram": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64()),
                                 "pmi": pa.array([], pa.float64())})
            vt, vc = ray.get(v_ref)
            w1 = bt["w1"].to_numpy(zero_copy_only=False).astype("U")
            w2 = bt["w2"].to_numpy(zero_copy_only=False).astype("U")
            i1 = np.minimum(np.searchsorted(vt, w1), len(vt) - 1)
            i2 = np.minimum(np.searchsorted(vt, w2), len(vt) - 1)
            # every bigram word comes from the same tokenization as the
            # vocab, so exact hits are an invariant — fail loud, not wrong
            if not ((vt[i1] == w1).all() and (vt[i2] == w2).all()):
                raise AssertionError("bigram word missing from vocab table")
            c1, c2 = vc[i1], vc[i2]
            cxy = np_col(bt, "cnt").astype(np.float64)
            pmi = np.round(np.log(((cxy * t_total) * t_total)
                                  / ((p_total * c1) * c2)), 6)
            bigram = pc.binary_join_element_wise(bt["w1"], bt["w2"], " ")
            return pa.table({"bigram": bigram,
                             "cnt": bt["cnt"].cast(pa.int64()),
                             "pmi": pa.array(pmi, pa.float64())})

        scored = big.map_batches(_attach_and_score, batch_format="pyarrow")
        return scored.sort(["pmi", "bigram"],
                           descending=[True, False]).limit(k)

    # large-vocab path: two union-mark-partition joins, no broadcast
    # join 1: attach c1 on w1 (bigram rows carry w2 + cnt)
    u1 = _as_union(big.map_batches(
        lambda bt: bt.select(["w1", "w2", "cnt"]), batch_format="pyarrow"),
        "w1", ["w2", "cnt"])
    j1 = partitionwise(u1, _join_on("w1", "c1"), "__key", num_parts)
    # join 2: attach c2 on w2 (rows now (word=w1, w2, cnt, c1))
    j1 = j1.map_batches(
        lambda bt: bt.rename_columns(
            ["w1" if c == "word" else c for c in bt.column_names]),
        batch_format="pyarrow")
    u2 = _as_union(j1, "w2", ["w1", "cnt", "c1"])
    j2 = partitionwise(u2, _join_on("w2", "c2"), "__key", num_parts)

    def _pmi(bt: pa.Table) -> pa.Table:
        if bt.num_rows == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "pmi": pa.array([], pa.float64())})
        cxy = np_col(bt, "cnt").astype(np.float64)
        c1 = np_col(bt, "c1").astype(np.float64)
        c2 = np_col(bt, "c2").astype(np.float64)
        # association mirrors the oracle SQL exactly:
        # ((cxy*T)*T) / ((P*c1)*c2)
        pmi = np.round(np.log(((cxy * t_total) * t_total)
                              / ((p_total * c1) * c2)), 6)
        bigram = pc.binary_join_element_wise(bt["w1"], bt["word"], " ")
        return pa.table({"bigram": bigram,
                         "cnt": bt["cnt"].cast(pa.int64()),
                         "pmi": pa.array(pmi, pa.float64())})

    scored = j2.map_batches(_pmi, batch_format="pyarrow")
    return scored.sort(["pmi", "bigram"], descending=[True, False]).limit(k)


def top_tokens_approx(sf_dir: str, k: int = 20, capacity: int = 4096):
    """Shuffle-FREE heavy-hitter top-k: (token, cnt, exact) — the single-pass
    alternative to ``top_tokens`` for corpora whose vocabulary is too large
    to shuffle (100 TB webtext ~ 10⁹ distinct tokens).

    Each block folds to an exact Arrow groupby then truncates to its
    ``capacity`` highest counts with a SpaceSaving-style overcount bound
    (kernels.freq.HeavyHitterSummary); the driver merges the bounded
    summaries (blocks × capacity rows max).  ``cnt`` is a lower bound;
    ``exact`` is True when the entry's top-k rank is GUARANTEED (its count
    beats every contender's upper bound) — with the default capacity this
    is exact on any corpus whose top-k tokens are not pathologically flat.
    """
    from ..kernels.freq import HeavyHitterSummary

    ds = _docs(sf_dir, ["text"])

    def _block_summary(b: pa.Table) -> pa.Table:
        cnt = _token_count_table(b)
        s = HeavyHitterSummary.from_exact_counts(
            capacity,
            np.asarray(cnt["token"].to_pylist(), object),
            cnt["cnt"].to_numpy(zero_copy_only=False))
        # ONE row per summary (list columns): Ray freely coalesces the tiny
        # per-batch outputs of a fused read→map task into a single block, so
        # a flat (token, cnt, err) layout would concatenate summaries and
        # lose their err boundaries — rows survive coalescing intact
        return pa.table({
            "tokens": pa.array([s.tokens.tolist()], pa.list_(pa.string())),
            "cnts": pa.array([s.counts.tolist()], pa.list_(pa.int64())),
            "err": pa.array([s.err], pa.int64())})

    merged: HeavyHitterSummary | None = None
    # summaries are ≤ capacity tokens each; the driver fold is bounded by
    # batches × capacity, the same budget class as the HLL register fold
    for blk in ds.map_batches(_block_summary, batch_format="pyarrow"
                              ).iter_batches(batch_format="pyarrow",
                                             batch_size=None):
        for i in range(blk.num_rows):
            s = HeavyHitterSummary(
                capacity,
                np.asarray(blk["tokens"][i].as_py(), object),
                np.asarray(blk["cnts"][i].as_py(), np.int64),
                err=int(blk["err"][i].as_py()))
            merged = s if merged is None else merged.merge(s)
    if merged is None:
        return pa.table({"token": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64()),
                         "exact": pa.array([], pa.bool_())})
    toks, cnts, exact = merged.topk(k)
    return pa.table({"token": pa.array(toks.tolist(), pa.string()),
                     "cnt": pa.array(cnts, pa.int64()),
                     "exact": pa.array(exact, pa.bool_())})


def events_value_quantiles_approx(sf_dir: str, qs=(0.5, 0.9, 0.99),
                                  base: float = 1.01):
    """Approximate quantiles of the float ``events.value`` column with a
    GUARANTEED relative error ≤ base-1 (1% default) in magnitude: one row
    (p50, p90, p99).  Negative values are first-class (the sketch keeps a
    mirrored bucket bank per sign), so e.g. refund-style event streams
    don't crash the lane.

    The scale path for quantiles over unbounded float columns, where the
    exact value-histogram fold (``length_percentiles``) would blow up on
    distinct values: each block folds into a fixed log-bucketed register
    vector (kernels.freq.LogBucketSketch), merged shuffle-free by vector
    add exactly like the HLL lane.
    """
    import ray.data as rd

    from ..kernels.freq import LogBucketSketch

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def _block(b: pa.Table) -> pa.Table:
        s = LogBucketSketch(base=base)
        v = np_col(b, "value").astype(np.float64)
        s.add(v[~np.isnan(v)])
        return pa.table({"regs": pa.array([s.counts], pa.list_(pa.int64()))})

    total = LogBucketSketch(base=base)
    for blk in ds.map_batches(_block, batch_format="pyarrow"
                              ).iter_batches(batch_format="pyarrow",
                                             batch_size=None):
        for regs in blk["regs"].to_pylist():
            total = total.merge(LogBucketSketch(
                base=base, counts=np.asarray(regs, np.int64)))
    return pa.table({f"p{int(q * 100)}": pa.array([total.quantile(q)],
                                                  pa.float64())
                     for q in qs})


def events_sliding_window(sf_dir: str, window_minutes: int = 60,
                          num_parts: int = DEFAULT_PARTS):
    """Trailing-window event count per event: (event_id, n_window) = how
    many events the SAME user produced in [ts - window, ts] inclusive —
    the standard burst/velocity feature (fraud scoring, rate limiting).

    SQL frame semantics (``RANGE ... PRECEDING AND CURRENT ROW``): peers
    with the exact same timestamp count regardless of row order, so the
    result is order-free.  One user-keyed shuffle; inside each partition
    the whole window family is two vectorized searchsorteds on a
    user-offset timeline (no per-user Python loop): user segments are
    shifted apart by more than span+window so no window can cross users.
    """
    ds = _events(sf_dir, ["event_id", "user_id", "ts"])
    w_us = np.int64(window_minutes) * 60 * 1_000_000

    def _win(g: pa.Table) -> pa.Table:
        uid = np_col(g, "user_id")
        eid = np_col(g, "event_id")
        ts = g["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        if len(uid) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"event_id": z, "n_window": z})
        order = np.lexsort((ts, uid))
        u_s, t_s, e_s = uid[order], ts[order], eid[order]
        new_user = np.ones(len(u_s), bool)
        new_user[1:] = u_s[1:] != u_s[:-1]
        gid = np.cumsum(new_user) - 1
        t0 = t_s - t_s.min()
        stride = np.int64(t0.max()) + w_us + 1
        n_users = int(gid[-1]) + 1
        if n_users * int(stride) < np.iinfo(np.int64).max // 2:
            # vectorized path: disjoint per-user timelines on one axis
            adj = t0 + gid * stride
            hi = np.searchsorted(adj, adj, side="right")
            lo = np.searchsorted(adj, adj - w_us, side="left")
            n = (hi - lo).astype(np.int64)
        else:  # pathological span × user-count: per-segment fallback
            n = np.empty(len(u_s), np.int64)
            starts = np.flatnonzero(new_user)
            bounds = np.append(starts, len(u_s))
            for s, e in zip(starts, bounds[1:]):
                seg = t_s[s:e]
                n[s:e] = (np.searchsorted(seg, seg, side="right")
                          - np.searchsorted(seg, seg - w_us, side="left"))
        return pa.table({"event_id": pa.array(e_s, pa.int64()),
                         "n_window": pa.array(n)})

    return partitionwise(ds, _win, "user_id", num_parts)


def train_val_test_split(sf_dir: str):
    """Deterministic hash split assignment: (doc_id, split) with split ∈
    {train, val, test} at ≈80/10/10 by the first byte of md5(doc_id) —
    train < 0xcc (204/256), val < 0xe6 (230/256), else test.

    Hash-of-id (not RNG) so the assignment is stable across runs, engines,
    partitionings and corpus growth — adding documents never reassigns an
    existing one, the property a 100-TB incremental pipeline needs.  Pure
    per-batch map, zero shuffles.
    """
    ds = _docs(sf_dir, ["doc_id"])

    def _assign(b: pa.Table) -> pa.Table:
        ids = np_col(b, "doc_id")
        # the shared md5 convention (== DuckDB md5()) — one definition to
        # audit, like _content_key
        byte0 = np.fromiter(
            (int(h[:2], 16) for h in md5_hex([str(i) for i in ids])),
            np.int64, len(ids))
        split = np.where(byte0 < 204, "train",
                         np.where(byte0 < 230, "val", "test"))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "split": pa.array(split.tolist(), pa.string())})

    return ds.map_batches(_assign, batch_format="pyarrow")


def strip_boilerplate_lines(sf_dir: str, min_docs: int = 3,
                            num_parts: int = DEFAULT_PARTS):
    """CCNet-style per-source boilerplate removal: a line occurring in ≥
    ``min_docs`` DISTINCT documents of the SAME source (nav bars, cookie
    banners, footers) is stripped from every document of that source;
    documents left with zero lines drop out.  Output (doc_id, text).

    Two keyed shuffles, both streaming: explode to (doc_id, source,
    line_no, line) keyed on fxhash64(source, line) — distinct-doc df per
    (source, line) is computed with all of a line's rows co-located
    (grouping inside the partition is by the full (source, line) strings,
    so hash collisions cannot merge distinct lines) — then reassemble the
    surviving lines per doc_id.  Line content crosses the wire once per
    stage and the df table is never driver-side state.
    """
    ds = _docs(sf_dir, ["doc_id", "source", "text"])

    def _explode(b: pa.Table) -> pa.Table:
        ids = np_col(b, "doc_id")
        srcs = ["" if s is None else s for s in b["source"].to_pylist()]
        texts = b["text"].to_pylist()
        lines_per = [("" if t is None else t).split("\n") for t in texts]
        n_lines = np.fromiter((len(ls) for ls in lines_per), np.int64,
                              len(texts))
        flat = [ln for ls in lines_per for ln in ls]
        did = np.repeat(ids, n_lines)
        src_rep = np.repeat(np.asarray(srcs, object), n_lines)
        starts = np.cumsum(n_lines) - n_lines
        line_no = (np.arange(len(flat), dtype=np.int64)
                   - np.repeat(starts, n_lines))
        key = fxhash64_bytes_list(
            [f"{s}\x00{ln}".encode("utf-8")
             for s, ln in zip(src_rep, flat)])
        return pa.table({"doc_id": pa.array(did, pa.int64()),
                         "source": pa.array(src_rep.tolist(), pa.string()),
                         "line_no": pa.array(line_no, pa.int64()),
                         "line": pa.array(flat, pa.string()),
                         "__key": pa.array(key, pa.uint64())})

    exploded = ds.map_batches(_explode, batch_format="pyarrow")

    def _df_filter(g: pa.Table) -> pa.Table:
        # distinct-doc count per (source, line); a doc repeating the same
        # line twice counts once
        dis = pa.TableGroupBy(
            g.select(["source", "line", "doc_id"]),
            ["source", "line", "doc_id"]).aggregate([]).group_by(
            ["source", "line"]).aggregate([("doc_id", "count")])
        dis = dis.rename_columns(["source", "line", "df"])
        j = g.join(dis, ["source", "line"])
        keep = j.filter(pc.less(j["df"], min_docs))
        return keep.select(["doc_id", "line_no", "line"])

    survivors = partitionwise(exploded, _df_filter, "__key", num_parts)

    def _reassemble(g: pa.Table) -> pa.Table:
        ids = np_col(g, "doc_id")
        no = np_col(g, "line_no")
        line = g["line"].to_numpy(zero_copy_only=False)
        order = np.lexsort((no, ids))
        ids_s, line_s = ids[order], line[order]
        newdoc = np.ones(len(ids_s), bool)
        newdoc[1:] = ids_s[1:] != ids_s[:-1]
        starts = np.flatnonzero(newdoc)
        bounds = np.append(starts, len(ids_s))
        texts = ["\n".join(line_s[s:e])
                 for s, e in zip(bounds[:-1], bounds[1:])]
        return pa.table({"doc_id": pa.array(ids_s[starts], pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return partitionwise(survivors, _reassemble, "doc_id", num_parts)


def source_token_kl(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Per-source token-distribution divergence from the corpus:
    (source, n_tokens, kl round 6) with KL(P_source ‖ P_corpus) over
    lowercased whitespace unigrams — the mixing diagnostic that flags a
    source whose language model would be over/under-served by uniform
    sampling (0 = indistinguishable from the corpus mix).

    One token-keyed shuffle: with every (source, token) row co-located per
    token, the partition computes corpus counts C_t locally and emits one
    partial (source, Σ c·ln(c/C_t), Σ c) row pair per source; the identity
    KL_s = (1/N_s)·Σ_t c_st·ln(c_st/C_t) − ln(N_s) + ln(N) turns the
    global totals into a tiny final source-level fold (drivers see bytes,
    never tokens).
    """
    ds = _docs(sf_dir, ["source", "text"])

    def _counts(b: pa.Table) -> pa.Table:
        srcs = pc.fill_null(b["source"], "")
        toks = _tokens_list(b, lower=True)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        src_rep = np.repeat(srcs.to_numpy(zero_copy_only=False), lens)
        tbl = pa.table({"source": pa.array(src_rep.tolist(), pa.string()),
                        "token": flat})
        tbl = tbl.filter(pc.not_equal(tbl["token"], ""))
        cnt = pa.TableGroupBy(tbl, ["source", "token"]).aggregate(
            [("token", "count")]).rename_columns(["source", "token", "c"])
        key = fxhash64_bytes_list(
            [t.encode("utf-8") for t in cnt["token"].to_pylist()])
        return cnt.append_column("__key", pa.array(key, pa.uint64()))

    combined = ds.map_batches(_counts, batch_format="pyarrow")

    def _partial(g: pa.Table) -> pa.Table:
        # fold duplicate (source, token) rows from different map batches
        cnt = pa.TableGroupBy(g, ["source", "token"]).aggregate(
            [("c", "sum")]).rename_columns(["source", "token", "c"])
        ct = pa.TableGroupBy(cnt, "token").aggregate(
            [("c", "sum")]).rename_columns(["token", "ct"])
        j = cnt.join(ct, "token")
        c = np_col(j, "c").astype(np.float64)
        ct_v = np_col(j, "ct").astype(np.float64)
        term = c * np.log(c / ct_v)
        t2 = pa.table({"source": j["source"],
                       "a": pa.array(term, pa.float64()),
                       "n": pa.array(c, pa.float64())})
        return pa.TableGroupBy(t2, "source").aggregate(
            [("a", "sum"), ("n", "sum")]).rename_columns(
            ["source", "a", "n"])

    partials = partitionwise(combined, _partial, "__key", num_parts)
    rows = partials.take_all()  # ≤ num_parts × n_sources rows — bounded
    agg: dict[str, list[float]] = {}
    for r in rows:
        a, n = agg.setdefault(r["source"], [0.0, 0.0])
        agg[r["source"]] = [a + r["a"], n + r["n"]]
    big_n = sum(v[1] for v in agg.values())
    out = sorted(agg.items())
    return pa.table({
        "source": pa.array([s for s, _ in out], pa.string()),
        "n_tokens": pa.array([int(v[1]) for _, v in out], pa.int64()),
        "kl": pa.array([round(v[0] / v[1] - np.log(v[1]) + np.log(big_n), 6)
                        if v[1] else 0.0 for _, v in out], pa.float64())})


def doc_unigram_logprob(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Per-doc mean token log-probability under the corpus unigram LM:
    (doc_id, n_tokens, mean_logprob round 6) with
    mean_logprob = (1/n) * sum_i ln(c(tok_i) / T), c = corpus count of the
    token, T = total corpus tokens.  The classic perplexity-proxy quality
    filter (CCNet-style LM scoring with the corpus itself as the LM): docs
    of common fluent vocabulary score high, gibberish / rare-token spam
    scores low.  No smoothing is needed — every scored token is in the LM's
    own training corpus by construction.

    Plan (same one-keyed-shuffle shape as ``doc_tfidf``): the explode stage
    emits per-batch (doc_id, token, tf) partials; a token-hash partition
    co-locates every row of a token so the corpus count c and each doc's
    partial sum tf*ln(c) are computed in-partition; a tiny doc-keyed pass
    folds partials and subtracts ln(T).  T itself is one streaming counting
    pass (scalar result) — nothing materializes.
    """
    from .common import explode_doc_token_tf

    ds = _docs(sf_dir, ["doc_id", "text"])
    total = int(total_token_count(sf_dir)["total_tokens"][0].as_py())

    exploded = ds.map_batches(explode_doc_token_tf, batch_format="pyarrow")

    def _partial(g: pa.Table) -> pa.Table:
        # re-sum split (doc, token) partials, then the corpus count per
        # token is complete inside this partition by construction
        tf = pa.TableGroupBy(g, ["doc_id", "token"]).aggregate(
            [("tf", "sum")]).rename_columns(["doc_id", "token", "tf"])
        c_t = pa.TableGroupBy(tf, "token").aggregate(
            [("tf", "sum")]).rename_columns(["token", "c"])
        j = tf.join(c_t, "token")
        tfv = np_col(j, "tf").astype(np.float64)
        s = tfv * np.log(np_col(j, "c").astype(np.float64))
        t2 = pa.table({"doc_id": j["doc_id"],
                       "s": pa.array(s, pa.float64()),
                       "nt": pa.array(tfv, pa.float64())})
        return pa.TableGroupBy(t2, "doc_id").aggregate(
            [("s", "sum"), ("nt", "sum")]).rename_columns(
            ["doc_id", "s", "nt"])

    partial = partitionwise(exploded, _partial, "__key", num_parts)
    ln_t = float(np.log(float(total))) if total else 0.0

    def _per_doc(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g, "doc_id").aggregate(
            [("s", "sum"), ("nt", "sum")]).rename_columns(
            ["doc_id", "s", "nt"])
        s = np_col(agg, "s").astype(np.float64)
        n = np_col(agg, "nt").astype(np.float64)
        return pa.table({
            "doc_id": agg["doc_id"],
            "n_tokens": agg["nt"].cast(pa.int64()),
            # floor(x·1e6 + 0.5) on BOTH sides (repo oracle convention):
            # numpy half-even and DuckDB round() disagree on half boundaries
            "mean_logprob": pa.array(
                np.floor((s / n - ln_t) * 1e6 + 0.5) / 1e6, pa.float64())})

    return partitionwise(partial, _per_doc, "doc_id", num_parts)


def dup_cluster_size_histogram(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Exact-duplicate cluster-size distribution: (group_size, n_groups,
    n_docs) over ALL content groups including singletons — the one-page
    corpus-duplication profile (how much of the corpus sits in 2-copy vs
    1000-copy clusters) that decides which dedup tier pays for itself.

    One content-key shuffle computes global group sizes (all rows of a text
    co-located), each partition folds to a tiny per-size histogram partial,
    and a builtin groupby sums the ≤ parts x sizes partial rows.
    """
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _with_md5, batch_format="pyarrow")

    def _sizes(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g, "text_md5").aggregate(
            [("doc_id", "count")]).rename_columns(["text_md5", "n"])
        h = pa.TableGroupBy(agg, "n").aggregate(
            [("text_md5", "count")]).rename_columns(["group_size", "n_groups"])
        sz = np_col(h, "group_size").astype(np.int64)
        ng = np_col(h, "n_groups").astype(np.int64)
        return pa.table({"group_size": pa.array(sz, pa.int64()),
                         "n_groups": pa.array(ng, pa.int64()),
                         "n_docs": pa.array(sz * ng, pa.int64())})

    part = partitionwise(ds, _sizes, "__key", num_parts)
    return part.groupby("group_size").aggregate(
        Sum("n_groups", alias_name="n_groups"),
        Sum("n_docs", alias_name="n_docs"))


def weighted_sample_by_quality(sf_dir: str, k: int = 50):
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis A-Res): the k docs with the largest priority u^(1/w), where
    w = max(n_chars, 1) is the quality weight and u in (0, 1] is derived
    from md5(text) — not an RNG — so the SAME sample comes back at any
    cluster size, any partitioning, and any engine.  The standard
    quality-weighted corpus subsample for training-mix assembly.

    Each block keeps only its local top-k candidates (bounded numpy
    argpartition), so the final sort+limit sees at most blocks x k rows,
    never the corpus.
    """
    ds = _docs(sf_dir, ["doc_id", "text", "n_chars"])

    def _pri(b: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in b["text"].to_pylist()]
        md5s = md5_hex(texts)
        # first 15 hex chars = 60 bits; +1 keeps u strictly positive
        v = np.array([int(m[:15], 16) for m in md5s], np.float64)
        u = (v + 1.0) / float(1 << 60)
        w = np.maximum(np_col(b, "n_chars").astype(np.float64), 1.0)
        pri = u ** (1.0 / w)
        # local selection must apply the GLOBAL tie rule (pri desc, doc_id
        # asc): a plain argpartition keeps an arbitrary k among equal
        # priorities (exact-duplicate texts), silently dropping the
        # smallest doc_ids and making the sample partitioning-dependent
        ids = np_col(b, "doc_id")
        keep = (np.lexsort((ids, -pri))[:k] if len(pri) > k
                else np.arange(len(pri)))
        return pa.table({
            "doc_id": pa.array(np_col(b, "doc_id")[keep], pa.int64()),
            "n_chars": pa.array(np_col(b, "n_chars")[keep], pa.int64()),
            "__pri": pa.array(pri[keep], pa.float64())})

    top = ds.map_batches(_pri, batch_format="pyarrow").sort(
        ["__pri", "doc_id"], descending=[True, False]).limit(k)
    return top.drop_columns(["__pri"])


def source_shingle_jaccard(sf_dir: str, ngram_size: int = 3,
                           num_parts: int = DEFAULT_PARTS):
    """Source-pair corpus similarity: exact Jaccard between the DISTINCT
    n-gram shingle sets of every source pair → (source_a < source_b,
    jaccard round 6), zero-overlap pairs omitted.  The corpus-mix
    diagnostic ("how redundant are these two crawls?") that decides
    whether a cross-corpus dedup pass pays for itself before any doc-level
    work runs.

    One shingle-keyed shuffle: each partition dedupes (shingle, source),
    folds per-source distinct-count partials and per-pair co-count
    partials (a shingle's full source set is co-located, so pair emission
    is bounded by source cardinality, never doc count); the driver folds
    parts × (sources + pairs) tiny rows.  Intended for LOW-cardinality
    source sets (corpus mixes — the driver fold is O(parts × sources²));
    at domain cardinality use ``cross_source_overlap``'s content-key
    formulation instead.
    """
    from ..kernels.shingle import batch_shingle_hashes
    from .common import pairs_within_runs

    ds = _docs(sf_dir, ["source", "text"])

    def _explode(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["source"]))
        texts = ["" if t is None else t for t in b["text"].to_pylist()]
        hashes, offsets = batch_shingle_hashes(texts, ngram_size)
        src = np.repeat(b["source"].to_numpy(zero_copy_only=False),
                        offsets[1:] - offsets[:-1])
        if len(hashes) == 0:
            return pa.table({"shingle": pa.array([], pa.uint64()),
                             "source": pa.array([], pa.string())})
        order = np.lexsort((src, hashes))
        h_s, s_s = hashes[order], src[order]
        keep = np.ones(len(h_s), bool)
        keep[1:] = (h_s[1:] != h_s[:-1]) | (s_s[1:] != s_s[:-1])
        return pa.table({"shingle": pa.array(h_s[keep], pa.uint64()),
                         "source": pa.array(s_s[keep], pa.string())})

    exploded = ds.map_batches(_explode, batch_format="pyarrow")

    def _fold(g: pa.Table) -> pa.Table:
        empty = pa.table({"source_a": pa.array([], pa.string()),
                          "source_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        sh = np_col(g, "shingle").astype(np.uint64)
        src = g["source"].to_numpy(zero_copy_only=False)
        if len(sh) == 0:
            return empty
        # cross-batch duplicates of (shingle, source) — dedupe, then each
        # shingle's run holds its distinct sources in sorted order
        order = np.lexsort((src, sh))
        sh_s, src_s = sh[order], src[order]
        keep = np.ones(len(sh_s), bool)
        keep[1:] = (sh_s[1:] != sh_s[:-1]) | (src_s[1:] != src_s[:-1])
        sh_d, src_d = sh_s[keep], src_s[keep]
        su, sc = np.unique(src_d, return_counts=True)
        parts = [pa.table({"source_a": pa.array(su, pa.string()),
                           "source_b": pa.array([None] * len(su), pa.string()),
                           "n": pa.array(sc, pa.int64())})]
        runs = np.ones(len(sh_d), bool)
        runs[1:] = sh_d[1:] != sh_d[:-1]
        rcounts = np.bincount(np.cumsum(runs) - 1)
        ii, jj = pairs_within_runs(rcounts)
        if len(ii):
            co = pa.TableGroupBy(
                pa.table({"source_a": pa.array(src_d[ii], pa.string()),
                          "source_b": pa.array(src_d[jj], pa.string())}),
                ["source_a", "source_b"]).aggregate(
                [("source_a", "count")]).rename_columns(
                ["source_a", "source_b", "n"])
            parts.append(co)
        return pa.concat_tables(parts)

    rows = partitionwise(exploded, _fold, "shingle", num_parts).take_all()
    sizes: dict[str, int] = {}
    co: dict[tuple[str, str], int] = {}
    for r in rows:
        if r["source_b"] is None:
            sizes[r["source_a"]] = sizes.get(r["source_a"], 0) + int(r["n"])
        else:
            k = (r["source_a"], r["source_b"])
            co[k] = co.get(k, 0) + int(r["n"])
    keys = sorted(co)
    return pa.table({
        "source_a": pa.array([k[0] for k in keys], pa.string()),
        "source_b": pa.array([k[1] for k in keys], pa.string()),
        "jaccard": pa.array(
            [round(co[k] / (sizes[k[0]] + sizes[k[1]] - co[k]), 6)
             for k in keys], pa.float64())})


def source_report(sf_dir: str, num_parts: int = DEFAULT_PARTS):
    """Per-source corpus report card: (source, n_docs, n_unique_texts,
    dup_frac round 6, mean_n_chars round 2) — the one-page health summary
    a mix owner reads before deciding which source needs which dedup tier.

    One content-key shuffle (the exact-dup family's) computes per-source
    distinct-text partials alongside doc counts and char sums inside the
    same partition kernel; a builtin groupby folds the ≤ parts × sources
    partial rows.  NULL-source docs are excluded (no owner to report to).
    """
    from ray.data.aggregate import Sum

    def _key(batch: pa.Table) -> pa.Table:
        return _content_key(batch.filter(pc.is_valid(batch["source"])),
                            ("source", "n_chars"))

    ds = _docs(sf_dir, ["source", "text", "n_chars"]).map_batches(
        _key, batch_format="pyarrow")

    def _partial(g: pa.Table) -> pa.Table:
        # all rows of a text are co-located: distinct (text, source) counts
        # are complete in-partition; docs/chars sum anywhere
        if g.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_unique_texts": pa.array([], pa.int64()),
                             "sum_chars": pa.array([], pa.int64())})
        uniq = pa.TableGroupBy(g, ["source", "text_md5"]).aggregate(
            [("text_md5", "count")]).rename_columns(
            ["source", "text_md5", "cnt"])
        per_src = pa.TableGroupBy(uniq, "source").aggregate(
            [("text_md5", "count"), ("cnt", "sum")]).rename_columns(
            ["source", "n_unique_texts", "n_docs"])
        chars = pa.TableGroupBy(g, "source").aggregate(
            [("n_chars", "sum")]).rename_columns(["source", "sum_chars"])
        j = per_src.join(chars, "source")
        return j.select(["source", "n_docs", "n_unique_texts", "sum_chars"])

    part = partitionwise(ds, _partial, "__key", num_parts)
    folded = part.groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_unique_texts", alias_name="n_unique_texts"),
        Sum("sum_chars", alias_name="sum_chars"))

    def _final(b: pa.Table) -> pa.Table:
        nd = np_col(b, "n_docs").astype(np.float64)
        nu = np_col(b, "n_unique_texts").astype(np.float64)
        sc = np_col(b, "sum_chars").astype(np.float64)
        # floor(x·10^k + 0.5)/10^k instead of round(): integer-ratio means
        # land exactly on half boundaries, where numpy (half-even) and
        # DuckDB (half-away) disagree — the same single expression on both
        # sides is boundary-rule-free
        dup = np.floor((1.0 - nu / nd) * 1e6 + 0.5) / 1e6
        mean = np.floor(sc / nd * 100 + 0.5) / 100
        return pa.table({
            "source": b["source"],
            "n_docs": b["n_docs"].cast(pa.int64()),
            "n_unique_texts": b["n_unique_texts"].cast(pa.int64()),
            "dup_frac": pa.array(dup, pa.float64()),
            "mean_n_chars": pa.array(mean, pa.float64())})

    return folded.map_batches(_final, batch_format="pyarrow")


def doc_ngram_novelty(sf_dir: str, ngram_size: int = 3,
                      num_parts: int = DEFAULT_PARTS):
    """Per-doc n-gram novelty: (doc_id, n_grams, novel_frac round 6) where
    novel_frac is the fraction of the doc's DISTINCT n-grams whose
    corpus-wide first appearance (minimum doc_id) is this doc — the
    contribution-to-corpus signal that attributes dedup savings per doc
    (a doc of all-novel grams is irreplaceable; near-zero novelty means
    everything it says arrived earlier).

    Two keyed shuffles: the shingle-hash partition holds each gram's full
    posting list, so the first-appearance doc and per-doc (novel, total)
    partials are computed in-partition; a doc-keyed fold sums partials.
    Grams ride as 64-bit shingle hashes (the 2⁻⁶⁴ collision class every
    shingle lane shares).
    """
    from .simjoin import _explode_distinct_shingles

    ds = _docs(sf_dir, ["doc_id", "text"])
    exploded = ds.map_batches(
        lambda b: _explode_distinct_shingles(b, ngram_size),
        batch_format="pyarrow")

    def _first(g: pa.Table) -> pa.Table:
        from .common import run_ids

        z = pa.array([], pa.int64())
        if g.num_rows == 0:
            return pa.table({"doc_id": z, "novel": z, "cnt": z})
        sh = np_col(g, "shingle").astype(np.uint64)
        ids = np_col(g, "doc_id")
        # sort each gram's run by doc id: the run head is the first
        # appearance (explode emits one row per DISTINCT (doc, gram))
        order, gid, counts = run_ids(sh, ids.astype(np.uint64),
                                     n_group_keys=1)
        ids_s = ids[order]
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        novel = np.zeros(len(ids_s), np.int64)
        novel[starts] = 1
        per_doc = pa.TableGroupBy(
            pa.table({"doc_id": pa.array(ids_s, pa.int64()),
                      "novel": pa.array(novel, pa.int64()),
                      "cnt": pa.array(np.ones(len(ids_s), np.int64))}),
            "doc_id").aggregate([("novel", "sum"), ("cnt", "sum")])
        return per_doc.rename_columns(["doc_id", "novel", "cnt"])

    partial = partitionwise(exploded, _first, "shingle", num_parts)

    def _fold(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g, "doc_id").aggregate(
            [("novel", "sum"), ("cnt", "sum")]).rename_columns(
            ["doc_id", "novel", "cnt"])
        nv = np_col(agg, "novel").astype(np.float64)
        ct = np_col(agg, "cnt").astype(np.float64)
        # floor(x·1e6 + 0.5), not round(): integer ratios land exactly on
        # half boundaries where numpy and DuckDB rounding rules differ
        frac = np.floor(nv / ct * 1e6 + 0.5) / 1e6
        return pa.table({"doc_id": agg["doc_id"],
                         "n_grams": agg["cnt"].cast(pa.int64()),
                         "novel_frac": pa.array(frac, pa.float64())})

    return partitionwise(partial, _fold, "doc_id", num_parts)
