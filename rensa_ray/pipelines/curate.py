"""Composed training-data curation pipeline over the documents schema.

The end-to-end shape a 100 TB pretraining-data job takes:

    read → language filter → quality filter (heuristics)
         → exact dedup (content-hash keep-min)
         → near dedup (MinHash-LSH clusters, keep cluster representative)
         → write curated corpus + per-stage counts

Every stage is a streaming Dataset transform; the only all-to-alls are the
exact-dedup key shuffle and the near-dup band/label shuffles from
pipelines.dedup.  Returns (curated_ds, stats dict) — stats carries the
per-stage surviving-row counts a production run would emit as metrics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textstats import content_hash_u64, quality_scores
from .common import np_col, partitionwise, run_ids
from .dedup import DedupConfig, near_dup_clusters


def quality_filter(ds, text_col: str = "text", min_words: int = 10,
                   max_words: int = 100_000, min_alnum_ratio: float = 0.2):
    """Heuristic quality gate (word count bounds + alphanumeric ratio)."""

    def _gate(b: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in b[text_col].to_pylist()]
        qs = quality_scores(texts)
        keep = ((qs["word_count"] >= min_words)
                & (qs["word_count"] <= max_words)
                & (qs["alnum_ratio"] >= min_alnum_ratio))
        return b.filter(pa.array(keep))

    return ds.map_batches(_gate, batch_format="pyarrow")


def lang_filter(ds, langs: tuple[str, ...] = ("en",), lang_col: str = "lang"):
    return ds.map_batches(
        lambda b: b.filter(pc.is_in(b[lang_col], value_set=pa.array(langs))),
        batch_format="pyarrow")


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                num_parts: int = 32):
    """Keep the min-id row per distinct text (content-hash shuffle).

    Hash collisions (2⁻⁶⁴) can only drop a unique doc, never corrupt output.
    """

    def _key(b: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in b[text_col].to_pylist()]
        return b.append_column("__ch", pa.array(content_hash_u64(texts),
                                                pa.uint64()))

    keyed = ds.map_batches(_key, batch_format="pyarrow")

    def _keep_min(g: pa.Table) -> pa.Table:
        ch = np_col(g, "__ch").astype(np.uint64)
        ids = np_col(g, id_col)
        order, gid, counts = run_ids(ch, ids.astype(np.uint64), n_group_keys=1)
        first = np.zeros(len(gid), bool)
        if len(gid):
            first[0] = True
            first[1:] = gid[1:] != gid[:-1]
        keep_rows = np.sort(order[first])
        return g.take(pa.array(keep_rows)).drop_columns(["__ch"])

    return partitionwise(keyed, _keep_min, "__ch", num_parts)


def near_dedup_keep_best(ds, cfg: DedupConfig | None = None, scores_ds=None):
    """Quality-aware near-dedup: keep the highest-scoring doc per near-dup
    cluster instead of the min-id representative (ties → min doc_id).

    ``scores_ds`` is an optional (id_col, score:float64) dataset; by default
    the score is the doc's word count (longer near-dups usually carry the
    full article, shorter ones a teaser/boilerplate fragment).  Returns the
    kept (doc_id,) set.

    The input is materialized once because it feeds two DAG branches
    (clusters + scores) — the double-consumption hazard pipelines.dedup
    documents.  At scale, pass a parquet-backed ds and a precomputed
    ``scores_ds`` so both branches are independent reads instead.
    """
    cfg = cfg or DedupConfig()
    if scores_ds is None:
        ds = ds.materialize()
    clusters = near_dup_clusters(ds, cfg)
    if scores_ds is None:
        def _wc(b: pa.Table) -> pa.Table:
            texts = ["" if t is None else t for t in b[cfg.text_col].to_pylist()]
            qs = quality_scores(texts)
            return pa.table({cfg.id_col: b[cfg.id_col],
                             "score": pa.array(qs["word_count"].astype(np.float64))})

        scores_ds = ds.map_batches(_wc, batch_format="pyarrow")

    # Merge (doc_id → cluster_id, score) without a join operator: tag each
    # side with sentinel columns, union, and pivot inside one doc_id-keyed
    # partitionwise pass (the same fused-join idiom webdedup uses).
    def _tag_cluster(b: pa.Table) -> pa.Table:
        # -inf sentinel, NOT -1.0: caller scores may be arbitrarily negative
        # (perplexities / log-likelihoods), and the maximum.at pivot must
        # never clamp a real score
        return pa.table({cfg.id_col: b[cfg.id_col],
                         "cluster_id": b["cluster_id"],
                         "score": pa.array(np.full(b.num_rows, -np.inf),
                                           pa.float64())})

    def _tag_score(b: pa.Table) -> pa.Table:
        return pa.table({cfg.id_col: b[cfg.id_col],
                         "cluster_id": pa.array(np.full(b.num_rows, -1, np.int64)),
                         "score": b["score"].cast(pa.float64())})

    both = (clusters.map_batches(_tag_cluster, batch_format="pyarrow")
            .union(scores_ds.map_batches(_tag_score, batch_format="pyarrow")))

    def _pivot(g: pa.Table) -> pa.Table:
        ids = np_col(g, cfg.id_col)
        cl = np_col(g, "cluster_id")
        sc = np_col(g, "score")
        order, gid, counts = run_ids(ids.astype(np.uint64))
        n_docs = len(counts)
        cluster = np.full(n_docs, -1, np.int64)
        score = np.full(n_docs, -np.inf, np.float64)
        np.maximum.at(cluster, gid, cl[order])
        np.maximum.at(score, gid, sc[order])
        first = np.zeros(len(gid), bool)
        if len(gid):
            first[0] = True
            first[1:] = gid[1:] != gid[:-1]
        ids_first = ids[order][first]
        # a doc present in scores_ds but absent from the cluster table is its
        # own singleton cluster (kept unconditionally)
        cluster = np.where(cluster < 0, ids_first, cluster)
        return pa.table({cfg.id_col: pa.array(ids_first, pa.int64()),
                         "cluster_id": pa.array(cluster, pa.int64()),
                         "score": pa.array(score, pa.float64())})

    merged = partitionwise(both, _pivot, cfg.id_col, cfg.num_parts)

    def _best(g: pa.Table) -> pa.Table:
        ids = np_col(g, cfg.id_col)
        cl = np_col(g, "cluster_id").astype(np.uint64)
        sc = np_col(g, "score")
        # sort by (cluster, -score, id): the first row of each cluster run is
        # the highest-scoring doc, min id on ties
        order, gid, counts = run_ids(cl, -sc, ids.astype(np.uint64),
                                     n_group_keys=1)
        first = np.zeros(len(gid), bool)
        if len(gid):
            first[0] = True
            first[1:] = gid[1:] != gid[:-1]
        return pa.table({cfg.id_col: pa.array(ids[order][first], pa.int64())})

    return partitionwise(merged, _best, "cluster_id", cfg.num_parts)


def remove_duplicate_lines(ds, id_col: str = "doc_id", text_col: str = "text",
                           num_parts: int = 32, sep: str = "\n"):
    """C4-style corpus-wide line dedup: each distinct line survives only at
    its first occurrence (ordered by (doc_id, line_no)); later occurrences
    are dropped from their documents, and documents left with zero lines
    disappear from the output.

    ``sep`` selects the dedup granularity: ``"\\n"`` (default) is C4/
    RefinedWeb line-level; ``"\\n\\n"`` is Dolma-style PARAGRAPH-level —
    coarser units resist the over-segmentation that makes line dedup eat
    legitimate short lines (headings, code), while still catching
    syndicated blocks.  Splitting and reassembly are plain substring
    operations on ``sep`` (no regex), so round-tripping a corpus with no
    duplicates is byte-identical at any granularity.

    Three streaming stages: explode to (doc_id, line_no, line) — one shuffle
    keyed on the line's content hash to elect first occurrences (grouping is
    by the full line string inside the partition, so hash collisions cannot
    merge distinct lines) — one shuffle keyed on doc_id to reassemble the
    surviving lines in order.  Line content crosses the wire once per stage;
    at web scale the elected-survivor table is the only state, never a
    driver-side structure.
    """
    from ..kernels.hashing import fxhash64_bytes_list

    def _explode(b: pa.Table) -> pa.Table:
        ids = np_col(b, id_col)
        texts = b[text_col].to_pylist()
        lines_per = [("" if t is None else t).split(sep) for t in texts]
        n_lines = np.fromiter((len(ls) for ls in lines_per), np.int64,
                              len(texts))
        flat = [ln for ls in lines_per for ln in ls]
        did = np.repeat(ids, n_lines)
        starts = np.cumsum(n_lines) - n_lines
        line_no = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, n_lines)
        key = fxhash64_bytes_list([ln.encode("utf-8") for ln in flat])
        return pa.table({id_col: pa.array(did, pa.int64()),
                         "line_no": pa.array(line_no, pa.int64()),
                         "line": pa.array(flat, pa.string()),
                         "__key": pa.array(key, pa.uint64())})

    exploded = ds.map_batches(_explode, batch_format="pyarrow")

    def _first_occurrence(g: pa.Table) -> pa.Table:
        key = np_col(g, "__key").astype(np.uint64)
        line = g["line"].to_numpy(zero_copy_only=False)
        ids = np_col(g, id_col)
        no = np_col(g, "line_no")
        order, gid, counts = run_ids(key, line, ids.astype(np.uint64),
                                     no.astype(np.uint64), n_group_keys=2)
        first = np.zeros(len(gid), bool)
        if len(gid):
            first[0] = True
            first[1:] = gid[1:] != gid[:-1]
        keep = order[first]
        return pa.table({id_col: pa.array(ids[keep], pa.int64()),
                         "line_no": pa.array(no[keep], pa.int64()),
                         "line": pa.array(line[keep], pa.string())})

    survivors = partitionwise(exploded, _first_occurrence, "__key", num_parts)

    def _reassemble(g: pa.Table) -> pa.Table:
        ids = np_col(g, id_col)
        no = np_col(g, "line_no")
        line = g["line"].to_numpy(zero_copy_only=False)
        order = np.lexsort((no, ids))
        ids_s, line_s = ids[order], line[order]
        newdoc = np.ones(len(ids_s), bool)
        newdoc[1:] = ids_s[1:] != ids_s[:-1]
        starts = np.flatnonzero(newdoc)
        bounds = np.append(starts, len(ids_s))
        texts = [sep.join(line_s[s:e]) for s, e in zip(bounds[:-1], bounds[1:])]
        return pa.table({id_col: pa.array(ids_s[starts], pa.int64()),
                         text_col: pa.array(texts, pa.string())})

    return partitionwise(survivors, _reassemble, id_col, num_parts)


def near_dedup_keep_representatives(exact, cfg: DedupConfig):
    """Near-dup tier shared by ``curate`` and ``tiered_dedup_report``:
    cluster, keep each cluster's representative (the row whose id equals
    its cluster_id — near_dup_clusters labels every doc, singletons label
    themselves), and semi-join the survivors back onto the corpus.

    Returns the MATERIALIZED survivor dataset — both callers read it twice
    (a count for their stats plus downstream consumption), so the
    materialize is the tier boundary a production run would checkpoint."""
    from .dedup import attach_and_filter

    clusters = near_dup_clusters(exact, cfg)
    keep_ids = clusters.map_batches(
        lambda b: pa.table({cfg.id_col: b[cfg.id_col].filter(
            pc.equal(b[cfg.id_col], b["cluster_id"]))}),
        batch_format="pyarrow")
    return attach_and_filter(exact, keep_ids, cfg).materialize()


def curate(ds, cfg: DedupConfig | None = None,
           langs: tuple[str, ...] = ("en",), min_words: int = 10):
    """Full curation: lang filter → quality filter → exact dedup → near dedup.

    Returns (curated_ds, stats).  ``stats`` maps stage → surviving rows;
    each count consumes its stage once (the stage results are parquet-sized
    datasets, so production runs should checkpoint between stages exactly
    like pipelines.webdedup does — this composition keeps the logical
    shape testable in-memory).
    """
    cfg = cfg or DedupConfig()
    # count() on an untransformed parquet read resolves from file metadata —
    # no execution; transformed stages are counted on their MATERIALIZED
    # results below so no stage ever runs twice for its metric
    stats: dict[str, int] = {"input": ds.count()}

    ds = lang_filter(ds, langs)
    ds = quality_filter(ds, text_col=cfg.text_col, min_words=min_words)
    filtered = ds.materialize()
    stats["after_filters"] = filtered.count()

    exact = exact_dedup(filtered, id_col=cfg.id_col, text_col=cfg.text_col,
                        num_parts=cfg.num_parts).materialize()
    stats["after_exact_dedup"] = exact.count()

    curated = near_dedup_keep_representatives(exact, cfg)
    stats["after_near_dedup"] = curated.count()
    return curated, stats


def web_tiered_dedup(input_path: str, cfg: DedupConfig | None = None,
                     num_parts: int = 16):
    """Web-schema tiered dedup over ``(url, warc_ts, text)`` crawl rows:

        crawl-snapshot (one row per canonical url, newest capture wins)
          → exact text dedup (content-hash keep-min-uid)
            → near-dup (MinHash-LSH clusters, keep representatives)

    The RefinedWeb-style tier ordering for raw crawl input — each tier is
    cheaper per-row than the next and runs only on the previous tier's
    survivors, so the expensive near-dup sketch never sees re-crawled
    snapshots or byte-identical mirrors.  Returns ``(kept_ds, report)``
    where ``report`` is a single-row table of per-tier survivor counts.

    All three tiers are the standalone streaming operators composed
    unchanged (weburl.keep_latest_snapshot → exact_dedup →
    near_dedup_keep_representatives); the two materializes are the tier
    boundaries a production run would checkpoint to parquet, exactly as
    pipelines.webdedup does for its stages.
    """
    import dataclasses

    import ray.data as rd

    from .webdedup import add_uid
    from .weburl import keep_latest_snapshot

    cfg = cfg or DedupConfig(num_parts=num_parts, concurrency=None)
    if cfg.id_col != "uid":
        cfg = dataclasses.replace(cfg, id_col="uid")
    ds = rd.read_parquet(input_path, columns=["url", "warc_ts", "text"])
    n_input = ds.count()  # parquet metadata — no execution

    snap = keep_latest_snapshot(ds, num_parts=num_parts).materialize()
    n_snap = snap.count()

    # uid = fxhash64(url): stable across runs, min-uid election deterministic
    keyed = add_uid(snap.drop_columns(["warc_ts"]))
    exact = exact_dedup(keyed, id_col="uid", text_col=cfg.text_col,
                        num_parts=num_parts).materialize()
    n_exact = exact.count()

    kept = near_dedup_keep_representatives(exact, cfg)
    n_near = kept.count()

    report = pa.table({
        "n_input": pa.array([n_input], pa.int64()),
        "n_after_snapshot": pa.array([n_snap], pa.int64()),
        "n_after_exact": pa.array([n_exact], pa.int64()),
        "n_after_near": pa.array([n_near], pa.int64()),
    })
    return kept, report


def tiered_dedup_report(sf_dir: str, cfg: DedupConfig | None = None,
                        min_len: int = 10, num_parts: int = 16):
    """The production tier-dedup drill in one row: exact → near-dup →
    substring-cut, each tier running only on the previous tier's survivors
    (the RefinedWeb/Lee-et-al. ordering — cheapest and highest-yield tier
    first, the expensive span pass last over the smallest corpus).

    Output (single row): n_input, n_after_exact, n_after_near,
    tokens_after_near, tokens_removed_cut, tokens_final.  Near-dup keeps
    each cluster's representative (cluster_id == doc id); the substring
    tier rewrites survivors, so its yield is measured in TOKENS, not docs.

    Every tier is the same streaming machinery the standalone lanes use;
    the two materializes are tier boundaries a production run would
    checkpoint to parquet anyway (pipelines.webdedup does exactly that).
    """
    import ray.data as rd

    from .substring import substring_dedup_cut_ds

    cfg = cfg or DedupConfig(num_parts=num_parts, concurrency=None)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=[cfg.id_col, cfg.text_col])
    n_input = ds.count()  # parquet metadata — no execution

    exact = exact_dedup(ds, id_col=cfg.id_col, text_col=cfg.text_col,
                        num_parts=num_parts).materialize()
    n_exact = exact.count()

    near = near_dedup_keep_representatives(exact, cfg)
    n_near = near.count()

    # the cut kernel's column names are fixed (doc_id, text) — select the
    # configured columns and rename so any cfg works
    cut = substring_dedup_cut_ds(
        near.map_batches(
            lambda b: b.select([cfg.id_col, cfg.text_col])
                       .rename_columns(["doc_id", "text"]),
            batch_format="pyarrow"),
        min_len=min_len, num_parts=num_parts)
    sums = cut.map_batches(
        lambda b: pa.table({
            "nt": pa.array([int(pc.sum(b["n_tokens"]).as_py() or 0)],
                           pa.int64()),
            "rm": pa.array([int(pc.sum(b["removed_tokens"]).as_py() or 0)],
                           pa.int64())}),
        batch_format="pyarrow")
    rows = sums.take_all()  # one partial row per block — bounded
    tokens_after_near = sum(r["nt"] for r in rows)
    removed = sum(r["rm"] for r in rows)

    return pa.table({
        "n_input": pa.array([n_input], pa.int64()),
        "n_after_exact": pa.array([n_exact], pa.int64()),
        "n_after_near": pa.array([n_near], pa.int64()),
        "tokens_after_near": pa.array([tokens_after_near], pa.int64()),
        "tokens_removed_cut": pa.array([removed], pa.int64()),
        "tokens_final": pa.array([tokens_after_near - removed], pa.int64()),
    })
