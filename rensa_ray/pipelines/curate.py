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

    clusters = near_dup_clusters(exact, cfg)
    keep_ids = clusters.map_batches(
        lambda b: pa.table({cfg.id_col: b[cfg.id_col].filter(
            pc.equal(b[cfg.id_col], b["cluster_id"]))}),
        batch_format="pyarrow")

    from .dedup import attach_and_filter

    # materialize once: the count for stats and the caller's consumption
    # share one execution (a lazy count() here would re-run the whole
    # attach/filter pipeline when the caller reads the result)
    curated = attach_and_filter(exact, keep_ids, cfg).materialize()
    stats["after_near_dedup"] = curated.count()
    return curated, stats
