"""Streaming / micro-batch dedup as a Ray Data stage.

The reference's inline deduplicators are arrival-order first-wins
(src/inline_dedup/rminhash.rs).  Two Ray formulations:

- ``StreamingDedupStage`` — a stateful ``map_batches`` actor holding an
  ``RMinHashDeduplicator``.  With ``concurrency=1`` it reproduces global
  first-wins over the stream order; with an actor pool each actor owns the
  stream-partition routed to it (use a hash-repartition on a routing key
  first so candidates co-locate).  Suitable for modest corpora / incremental
  top-ups; the 10^12-scale path is the batch shuffle in pipelines.dedup
  against checkpointed band tables (SURVEY.md §3.2).
- ``incremental_dedup_against_checkpoint`` — the scale path for
  micro-batches: band-explode the NEW batch, join against the historical
  band table (parquet checkpoint), flag collisions, append the new bands.
"""

from __future__ import annotations

import copy

import numpy as np
import pyarrow as pa

from .dedup import RMinHashDeduplicator
from .minhash import RMinHash


class StreamingDedupStage:
    """map_batches actor: (id, text) → (id, is_dup) in arrival order."""

    def __init__(self, threshold: float = 0.8, num_perm: int = 128,
                 num_bands: int | None = None, seed: int = 42,
                 ngram_size: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.dedup = RMinHashDeduplicator(threshold, num_perm, use_lsh=True,
                                          num_bands=num_bands, seed=seed)
        self.num_perm = num_perm
        self.seed = seed
        self.ngram_size = ngram_size
        self.id_col = id_col
        self.text_col = text_col
        # template RMinHash built ONCE per actor: per-row instances are
        # shallow clones sharing the permutation arrays (rebuilding the
        # 128-step Xoshiro seed loop per row dominated the stage otherwise)
        self._template = RMinHash(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.shingle import batch_shingle_hashes
        from ..kernels.sketch import rmin_digest_matrix

        texts = ["" if t is None else t for t in batch[self.text_col].to_pylist()]
        ids = batch[self.id_col].to_pylist()
        hashes, offsets = batch_shingle_hashes(texts, self.ngram_size)
        mat = rmin_digest_matrix(hashes, offsets, self.num_perm, self.seed)
        flags = []
        for i, key in enumerate(ids):
            mh = copy.copy(self._template)  # shares immutable _a/_b
            mh._sig = mat[i].copy()         # own row (don't pin the matrix)
            flags.append(not self.dedup.add(str(key), mh))
        return pa.table({self.id_col: batch[self.id_col],
                         "is_dup": pa.array(flags, pa.bool_())})


def incremental_dedup_against_checkpoint(new_ds, band_checkpoint_dir: str, cfg,
                                         write_back: bool = True):
    """Micro-batch dedup against a historical band table.

    ``new_ds``: (id, text).  Returns (id, is_dup) where is_dup means the doc
    collides with history OR with an earlier-keyed doc of the same batch.
    New band rows are appended to the checkpoint (one parquet file per call)
    so the next micro-batch sees them — the distributed equivalent of the
    reference's incremental ``add`` (SURVEY.md §3.2).
    """
    import os
    import uuid

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..pipelines.common import np_col, partitionwise, run_ids
    from ..pipelines.dedup import band_table, compute_signatures

    os.makedirs(band_checkpoint_dir, exist_ok=True)
    id_col = cfg.id_col

    # Materialize the new batch's band table once (micro-batches are small);
    # it is both joined against history and appended to the checkpoint.
    new_bands_tbl = pa.concat_tables(
        [pa.table(b) for b in band_table(compute_signatures(new_ds, cfg), cfg)
         .iter_batches(batch_format="pyarrow", batch_size=None)])
    new_bands = rd.from_arrow(new_bands_tbl)

    def _mark(b: pa.Table, is_new: int) -> pa.Table:
        return pa.table({id_col: b[id_col],
                         "band_id": b["band_id"].cast(pa.int32()),
                         "band_hash": b["band_hash"],
                         "__new": pa.array(np.full(len(b), is_new, np.int8))})

    new_marked = new_bands.map_batches(lambda b: _mark(b, 1),
                                       batch_format="pyarrow")
    hist_files = [f for f in os.listdir(band_checkpoint_dir)
                  if f.endswith(".parquet")]
    if hist_files:
        hist = rd.read_parquet(
            [os.path.join(band_checkpoint_dir, f) for f in hist_files])
        both = new_marked.union(hist.map_batches(lambda b: _mark(b, 0),
                                                 batch_format="pyarrow"))
    else:
        both = new_marked

    def _collide(g: pa.Table) -> pa.Table:
        bh = np_col(g, "band_hash").astype(np.uint64)
        bid = np_col(g, "band_id").astype(np.int64)
        ids = np_col(g, id_col)
        is_new = np_col(g, "__new") > 0
        order, gid, counts = run_ids(bh, bid)
        dup = counts[gid] >= 2
        flag_rows = dup & is_new[order]
        return pa.table({id_col: pa.array(np.unique(ids[order][flag_rows]))})

    flagged = partitionwise(both, _collide, "band_hash", cfg.num_parts)

    # merge flags back over all new ids
    all_ids = new_ds.select_columns([id_col]).map_batches(
        lambda b: b.append_column("__f", pa.array(np.zeros(len(b), np.int8))),
        batch_format="pyarrow")
    hits = flagged.map_batches(
        lambda b: b.append_column("__f", pa.array(np.ones(len(b), np.int8))),
        batch_format="pyarrow")

    def _merge(g: pa.Table) -> pa.Table:
        ids = np_col(g, id_col)
        f = np_col(g, "__f")
        if len(ids) == 0:
            return pa.table({id_col: pa.array(ids),
                             "is_dup": pa.array([], pa.bool_())})
        order, gid, counts = run_ids(ids.astype(np.uint64))
        flag = np.zeros(len(counts), np.int8)
        np.maximum.at(flag, gid, f[order])
        first = np.zeros(len(gid), bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        return pa.table({id_col: pa.array(ids[order][first]),
                         "is_dup": pa.array(flag > 0)})

    result = partitionwise(all_ids.union(hits), _merge, id_col, cfg.num_parts)

    if write_back:
        tbl = new_bands_tbl.select([id_col, "band_id", "band_hash"])
        tbl = tbl.set_column(1, "band_id", tbl["band_id"].cast(pa.int32()))
        pq.write_table(
            tbl,
            os.path.join(band_checkpoint_dir, f"bands-{uuid.uuid4().hex}.parquet"))
    return result
