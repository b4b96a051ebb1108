"""Set-similarity join and SimHash near-dup pipelines over the documents table.

- ``ngram_jaccard_pairs`` — exact n-gram-set Jaccard self-join via an
  inverted shingle index: explode (shingle_hash, doc_id), co-occurrence
  counts per doc pair inside one hash-partitioned shuffle, then
  jaccard = c / (|A| + |B| - c) with per-doc distinct-shingle sizes joined
  in the same shuffle.  Exact (modulo 2⁻⁶⁴ shingle-hash collisions) and
  SQL-checkable; at web scale the MinHash-LSH pipeline (pipelines.dedup) is
  the approximate fast path and this is the verify lane.
- ``simhash_sketches`` / ``simhash_dup_flags`` — 64-bit Charikar SimHash
  with pigeonhole banding: docs within Hamming distance < num_bands collide
  on ≥1 exact band, reusing the (band_id, band_hash) shuffle shape from the
  MinHash pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.simhash import simhash64, simhash_bands
from ..kernels.shingle import batch_shingle_hashes
from .common import np_col, partitionwise, run_ids

DOC_FILE = "documents.parquet"


def _read_docs(sf_dir: str, columns: list[str]):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{DOC_FILE}", columns=columns)


def _explode_distinct_shingles(batch: pa.Table, ngram_size: int) -> pa.Table:
    """(doc_id, shingle_hash, doc_size) rows — one per DISTINCT shingle.

    Fully vectorized: one lexsort over (doc, hash) dedupes every document's
    shingle set in a single pass (no per-doc python)."""
    texts = ["" if t is None else t for t in batch["text"].to_pylist()]
    hashes, offsets = batch_shingle_hashes(texts, ngram_size)
    ids = np_col(batch, "doc_id")
    n = len(ids)
    if len(hashes) == 0:
        z = pa.array([], pa.int64())
        return pa.table({"shingle": pa.array([], pa.uint64()),
                         "doc_id": z, "doc_size": z})
    doc_idx = np.repeat(np.arange(n), offsets[1:] - offsets[:-1])
    order = np.lexsort((hashes, doc_idx))
    d_s, h_s = doc_idx[order], hashes[order]
    keep = np.ones(len(h_s), bool)
    keep[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    d_u, h_u = d_s[keep], h_s[keep]
    sizes = np.bincount(d_u, minlength=n)
    return pa.table({"shingle": pa.array(h_u, pa.uint64()),
                     "doc_id": pa.array(ids[d_u], pa.int64()),
                     "doc_size": pa.array(sizes[d_u], pa.int64())})


def _ngram_pair_join(sf_dir: str, ngram_size: int, num_parts: int,
                     max_df: int | None, gate):
    """Shared two-shuffle n-gram-set pair join (jaccard + containment lanes).

    Shuffle 1: inverted index partitioned by shingle hash → per-bucket
    co-occurring (id_a < id_b, partial co-count, size sum, size min).
    Shuffle 2: sum co-counts per pair → ``gate(co, sz_sum, sz_min)`` mask.
    Pair fan-out is quadratic in a shingle's document frequency, so at web
    scale pass ``max_df``: a shingle's full posting list is co-located in
    its partition, and lists longer than ``max_df`` (boilerplate/
    stop-shingles) are dropped before pair emission.  Dropped shingles only
    shrink co-counts (doc sizes are unchanged), so the gate can only lose
    borderline pairs held together by ultra-common shingles — exactly the
    skew a df cap is meant to ignore.  ``max_df=None`` keeps the join exact
    (the DuckDB oracles' semantics).
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _explode_distinct_shingles(b, ngram_size),
        batch_format="pyarrow")

    def _co_pairs(g: pa.Table) -> pa.Table:
        from .common import pairs_within_runs

        sh = np_col(g, "shingle").astype(np.uint64)
        ids = np_col(g, "doc_id")
        sz = np_col(g, "doc_size")
        order, gid, counts = run_ids(sh, ids.astype(np.uint64), n_group_keys=1)
        ids_s, sz_s = ids[order], sz[order]
        if max_df is not None and (counts > max_df).any():
            keep_rows = (counts <= max_df)[gid]
            ids_s, sz_s = ids_s[keep_rows], sz_s[keep_rows]
            counts = counts[counts <= max_df]
        ii, jj = pairs_within_runs(counts)
        if len(ii) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"id_a": z, "id_b": z, "co": z,
                             "sz": z, "szmin": z})
        a, b = ids_s[ii], ids_s[jj]
        sa, sb = sz_s[ii], sz_s[jj]
        # aggregate within partition (combiner): count co-occurrences per pair
        order2, gid2, counts2 = run_ids(a.astype(np.uint64), b.astype(np.uint64))
        first = np.zeros(len(gid2), bool)
        if len(gid2):
            first[0] = True
            first[1:] = gid2[1:] != gid2[:-1]
        return pa.table({"id_a": pa.array(a[order2][first], pa.int64()),
                         "id_b": pa.array(b[order2][first], pa.int64()),
                         "co": pa.array(counts2, pa.int64()),
                         "sz": pa.array((sa + sb)[order2][first], pa.int64()),
                         "szmin": pa.array(
                             np.minimum(sa, sb)[order2][first], pa.int64())})

    partial = partitionwise(ds, _co_pairs, "shingle", num_parts)

    def _sum_and_gate(g: pa.Table) -> pa.Table:
        a = np_col(g, "id_a"); b = np_col(g, "id_b")
        co = np_col(g, "co"); sz = np_col(g, "sz")
        szmin = np_col(g, "szmin")
        if len(a) == 0:
            return pa.table({"id_a": pa.array(a, pa.int64()),
                             "id_b": pa.array(b, pa.int64())})
        order, gid, counts = run_ids(a.astype(np.uint64), b.astype(np.uint64))
        first = np.zeros(len(gid), bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        tot = np.zeros(len(counts), np.int64)
        np.add.at(tot, gid, co[order])
        keep = gate(tot, sz[order][first], szmin[order][first])
        return pa.table({"id_a": pa.array(a[order][first][keep], pa.int64()),
                         "id_b": pa.array(b[order][first][keep], pa.int64())})

    return partitionwise(partial, _sum_and_gate, "id_a", num_parts)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5, ngram_size: int = 3,
                        num_parts: int = 32, max_df: int | None = None):
    """All doc pairs with n-gram-set Jaccard ≥ threshold → (id_a, id_b).

    jac = |A∩B| / |A∪B|; see ``_ngram_pair_join`` for the two-shuffle plan
    and the ``max_df`` skew guard.
    """
    return _ngram_pair_join(
        sf_dir, ngram_size, num_parts, max_df,
        lambda co, szsum, szmin: co / (szsum - co) >= threshold)


def ngram_containment_pairs(sf_dir: str, threshold: float = 0.8,
                            ngram_size: int = 3, num_parts: int = 32,
                            max_df: int | None = None):
    """All doc pairs with n-gram-set CONTAINMENT ≥ threshold → (id_a, id_b).

    cont = |A∩B| / min(|A|, |B|) — the asymmetric near-dup criterion that
    catches a short doc wholly embedded in a long one (quote pages, list
    subsets), which Jaccard misses because the union is dominated by the
    long side.  Same two-shuffle plan + ``max_df`` skew guard as
    ``ngram_jaccard_pairs`` (``_ngram_pair_join``).
    """
    return _ngram_pair_join(
        sf_dir, ngram_size, num_parts, max_df,
        lambda co, szsum, szmin: co / szmin >= threshold)


class SimHashStage:
    """map_batches stage: (doc_id, text) → (doc_id, simhash uint64)."""

    def __init__(self, ngram_size: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.ngram_size = ngram_size
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch[self.text_col].to_pylist()]
        s = simhash64(texts, self.ngram_size)
        return pa.table({self.id_col: batch[self.id_col],
                         "simhash": pa.array(s, pa.uint64())})


def simhash_sketches(sf_dir: str, ngram_size: int = 3):
    """(doc_id, simhash) for every document."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHashStage(ngram_size), batch_format="pyarrow", batch_size=2048)


def simhash_dup_flags(sf_dir: str, num_bands: int = 4, max_hamming: int = 3,
                      ngram_size: int = 3, num_parts: int = 32,
                      max_bucket: int | None = None):
    """(doc_id, is_dup): docs sharing a simhash band AND within Hamming
    distance ≤ max_hamming of a band-mate.  Pigeonhole guarantee: any pair
    within distance < num_bands shares ≥1 exact band — so ``max_hamming``
    MUST be < ``num_bands`` or pairs in [num_bands, max_hamming] would be
    silently missed when their differing bits span every band.

    Skew guard: identical sketches are flagged as distance-0 groups WITHOUT
    any pair emission (a web corpus full of byte-identical boilerplate costs
    O(k), not O(k²)); Hamming pairs are checked only across DISTINCT sketch
    values within a bucket.  ``max_bucket`` additionally caps the number of
    distinct sketches per band bucket whose cross pairs are checked — a band
    value shared by more distinct sketches than that is boilerplate-driven,
    and the docs it would link collide in other, more selective bands too
    (the same recall argument as ``ngram_jaccard_pairs``' ``max_df``).
    ``max_bucket=None`` (default) keeps the candidate set exact."""
    if max_hamming >= num_bands:
        raise ValueError(
            f"max_hamming={max_hamming} >= num_bands={num_bands}: the "
            f"banding only guarantees candidates for Hamming distance < "
            f"num_bands; raise num_bands (e.g. {max_hamming + 1}) instead")
    from ..functions.simhash import hamming_distance

    sk = simhash_sketches(sf_dir, ngram_size)

    def _explode(batch: pa.Table) -> pa.Table:
        s = np_col(batch, "simhash").astype(np.uint64)
        ids = np_col(batch, "doc_id")
        bands = simhash_bands(s, num_bands)
        n = len(s)
        rep = np.repeat(np.arange(n), num_bands)
        band_id = np.tile(np.arange(num_bands, dtype=np.uint64), n)
        key = bands.reshape(-1) | (band_id << np.uint64(60))
        return pa.table({"band_key": pa.array(key, pa.uint64()),
                         "doc_id": pa.array(ids[rep], pa.int64()),
                         "simhash": pa.array(s[rep], pa.uint64())})

    exploded = sk.map_batches(_explode, batch_format="pyarrow")

    def _flag_members(g: pa.Table) -> pa.Table:
        from .common import capped_distinct_value_pairs

        key = np_col(g, "band_key").astype(np.uint64)
        ids = np_col(g, "doc_id")
        sh = np_col(g, "simhash").astype(np.uint64)
        n = len(ids)
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        order = np.lexsort((ids.astype(np.uint64), sh, key))
        key_s, sh_s, ids_s = key[order], sh[order], ids[order]
        # value groups: runs of equal (bucket, sketch).  A group of k equal
        # sketches is k distance-0 duplicates — flag it directly, O(k);
        # Hamming pairs only between DISTINCT sketch values (skew-guarded)
        vb = np.ones(n, bool)
        vb[1:] = (key_s[1:] != key_s[:-1]) | (sh_s[1:] != sh_s[:-1])
        vgid, vcounts, _, rep_rows, rep_vgroup, ii, jj = \
            capped_distinct_value_pairs(key_s, vb, max_bucket)
        vg_hit = vcounts >= 2
        if len(ii):
            rep_sh = sh_s[rep_rows]
            hit = hamming_distance(rep_sh[ii], rep_sh[jj]) <= max_hamming
            np.logical_or.at(vg_hit, rep_vgroup[ii[hit]], True)
            np.logical_or.at(vg_hit, rep_vgroup[jj[hit]], True)
        flagged = np.unique(ids_s[vg_hit[vgid]])
        return pa.table({"doc_id": pa.array(flagged, pa.int64())})

    # repeated ids across band partitions are collapsed by the flag merge's
    # group-by-id below — no separate distinct shuffle needed
    flagged = partitionwise(exploded, _flag_members, "band_key", num_parts)

    all_ids = _read_docs(sf_dir, ["doc_id"]).map_batches(
        lambda b: b.append_column("__f", pa.array(np.zeros(len(b), np.int8))),
        batch_format="pyarrow")
    hits = flagged.map_batches(
        lambda b: b.append_column("__f", pa.array(np.ones(len(b), np.int8))),
        batch_format="pyarrow")

    def _merge(g: pa.Table) -> pa.Table:
        ids = np_col(g, "doc_id")
        f = np_col(g, "__f")
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "is_dup": pa.array([], pa.bool_())})
        order, gid, counts = run_ids(ids.astype(np.uint64))
        flag = np.zeros(len(counts), np.int8)
        np.maximum.at(flag, gid, f[order])
        first = np.zeros(len(gid), bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        return pa.table({"doc_id": pa.array(ids[order][first], pa.int64()),
                         "is_dup": pa.array(flag > 0)})

    return partitionwise(all_ids.union(hits), _merge, "doc_id", num_parts)
