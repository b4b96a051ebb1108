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
import pyarrow.compute as pc

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
                     max_df: int | None, gate, with_sizes: bool = False):
    """Shared two-shuffle n-gram-set pair join (jaccard + containment lanes).

    Shuffle 1: inverted index partitioned by shingle hash → per-bucket
    co-occurring (id_a < id_b, partial co-count, per-side set sizes).
    Shuffle 2: sum co-counts per pair → ``gate(co, sz_sum, sz_min)`` mask.
    ``with_sizes=True`` keeps the per-side distinct-shingle counts on the
    surviving pairs (id_a, id_b, sz_a, sz_b) so keep/drop lanes can elect a
    loser without a third shuffle.
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
                             "sza": z, "szb": z})
        a, b = ids_s[ii], ids_s[jj]
        sa, sb = sz_s[ii], sz_s[jj]
        # aggregate within partition (combiner): count co-occurrences per pair
        order2, gid2, counts2 = run_ids(a.astype(np.uint64), b.astype(np.uint64))
        first = np.zeros(len(gid2), bool)
        if len(gid2):
            first[0] = True
            first[1:] = gid2[1:] != gid2[:-1]
        # (sa, sb) is constant per (id_a, id_b) pair, so first-row take is exact
        return pa.table({"id_a": pa.array(a[order2][first], pa.int64()),
                         "id_b": pa.array(b[order2][first], pa.int64()),
                         "co": pa.array(counts2, pa.int64()),
                         "sza": pa.array(sa[order2][first], pa.int64()),
                         "szb": pa.array(sb[order2][first], pa.int64())})

    partial = partitionwise(ds, _co_pairs, "shingle", num_parts)

    def _sum_and_gate(g: pa.Table) -> pa.Table:
        a = np_col(g, "id_a"); b = np_col(g, "id_b")
        co = np_col(g, "co")
        sza = np_col(g, "sza"); szb = np_col(g, "szb")
        if len(a) == 0:
            cols = {"id_a": pa.array(a, pa.int64()),
                    "id_b": pa.array(b, pa.int64())}
            if with_sizes:
                cols["sz_a"] = pa.array(sza, pa.int64())
                cols["sz_b"] = pa.array(szb, pa.int64())
            return pa.table(cols)
        order, gid, counts = run_ids(a.astype(np.uint64), b.astype(np.uint64))
        first = np.zeros(len(gid), bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        tot = np.zeros(len(counts), np.int64)
        np.add.at(tot, gid, co[order])
        sa_f = sza[order][first]
        sb_f = szb[order][first]
        keep = gate(tot, sa_f + sb_f, np.minimum(sa_f, sb_f))
        cols = {"id_a": pa.array(a[order][first][keep], pa.int64()),
                "id_b": pa.array(b[order][first][keep], pa.int64())}
        if with_sizes:
            cols["sz_a"] = pa.array(sa_f[keep], pa.int64())
            cols["sz_b"] = pa.array(sb_f[keep], pa.int64())
        return pa.table(cols)

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


def containment_dedup_kept(sf_dir: str, threshold: float = 0.6,
                           ngram_size: int = 3, num_parts: int = 32,
                           max_df: int | None = None):
    """Keep-longest containment dedup: docs (near-)wholly embedded in a
    larger doc are dropped; output is the kept (doc_id) set.

    The real-pipeline complement to ``ngram_containment_pairs`` (quote
    pages, syndicated excerpts, list subsets survive Jaccard but not
    containment): for every pair with shingle-set containment ≥
    ``threshold`` the doc with the SMALLER distinct-shingle set loses (it
    is the contained side); equal sizes break to the larger doc_id losing,
    matching the repo's keep-first-id convention.  The election is local
    per pair — no iteration — so a chain a⊂b⊂c drops both a and b in one
    pass.  Docs that appear in no pair (including empty/short docs with no
    shingles) are kept.

    Plan: the shared two-shuffle pair join (``_ngram_pair_join`` with
    per-side sizes riding the pair rows) → per-batch loser election →
    ``merge_flags`` anti-join against the full doc_id column.  Adds ONE
    keyed shuffle (the flag merge) on top of the pair join; the loser set
    never lands on the driver.
    """
    pairs = _ngram_pair_join(
        sf_dir, ngram_size, num_parts, max_df,
        lambda co, szsum, szmin: co / szmin >= threshold, with_sizes=True)

    def _losers(b: pa.Table) -> pa.Table:
        a = np_col(b, "id_a"); bb = np_col(b, "id_b")
        sa = np_col(b, "sz_a"); sb = np_col(b, "sz_b")
        loser = np.where(sa < sb, a, np.where(sb < sa, bb,
                                              np.maximum(a, bb)))
        return pa.table({"doc_id": pa.array(loser, pa.int64())})

    from .common import merge_flags

    all_ids = _read_docs(sf_dir, ["doc_id"])
    flags = merge_flags(all_ids, pairs.map_batches(
        _losers, batch_format="pyarrow"), "doc_id", num_parts)
    def _kept(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pc.filter(b["doc_id"], pc.invert(b["is_dup"]))})

    return flags.map_batches(_kept, batch_format="pyarrow")


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


def ngram_jaccard_pairs_prefix(sf_dir: str, threshold: float = 0.5,
                               ngram_size: int = 3, num_parts: int = 32):
    """EXACT n-gram Jaccard join via prefix filtering (the AllPairs/PPJoin
    family, cf. "Distributed Streaming Set Similarity Join", ICDE 2020):
    same results as ``ngram_jaccard_pairs``, far smaller index.

    Under any fixed global token order, two sets with jac ≥ τ must share a
    token among each one's first ``|S| - ceil(τ·|S|) + 1`` tokens, so only
    that prefix enters the inverted index — at τ=0.8 that is ~20% of the
    full posting volume, and the quadratic pair fan-out shrinks with the
    SQUARE of that.  We use ascending shingle-hash order as the global
    order (zero extra passes; frequency order would shrink candidates
    further at the price of a df pre-pass).  Candidates are verified
    EXACTLY against the two docs' full shingle sets (shipped once each as
    binary payloads through two keyed joins), so the gate — unlike the
    banded-LSH lanes — has no false negatives by construction.
    """
    from ..kernels.shingle import batch_shingle_hashes

    tau = threshold
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def _distinct_sorted(batch: pa.Table):
        texts = ["" if t is None else t for t in batch["text"].to_pylist()]
        hashes, offsets = batch_shingle_hashes(texts, ngram_size)
        ids = np_col(batch, "doc_id")
        n = len(ids)
        doc_idx = np.repeat(np.arange(n), offsets[1:] - offsets[:-1])
        if len(hashes) == 0:
            return ids, np.empty(0, np.int64), np.empty(0, np.uint64), \
                np.zeros(n, np.int64)
        order = np.lexsort((hashes, doc_idx))
        d_s, h_s = doc_idx[order], hashes[order]
        keep = np.ones(len(h_s), bool)
        keep[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        return ids, d_s[keep], h_s[keep], np.bincount(d_s[keep], minlength=n)

    def _explode_prefix(batch: pa.Table) -> pa.Table:
        ids, d_u, h_u, sizes = _distinct_sorted(batch)
        if len(h_u) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"shingle": pa.array([], pa.uint64()),
                             "doc_id": z, "doc_size": z})
        # position of each distinct shingle inside its doc (hash-ascending)
        starts = np.cumsum(sizes) - sizes
        pos = np.arange(len(h_u), dtype=np.int64) - starts[d_u]
        # Nudge below the ceiling: binary float products can land a hair
        # ABOVE the exact value (0.55*100 == 55.000000000000007), and an
        # overshot ceil shortens the prefix by one — a silent false
        # negative.  The epsilon can only LENGTHEN the prefix (a candidate
        # superset), so exactness is preserved.
        pref = sizes - np.ceil(tau * sizes - 1e-9).astype(np.int64) + 1
        keep = pos < pref[d_u]
        return pa.table({
            "shingle": pa.array(h_u[keep], pa.uint64()),
            "doc_id": pa.array(ids[d_u[keep]], pa.int64()),
            "doc_size": pa.array(sizes[d_u[keep]], pa.int64())})

    def _doc_sets(batch: pa.Table) -> pa.Table:
        ids, d_u, h_u, sizes = _distinct_sorted(batch)
        n = len(ids)
        bounds = np.concatenate([[0], np.cumsum(sizes)])
        blobs = [h_u[bounds[i]:bounds[i + 1]].tobytes() for i in range(n)]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "sset": pa.array(blobs, pa.binary())})

    prefix_index = ds.map_batches(_explode_prefix, batch_format="pyarrow")

    def _cand_pairs(g: pa.Table) -> pa.Table:
        from .common import pairs_within_runs

        sh = np_col(g, "shingle").astype(np.uint64)
        ids = np_col(g, "doc_id")
        order, gid, counts = run_ids(sh, ids.astype(np.uint64), n_group_keys=1)
        ids_s = ids[order]
        ii, jj = pairs_within_runs(counts)
        if len(ii) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"id_a": z, "id_b": z})
        a, b = ids_s[ii], ids_s[jj]
        # distinct within partition (combiner)
        o2, gid2, _ = run_ids(a.astype(np.uint64), b.astype(np.uint64))
        first = np.zeros(len(gid2), bool)
        first[0] = True
        first[1:] = gid2[1:] != gid2[:-1]
        keep = o2[first]
        return pa.table({"id_a": pa.array(a[keep], pa.int64()),
                         "id_b": pa.array(b[keep], pa.int64())})

    cands = partitionwise(prefix_index, _cand_pairs, "shingle", num_parts)

    def _distinct(g: pa.Table) -> pa.Table:
        a = np_col(g, "id_a"); b = np_col(g, "id_b")
        if len(a) == 0:
            return g
        order, gid, _ = run_ids(a.astype(np.uint64), b.astype(np.uint64))
        first = np.zeros(len(gid), bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        keep = order[first]
        return pa.table({"id_a": pa.array(a[keep], pa.int64()),
                         "id_b": pa.array(b[keep], pa.int64())})

    cands = partitionwise(cands, _distinct, "id_a", num_parts)
    # both _mark_union calls below consume `sets`; without materialize the
    # corpus would be re-read and re-shingled once per side
    sets = ds.map_batches(_doc_sets, batch_format="pyarrow").materialize()

    def _mark_union(pairs_ds, key_col: str, carry: list[str]):
        def _p(bt: pa.Table) -> pa.Table:
            cols = {"key": bt[key_col],
                    "side": pa.array(np.zeros(len(bt), np.int8))}
            for c in carry:
                cols[c] = bt[c]
            cols["sset"] = pa.array([None] * len(bt), pa.binary())
            return pa.table(cols)

        def _s(bt: pa.Table) -> pa.Table:
            cols = {"key": bt["doc_id"],
                    "side": pa.array(np.ones(len(bt), np.int8))}
            for c in carry:
                typ = pa.binary() if c in ("sa", "sb") else pa.int64()
                cols[c] = pa.array([None] * len(bt), typ)
            cols["sset"] = bt["sset"]
            return pa.table(cols)

        return pairs_ds.map_batches(_p, batch_format="pyarrow").union(
            sets.map_batches(_s, batch_format="pyarrow"))

    def _attach(out_col: str):
        def _j(g: pa.Table) -> pa.Table:
            pr = g.filter(pc.equal(g["side"], 0)).drop_columns(
                ["side", "sset"])
            st = g.filter(pc.equal(g["side"], 1)).select(["key", "sset"])
            j = pr.join(st, "key")
            return j.rename_columns(
                [out_col if c == "sset" else c for c in j.column_names])
        return _j

    u1 = _mark_union(cands, "id_a", ["id_b"])
    j1 = partitionwise(u1, _attach("sa"), "key", num_parts)
    j1 = j1.map_batches(
        lambda bt: bt.rename_columns(
            ["id_a" if c == "key" else c for c in bt.column_names]),
        batch_format="pyarrow")
    u2 = _mark_union(j1, "id_b", ["id_a", "sa"])
    j2 = partitionwise(u2, _attach("sb"), "key", num_parts)

    def _verify(bt: pa.Table) -> pa.Table:
        z = pa.array([], pa.int64())
        if bt.num_rows == 0:
            return pa.table({"id_a": z, "id_b": z})
        id_b = np_col(bt, "key")  # key == id_b after the second join
        id_a = np_col(bt, "id_a")
        sa = bt["sa"].to_pylist()
        sb = bt["sb"].to_pylist()
        keep = np.zeros(len(id_a), bool)
        for i in range(len(id_a)):
            A = np.frombuffer(sa[i], np.uint64)
            B = np.frombuffer(sb[i], np.uint64)
            # sorted-array intersection count via searchsorted (C-speed)
            if len(A) > len(B):
                A, B = B, A
            idx = np.searchsorted(B, A)
            idx[idx == len(B)] = len(B) - 1 if len(B) else 0
            co = int((B[idx] == A).sum()) if len(B) else 0
            union = len(A) + len(B) - co
            keep[i] = union > 0 and co / union >= tau
        return pa.table({"id_a": pa.array(id_a[keep], pa.int64()),
                         "id_b": pa.array(id_b[keep], pa.int64())})

    return j2.map_batches(_verify, batch_format="pyarrow")


def _tfidf_dense_pairs_if_small(weighted, threshold: float):
    """Budget-gated dense tier for ``tfidf_cosine_pairs``.

    Returns ``None`` when the tier is disabled (cells budget 0), else
    ``(materialized_weighted, dense_result_or_None)`` — the caller reuses
    the materialized postings for the general path when any gate fails,
    so probing costs one stage execution either way.

    Three explicit gates, every one measured before any driver fetch:

    1. postings rows P ≤ cells budget  (bounds the driver-side fetch);
    2. docs × vocab ≤ cells budget     (bounds the broadcast matrix);
    3. docs² × vocab ≤ flops budget    (bounds the blocked matmul).
    """
    import os

    import ray
    import ray.data as rd

    try:
        max_cells = int(os.environ.get("RENSA_TFIDF_DENSE_MAX_CELLS",
                                       str(1 << 25)))
        max_flops = int(os.environ.get("RENSA_TFIDF_DENSE_MAX_FLOPS",
                                       str(1 << 36)))
    except ValueError:
        max_cells, max_flops = 1 << 25, 1 << 36
    if max_cells <= 0 or max_flops <= 0:
        return None
    weighted = weighted.materialize()
    if weighted.count() > max_cells:
        return weighted, None
    parts = [t for t in ray.get(weighted.to_arrow_refs())
             if t.num_rows > 0]                 # empty blocks carry no schema
    if not parts:
        return weighted, None
    tbl = pa.concat_tables(parts).combine_chunks()
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = tbl["token"].to_numpy(zero_copy_only=False)
    w = tbl["w"].to_numpy(zero_copy_only=False).astype(np.float64)
    uids, id_idx = np.unique(ids, return_inverse=True)
    utok, tok_idx = np.unique(toks, return_inverse=True)
    n, v = len(uids), len(utok)
    if n * v > max_cells or n * n * v > max_flops:
        return weighted, None
    m = np.zeros((n, v), np.float64)
    m[id_idx, tok_idx] = w
    nrm = np.sqrt((m * m).sum(axis=1))
    bcast = ray.put((m, nrm, uids))
    block = max(256, min(4096, (n + 31) // 32))

    def _block_pairs(b: dict) -> pa.Table:
        mm, nn, dd = ray.get(bcast)
        z = pa.array([], pa.int64())
        out_a, out_b, out_c = [], [], []
        for s in np.asarray(b["id"], np.int64):
            e = min(int(s) + block, len(dd))
            s = int(s)
            dots = mm[s:e] @ mm.T                      # (e-s, n)
            den = nn[s:e, None] * nn[None, :]
            cos = np.divide(dots, den, out=np.zeros_like(dots),
                            where=den > 0)
            bi, bj = np.nonzero(cos >= threshold)
            keep = (bi + s) < bj                       # id_a < id_b, upper tri
            bi, bj = bi[keep], bj[keep]
            out_a.append(dd[bi + s])
            out_b.append(dd[bj])
            out_c.append(np.round(cos[bi, bj], 6))
        if not out_a:
            return pa.table({"id_a": z, "id_b": z,
                             "cos": pa.array([], pa.float64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            "cos": pa.array(np.concatenate(out_c), pa.float64())})

    starts = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(0, n, block, dtype=np.int64), pa.int64())}))
    return weighted, starts.map_batches(_block_pairs, batch_format="numpy",
                                        batch_size=1)


def tfidf_cosine_pairs(sf_dir: str, threshold: float = 0.8,
                       num_parts: int = 32, max_df: int | None = None):
    """Weighted sparse similarity self-join: all doc pairs with TF-IDF
    cosine ≥ threshold → (id_a, id_b, cos round 6), w(d,t) = tf·ln(N/df)
    over lowercased whitespace tokens (the ``doc_tfidf`` weight convention).
    The weighted complement to ``ngram_jaccard_pairs``: rare shared
    vocabulary counts for more than boilerplate, so near-duplicate
    *topical* rewrites surface that set-Jaccard misses.

    Four keyed shuffles, no broadcast, no driver state:

    1. token-hash: global df → per-posting weight, all in-partition
       (grouping joins on the full token STRING inside the partition, so
       hash collisions cannot merge tokens);
    2. doc_id: per-doc norm √Σw², attached to every posting row;
    3. token-hash: each token's full posting list is co-located → pair
       partial dots w_a·w_b with an in-partition per-pair combiner.  Pair
       fan-out is quadratic in df, so at web scale pass ``max_df``:
       longer posting lists (stop tokens — which ln(N/df) already damps
       toward zero) are dropped before pair emission.  Norms are
       unchanged, so a dropped token only LOWERS cos — borderline pairs
       can be lost, never invented.  ``max_df=None`` keeps the join exact
       (the DuckDB oracle's semantics);
    4. id_a: sum partial dots per pair, gate cos = dot/(n_a·n_b) ≥ τ.
    """
    import ray.data as rd

    from ..kernels.hashing import fxhash64_bytes_list
    from .common import explode_doc_token_tf, pairs_within_runs, tf_df_weight

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = rd.read_parquet(f"{sf_dir}/{DOC_FILE}",
                             columns=["doc_id"]).count()

    exploded = ds.map_batches(explode_doc_token_tf, batch_format="pyarrow")

    def _weight(g: pa.Table) -> pa.Table:
        j, _tfv, w = tf_df_weight(g, n_docs)
        return pa.table({"doc_id": j["doc_id"], "token": j["token"],
                         "w": pa.array(w, pa.float64())})

    weighted = partitionwise(exploded, _weight, "__key", num_parts)

    # ---- dense auto-tier ------------------------------------------------
    # The posting-list join below is quadratic in df: a corpus whose
    # vocabulary is tiny relative to its size (every token near-stopword
    # density) explodes into Σ df²/2 pair emissions even though the exact
    # answer is a small dense matmul (the sf0.1 documents table: 5k docs,
    # 31 distinct tokens → 224M posting pairs vs a 5000×31 matrix).  When
    # the full TF-IDF matrix provably fits a budget, compute cosines as
    # blocked row-block × broadcast-matrixᵀ products instead — bit-stable
    # at the round-6 output convention (pytest pins dense == posting) and
    # the same measure-the-bytes-then-dispatch pattern as knn_graph's
    # broadcast guardrail.  Budgets via RENSA_TFIDF_DENSE_MAX_CELLS /
    # _MAX_FLOPS; 0 disables the tier.  Only the exact join tiers
    # (max_df would change which pairs exist, and its scale story is the
    # posting path by construction).
    if max_df is None:
        res = _tfidf_dense_pairs_if_small(weighted, threshold)
        if res is not None:
            weighted, dense = res
            if dense is not None:
                return dense

    def _norms(g: pa.Table) -> pa.Table:
        ids = np_col(g, "doc_id")
        w = np_col(g, "w")
        order, gid, counts = run_ids(ids.astype(np.uint64))
        nrm2 = np.zeros(len(counts), np.float64)
        np.add.at(nrm2, gid, w[order] ** 2)
        nrm = np.sqrt(nrm2)[gid]
        tok = g["token"].to_numpy(zero_copy_only=False)[order]
        key = fxhash64_bytes_list([t.encode("utf-8") for t in tok])
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "token": pa.array(tok, pa.string()),
                         "w": pa.array(w[order], pa.float64()),
                         "nrm": pa.array(nrm, pa.float64()),
                         "__key": pa.array(key, pa.uint64())})

    with_norms = partitionwise(weighted, _norms, "doc_id", num_parts)

    def _dots(g: pa.Table) -> pa.Table:
        key = np_col(g, "__key").astype(np.uint64)
        tok = g["token"].to_numpy(zero_copy_only=False)
        ids = np_col(g, "doc_id")
        w = np_col(g, "w")
        nrm = np_col(g, "nrm")
        # group by (hash, STRING) — collisions split, never merge; the
        # trailing id key makes ids ascend within a run, so ii<jj ⇒ a<b
        order, gid, counts = run_ids(key, tok, ids.astype(np.uint64),
                                     n_group_keys=2)
        ids_s, w_s, n_s = ids[order], w[order], nrm[order]
        if max_df is not None and (counts > max_df).any():
            keep_rows = (counts <= max_df)[gid]
            ids_s, w_s, n_s = ids_s[keep_rows], w_s[keep_rows], n_s[keep_rows]
            counts = counts[counts <= max_df]
        ii, jj = pairs_within_runs(counts)
        z = pa.array([], pa.int64())
        zf = pa.array([], pa.float64())
        if len(ii) == 0:
            return pa.table({"id_a": z, "id_b": z, "dot": zf,
                             "na": zf, "nb": zf})
        a, b = ids_s[ii], ids_s[jj]
        dot = w_s[ii] * w_s[jj]
        na, nb = n_s[ii], n_s[jj]
        # in-partition combiner: one row per pair
        order2, gid2, _c2 = run_ids(a.astype(np.uint64), b.astype(np.uint64))
        first = np.zeros(len(gid2), bool)
        first[0] = True
        first[1:] = gid2[1:] != gid2[:-1]
        tot = np.zeros(int(gid2[-1]) + 1, np.float64)
        np.add.at(tot, gid2, dot[order2])
        return pa.table({"id_a": pa.array(a[order2][first], pa.int64()),
                         "id_b": pa.array(b[order2][first], pa.int64()),
                         "dot": pa.array(tot, pa.float64()),
                         "na": pa.array(na[order2][first], pa.float64()),
                         "nb": pa.array(nb[order2][first], pa.float64())})

    partial = partitionwise(with_norms, _dots, "__key", num_parts)

    def _gate(g: pa.Table) -> pa.Table:
        a = np_col(g, "id_a")
        b = np_col(g, "id_b")
        z = pa.array([], pa.int64())
        if len(a) == 0:
            return pa.table({"id_a": z, "id_b": z,
                             "cos": pa.array([], pa.float64())})
        dot = np_col(g, "dot")
        den = np_col(g, "na") * np_col(g, "nb")
        order, gid, counts = run_ids(a.astype(np.uint64), b.astype(np.uint64))
        first = np.zeros(len(gid), bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        tot = np.zeros(len(counts), np.float64)
        np.add.at(tot, gid, dot[order])
        d1 = den[order][first]
        cos = np.where(d1 > 0, tot / np.where(d1 == 0, 1.0, d1), 0.0)
        keep = (cos >= threshold) & (d1 > 0)
        return pa.table({"id_a": pa.array(a[order][first][keep], pa.int64()),
                         "id_b": pa.array(b[order][first][keep], pa.int64()),
                         "cos": pa.array(np.round(cos[keep], 6), pa.float64())})

    return partitionwise(partial, _gate, "id_a", num_parts)
