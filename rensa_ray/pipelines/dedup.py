"""Near-duplicate detection pipelines (the flagship).

Batch formulation of the reference's one-shot LSH dedup
(src/lsh/one_shot.rs:294-332 ``simple_one_shot_flags``) and of the README
dedup recipe (README.md:94-123: LSH candidates → Jaccard verify → keep the
smaller doc id), generalized to connected-component clustering:

    read → MinHashSigner (actor pool) → BandExploder
         → hash-partition on band_hash → vectorized bucket kernels
         → duplicate flags / candidate edges → connected components
         → cluster labels / deduped output

Duplicate-flag semantics are exactly the reference's: a document is flagged
iff it shares some (band_id, band_hash) bucket with another document.  Flag
and cluster outcomes are order-free (keep-min-id), replacing the reference's
arrival-order-dependent first-wins rule — consistent with its own accuracy
metric which compares kept *sets* (benchmarks/full_benchmark.py:656-660).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..kernels.sketch import pairwise_jaccard
from ..stages.band import BandExploder, band_hashes_matrix, validate_bands
from ..stages.sign import SIG_COL, MinHashSigner, sig_from_arrow, sig_to_arrow
from .common import np_col, pairs_within_runs, partitionwise, run_ids


@dataclass(frozen=True)
class DedupConfig:
    """Reference benchmark config defaults (benchmarks/full_benchmark.py:35-44)."""

    num_perm: int = 128
    num_bands: int = 8
    threshold: float = 0.8
    seed: int = 42
    ngram_size: int = 3
    algo: str = "rmin"          # "rmin" | "cmin" | "oph" (fast scale path)
    id_col: str = "doc_id"
    text_col: str = "text"
    # physical knobs — the only things that change between cluster sizes
    num_parts: int = 64          # hash partitions for keyed shuffles (2-4x cores)
    batch_size: int = 512        # docs per signature batch: keeps the sign
                                 # kernel's working set (~1 MB uniq+token
                                 # arrays) L2-resident — 512 measured 2.5×
                                 # faster than 2048 at 8 concurrent workers
                                 # (cache contention), 1.4× faster at 1
    concurrency: int | None = 4  # signer actor pool size (None → num_parts tasks)
    verify: bool = False         # exact-Jaccard gate on candidate pairs (README
                                 # recipe semantics; one-shot flags don't verify)
    num_salts: int = 0           # hot-bucket salting for the clustering path
                                 # (see candidate_edges): 0 = AUTO (count-then-
                                 # salt: estimate bucket sizes from a row
                                 # sample, salt only buckets above
                                 # hot_bucket_rows), 1 = off, >1 = salt EVERY
                                 # bucket with that many salts (test/manual
                                 # mode).  Web-scale boilerplate / empty docs
                                 # put millions of rows in one
                                 # (band_id, band_hash) bucket otherwise.
    hot_bucket_rows: int = 100_000   # auto mode: buckets estimated larger
                                 # than this are salted; also the target
                                 # sub-bucket size after salting
    salt_sample_shift: int = 6   # auto mode: the count pass samples
                                 # 1/2^shift of rows (0 = count every row)

    def __post_init__(self):
        validate_bands(self.num_perm, self.num_bands)

    _ENV_FIELDS = {
        "num_perm": int, "num_bands": int, "threshold": float, "seed": int,
        "ngram_size": int, "algo": str, "num_parts": int, "batch_size": int,
        "concurrency": int, "verify": bool, "num_salts": int,
        "hot_bucket_rows": int, "salt_sample_shift": int,
    }

    @classmethod
    def from_env(cls, **overrides) -> "DedupConfig":
        """Config with ``RENSA_RAY_<FIELD>`` environment overrides.

        The ops-facing tuning surface for packaged jobs (mirror of the
        reference's ~15 ``RENSA_*`` env knobs, src/env.rs:1-23,
        src/lsh/config.rs:28-124): e.g. ``RENSA_RAY_NUM_PARTS=512
        RENSA_RAY_BATCH_SIZE=1024 ray job submit -- python job.py``.
        Explicit ``overrides`` (code) win over the environment; booleans
        accept 0/1/true/false; ``RENSA_RAY_CONCURRENCY=none`` selects the
        task-pool signer.
        """
        import os

        kwargs: dict = {}
        for field, typ in cls._ENV_FIELDS.items():
            raw = os.environ.get(f"RENSA_RAY_{field.upper()}")
            if raw is None:
                continue
            if field == "concurrency" and raw.lower() in ("none", ""):
                kwargs[field] = None
            elif typ is bool:
                kwargs[field] = raw.lower() in ("1", "true", "yes")
            else:
                kwargs[field] = typ(raw)
        kwargs.update(overrides)
        return cls(**kwargs)


def compute_signatures(ds, cfg: DedupConfig):
    """(id, text) dataset → (id, sig) dataset via the signer stage.

    ``cfg.concurrency = N`` → actor pool of N signers (state built once per
    actor).  ``cfg.concurrency = None`` → task pool: a PREBUILT signer
    instance is the UDF — its permutation arrays (2·num_perm u64, ~2 KB)
    ship by value in the task spec, so tasks keep the precomputed state but
    schedule onto every free CPU.  The task pool avoids the fixed-pool
    sizing pathologies on small clusters (a pool sized to the cluster
    starves/deadlocks the upstream read; an undersized pool idles cores),
    and is the default for the bench's scaling runs.
    """
    signer_kwargs = dict(num_perm=cfg.num_perm, seed=cfg.seed,
                         ngram_size=cfg.ngram_size, algo=cfg.algo,
                         id_col=cfg.id_col, text_col=cfg.text_col)
    if cfg.concurrency is None:
        return ds.map_batches(
            MinHashSigner(**signer_kwargs),
            batch_format="pyarrow", batch_size=cfg.batch_size,
        )
    return ds.map_batches(
        MinHashSigner, fn_constructor_kwargs=signer_kwargs,
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=cfg.concurrency, num_cpus=1,
    )


def with_band_columns(sig_ds, cfg: DedupConfig):
    """Append per-band hash columns ``bh0..bh{B-1}`` to a (id, sig) dataset.

    Written into the signature checkpoint so the banding stage can read
    64 B/doc of band hashes (parquet column pruning) instead of re-parsing
    the full 4·num_perm-byte signature column — at web scale the band table
    derivation is I/O-bound on exactly this choice.
    """
    num_bands = cfg.num_bands

    def _add(batch: pa.Table) -> pa.Table:
        sig = sig_from_arrow(batch[SIG_COL])
        u32 = sig if sig.dtype == np.uint32 else (
            sig >> np.uint64(32)).astype(np.uint32)
        bh = band_hashes_matrix(u32, num_bands)
        for b in range(num_bands):
            batch = batch.append_column(f"bh{b}", pa.array(bh[:, b], pa.uint64()))
        return batch

    return sig_ds.map_batches(_add, batch_format="pyarrow", batch_size=None)


def band_table_from_columns(ds, cfg: DedupConfig):
    """(id, bh0..bh{B-1}) → exploded (id, band_id, band_hash) band table."""
    num_bands, id_col = cfg.num_bands, cfg.id_col

    def _explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = np_col(batch, id_col)
        bh = np.empty((n, num_bands), np.uint64)
        for b in range(num_bands):
            bh[:, b] = np_col(batch, f"bh{b}").astype(np.uint64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, num_bands)),
            "band_id": pa.array(np.tile(np.arange(num_bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
        })

    return ds.map_batches(_explode, batch_format="pyarrow", batch_size=None)


def band_table(sig_ds, cfg: DedupConfig, include_sig: bool = False):
    """(id, sig) → exploded (id, band_id, band_hash[, sig]) band table.

    Callers holding a checkpoint with precomputed ``bh*`` columns should use
    ``band_table_from_columns`` directly — sniffing the schema here would
    trigger a partial execution on lazy inputs.
    """
    if not include_sig:
        # stateless → task pool (an instance, not a class: no actor needed)
        # per-block batches: band explode is simple repeat/tile work with no
        # cache-sized working set — small batches only add per-call overhead
        return sig_ds.map_batches(
            BandExploder(num_bands=cfg.num_bands, id_col=cfg.id_col),
            batch_format="pyarrow", batch_size=None,
        )

    num_bands, id_col = cfg.num_bands, cfg.id_col

    def _explode_with_sig(batch: pa.Table) -> pa.Table:
        sig = sig_from_arrow(batch[SIG_COL])
        u32 = sig if sig.dtype == np.uint32 else (sig >> np.uint64(32)).astype(np.uint32)
        bh = band_hashes_matrix(u32, num_bands)
        n = len(sig)
        rep = np.repeat(np.arange(n), num_bands)
        ids = np_col(batch, id_col)
        return pa.table({
            id_col: pa.array(ids[rep]),
            "band_id": pa.array(np.tile(np.arange(num_bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
            SIG_COL: sig_to_arrow(sig[rep]),
        })

    return sig_ds.map_batches(_explode_with_sig, batch_format="pyarrow",
                              batch_size=None)


def _compact_bands_and_count(sig_ds, cfg: DedupConfig):
    """Materialize the slim per-doc band-hash columns ONCE, then derive BOTH
    the live band table and a sample-before-explode count pass from it.

    The checkpoint-less analogue of the flagship's count trick
    (webdedup.py: the signature checkpoint is re-read and row-sampled BEFORE
    band explosion).  Here the materialized unit is (id, bh0..bh{B-1}) —
    ~72 B/doc at 8 bands versus ~160 B/doc for the exploded band table the
    old path pinned, and the signer still executes exactly once (both
    consumers re-derive from the materialized compact blocks, never from
    the signer stage).  Returns (band_ds, count_ds, count_pre_shift).
    """
    cols = [cfg.id_col] + [f"bh{b}" for b in range(cfg.num_bands)]
    compact = (with_band_columns(sig_ds, cfg)
               .select_columns(cols).materialize())
    bands = band_table_from_columns(compact, cfg)
    shift = cfg.salt_sample_shift
    if shift > 0:
        id_col = cfg.id_col
        sh = np.uint64(64 - shift)

        def _sample_rows(b: pa.Table) -> pa.Table:
            ids = np_col(b, id_col).astype(np.uint64)
            keep = ((ids * _SALT_MIX) >> sh) == 0
            return b.filter(pa.array(keep))

        sampled = compact.map_batches(_sample_rows, batch_format="pyarrow",
                                      batch_size=None)
    else:
        sampled = compact
    return bands, band_table_from_columns(sampled, cfg), shift


def _edges_from_sigs(sig_ds, cfg: DedupConfig, spanning: bool = False):
    """Candidate edges with the scale-correct count pass for each mode:
    verify runs band tables with signatures (plain path), auto-salt runs
    route the hot-bucket count through the compact materialize.

    ``spanning`` (verify mode only): emit a connectivity-preserving star
    per locally-connected component of the passing-pair graph instead of
    every passing pair — the clusters lane needs reachability, not the
    O(k²) pair list a bucket of k exact duplicates produces."""
    if cfg.verify:
        return candidate_edges(band_table(sig_ds, cfg, include_sig=True),
                               cfg, with_sig=True, spanning=spanning)
    if cfg.num_salts == 0:
        bands, count_ds, pre_shift = _compact_bands_and_count(sig_ds, cfg)
        return candidate_edges(bands, cfg, count_ds=count_ds,
                               count_pre_shift=pre_shift)
    return candidate_edges(band_table(sig_ds, cfg), cfg)


def flagged_doc_ids(band_ds, cfg: DedupConfig):
    """Distinct doc ids sharing any (band_id, band_hash) bucket (L6 parity)."""
    id_col = cfg.id_col

    def _dup_members(group: pa.Table) -> pa.Table:
        bh = np_col(group, "band_hash").astype(np.uint64)
        bid = np_col(group, "band_id").astype(np.int64)
        ids = np_col(group, id_col)
        order, gid, counts = run_ids(bh, bid)
        dup = counts[gid] >= 2
        return pa.table({id_col: pa.array(np.unique(ids[order][dup]))})

    # members may repeat a doc id across band partitions — downstream
    # consumers (the flag merge) group by id anyway, so no distinct pass
    return partitionwise(band_ds, _dup_members, "band_hash", cfg.num_parts)


def duplicate_flags(ds, cfg: DedupConfig, sig_ds=None):
    """Full one-shot parity pipeline → (id, is_dup) for every document.

    Matches ``RMinHashLSH.query_duplicate_flags_matrix_one_shot`` on an empty
    pre-existing index (src/lsh/one_shot.rs:78-185 simple path).

    Skew handling (``cfg.num_salts == 0``, the default): hot buckets found
    by the sampled count pass with a PROVEN sampled count ≥ 2 bypass the
    band shuffle entirely — every member of a ≥2 bucket is flagged by the
    one-shot rule, so their ids go straight to the flag merge.  Web-scale
    boilerplate (the dominant skew source) thus never enters the all-to-all
    at all; only the power-law tail shuffles.
    """
    if sig_ds is None:
        sig_ds = compute_signatures(ds, cfg)
    id_col = cfg.id_col
    hot_keys = None
    if cfg.num_salts == 0:
        # compact (id, bh*) materialize, NOT the exploded band table: count
        # pass and flag path both re-derive bands from the compact blocks
        # (sampled>=2 still PROVES true bucket size >= 2 — sampling before
        # explosion keeps per-bucket counts a subset of true membership)
        bands, count_ds, pre_shift = _compact_bands_and_count(sig_ds, cfg)
        keys, _salts, sampled = _detect_hot_buckets(count_ds, cfg,
                                                    pre_shift=pre_shift)
        proven = sampled >= 2
        if proven.any():
            hot_keys = keys[proven]
    else:
        bands = band_table(sig_ds, cfg)
    if hot_keys is None:
        flagged = flagged_doc_ids(bands, cfg)
    else:
        hk = hot_keys

        def _split(batch: pa.Table, want_hot: bool) -> pa.Table:
            bh = np_col(batch, "band_hash").astype(np.uint64)
            pos = np.minimum(np.searchsorted(hk, bh), len(hk) - 1)
            hot = hk[pos] == bh
            mask = hot if want_hot else ~hot
            return batch.filter(pa.array(mask))

        hot_ids = bands.map_batches(
            lambda b: _split(b, True).select([id_col]),
            batch_format="pyarrow")
        nonhot = bands.map_batches(
            lambda b: _split(b, False), batch_format="pyarrow")
        flagged = flagged_doc_ids(nonhot, cfg).union(hot_ids)

    # ids come from the raw input, NOT sig_ds: re-using sig_ds in two DAG
    # branches would re-execute (and double-instantiate) the signer actor pool.
    from .common import merge_flags

    return merge_flags(ds.select_columns([id_col]), flagged, id_col,
                       cfg.num_parts)


def duplicate_flags_against(new_ds, ref_ds, cfg: DedupConfig):
    """Cross-corpus near-dup flags: (id, is_dup) for every NEW doc, True iff
    it shares an LSH band bucket with ANY reference-corpus doc.

    New docs never flag each other — these are the semantics of querying an
    LSH index prebuilt from the reference corpus
    (``RMinHashLSH.insert_matrix`` + ``query_duplicate_flags_matrix``,
    src/lsh/py.rs), re-expressed shuffle-native: both sides band-explode
    with a side marker, one keyed shuffle on the bucket co-locates them, and
    a bucket flags its new members iff a reference row is present.  Use it
    for near-dup-level decontamination (train vs eval benchmarks) or
    delta-dedup of a fresh crawl against an existing corpus.
    """
    id_col = cfg.id_col

    def _mark(side: int):
        def _m(b: pa.Table) -> pa.Table:
            return pa.table({
                id_col: b[id_col],
                "band_id": b["band_id"],
                "band_hash": b["band_hash"],
                "__ref": pa.array(np.full(len(b), side, np.int8)),
            })
        return _m

    # The ref side is materialized BEFORE the union: two live signer actor
    # pools in one streaming DAG can reserve every CPU between them and
    # starve the downstream tasks (the documented double-pool hazard —
    # see duplicate_flags' comment).  The reference corpus is the small
    # side by design (benchmarks / an existing index), so this is cheap
    # and doubles as its checkpoint boundary.
    ref_bands = band_table(compute_signatures(ref_ds, cfg), cfg).map_batches(
        _mark(1), batch_format="pyarrow").materialize()
    new_bands = band_table(compute_signatures(new_ds, cfg), cfg).map_batches(
        _mark(0), batch_format="pyarrow")
    both = new_bands.union(ref_bands)

    def _collide(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return g.select([id_col])
        bh = np_col(g, "band_hash").astype(np.uint64)
        bid = np_col(g, "band_id").astype(np.int64)
        ids = np_col(g, id_col)
        is_ref = np_col(g, "__ref") > 0
        order, gid, counts = run_ids(bh, bid)
        has_ref = np.zeros(len(counts), np.int8)
        np.maximum.at(has_ref, gid, is_ref[order].astype(np.int8))
        hit = (has_ref[gid] > 0) & ~is_ref[order]
        return pa.table({id_col: pa.array(np.unique(ids[order][hit]))})

    flagged = partitionwise(both, _collide, "band_hash", cfg.num_parts)
    from .common import merge_flags

    return merge_flags(new_ds.select_columns([id_col]), flagged, id_col,
                       cfg.num_parts)


def duplicate_flags_oph_rescued(ds, cfg: DedupConfig):
    """OPH fast-path duplicate flags with the sparse-row ≥2-band rule — the
    analogue of the reference's rho one-shot recall/precision extensions
    (src/lsh/one_shot.rs:187-292,334-577 sparse-row handling).

    OPH densification copies values into empty buckets, so for SPARSE
    documents (fewer shingles than ``num_perm``) a single colliding band is
    weak evidence — densified runs make unrelated short docs collide far
    more often than the MinHash s-curve predicts.  Rule: a sparse doc is
    flagged only when it collides in ≥ 2 DISTINCT bands; dense docs keep
    the standard any-band rule.  Exact duplicates always collide in every
    band, so recall on true dups is unaffected.
    """
    if cfg.algo != "oph":
        raise ValueError("duplicate_flags_oph_rescued requires algo='oph'")
    from ..stages.sign import MinHashSigner

    id_col, num_bands, P = cfg.id_col, cfg.num_bands, cfg.num_perm
    signer = MinHashSigner(num_perm=P, seed=cfg.seed, ngram_size=cfg.ngram_size,
                           algo="oph", id_col=id_col, text_col=cfg.text_col,
                           emit_token_count=True)
    sig_ds = ds.map_batches(signer, batch_format="pyarrow",
                            batch_size=cfg.batch_size)

    def _explode(batch: pa.Table) -> pa.Table:
        sig = sig_from_arrow(batch[SIG_COL])
        u32 = (sig >> np.uint64(32)).astype(np.uint32)
        bh = band_hashes_matrix(u32, num_bands)
        n = len(sig)
        ids = np_col(batch, id_col)
        sparse = np_col(batch, "n_tok") < P
        rep = np.repeat(np.arange(n), num_bands)
        return pa.table({
            id_col: pa.array(ids[rep]),
            "band_id": pa.array(np.tile(np.arange(num_bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
            "sparse": pa.array(sparse[rep]),
        })

    bands = sig_ds.map_batches(_explode, batch_format="pyarrow", batch_size=None)

    def _members(g: pa.Table) -> pa.Table:
        bh = np_col(g, "band_hash").astype(np.uint64)
        bid = np_col(g, "band_id").astype(np.int64)
        ids = np_col(g, id_col)
        sp = np_col(g, "sparse")
        order, gid, counts = run_ids(bh, bid)
        dup = counts[gid] >= 2
        return pa.table({id_col: pa.array(ids[order][dup]),
                         "band_id": pa.array(bid[order][dup].astype(np.int32)),
                         "sparse": pa.array(sp[order][dup])})

    members = partitionwise(bands, _members, "band_hash", cfg.num_parts)

    all_ids = ds.select_columns([id_col]).map_batches(
        lambda b: pa.table({id_col: b[id_col],
                            "band_id": pa.array(np.full(len(b), -1, np.int32)),
                            "sparse": pa.array(np.zeros(len(b), bool))}),
        batch_format="pyarrow")

    def _merge(g: pa.Table) -> pa.Table:
        ids = np_col(g, id_col)
        band = np_col(g, "band_id").astype(np.int64)
        sp = np_col(g, "sparse")
        if len(ids) == 0:
            return pa.table({id_col: pa.array(ids),
                             "is_dup": pa.array([], pa.bool_())})
        order, gid, counts = run_ids(ids.astype(np.uint64),
                                     (band + 1).astype(np.uint64),
                                     n_group_keys=1)
        b_s, sp_s = band[order], sp[order]
        hit = b_s >= 0
        newband = np.zeros(len(gid), bool)
        newband[0] = True
        newband[1:] = (gid[1:] != gid[:-1]) | (b_s[1:] != b_s[:-1])
        dist = np.zeros(len(counts), np.int64)
        np.add.at(dist, gid, (newband & hit).astype(np.int64))
        dense_hit = np.zeros(len(counts), np.int8)
        np.maximum.at(dense_hit, gid, (hit & ~sp_s).astype(np.int8))
        first = np.zeros(len(gid), bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        flag = (dense_hit > 0) | (dist >= 2)
        return pa.table({id_col: pa.array(ids[order][first]),
                         "is_dup": pa.array(flag)})

    return partitionwise(all_ids.union(members), _merge, id_col, cfg.num_parts)


def candidate_edges(band_ds, cfg: DedupConfig, with_sig: bool = False,
                    count_ds=None, count_pre_shift: int = 0,
                    spanning: bool = False):
    """Star edges (bucket-min doc ← member) per colliding bucket, deduped.

    With ``with_sig`` the band table carries signatures and pairs are gated by
    exact signature Jaccard ≥ threshold inside the same shuffle (README.md
    recipe semantics: candidates → verify → keep smaller id).

    Skew handling (no verify gate): hot (band_id, band_hash) buckets are
    salted — rows partition on hash(band_hash, id % S), each salted
    sub-bucket emits its own star plus one representative row, and a small
    follow-up shuffle chains the S sub-bucket representatives of each bucket.
    Connectivity (hence the connected-component clusters) is exactly
    preserved while no single partition has to hold a whole pathological
    bucket (all-empty / boilerplate docs at web scale collapse to ONE
    (band_id, band_hash) bucket otherwise).  ``cfg.num_salts == 0`` (the
    default) detects hot buckets with a sampled count pass and salts only
    those; ``> 1`` salts every bucket (test/manual mode); ``1`` disables.

    ``count_ds``: an independently-derived copy of the band table for the
    auto count pass (e.g. a fresh read of a band-column checkpoint).  When
    omitted, ``band_ds`` is materialized once and reused — correct, but a
    checkpoint-backed ``count_ds`` avoids pinning the band table in the
    object store at very large scale.  ``count_pre_shift``: how much row
    sampling (1/2^shift) the caller already applied to ``count_ds``.
    """
    if not with_sig and cfg.num_salts != 1:
        return _candidate_edges_salted(band_ds, cfg, count_ds, count_pre_shift)
    return _candidate_edges_plain(band_ds, cfg, with_sig, spanning)


def _local_star_edges(ii: np.ndarray, jj: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Reduce an undirected pair list over rows 0..n-1 to star edges that
    preserve exactly its connectivity: vectorized min-label propagation with
    pointer jumping (O(pairs·log n) numpy work, ≤ one edge per non-root row
    out).  Pairs are within-run from ``pairs_within_runs``, and rows sort
    ascending by id inside each run, so the component root (min row index)
    is the component's min id."""
    lab = np.arange(n, dtype=np.int64)
    while True:
        prev = lab
        nxt = lab.copy()
        np.minimum.at(nxt, ii, lab[jj])
        np.minimum.at(nxt, jj, lab[ii])
        for _ in range(2):  # pointer jumping halves chain depth per pass
            nxt = nxt[nxt]
        if (nxt == prev).all():
            break
        lab = nxt
    member = np.flatnonzero(lab != np.arange(n))
    return lab[member], member


def _candidate_edges_plain(band_ds, cfg: DedupConfig, with_sig: bool = False,
                           spanning: bool = False):
    id_col, threshold = cfg.id_col, cfg.threshold

    def _edges(group: pa.Table) -> pa.Table:
        bh = np_col(group, "band_hash").astype(np.uint64)
        bid = np_col(group, "band_id").astype(np.int64)
        ids = np_col(group, id_col)
        order, gid, counts = run_ids(bh, bid, ids.astype(np.uint64), n_group_keys=2)
        ids_s = ids[order]
        dup = counts[gid] >= 2
        first = np.zeros(len(gid), dtype=bool)
        if len(gid):
            first[0] = True
            first[1:] = gid[1:] != gid[:-1]
        # representative (min id — sorted last key) of each run, aligned to rows
        rep_idx = np.flatnonzero(first)
        rep_of_row = ids_s[rep_idx[gid]] if len(gid) else ids_s[:0]
        take = dup & ~first
        src, dst = rep_of_row[take], ids_s[take]
        if with_sig:
            # verify mode gates EVERY within-bucket pair, not just the
            # rep←member star: jac(A,B) can pass while jac(rep,A) and
            # jac(rep,B) both fail, and the README recipe (candidates →
            # verify → keep smaller id) links A-B in that case.  The
            # Jaccard evaluation is quadratic per bucket by the recipe's
            # semantics — the verify lane is the non-salted, non-scale
            # recipe lane by contract.
            ii, jj = pairs_within_runs(counts)
            if len(ii):
                sig = sig_from_arrow(group[SIG_COL])[order]
                jac = pairwise_jaccard(sig[ii], sig[jj])
                keep = jac >= threshold
                if spanning:
                    # clusters lane: don't ship the O(k²) passing pairs of
                    # a k-duplicate bucket into the CC shuffle — a local
                    # min-label star per passing-pair component has the
                    # same transitive closure with ≤ k-1 edges
                    si, sj = _local_star_edges(ii[keep], jj[keep], len(ids_s))
                    src, dst = ids_s[si], ids_s[sj]
                else:
                    src, dst = ids_s[ii[keep]], ids_s[jj[keep]]
            else:
                src, dst = ids_s[:0], ids_s[:0]
        # dedupe identical pairs within the partition
        if len(src):
            o2, g2, _ = run_ids(src.astype(np.uint64), dst.astype(np.uint64))
            fst = np.zeros(len(g2), dtype=bool)
            fst[0] = True
            fst[1:] = g2[1:] != g2[:-1]
            src, dst = src[o2][fst], dst[o2][fst]
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = partitionwise(band_ds, _edges, "band_hash", cfg.num_parts)

    # global distinct: the same (rep, member) pair surfaces once per
    # colliding band (different band_hash → different partition above), an
    # up-to-num_bands× inflation of the CC input — one cheap keyed pass
    # collapses it before the edge table feeds connected components
    return partitionwise(edges, _distinct_pairs, "src", cfg.num_parts)


def near_dup_clusters(ds, cfg: DedupConfig, sig_ds=None):
    """→ (id, cluster_id) for every document; cluster_id = min doc id reachable
    through LSH candidate (optionally Jaccard-verified) edges."""
    from .cc import connected_components

    if sig_ds is None:
        sig_ds = compute_signatures(ds, cfg)
    # spanning: CC needs reachability only — verify mode's full passing-pair
    # list (quadratic in duplicate-cluster size) stays exclusive to
    # near_dup_pairs, where the pairs ARE the product
    edges = _edges_from_sigs(sig_ds, cfg, spanning=True)
    labels = connected_components(edges, num_parts=cfg.num_parts)  # (node, label)
    id_col = cfg.id_col
    if labels.count() == 0:
        return ds.select_columns([id_col]).map_batches(
            lambda b: pa.table({id_col: b[id_col], "cluster_id": b[id_col]}),
            batch_format="pyarrow")

    # every doc contributes (id, cluster=id); CC labels contribute (node, label)
    # with label <= node always, so cluster(id) = min over the id's rows.
    all_ids = ds.select_columns([id_col]).map_batches(
        lambda b: pa.table({id_col: b[id_col], "cluster_id": b[id_col]}),
        batch_format="pyarrow")
    lab_ids = labels.map_batches(
        lambda b: pa.table({id_col: b["node"], "cluster_id": b["label"]}),
        batch_format="pyarrow")

    def _merge(group: pa.Table) -> pa.Table:
        ids = np_col(group, id_col)
        lab = np_col(group, "cluster_id")
        if len(ids) == 0:
            return group
        order, gid, counts = run_ids(ids.astype(np.uint64))
        first = np.zeros(len(gid), dtype=bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        cluster = np.full(len(counts), np.iinfo(np.uint64).max, dtype=np.uint64)
        np.minimum.at(cluster, gid, lab[order].astype(np.uint64))
        return pa.table({id_col: pa.array(ids[order][first]),
                         "cluster_id": pa.array(cluster.astype(ids.dtype))})

    return partitionwise(all_ids.union(lab_ids), _merge, id_col, cfg.num_parts)


def near_dup_pairs(ds, cfg: DedupConfig, sig_ds=None):
    """→ (id_a, id_b), id_a < id_b: the LSH candidate edge set (Jaccard-
    verified when ``cfg.verify``) — the same connectivity edges the CC
    clustering consumes, i.e. bucket-representative ← member stars per
    colliding band bucket, globally distinct.

    Deliberately NOT the full near-dup clique: emitting every within-cluster
    pair is quadratic in cluster size (one boilerplate cluster of 10^5 docs
    = 5·10^9 pairs at web scale).  The star set has the same transitive
    closure; derive cliques per cluster downstream if a bounded-size report
    needs them.  Mirrors the reference README recipe's (doc, candidate)
    pair emission (README.md:94-123).
    """
    if sig_ds is None:
        sig_ds = compute_signatures(ds, cfg)
    edges = _edges_from_sigs(sig_ds, cfg)
    # rename only — casting to int64 raised ArrowInvalid for uint64 doc ids
    # with the high bit set (fxhash64 id spaces)
    return edges.map_batches(
        lambda b: pa.table({"id_a": b["src"], "id_b": b["dst"]}),
        batch_format="pyarrow")


def dedup(ds, cfg: DedupConfig):
    """Keep exactly one document (the min id) per near-dup cluster.

    Returns the kept subset of ``ds`` with all payload columns, plus a
    ``cluster_id`` column — the deterministic generalization of the README
    recipe's ``to_remove.add(max(doc_id, candidate))``.
    """
    clusters = near_dup_clusters(ds, cfg)
    id_col = cfg.id_col

    def _keep(batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch[id_col], batch["cluster_id"])
        return batch.filter(keep)

    kept_ids = clusters.map_batches(_keep, batch_format="pyarrow")
    return attach_and_filter(ds, kept_ids, cfg)


def attach_and_filter(ds, kept_ids, cfg: DedupConfig):
    """Semi-join: rows of ``ds`` whose id appears in ``kept_ids`` (partition-wise)."""
    id_col = cfg.id_col

    def _mark(b: pa.Table, is_keep: int) -> pa.Table:
        return b.append_column("__keep", pa.array(np.full(len(b), is_keep, np.int8)))

    keys = kept_ids.select_columns([id_col]).map_batches(
        lambda b: _mark(b, 1), batch_format="pyarrow")

    # align schemas: key rows get null payload columns
    schema = ds.schema()

    def _pad_keys(b: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in zip(schema.names, schema.types):
            if name == id_col:
                cols[name] = b[id_col].cast(typ)
            else:
                cols[name] = pa.nulls(len(b), typ)
        cols["__keep"] = b["__keep"]
        return pa.table(cols)

    keys = keys.map_batches(_pad_keys, batch_format="pyarrow")
    payload = ds.map_batches(lambda b: _mark(b, 0), batch_format="pyarrow")

    def _semi(group: pa.Table) -> pa.Table:
        ids = np_col(group, id_col)
        keep_mark = np_col(group, "__keep") > 0
        keep_set = np.sort(ids[keep_mark])
        rows = ~keep_mark
        base = ids[rows]
        pos = np.searchsorted(keep_set, base)
        pos_c = np.clip(pos, 0, max(len(keep_set) - 1, 0))
        hit = len(keep_set) > 0
        mask = (keep_set[pos_c] == base) if hit else np.zeros(len(base), bool)
        tbl = group.filter(pa.array(rows)).filter(pa.array(mask))
        return tbl.drop_columns(["__keep"])

    return partitionwise(payload.union(keys), _semi, id_col, cfg.num_parts)


_SALT_MIX = np.uint64(0x9E3779B97F4A7C15)


def _distinct_pairs(g: pa.Table) -> pa.Table:
    """Global (src, dst) distinct — run partitionwise keyed on src."""
    from .common import distinct_pair_rows

    return distinct_pair_rows(g, "src", "dst")


def _detect_hot_buckets(count_ds, cfg: DedupConfig, pre_shift: int = 0):
    """Sampled count-then-salt (SURVEY.md §7.3 step 4): estimate per-
    ``band_hash`` bucket sizes from a deterministic 1/2^shift row sample and
    return ``(sorted_keys, salts_per_key)`` for buckets whose estimated size
    exceeds ``cfg.hot_bucket_rows``.

    Keying on ``band_hash`` alone (not (band_id, band_hash)) can only
    over-salt on cross-band hash collisions — harmless, since salting
    preserves connectivity exactly.  Sampling noise likewise only shifts
    which buckets get salted, never correctness.  Per-block ``np.unique``
    acts as the combiner, so the count shuffle moves (band_hash, cnt)
    partials, not raw rows.

    Counts are DISTINCT DOCS per band_hash, not rows: a degenerate doc
    (constant signature, e.g. empty text under rmin) repeats one band_hash
    across all its bands, and row counting would let a single such doc
    "prove" a ≥2 bucket to the flags bypass — a false duplicate.  Distinct
    docs keep ``sampled >= 2`` a real proof (two docs sharing a band hash
    share a same-band bucket except for identical band CONTENT at
    different band positions — 2^-64-class outside the constant-signature
    case, which always has same-band pairs too).  As a load estimate this
    undercounts rows by at most num_bands× for degenerate buckets; those
    are far past the salting threshold regardless.

    ``pre_shift``: the caller already row-sampled ``count_ds`` at
    1/2^pre_shift (cheaper: sampling before band explosion skips the
    explode for dropped rows); only the remaining shift is applied here
    and estimates still scale by the TOTAL ``cfg.salt_sample_shift``.
    """
    shift = max(cfg.salt_sample_shift - pre_shift, 0)
    thresh = max(int(cfg.hot_bucket_rows), 2)
    id_col = cfg.id_col

    def _partials(b: pa.Table) -> pa.Table:
        bh = np_col(b, "band_hash").astype(np.uint64)
        ids = np_col(b, id_col).astype(np.uint64)
        if shift > 0:
            keep = ((ids * _SALT_MIX) >> np.uint64(64 - shift)) == 0
            bh, ids = bh[keep], ids[keep]
        if len(bh) == 0:
            return pa.table({"band_hash": pa.array([], pa.uint64()),
                             "cnt": pa.array([], pa.int64())})
        # distinct (doc, band_hash) first — see docstring; a doc's band rows
        # are block-contiguous (explode is per batch), so block-level dedupe
        # is global dedupe
        order = np.lexsort((ids, bh))
        bh_s, id_s = bh[order], ids[order]
        fst = np.ones(len(bh_s), bool)
        fst[1:] = (bh_s[1:] != bh_s[:-1]) | (id_s[1:] != id_s[:-1])
        u, c = np.unique(bh_s[fst], return_counts=True)
        return pa.table({"band_hash": pa.array(u, pa.uint64()),
                         "cnt": pa.array(c, pa.int64())})

    partials = count_ds.map_batches(_partials, batch_format="pyarrow",
                                    batch_size=None)
    # 2x safety on the sampled threshold (vs the TOTAL sampling rate):
    # borderline buckets are still detected w.h.p.; a miss only costs
    # partition balance, never correctness
    sample_thresh = max(1, thresh >> (cfg.salt_sample_shift + 1))

    def _sum(g: pa.Table) -> pa.Table:
        bh = np_col(g, "band_hash").astype(np.uint64)
        c = np_col(g, "cnt").astype(np.int64)
        order, gid, counts = run_ids(bh)
        tot = np.zeros(len(counts), np.int64)
        np.add.at(tot, gid, c[order])
        first = np.zeros(len(gid), bool)
        if len(gid):
            first[0] = True
            first[1:] = gid[1:] != gid[:-1]
        keys = bh[order][first]
        keep = tot >= sample_thresh
        return pa.table({"band_hash": pa.array(keys[keep], pa.uint64()),
                         "cnt": pa.array(tot[keep], pa.int64())})

    hot = partitionwise(partials, _sum, "band_hash", cfg.num_parts)
    df = hot.to_pandas()
    if len(df) == 0:
        e = np.empty(0, np.int64)
        return np.empty(0, np.uint64), e, e
    keys = df["band_hash"].to_numpy().astype(np.uint64)
    sampled = df["cnt"].to_numpy().astype(np.int64)
    est = sampled << cfg.salt_sample_shift
    target = max(thresh // 2, 1)
    salts = np.clip(np.ceil(est / target).astype(np.int64), 2, cfg.num_parts)
    o = np.argsort(keys)
    # sampled counts ride along: sampled >= 2 PROVES true bucket size >= 2
    # (samples never overcount), which lets the flags path auto-flag hot
    # buckets without any shuffle
    return keys[o], salts[o], sampled[o]


def _candidate_edges_salted(band_ds, cfg: DedupConfig, count_ds=None,
                            count_pre_shift: int = 0):
    """Salted star-edge generation as ONE linear DAG (no branch consumes the
    same un-materialized upstream twice — the round-1 double-consumption
    deadlock).  Stages:

    1. map: append ``__skey`` (salted partition key for hot rows, plain
       band_hash otherwise) and ``__hot``.
    2. shuffle on ``__skey``: per (band_id, band_hash) run emit star edges
       (kind 0); hot runs additionally emit ONE representative row (kind 1).
    3. shuffle on ``__k2`` (= src for edges, band_hash for reps): edges pass
       through; rep rows of the same bucket — one per salted sub-bucket,
       co-located here — chain into rep-star edges.
    4. shuffle on src: global (src, dst) distinct (same as the plain path).

    In auto mode only hot buckets pay the rep machinery, so stage 3 moves
    collision rows + a handful of reps, not the whole band table.
    """
    id_col = cfg.id_col
    S_manual = cfg.num_salts

    if S_manual > 1:
        hot_keys = hot_salts = None       # manual mode: every bucket is hot
    else:
        if count_ds is None:
            # SAFETY NET for direct candidate_edges callers only — every
            # default entry point (duplicate_flags / near_dup_clusters /
            # near_dup_pairs via _edges_from_sigs, the flagship via its
            # checkpoint) supplies a count_ds derived from a compact
            # (id, bh*) materialize, so the exploded band table is never
            # pinned on a default path
            band_ds = band_ds.materialize()
            count_ds = band_ds
            count_pre_shift = 0
        hot_keys, hot_salts, _ = _detect_hot_buckets(count_ds, cfg,
                                                     pre_shift=count_pre_shift)
        if len(hot_keys) == 0:
            return _candidate_edges_plain(band_ds, cfg)

    def _add_salt_cols(batch: pa.Table) -> pa.Table:
        bh = np_col(batch, "band_hash").astype(np.uint64)
        ids = np_col(batch, id_col).astype(np.uint64)
        if S_manual > 1:
            hot = np.ones(len(bh), bool)
            S = np.full(len(bh), S_manual, np.uint64)
        else:
            pos = np.searchsorted(hot_keys, bh)
            posc = np.minimum(pos, len(hot_keys) - 1)
            hot = hot_keys[posc] == bh
            S = hot_salts[posc].astype(np.uint64)
        skey = bh.copy()
        if hot.any():
            salt = ids[hot] % S[hot]
            skey[hot] = bh[hot] + (salt + np.uint64(1)) * _SALT_MIX
        return pa.table({id_col: batch[id_col],
                         "band_id": batch["band_id"],
                         "band_hash": pa.array(bh, pa.uint64()),
                         "__skey": pa.array(skey, pa.uint64()),
                         "__hot": pa.array(hot, pa.bool_())})

    salted = band_ds.map_batches(_add_salt_cols, batch_format="pyarrow",
                                 batch_size=None)

    def _stars_and_reps(g: pa.Table) -> pa.Table:
        bh = np_col(g, "band_hash").astype(np.uint64)
        bid = np_col(g, "band_id").astype(np.int64)
        ids = np_col(g, id_col)
        hot = np_col(g, "__hot")
        order, gid, counts = run_ids(bh, bid, ids.astype(np.uint64),
                                     n_group_keys=2)
        ids_s = ids[order]
        first = np.zeros(len(gid), dtype=bool)
        if len(gid):
            first[0] = True
            first[1:] = gid[1:] != gid[:-1]
        rep_idx = np.flatnonzero(first)
        rep_of_row = ids_s[rep_idx[gid]] if len(gid) else ids_s[:0]
        take = (counts[gid] >= 2) & ~first
        src_e, dst_e = rep_of_row[take], ids_s[take]
        # rep rows only for hot (salted) runs — they carry cross-salt links;
        # singleton sub-buckets MUST emit one too (their only link out)
        hrun = hot[order][rep_idx].astype(bool)
        hrep = rep_idx[hrun]
        reps = ids_s[hrep]
        kind = np.concatenate([np.zeros(len(src_e), np.int8),
                               np.ones(len(reps), np.int8)])
        k2 = np.concatenate([src_e.astype(np.uint64), bh[order][hrep]])
        out_bh = np.concatenate([np.zeros(len(src_e), np.uint64),
                                 bh[order][hrep]])
        out_bid = np.concatenate([np.zeros(len(src_e), np.int64),
                                  bid[order][hrep]])
        return pa.table({"src": pa.array(np.concatenate([src_e, reps])),
                         "dst": pa.array(np.concatenate([dst_e, reps])),
                         "band_hash": pa.array(out_bh, pa.uint64()),
                         "band_id": pa.array(out_bid, pa.int64()),
                         "kind": pa.array(kind, pa.int8()),
                         "__k2": pa.array(k2, pa.uint64())})

    both = partitionwise(salted, _stars_and_reps, "__skey", cfg.num_parts)

    def _chain_reps(g: pa.Table) -> pa.Table:
        kind = np_col(g, "kind")
        src_all, dst_all = np_col(g, "src"), np_col(g, "dst")
        e = kind == 0
        src_e, dst_e = src_all[e], dst_all[e]
        r = ~e
        bh = np_col(g, "band_hash").astype(np.uint64)[r]
        bid = np_col(g, "band_id").astype(np.int64)[r]
        rid = src_all[r]
        order, gid, counts = run_ids(bh, bid, rid.astype(np.uint64),
                                     n_group_keys=2)
        ids_s = rid[order]
        first = np.zeros(len(gid), dtype=bool)
        if len(gid):
            first[0] = True
            first[1:] = gid[1:] != gid[:-1]
        rep_idx = np.flatnonzero(first)
        rep_of_row = ids_s[rep_idx[gid]] if len(gid) else ids_s[:0]
        take = (counts[gid] >= 2) & ~first
        return pa.table({
            "src": pa.array(np.concatenate([src_e, rep_of_row[take]])),
            "dst": pa.array(np.concatenate([dst_e, ids_s[take]]))})

    edges = partitionwise(both, _chain_reps, "__k2", cfg.num_parts)
    return partitionwise(edges, _distinct_pairs, "src", cfg.num_parts)


def lsh_query_all(ds, cfg: DedupConfig, query_mod: int = 50,
                  num_parts: int | None = None):
    """Distributed ``RMinHashLSH.query_all`` (reference L3,
    src/lsh/py.rs:192-227): for each QUERY doc (id % query_mod == 0), the
    deduped union of its LSH bucket members across all bands, against an
    index of the WHOLE corpus — rows (query_id, candidate_id), candidate
    set semantics (the scalar API's first-seen ORDER is meaningless under
    a shuffle; the set is identical and pinned by pytest parity).

    One signing pass and ONE band-hash shuffle: query membership is a flag
    column on the single band table (never a second DAG branch on the
    signature dataset — that re-executes the signer), so each (band_id,
    band_hash) bucket arrives co-located and emits query-row × member
    pairs vectorized.  Output size IS the reference semantics (each query's
    candidate set); the per-bucket cost is |queries ∩ bucket| × |bucket|,
    bounded by the query fraction — at web scale pass a sparser
    ``query_mod`` or pre-filter the corpus, exactly like the in-memory API.
    """
    num_parts = num_parts or cfg.num_parts
    id_col = cfg.id_col
    sig_ds = compute_signatures(ds, cfg)
    bands = band_table(sig_ds, cfg)

    def _flag(b: pa.Table) -> pa.Table:
        ids = np_col(b, id_col)
        isq = (ids % np.uint64(query_mod) if ids.dtype == np.uint64
               else ids % query_mod) == 0
        return b.append_column("is_q", pa.array(isq.astype(np.int8)))

    flagged = bands.map_batches(_flag, batch_format="pyarrow")

    def _cands(g: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "candidate_id": pa.array([], pa.int64())})
        bh = np_col(g, "band_hash").astype(np.uint64)
        bid = np_col(g, "band_id").astype(np.uint64)
        ids = np_col(g, id_col)
        isq = np_col(g, "is_q").astype(bool)
        if len(ids) == 0:
            return empty
        order, gid, counts = run_ids(bh, bid, ids.astype(np.uint64),
                                     n_group_keys=2)
        ids_s, q_s = ids[order], isq[order]
        qrows = np.flatnonzero(q_s)
        if len(qrows) == 0:
            return empty
        qg = gid[qrows]
        m = counts[qg]
        total = int(m.sum())
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        local = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(m) - m, m)
        cand = ids_s[np.repeat(starts[qg], m) + local]
        qid = np.repeat(ids_s[qrows], m)
        # in-partition distinct (query, candidate) — bands of one bucket
        # value co-locate, so most duplicates die here
        o2, gid2, _ = run_ids(qid.astype(np.uint64), cand.astype(np.uint64))
        first = np.zeros(len(gid2), bool)
        first[0] = True
        first[1:] = gid2[1:] != gid2[:-1]
        keep = o2[first]
        return pa.table({"query_id": pa.array(qid[keep], pa.int64()),
                         "candidate_id": pa.array(cand[keep], pa.int64())})

    pairs = partitionwise(flagged, _cands, "band_hash", num_parts)

    def _distinct(g: pa.Table) -> pa.Table:
        q = np_col(g, "query_id")
        c = np_col(g, "candidate_id")
        if len(q) == 0:
            return g
        order, gid, _ = run_ids(q.astype(np.uint64), c.astype(np.uint64))
        first = np.zeros(len(gid), bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        keep = order[first]
        return pa.table({"query_id": pa.array(q[keep], pa.int64()),
                         "candidate_id": pa.array(c[keep], pa.int64())})

    # cross-band duplicates for the same (query, candidate) collapse in a
    # second, query-keyed distinct pass
    return partitionwise(pairs, _distinct, "query_id", num_parts)
