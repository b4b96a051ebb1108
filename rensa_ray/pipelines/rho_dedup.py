"""Distributed rho fast-path duplicate flags.

Shuffle formulation of the reference's full rho one-shot recall/precision
machinery (src/lsh/one_shot.rs:78-185): band FOLDING (pairs of bands hash as
one effective band, halving the multi-probe sketch's false-positive rate),
the sparse-row ≥2-band rule, the sparse-verify mini-signature gate, and the
mid-length recall rescue — semantically the batch equivalent of
``RMinHashLSH.query_duplicate_flags_matrix_one_shot`` on a rho digest matrix
with an empty pre-existing index.

Pipeline shape (two keyed shuffles, same as the plain flags lane):

    read → RhoSigner (actor pool, O(tokens) per doc — the reference's rho
           sketch is its answer to web-scale sign cost)
         → explode: eff_bands FOLDED rows/doc (kind 0, + sparse/svsig/n_tok)
           and, when recall rescue is enabled, num_bands UNFOLDED rows/doc
           (kind 1) — 1.5× the plain lane's band-table volume at fold 2;
           disable rescue (RENSA_RHO_RECALL_RESCUE_ENABLE=0) for the
           shuffle-lean configuration
         → hash-partition on band_hash: per (kind, band_id, band_hash)
           bucket emit match evidence (folded buckets apply the
           sparse-verify gate; unfolded buckets emit raw collision rows)
         → hash-partition on id: count folded/unfolded band matches, apply
           required (1, or ≥2 for sparse rows) + the rescue rule → is_dup

Scan-order caveat (a TESTED contract, not just a comment): the reference
checks at most ``RENSA_RHO_SPARSE_VERIFY_MAX_CANDIDATES`` bucket partners in
matrix row order; this lane scans partners in ascending doc id and, before
the bounded scan, vectorizes the equal-svsig pass without a horizon.  The
outcomes differ only for buckets where >max_candidates sparse partners
straddle the threshold, and always in the recall-SUPERSET direction — a
true duplicate hidden behind 16+ gate-failing partners is flagged here and
missed by the reference
(tests/test_rho_distributed.py::test_rho_scan_horizon_divergence_is_a_recall_superset
constructs exactly that bucket; the other tests there pin flag parity
against the scalar one-shot whenever ids are assigned in row order).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..kernels.rho import (
    RhoParams,
    _env_float_clamped,
    _env_int_clamped,
)
from ..stages.sign import SIG_COL, RhoSigner, sig_from_arrow, sig_to_arrow
from .common import np_col, partitionwise, run_ids
from .dedup import DedupConfig


def _rho_scan_config(num_bands: int, sv_perm: int) -> dict:
    """One-shot env surface (src/lsh/config.rs:28-124), resolved once on the
    driver so every worker scans with identical parameters."""
    fold = _env_int_clamped("RENSA_RHO_BAND_FOLD", 2, 1, max(num_bands, 1))
    if num_bands % fold != 0:
        fold = 1
    sparse_req = _env_int_clamped(
        "RENSA_RHO_SPARSE_REQUIRED_BAND_MATCHES", 2, 1,
        max(num_bands // fold, 1))
    rescue = fold > 1 and os.environ.get(
        "RENSA_RHO_RECALL_RESCUE_ENABLE", "1") != "0"
    rmin = _env_int_clamped("RENSA_RHO_RECALL_RESCUE_MIN_TOKENS", 17, 1, 65_536)
    rmax = max(_env_int_clamped("RENSA_RHO_RECALL_RESCUE_MAX_TOKENS",
                                96, 1, 65_536), rmin)
    rreq = _env_int_clamped("RENSA_RHO_RECALL_RESCUE_REQUIRED_BAND_MATCHES",
                            2, 1, max(num_bands, 1))
    return {
        "fold": fold, "eff_bands": num_bands // fold,
        "sparse_req": sparse_req,
        "sv_enabled": sv_perm > 0,
        "sv_threshold": _env_float_clamped(
            "RENSA_RHO_SPARSE_VERIFY_THRESHOLD", 0.75, 0.0, 1.0),
        "sv_max_cand": _env_int_clamped(
            "RENSA_RHO_SPARSE_VERIFY_MAX_CANDIDATES", 16, 1, 512),
        "rescue": rescue, "rmin": rmin, "rmax": rmax, "rreq": rreq,
    }


def duplicate_flags_rho(ds, cfg: DedupConfig):
    """(id, text) dataset → (id, is_dup) with the reference's rho defaults.

    ``cfg.num_perm/num_bands/seed/ngram_size`` configure the sketch; the
    rho-specific knobs come from the ``RENSA_RHO_*`` environment exactly as
    in the reference (probes, token budgets, fold, sparse verify, rescue).
    """
    from ..stages.band import validate_bands

    validate_bands(cfg.num_perm, cfg.num_bands)
    id_col = cfg.id_col
    params = RhoParams.from_env(cfg.num_perm)
    scan = _rho_scan_config(cfg.num_bands, params.sparse_verify_perm)
    eff_bands, fold = scan["eff_bands"], scan["fold"]
    # folded band widths are derived inside band_hashes_matrix
    sv_perm = params.sparse_verify_perm

    # the driver-resolved params ship INSIDE the signer constructor args —
    # worker processes may carry a different RENSA_RHO_* env than the
    # driver (ray job submit does not re-export the driver env), and sketch
    # params must match the scan config derived above
    signer_kwargs = dict(num_perm=cfg.num_perm, seed=cfg.seed,
                         ngram_size=cfg.ngram_size, id_col=id_col,
                         text_col=cfg.text_col, params=params)
    if cfg.concurrency is None:
        sig_ds = ds.map_batches(RhoSigner(**signer_kwargs),
                                batch_format="pyarrow",
                                batch_size=cfg.batch_size)
    else:
        sig_ds = ds.map_batches(RhoSigner, fn_constructor_kwargs=signer_kwargs,
                                batch_format="pyarrow",
                                batch_size=cfg.batch_size,
                                concurrency=cfg.concurrency, num_cpus=1)

    rescue = scan["rescue"]

    def _explode(batch: pa.Table) -> pa.Table:
        from ..stages.band import band_hashes_matrix

        sig = sig_from_arrow(batch[SIG_COL])           # (n, P) uint32
        n = len(sig)
        ids = np_col(batch, id_col)
        sparse = np_col(batch, "sparse").astype(bool)
        ntok = np_col(batch, "n_tok").astype(np.int32)
        bh_f = band_hashes_matrix(sig, eff_bands)      # (n, eff_bands)
        parts_id = [np.repeat(ids, eff_bands)]
        parts_bid = [np.tile(np.arange(eff_bands, dtype=np.int32), n)]
        parts_bh = [bh_f.reshape(-1)]
        parts_kind = [np.zeros(n * eff_bands, np.int8)]
        parts_sp = [np.repeat(sparse, eff_bands)]
        parts_nt = [np.repeat(ntok, eff_bands)]
        sv_rows = [np.repeat(np.arange(n), eff_bands)]
        if rescue:
            B = cfg.num_bands
            bh_u = band_hashes_matrix(sig, B)          # (n, B) unfolded
            parts_id.append(np.repeat(ids, B))
            parts_bid.append(np.tile(np.arange(B, dtype=np.int32), n))
            parts_bh.append(bh_u.reshape(-1))
            parts_kind.append(np.ones(n * B, np.int8))
            parts_sp.append(np.repeat(sparse, B))
            parts_nt.append(np.repeat(ntok, B))
            sv_rows.append(np.repeat(np.arange(n), B))
        cols = {
            id_col: pa.array(np.concatenate(parts_id)),
            "band_id": pa.array(np.concatenate(parts_bid), pa.int32()),
            "band_hash": pa.array(np.concatenate(parts_bh), pa.uint64()),
            "kind": pa.array(np.concatenate(parts_kind), pa.int8()),
            "sparse": pa.array(np.concatenate(parts_sp), pa.bool_()),
            "n_tok": pa.array(np.concatenate(parts_nt), pa.int32()),
        }
        if sv_perm > 0:
            if "svsig" not in batch.schema.names:
                # a zeros fallback would make every sparse row's signature
                # identical and silently neutralize the precision gate —
                # this can only happen if signer and driver resolved
                # different RENSA_RHO_* envs, which passing params through
                # the constructor prevents; fail loudly if it ever recurs
                raise RuntimeError(
                    "rho signer emitted no svsig column while the driver's "
                    "scan config expects sparse-verify signatures "
                    f"(sv_perm={sv_perm}) — driver/worker RENSA_RHO_* "
                    "environment mismatch")
            sv = sig_from_arrow(batch["svsig"])
            # NOTE: svsig also rides the kind-1 (rescue) rows although only
            # folded buckets read it — one fixed_size_list column must cover
            # every row of the table; splitting kinds into schema-divergent
            # tables costs a second shuffle.  This is part of the documented
            # ~1.5-3x rescue-mode band-volume trade-off (module docstring).
            cols["svsig"] = sig_to_arrow(sv[np.concatenate(sv_rows)])
        return pa.table(cols)

    bands = sig_ds.map_batches(_explode, batch_format="pyarrow",
                               batch_size=None)

    sv_enabled = scan["sv_enabled"]
    sv_threshold, sv_max_cand = scan["sv_threshold"], scan["sv_max_cand"]

    def _bucket_evidence(g: pa.Table) -> pa.Table:
        """Per (kind, band_id, band_hash) bucket → match-evidence rows
        (id, kind, band_id, sparse, n_tok)."""
        bh = np_col(g, "band_hash").astype(np.uint64)
        bid = np_col(g, "band_id").astype(np.int64)
        kind = np_col(g, "kind").astype(np.int64)
        ids = np_col(g, id_col)
        sp = np_col(g, "sparse").astype(bool)
        nt = np_col(g, "n_tok")
        order, gid, counts = run_ids(kind.astype(np.uint64), bh, bid,
                                     ids.astype(np.uint64), n_group_keys=3)
        in_dup = counts[gid] >= 2
        kind_s, sp_s = kind[order], sp[order]
        take = in_dup.copy()
        if sv_enabled:
            # The reference scans each row's bucket partners in row order,
            # passing trivially unless BOTH rows are sparse
            # (one_shot.rs:388-451).  Consequences used here:
            # 1. a DENSE member of any ≥2 bucket always matches — its first
            #    partner either matches outright (dense) or passes the gate
            #    trivially (sparse) — so only sparse members need scanning;
            # 2. sparse members sharing an IDENTICAL verify signature pass
            #    each other at similarity 1.0, so equal-svsig runs ≥2 pass
            #    vectorized — the web-scale pathological bucket (millions
            #    of empty/boilerplate docs, all sparse, all identical
            #    svsig) never enters the Python scan.  This vectorized pass
            #    ignores the reference's 16-candidate scan horizon, a
            #    documented recall-superset divergence (see module
            #    docstring); the residual per-row scan keeps the horizon.
            sv = sig_from_arrow(g["svsig"])[order]
            scan_rows = in_dup & sp_s & (kind_s == 0)
            if scan_rows.any():
                take[scan_rows] = False
                sidx = np.flatnonzero(scan_rows)
                svb = np.ascontiguousarray(sv[sidx]).view(
                    np.dtype((np.void, sv.shape[1] * sv.dtype.itemsize))
                ).ravel()
                # equal-svsig pass: sort sparse rows by (bucket, svsig bytes)
                so = np.lexsort((svb, gid[sidx]))
                ss_g, ss_v = gid[sidx][so], svb[so]
                same = np.zeros(len(so), bool)
                if len(so) > 1:
                    eq = (ss_g[1:] == ss_g[:-1]) & (ss_v[1:] == ss_v[:-1])
                    same[1:] |= eq
                    same[:-1] |= eq
                take[sidx[so[same]]] = True
                # residual bounded scan (reference 16-candidate horizon)
                rest = sidx[~take[sidx]]
                if len(rest):
                    starts = np.flatnonzero(np.concatenate(
                        [[True], gid[1:] != gid[:-1]]))
                    run_start = starts[gid[rest]]
                    for k in range(len(rest)):
                        r = int(rest[k])
                        p = int(run_start[k])
                        size = int(counts[gid[r]])
                        checked, matched = 0, False
                        for o in range(p, p + size):
                            if o == r:
                                continue
                            if checked >= sv_max_cand:
                                break
                            checked += 1
                            if (not sp_s[o]
                                    or (sv[r] == sv[o]).mean() >= sv_threshold):
                                matched = True
                                break
                        if matched:
                            take[r] = True
        emit = take
        return pa.table({
            id_col: pa.array(ids[order][emit]),
            "kind": pa.array(kind_s[emit].astype(np.int8), pa.int8()),
            "sparse": pa.array(sp_s[emit], pa.bool_()),
            "n_tok": pa.array(nt[order][emit]),
        })

    evidence = partitionwise(bands, _bucket_evidence, "band_hash",
                             cfg.num_parts)

    all_ids = ds.select_columns([id_col]).map_batches(
        lambda b: pa.table({
            id_col: b[id_col],
            "kind": pa.array(np.full(len(b), 2, np.int8)),
            "sparse": pa.array(np.zeros(len(b), bool)),
            "n_tok": pa.array(np.zeros(len(b), np.int32)),
        }), batch_format="pyarrow")

    sparse_req = scan["sparse_req"]
    rmin, rmax, rreq = scan["rmin"], scan["rmax"], scan["rreq"]

    def _merge(g: pa.Table) -> pa.Table:
        ids = np_col(g, id_col)
        kind = np_col(g, "kind").astype(np.int64)
        sp = np_col(g, "sparse").astype(bool)
        nt = np_col(g, "n_tok").astype(np.int64)
        if len(ids) == 0:
            return pa.table({id_col: pa.array(ids),
                             "is_dup": pa.array([], pa.bool_())})
        order, gid, counts = run_ids(ids.astype(np.uint64))
        kind_s = kind[order]
        folded = np.zeros(len(counts), np.int64)
        np.add.at(folded, gid, (kind_s == 0).astype(np.int64))
        unfolded = np.zeros(len(counts), np.int64)
        np.add.at(unfolded, gid, (kind_s == 1).astype(np.int64))
        is_sp = np.zeros(len(counts), bool)
        np.logical_or.at(is_sp, gid, sp[order])
        ntok = np.zeros(len(counts), np.int64)
        np.maximum.at(ntok, gid, nt[order])
        required = np.where(is_sp, sparse_req, 1)
        flag = folded >= required
        if rescue:
            window = (ntok >= rmin) & (ntok <= rmax)
            flag |= (folded == 0) & ~is_sp & window & (unfolded >= rreq)
        first = np.zeros(len(gid), bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        return pa.table({id_col: pa.array(ids[order][first]),
                         "is_dup": pa.array(flag)})

    return partitionwise(all_ids.union(evidence), _merge, id_col,
                         cfg.num_parts)
