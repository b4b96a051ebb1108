"""Flagship pipeline: near-dup dedup over a Common-Crawl-style web corpus.

Input schema (BASELINE.json input_hint):
    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

Stages (each checkpointed to parquet + _SUCCESS marker so a killed run resumes
from the last completed stage; per-stage wall time and row counts land in
``manifest.json``):

    1. read      — read_parquet with column pruning (url [+ html or text])
    2. extract   — html → text (byte-identical per-row invariant) when asked
    3. sign      — MinHashSigner actor pool; doc uid = fxhash64(url)
    4. cluster   — band explode → bucket kernels → candidate edges → CC
    5. write     — (url, cluster_uid, is_dup) assignments + kept-doc corpus

The doc id is ``fxhash64(url)`` (uint64) rather than the url string so the
band/edge shuffles move 8-byte keys instead of ~60-byte urls; the final
outputs re-attach urls.  Collision probability for 2^64 ids is ~n²/2⁶⁵
(≈5e-5 at 10^9 docs) and a collision can only merge two clusters, never
crash — acceptable for dedup semantics at 10^12 scale, documented here.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa

from ..kernels.hashing import fxhash64_bytes_list
from .dedup import DedupConfig, compute_signatures

UID_COL = "uid"


def reserve_sentinel_uids(uids: np.ndarray) -> np.ndarray:
    """Remap the two pipeline sentinels out of the uid space.

    uid 0 is the assignments join's "no cluster label" marker and
    u64::MAX is the CC round's "message row, no old label" marker
    (cc._emit_messages) — a url hashing to either would self-label /
    confuse convergence with probability 2^-64 per corpus.  Remapping at
    ingest turns those documented notes into impossibilities; the remap
    target colliding with another url's hash is the same already-accepted
    fxhash64-collision class as any other id collision."""
    uids = np.asarray(uids, np.uint64)
    hit = (uids == np.uint64(0)) | (uids == np.iinfo(np.uint64).max)
    if hit.any():
        # copy-on-write: np.asarray is zero-copy for uint64 input, so an
        # in-place remap would corrupt (or crash on read-only Arrow-backed)
        # caller arrays — copy only in the 2^-64 sentinel-hit case
        uids = uids.copy()
        uids[uids == np.uint64(0)] = np.uint64(0x9E3779B97F4A7C15)
        uids[uids == np.iinfo(np.uint64).max] = np.uint64(0x61C8864680B583EB)
    return uids


def add_uid(ds, url_col: str = "url"):
    """Append uid = fxhash64(url utf-8 bytes) as uint64 (sentinels 0 and
    u64::MAX remapped — see ``reserve_sentinel_uids``)."""

    def _add(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pylist()
        uids = reserve_sentinel_uids(
            fxhash64_bytes_list([u.encode("utf-8") for u in urls]))
        return batch.append_column(UID_COL, pa.array(uids, pa.uint64()))

    return ds.map_batches(_add, batch_format="pyarrow")


def extract_text(ds, html_col: str = "html", text_col: str = "text"):
    """html → text stage (inverts the corpus wrapper byte-identically)."""
    from ..sources.corpus import extract_text_from_html

    def _extract(batch: pa.Table) -> pa.Table:
        htmls = batch[html_col].to_pylist()
        texts = [extract_text_from_html(h) for h in htmls]
        batch = batch.drop_columns([html_col])
        if text_col in batch.column_names:
            batch = batch.drop_columns([text_col])
        return batch.append_column(text_col, pa.array(texts, pa.string()))

    return ds.map_batches(_extract, batch_format="pyarrow")


class _Checkpointer:
    """Stage-level checkpoint/resume: parquet dir + _SUCCESS + manifest entry."""

    def __init__(self, out_dir: str, num_blocks: int | None = None,
                 effective_input: dict | None = None):
        self.out_dir = out_dir
        # blocks-per-stage hint: keeping block count ≈ shuffle partition
        # count (not #files) keeps the sort's map×reduce fan-out quadratic
        # overhead bounded — at 100 TB the same knob caps block count at
        # 2-4× cluster cores subject to target_max_block_size
        self.num_blocks = num_blocks
        os.makedirs(out_dir, exist_ok=True)
        self.manifest_path = os.path.join(out_dir, "manifest.json")
        self.manifest: dict = {"stages": {}}
        if os.path.exists(self.manifest_path):
            try:
                with open(self.manifest_path) as f:
                    self.manifest = json.load(f)
            except Exception:
                pass
        # ADVICE r4: _SUCCESS alone does not identify WHAT a stage was
        # computed from — resuming into an --out whose checkpoints came
        # from a different effective input (e.g. --snapshot-dedup toggled)
        # would silently reuse stale downstream stages.  Record the
        # effective input in the manifest and REFUSE resume on mismatch.
        if effective_input is not None:
            stored = self.manifest.get("effective_input")
            if (stored is not None and stored != effective_input
                    and self._any_stage_finished()):
                raise ValueError(
                    f"checkpoint dir {out_dir!r} holds stages computed from "
                    f"a different effective input {stored!r} (current: "
                    f"{effective_input!r}) — resuming would silently reuse "
                    f"stale results.  Use a fresh --out or delete the "
                    f"stage=* checkpoints.")
            self.manifest["effective_input"] = effective_input
            with open(self.manifest_path, "w") as f:
                json.dump(self.manifest, f, indent=2)

    def _any_stage_finished(self) -> bool:
        try:
            entries = os.listdir(self.out_dir)
        except OSError:  # pragma: no cover
            return False
        return any(
            e.startswith("stage=")
            and os.path.exists(os.path.join(self.out_dir, e, "_SUCCESS"))
            for e in entries)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.out_dir, f"stage={name}")

    def done(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._stage_dir(name), "_SUCCESS"))

    def load(self, name: str, columns: list | None = None):
        import ray.data as rd

        return rd.read_parquet(self._stage_dir(name), columns=columns,
                               override_num_blocks=self.num_blocks)

    def save(self, name: str, ds, t0: float,
             empty_schema: pa.Schema | None = None):
        import shutil

        import pyarrow.parquet as pq

        path = self._stage_dir(name)
        if os.path.isdir(path) and not self.done(name):
            # stale partial files from a killed attempt: write_parquet
            # APPENDS under fresh UUID names, so resuming into the dir
            # would silently duplicate every row — wipe and rewrite
            shutil.rmtree(path)
        ds.write_parquet(path)
        if not os.path.isdir(path):
            # a 0-row dataset writes no directory at all (Ray 2.49): pin
            # the stage's schema in one explicit empty parquet file so
            # done()/load() behave identically for empty stages
            # (ds.schema() is None for a fully-empty dataset — callers
            # whose stage can legitimately be empty pass ``empty_schema``)
            os.makedirs(path, exist_ok=True)
            schema = ds.schema()
            arrow_schema = (pa.schema(list(zip(schema.names, schema.types)))
                            if schema is not None else empty_schema)
            if arrow_schema is None:
                raise ValueError(
                    f"stage {name!r} produced no rows and no schema; pass "
                    f"empty_schema to checkpoint it")
            pq.write_table(arrow_schema.empty_table(),
                           os.path.join(path, "empty.parquet"))
        # per-partition lineage straight from parquet footers — no Ray
        # execution at all (counting the live dataset would re-run the whole
        # upstream pipeline).  One entry per output file gives a downstream
        # consumer (or a restarted run) the exact row accounting per shard.
        parts = {}
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(path, f)
            md = pq.ParquetFile(fp).metadata
            parts[f] = {"rows": md.num_rows,
                        "bytes": os.path.getsize(fp)}
        rows = sum(p["rows"] for p in parts.values())
        wall = time.time() - t0
        with open(os.path.join(path, "_SUCCESS"), "w") as f:
            f.write("ok")
        self.manifest["stages"][name] = {
            "rows": rows, "wall_sec": round(wall, 3),
            "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
            "path": path, "num_partitions": len(parts),
            "partitions": parts,
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        with open(self.manifest_path, "w") as f:
            json.dump(self.manifest, f, indent=2)
        return self.load(name)


def run_web_dedup(input_path: str, out_dir: str, cfg: DedupConfig | None = None,
                  use_html: bool = False, checkpoint: bool = True):
    """End-to-end web dedup.  Returns (clusters_ds, manifest dict).

    clusters_ds: (url, uid, cluster_uid, is_dup) — is_dup means "not the
    cluster representative" (keep-min-uid semantics).
    """
    import ray.data as rd

    cfg = cfg or DedupConfig.from_env(id_col=UID_COL, text_col="text")
    if cfg.id_col != UID_COL:
        cfg = DedupConfig(**{**cfg.__dict__, "id_col": UID_COL})
    # the fingerprint that must match for a resume to be valid: the actual
    # input path (distinguishes a --snapshot-dedup pre-staged input from
    # the raw corpus) + the extraction mode
    effective_input = {"input": os.path.abspath(input_path),
                       "use_html": bool(use_html)}
    ck = (_Checkpointer(out_dir, num_blocks=cfg.num_parts,
                        effective_input=effective_input)
          if checkpoint else None)

    cols = ["url", "html"] if use_html else ["url", "text"]

    def _read():
        ds = rd.read_parquet(input_path, columns=cols,
                             override_num_blocks=cfg.num_parts)
        ds = extract_text(ds) if use_html else ds
        return add_uid(ds)

    # --- sign ---------------------------------------------------------
    # the checkpoint carries precomputed band-hash columns so the banding
    # stage reads 8 uint64/doc (column pruning) instead of the full
    # 4*num_perm-byte signature column
    from .dedup import with_band_columns

    if ck is not None and ck.done("signatures"):
        sig_cols = [UID_COL] + [f"bh{b}" for b in range(cfg.num_bands)]
        sig_ds = ck.load("signatures",
                         columns=None if cfg.verify else sig_cols)
    else:
        t0 = time.time()
        sig_ds = with_band_columns(compute_signatures(_read(), cfg), cfg)
        if not cfg.verify:
            # the banding path only ever reads (uid, bh*): dropping the
            # 4*num_perm-byte sig column cuts the checkpoint ~7x (3.7 GB →
            # 0.5 GB at 6M docs), which matters twice — less write I/O here,
            # and less page-cache pressure degrading the later stages'
            # first-touch allocation speed on this host.  Verify runs keep
            # the signatures (their edge gate re-reads them).
            from ..stages.sign import SIG_COL

            sig_ds = sig_ds.drop_columns([SIG_COL])
        if ck is not None:
            ck.save("signatures", sig_ds, t0)
            sig_cols = [UID_COL] + [f"bh{b}" for b in range(cfg.num_bands)]
            sig_ds = ck.load("signatures",
                             columns=None if cfg.verify else sig_cols)

    # --- labels: band shuffle → candidate edges → connected components.
    # Only nodes that touch an edge get a label row — a small table, cheap to
    # checkpoint (full cluster attachment is fused into the assignments join
    # below, saving one whole all-to-all shuffle over every document).
    from .dedup import band_table, candidate_edges

    if ck is not None and ck.done("labels"):
        labels = ck.load("labels")
    else:
        from .cc import connected_components

        t0 = time.time()
        count_ds = None
        count_pre_shift = 0
        if cfg.verify:
            bands = band_table(sig_ds, cfg, include_sig=True)
        else:
            from .dedup import _SALT_MIX, band_table_from_columns

            sig_cols = [UID_COL] + [f"bh{b}" for b in range(cfg.num_bands)]
            count_pre_shift = cfg.salt_sample_shift
            shift = np.uint64(64 - count_pre_shift) if count_pre_shift else None

            def _sample_rows(b: pa.Table) -> pa.Table:
                if count_pre_shift == 0:
                    return b
                uids = b[UID_COL].to_numpy(zero_copy_only=False
                                           ).astype(np.uint64)
                keep = ((uids * _SALT_MIX) >> shift) == 0
                return b.filter(pa.array(keep))

            if ck is not None:
                # independent re-read of the signature checkpoint for the
                # auto-salt count pass — two cheap parquet scans instead of
                # pinning the whole band table in the object store.  Rows
                # are sampled BEFORE band explosion (the detector's full
                # sampling rate), so the count pass explodes 1/2^shift of
                # the corpus instead of all of it.
                bands = band_table_from_columns(sig_ds, cfg)
                count_ds = band_table_from_columns(
                    ck.load("signatures", columns=sig_cols).map_batches(
                        _sample_rows, batch_format="pyarrow"), cfg)
            else:
                # no checkpoint to re-read: materialize the compact
                # (uid, bh*) columns once (~72 B/doc) and derive BOTH the
                # live band table and the sample-before-explode count pass
                # from them — same shape as dedup._compact_bands_and_count,
                # instead of candidate_edges' exploded-band safety net
                compact = sig_ds.select_columns(sig_cols).materialize()
                bands = band_table_from_columns(compact, cfg)
                count_ds = band_table_from_columns(
                    compact.map_batches(_sample_rows,
                                        batch_format="pyarrow"), cfg)
        edges = candidate_edges(bands, cfg, with_sig=cfg.verify,
                                count_ds=count_ds,
                                count_pre_shift=count_pre_shift)
        labels = connected_components(edges, num_parts=cfg.num_parts)
        if ck is not None:
            # labels are legitimately empty on an all-unique corpus
            labels = ck.save("labels", labels, t0, empty_schema=pa.schema(
                [("node", pa.uint64()), ("label", pa.uint64())]))

    # --- assignments: one shuffle joins (uid → url) with (uid → label) ----
    if ck is not None and ck.done("assignments"):
        out = ck.load("assignments")
    else:
        t0 = time.time()
        url_map = add_uid(rd.read_parquet(
            input_path, columns=["url"], override_num_blocks=cfg.num_parts))

        from .common import np_col, partitionwise, run_ids

        def _mark_url(b: pa.Table) -> pa.Table:
            return pa.table({UID_COL: b[UID_COL], "url": b["url"],
                             "cluster_uid": pa.array(np.zeros(len(b), np.uint64))})

        def _mark_label(b: pa.Table) -> pa.Table:
            return pa.table({UID_COL: b["node"].cast(pa.uint64()),
                             "url": pa.nulls(len(b), pa.string()),
                             "cluster_uid": b["label"].cast(pa.uint64())})

        unioned = url_map.map_batches(_mark_url, batch_format="pyarrow").union(
            labels.map_batches(_mark_label, batch_format="pyarrow"))

        def _join(g: pa.Table) -> pa.Table:
            uids = np_col(g, UID_COL).astype(np.uint64)
            urls = g["url"].to_numpy(zero_copy_only=False)
            cl = np_col(g, "cluster_uid").astype(np.uint64)
            has_url = pa.compute.is_valid(g["url"].combine_chunks()).to_numpy(
                zero_copy_only=False)
            order, gid, counts = run_ids(uids)
            # cluster = CC label where present (label rows), else the doc's
            # own uid (labels are always <= uid, so max picks the url-row 0
            # default only when no label row exists... use explicit merge)
            cluster = np.zeros(len(counts), np.uint64)
            np.maximum.at(cluster, gid, cl[order])
            url_rows = np.flatnonzero(has_url[order])
            out_uid = uids[order][url_rows]
            out_url = urls[order][url_rows]
            out_cl = cluster[gid[url_rows]]
            # cluster_uid == 0 is safe as the no-label sentinel: uid 0 is
            # remapped out of the id space at ingest (reserve_sentinel_uids)
            no_label = out_cl == 0
            out_cl[no_label] = out_uid[no_label]
            return pa.table({
                "url": pa.array(out_url, pa.string()),
                UID_COL: pa.array(out_uid, pa.uint64()),
                "cluster_uid": pa.array(out_cl, pa.uint64()),
                "is_dup": pa.array(out_cl != out_uid),
            })

        out = partitionwise(unioned, _join, UID_COL, cfg.num_parts)
        if ck is not None:
            out = ck.save("assignments", out, t0)

    manifest = ck.manifest if ck is not None else {}
    return out, manifest
