"""Packaged job entrypoint for ``ray job submit``.

On a real cluster the flagship dedup runs as:

    ray job submit --working-dir . -- \
        python -m rensa_ray.job --input s3://bucket/pages/ --out s3://bucket/dedup/

(in this sandbox: ``python -m rensa_ray.job --input /tmp/corpus --out /tmp/out``).

``python -m rensa_ray.job --rehearse`` is the one-command scale rehearsal:
generate the deterministic synthetic web corpus (default 200k docs for a
quick drill; ``--rehearse-docs 20000000`` is the BASELINE.md holding-run
size), run the checkpointed flagship, then simulate
a crash (delete the final stage checkpoint) and re-run — asserting that
finished stages are NOT recomputed (their files untouched on disk) and the
resumed output is value-identical (order-independent checksum).  Exits
non-zero if any assertion fails; prints one JSON report.

The job connects to whatever cluster ``RAY_ADDRESS`` points at (Ray's job
runtime sets it; standalone runs fall back to a local session), reads every
``RENSA_RAY_*`` tuning knob through ``DedupConfig.from_env``, executes the
checkpointed web-dedup pipeline, and prints the manifest — per-stage wall
time, rows/sec, and per-partition lineage — as one JSON document on stdout.
A re-submitted job resumes from the last completed stage (see
pipelines.webdedup._Checkpointer).

This module is the ONLY library-owned Ray session owner besides bench.py and
the test fixture, and only when run as __main__.
"""

from __future__ import annotations

import argparse
import json
import sys


def _assignments_checksum(ds) -> tuple[int, int]:
    """Order-independent (checksum, n_rows) over (uid, cluster_uid, is_dup).

    Per-batch vectorized mix + commutative u64 sum, reduced through Ray —
    nothing materializes on the driver, so this works at rehearsal scale.
    """
    import numpy as np
    import pyarrow as pa

    def _mix(b: pa.Table) -> pa.Table:
        uid = b["uid"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cu = b["cluster_uid"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dup = b["is_dup"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (uid * np.uint64(0x9E3779B97F4A7C15)
                 ^ cu * np.uint64(0xBF58476D1CE4E5B9)
                 ^ dup * np.uint64(0x94D049BB133111EB))
            h ^= h >> np.uint64(29)
            s = np.uint64(h.sum())
        return pa.table({"s": pa.array([int(s)], pa.uint64()),
                         "n": pa.array([len(b)], pa.int64())})

    parts = ds.map_batches(_mix, batch_format="pyarrow").take_all()
    total = 0
    for r in parts:
        total = (total + int(r["s"])) & ((1 << 64) - 1)
    return total, sum(int(r["n"]) for r in parts)


def _auto_config(input_dir: str):
    """The submit-path DedupConfig: env knobs + the two auto defaults
    (task-pool signer, input/cores-sized shuffle partitions).  Shared by
    normal job runs and --rehearse so the rehearsal exercises EXACTLY the
    configuration a real submission would run."""
    import dataclasses
    import os

    import ray

    from .pipelines.dedup import DedupConfig
    from .pipelines.webdedup import UID_COL

    cfg = DedupConfig.from_env(id_col=UID_COL)
    patch: dict = {}
    if "RENSA_RAY_CONCURRENCY" not in os.environ:
        # task-pool signer by default: a fixed actor pool sized larger than
        # the cluster deadlocks (reserves CPUs the shuffle stages need),
        # and sized smaller idles cores — tasks fit every cluster size
        patch["concurrency"] = None
    if "RENSA_RAY_NUM_PARTS" not in os.environ:
        # auto-size shuffle partitions from input bytes + cluster cores so
        # the same submit command works from a laptop corpus to 100 TB
        from .pipelines.common import dir_parquet_bytes, suggest_num_parts

        cores = int(ray.cluster_resources().get("CPU", 8))
        patch["num_parts"] = suggest_num_parts(
            dir_parquet_bytes(input_dir), cores)
    return dataclasses.replace(cfg, **patch)


def _rehearse(args) -> int:
    """Scale rehearsal: flagship at --rehearse-docs + kill/resume assertion."""
    import os
    import shutil
    import time

    from .pipelines.webdedup import run_web_dedup
    from .sources.corpus import write_corpus, write_corpus_parallel

    n_docs = args.rehearse_docs
    base = args.out or f"/tmp/rensa_rehearse/{n_docs}"
    # announce the footprint BEFORE doing anything: the 20M holding-run
    # drill writes tens of GB under /tmp and runs for minutes — a casual
    # invocation should see what it signed up for (default is 200k docs;
    # pass --rehearse-docs 20000000 for the BASELINE.md holding-run scale)
    est_gb = n_docs * 1100 / 1e9  # ~1.1 KB/doc corpus + checkpoints
    print(f"[rehearse] {n_docs:,} docs → {base} (~{est_gb:.1f} GB disk, "
          f"two full pipeline runs{', forced distributed CC' if args.force_distributed_cc else ''})",
          file=sys.stderr)
    prev_cc_env = os.environ.get("RENSA_RAY_DRIVER_CC_THRESHOLD")
    if args.force_distributed_cc:
        os.environ["RENSA_RAY_DRIVER_CC_THRESHOLD"] = "0"
    try:
        return _rehearse_body(args, n_docs, base)
    finally:
        # scope the forced-CC override to the rehearsal: this knob is a
        # process-global side channel read by every connected_components
        # call, so leaving it set would silently force threshold-0 on any
        # later pipeline run in the same process
        if args.force_distributed_cc:
            if prev_cc_env is None:
                os.environ.pop("RENSA_RAY_DRIVER_CC_THRESHOLD", None)
            else:
                os.environ["RENSA_RAY_DRIVER_CC_THRESHOLD"] = prev_cc_env


def _rehearse_body(args, n_docs: int, base: str) -> int:
    import os
    import shutil
    import time

    from .pipelines.webdedup import run_web_dedup
    from .sources.corpus import write_corpus, write_corpus_parallel

    cdir = os.path.join(base, "corpus_base", "corpus")
    marker = os.path.join(base, "corpus_base", "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(os.path.join(base, "corpus_base"), ignore_errors=True)
        writer = write_corpus_parallel if n_docs >= 200_000 else write_corpus
        writer(os.path.join(base, "corpus_base"), n_docs=n_docs, seed=42)
        with open(marker, "w") as f:
            f.write("ok")
    out_dir = os.path.join(base, "out")
    shutil.rmtree(out_dir, ignore_errors=True)

    cfg = _auto_config(cdir)

    t0 = time.time()
    out1, m1 = run_web_dedup(cdir, out_dir, cfg=cfg, checkpoint=True)
    sum1, rows1 = _assignments_checksum(out1)
    wall1 = time.time() - t0

    failures: list[str] = []
    if rows1 != n_docs:
        failures.append(f"first run rows {rows1} != {n_docs}")

    # snapshot finished-stage files, then simulate a crash after 'labels'
    keep_stages = ("stage=signatures", "stage=labels")
    mtimes = {}
    for st in keep_stages:
        d = os.path.join(out_dir, st)
        mtimes[st] = {f: os.stat(os.path.join(d, f)).st_mtime_ns
                      for f in os.listdir(d)}
    shutil.rmtree(os.path.join(out_dir, "stage=assignments"))

    t1 = time.time()
    out2, m2 = run_web_dedup(cdir, out_dir, cfg=cfg, checkpoint=True)
    sum2, rows2 = _assignments_checksum(out2)
    wall2 = time.time() - t1

    for st in keep_stages:
        d = os.path.join(out_dir, st)
        now = {f: os.stat(os.path.join(d, f)).st_mtime_ns
               for f in os.listdir(d)}
        if now != mtimes[st]:
            failures.append(f"resume recomputed {st} (files changed on disk)")
    if (sum1, rows1) != (sum2, rows2):
        failures.append(
            f"resumed output differs: ({sum1}, {rows1}) vs ({sum2}, {rows2})")

    report = {
        "mode": "rehearse", "docs": n_docs, "rows": rows1,
        "cc_mode": ("distributed-forced" if args.force_distributed_cc
                    else "auto"),
        "first_run_sec": round(wall1, 2),
        "docs_per_sec": round(n_docs / max(wall1, 1e-9), 1),
        "resume_sec": round(wall2, 2),
        "stages_first": {k: v["wall_sec"] for k, v in m1["stages"].items()},
        "stages_resume": {k: v["wall_sec"] for k, v in m2["stages"].items()},
        "checksum": sum1, "resume_identical": (sum1, rows1) == (sum2, rows2),
        "finished_stages_untouched": not any(
            "recomputed" in f for f in failures),
        "failures": failures, "out": out_dir,
    }
    json.dump(report, sys.stdout, indent=2, default=str)
    print()
    return 1 if failures else 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m rensa_ray.job",
        description="Checkpointed web-corpus near-dup dedup job.")
    p.add_argument("--input",
                   help="parquet dir of web pages (url, warc_ts, html, text, lang)")
    p.add_argument("--out",
                   help="output dir for stage checkpoints + assignments")
    p.add_argument("--rehearse", action="store_true",
                   help="one-command scale rehearsal: synthetic corpus → "
                        "flagship → kill last stage → resume; asserts "
                        "stage-skip + identical output, exits non-zero on "
                        "any failure")
    p.add_argument("--rehearse-docs", type=int,
                   default=int(__import__("os").environ.get(
                       "RENSA_REHEARSE_DOCS", "200000")),
                   help="rehearsal corpus size (default 200k — a quick "
                        "drill; pass 20000000 or RENSA_REHEARSE_DOCS for "
                        "the BASELINE.md holding-run scale)")
    p.add_argument("--force-distributed-cc", action="store_true",
                   help="rehearse with driver_cc_threshold=0 so the labels "
                        "stage runs the distributed label-propagation loop "
                        "(the 10^12-doc path) instead of the driver fast "
                        "path")
    p.add_argument("--tiered", action="store_true",
                   help="run the tiered dedup report (exact → near-dup → "
                        "substring-cut over survivors) instead of the "
                        "flagship; --input must be a dir holding a "
                        "documents.parquet with (doc_id, text)")
    p.add_argument("--snapshot-dedup", action="store_true",
                   help="crawl-snapshot pre-stage: collapse each canonical "
                        "url (tracking-param aliases, re-crawls) to its "
                        "newest warc_ts capture before content dedup; "
                        "checkpointed under <out>/stage=snapshots and "
                        "skipped on resume")
    p.add_argument("--use-html", action="store_true",
                   help="extract text from the html column (byte-identical "
                        "invariant) instead of reading the text column")
    p.add_argument("--no-checkpoint", action="store_true",
                   help="disable stage checkpoints (single-shot run)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="num_cpus for a standalone local session (ignored "
                        "when attaching to a running cluster)")
    args = p.parse_args(argv)
    if args.tiered and args.input is None:
        p.error("--tiered requires --input")
    if not args.rehearse and not args.tiered and (
            args.input is None or args.out is None):
        p.error("--input and --out are required (unless --rehearse/--tiered)")

    import ray

    if not ray.is_initialized():
        init_kwargs: dict = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus is not None:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.rehearse:
        rc = _rehearse(args)
        ray.shutdown()
        return rc

    if args.tiered:
        from .pipelines.curate import tiered_dedup_report

        rep = tiered_dedup_report(args.input)
        json.dump({"mode": "tiered",
                   **{c: rep[c][0].as_py() for c in rep.column_names}},
                  sys.stdout, indent=2)
        print()
        ray.shutdown()
        return 0

    from .pipelines.webdedup import run_web_dedup

    input_dir = args.input
    snap_stage: dict = {}
    if args.snapshot_dedup:
        import os
        import shutil
        import time

        import ray.data as rd

        from .pipelines.weburl import keep_latest_snapshot

        import pyarrow.parquet as _pq

        snap_dir = os.path.join(args.out, "stage=snapshots")
        done = os.path.join(snap_dir, "_DONE")
        # the _DONE marker records WHICH input the snapshots came from, so
        # a resume with a different --input recomputes instead of silently
        # reusing another corpus's snapshot stage (ADVICE r4)
        fingerprint = os.path.abspath(input_dir)
        resumed = False
        if os.path.exists(done):
            with open(done) as f:
                resumed = f.read().strip() == fingerprint
        if resumed:
            snap_stage = {"resumed": True, "path": snap_dir}
        else:
            if os.path.isdir(snap_dir):  # stale partial / other-input stage
                shutil.rmtree(snap_dir)
            t0 = time.time()
            keep_latest_snapshot(
                rd.read_parquet(input_dir)).write_parquet(snap_dir)
            with open(done, "w") as f:
                f.write(fingerprint)
            snap_stage = {"resumed": False, "path": snap_dir,
                          "wall_sec": round(time.time() - t0, 3)}
        # per-partition lineage from parquet footers, same accounting as
        # the checkpointer stages (no Ray execution)
        parts = {}
        for f in sorted(os.listdir(snap_dir)):
            if f.endswith(".parquet"):
                fp = os.path.join(snap_dir, f)
                parts[f] = {"rows": _pq.ParquetFile(fp).metadata.num_rows,
                            "bytes": os.path.getsize(fp)}
        snap_stage["rows"] = sum(p["rows"] for p in parts.values())
        snap_stage["partitions"] = parts
        input_dir = snap_dir

    cfg = _auto_config(input_dir)
    out, manifest = run_web_dedup(input_dir, args.out, cfg=cfg,
                                  use_html=args.use_html,
                                  checkpoint=not args.no_checkpoint)
    n_rows = out.count()
    report = {"rows": n_rows, "out": args.out,
              "config": {k: v for k, v in cfg.__dict__.items()},
              "stages": manifest.get("stages", {})}
    if snap_stage:
        report["snapshot_stage"] = snap_stage
    json.dump(report, sys.stdout, indent=2, default=str)
    print()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
