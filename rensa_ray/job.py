"""Packaged job entrypoint for ``ray job submit``.

On a real cluster the flagship dedup runs as:

    ray job submit --working-dir . -- \
        python -m rensa_ray.job --input s3://bucket/pages/ --out s3://bucket/dedup/

(in this sandbox: ``python -m rensa_ray.job --input /tmp/corpus --out /tmp/out``).

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


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m rensa_ray.job",
        description="Checkpointed web-corpus near-dup dedup job.")
    p.add_argument("--input", required=True,
                   help="parquet dir of web pages (url, warc_ts, html, text, lang)")
    p.add_argument("--out", required=True,
                   help="output dir for stage checkpoints + assignments")
    p.add_argument("--use-html", action="store_true",
                   help="extract text from the html column (byte-identical "
                        "invariant) instead of reading the text column")
    p.add_argument("--no-checkpoint", action="store_true",
                   help="disable stage checkpoints (single-shot run)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="num_cpus for a standalone local session (ignored "
                        "when attaching to a running cluster)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        init_kwargs: dict = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus is not None:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.dedup import DedupConfig
    from .pipelines.webdedup import UID_COL, run_web_dedup

    import dataclasses
    import os

    cfg = DedupConfig.from_env(id_col=UID_COL)
    if "RENSA_RAY_CONCURRENCY" not in os.environ:
        # task-pool signer by default: a fixed actor pool sized larger than
        # the cluster deadlocks (reserves CPUs the shuffle stages need),
        # and sized smaller idles cores — tasks fit every cluster size
        cfg = dataclasses.replace(cfg, concurrency=None)
    if "RENSA_RAY_NUM_PARTS" not in os.environ:
        # auto-size shuffle partitions from input bytes + cluster cores so
        # the same submit command works from a laptop corpus to 100 TB
        from .pipelines.common import dir_parquet_bytes, suggest_num_parts

        cores = int(ray.cluster_resources().get("CPU", 8))
        cfg = dataclasses.replace(cfg, num_parts=suggest_num_parts(
            dir_parquet_bytes(args.input), cores))
    out, manifest = run_web_dedup(args.input, args.out, cfg=cfg,
                                  use_html=args.use_html,
                                  checkpoint=not args.no_checkpoint)
    n_rows = out.count()
    report = {"rows": n_rows, "out": args.out,
              "config": {k: v for k, v in cfg.__dict__.items()},
              "stages": manifest.get("stages", {})}
    json.dump(report, sys.stdout, indent=2, default=str)
    print()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
