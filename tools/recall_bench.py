"""Dup-pair recall vs planted truth — the north-rule's second metric.

The graded rule is "dedup throughput (docs/sec) + dup-pair recall >= 0.99".
Throughput comes from bench.py's timed lanes; THIS module supplies the
recall side as a measured artifact (not just a pytest) by joining the
flagship pipeline's cluster assignments against the synthetic corpus
generator's planted ground truth (sources/corpus.py writes, per doc, its
cluster root and TRUE word-3-gram Jaccard to that root).

Two honest bands, mirroring tests/test_recall.py:

- ``exact``  (kind=exact, true j >= 0.999): byte-identical pages — any
  config must find every pair; the >=0.99 bar applies directly.
- ``near_j095`` (kind=near, true j >= 0.95): above the reference
  8-band x 16-row S-curve midpoint (~0.88) where MinHash LSH detects
  reliably.  Pairs between 0.8 and ~0.88 are BELOW the reference
  config's own detection curve — the reference misses them too, so the
  parity claim for those lives in tests/test_recall.py's
  distributed==scalar-oracle recall-1.0 test, not here.

Used two ways:
- ``python tools/recall_bench.py [n_docs]`` — standalone: runs the
  flagship web dedup once on the cached bench corpus and prints the
  recall JSON (initialises its own Ray session).
- ``measure_recall(corpus_dir, assignments)`` — called by bench.py's
  suite lane on an assignments Dataset it already has (untimed; never
  inside a timed window).
"""
from __future__ import annotations

import json
import os
import sys


def measure_recall(corpus_dir: str, assignments) -> dict | None:
    """Join assignments (url, cluster_uid) against the truth sidecar next
    to ``corpus_dir``; returns per-band recall or None if no sidecar.

    Driver-side by design: this is a bench DIAGNOSTIC over the synthetic
    corpus (<= RENSA_BENCH_SCALE_DOCS rows), not a pipeline stage — the
    label map is two int64/string columns, ~100 MB at the 6M-doc scaling
    corpus, and it runs outside every timed window.
    """
    import pyarrow.dataset as pads

    base = os.path.dirname(corpus_dir)
    src = os.path.join(base, "truth.parquet")
    if not os.path.exists(src):
        src = os.path.join(base, "truth")  # sharded layout
        if not os.path.isdir(src):
            return None
    t = (pads.dataset(src)
         .to_table(columns=["url", "root_url", "kind",
                            "true_jaccard_to_root"])
         .to_pandas())
    amap = assignments.select_columns(["url", "cluster_uid"]).to_pandas()
    labels = amap.set_index("url")["cluster_uid"]

    pairs = t[t.url != t.root_url].copy()
    pairs["c_doc"] = pairs.url.map(labels)
    pairs["c_root"] = pairs.root_url.map(labels)

    out: dict = {}
    for name, kind, jmin in (("exact", "exact", 0.999),
                             ("near_j095", "near", 0.95)):
        sel = pairs[(pairs.kind == kind)
                    & (pairs.true_jaccard_to_root >= jmin)]
        n = len(sel)
        out[f"n_pairs_{name}"] = int(n)
        out[f"recall_{name}"] = (
            round(float((sel.c_doc == sel.c_root).mean()), 6) if n else None)
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    import bench
    from rensa_ray.pipelines.dedup import DedupConfig
    from rensa_ray.pipelines.webdedup import run_web_dedup

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    bench._init_ray(num_cpus)
    cdir = bench._corpus_dir(n_docs)
    out_dir = f"/tmp/rensa_bench/recall_{n_docs}_{os.getpid()}"
    import dataclasses
    import shutil

    cfg = dataclasses.replace(DedupConfig.from_env(id_col="uid"),
                              num_parts=max(2 * num_cpus, 16),
                              concurrency=None, batch_size=512)
    try:
        assignments, _ = run_web_dedup(cdir, out_dir, cfg=cfg,
                                       checkpoint=True)
        rec = measure_recall(cdir, assignments)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps({"metric": "dup-pair recall vs planted truth",
                      "n_docs": n_docs, "config": "num_perm=128 bands=8 t=0.8",
                      **(rec or {})}))
    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
