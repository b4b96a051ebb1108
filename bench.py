#!/usr/bin/env python
"""Benchmark harness.

Default mode: time the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and print ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: run the flagship web-corpus dedup in FRESH processes at
num_cpus 2 / 8 / 32 on the same input (the sandbox stand-in for N vs 4N Ray
nodes) and report throughputs + N→4N scaling efficiencies (2→8 primary,
8→32 as the hardware-ceiling diagnostic).

``--worker CPUS`` (internal): one flagship run in this process; prints JSON.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
WEB_DOCS = int(os.environ.get("RENSA_BENCH_WEB_DOCS", "50000"))
# this host shows ~6x per-query wall-time variance between invisible
# host-state windows (BASELINE.md first-touch-fault evidence); a single
# trial can misrepresent the engine in either direction, so every reported
# number is the MEDIAN of >=TRIALS timed runs after one untimed warm-up,
# and the min/max spread is emitted beside it
TRIALS = max(1, int(os.environ.get("RENSA_BENCH_TRIALS", "3")))
# scaling runs need enough parallel work that fixed per-stage overheads
# (actor-pool spin-up, checkpoint round-trips, driver CC) don't dominate
SCALE_DOCS = int(os.environ.get("RENSA_BENCH_SCALE_DOCS", "6000000"))
CORPUS_SEED = 12345


def _corpus_dir(n_docs: int) -> str:
    """Deterministic synthetic web corpus, generated once and cached."""
    base = f"/tmp/rensa_bench/corpus_{n_docs}_{CORPUS_SEED}"
    marker = os.path.join(base, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(base, ignore_errors=True)
        if n_docs >= 200_000:
            from rensa_ray.sources.corpus import write_corpus_parallel

            write_corpus_parallel(base, n_docs=n_docs, seed=CORPUS_SEED,
                                  n_shards=64, n_procs=16)
        else:
            from rensa_ray.sources.corpus import write_corpus

            write_corpus(base, n_docs=n_docs, seed=CORPUS_SEED, n_shards=64)
        with open(marker, "w") as f:
            f.write("ok")
    return os.path.join(base, "corpus")


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _flagship_webdedup(num_cpus: int, n_docs: int,
                       want_recall: bool = False) -> dict:
    """Full web dedup (sign → band shuffle → edges → CC → assignments)."""
    from rensa_ray.pipelines.dedup import DedupConfig
    from rensa_ray.pipelines.webdedup import run_web_dedup

    cdir = _corpus_dir(n_docs)
    out = f"/tmp/rensa_bench/out_{n_docs}_{num_cpus}_{os.getpid()}"
    shutil.rmtree(out, ignore_errors=True)
    # task-pool signer (concurrency=None): schedules onto every free CPU at
    # any cluster size — fixed actor pools deadlock when sized to the whole
    # cluster and idle cores when undersized (see compute_signatures).
    # RENSA_RAY_* env knobs override any of these (DedupConfig.from_env).
    import dataclasses

    cfg = DedupConfig.from_env(id_col="uid")
    patch = {}
    if "RENSA_RAY_NUM_PARTS" not in os.environ:
        patch["num_parts"] = max(2 * num_cpus, 16)
    if "RENSA_RAY_CONCURRENCY" not in os.environ:
        patch["concurrency"] = None
    if "RENSA_RAY_BATCH_SIZE" not in os.environ:
        patch["batch_size"] = 512
    cfg = dataclasses.replace(cfg, **patch)
    t0 = time.time()
    assignments, manifest = run_web_dedup(cdir, out, cfg=cfg, checkpoint=True)
    rows = assignments.count()
    wall = time.time() - t0
    res = {"rows": rows, "sec": round(wall, 3),
           "docs_per_sec": round(n_docs / wall, 1),
           "stages": {k: v["wall_sec"] for k, v in manifest["stages"].items()}}
    if want_recall:
        # the north rule's second metric (dup-pair recall >= 0.99 vs the
        # planted ground truth); measured OUTSIDE the timed window — wall
        # above is already closed — and before the checkpoint dir goes away
        from tools.recall_bench import measure_recall

        res["recall"] = measure_recall(cdir, assignments)
    shutil.rmtree(out, ignore_errors=True)
    return res


def _tiered_webdedup(n_docs: int) -> dict:
    """Composite tier lane: snapshot → exact → near over a corpus with
    planted crawl re-captures (snapshot_dup_frac=0.15)."""
    from rensa_ray.pipelines.curate import web_tiered_dedup
    from rensa_ray.pipelines.dedup import DedupConfig

    base = f"/tmp/rensa_bench/corpus_snap_{n_docs}_{CORPUS_SEED}"
    marker = os.path.join(base, "_DONE")
    if not os.path.exists(marker):
        from rensa_ray.sources.corpus import write_corpus

        shutil.rmtree(base, ignore_errors=True)
        write_corpus(base, n_docs=n_docs, seed=CORPUS_SEED, n_shards=64,
                     snapshot_dup_frac=0.15)
        with open(marker, "w") as f:
            f.write("ok")
    cfg = DedupConfig(id_col="uid", num_parts=max(2 * NUM_CPUS, 16),
                      concurrency=None, batch_size=512)
    t0 = time.time()
    _kept, report = web_tiered_dedup(os.path.join(base, "corpus"), cfg=cfg,
                                     num_parts=cfg.num_parts)
    wall = time.time() - t0
    row = report.to_pylist()[0]
    return {"sec": round(wall, 3), "tiers": row,
            "docs_per_sec": round(row["n_input"] / wall, 1)}


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def _host_probe() -> dict:
    """One host-state probe (tools/probe_host.py): cold first-touch MB/s +
    verdict.  Automated per VERDICT r4 #9 — every BENCH artifact carries
    the window it was measured in, so cross-round comparisons don't need
    the manual BASELINE.md protocol."""
    from tools.probe_host import probe

    return probe()


class _CpuSampler:
    """Background /proc/stat sampler over a core set: (monotonic t, busy
    jiffies) every ``period`` seconds.  Used by the scaling worker to
    attribute CPU utilization per pipeline stage, separating the
    physical-core ceiling (high util, low speedup) from executor overhead
    (low util)."""

    def __init__(self, cpu_ids: list[int], period: float = 0.25):
        import threading

        self.cpu_ids = set(cpu_ids)
        self.period = period
        self.samples: list[tuple[float, float]] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _busy(self) -> float:
        busy = 0.0
        try:
            with open("/proc/stat") as f:
                for line in f:
                    if not line.startswith("cpu") or line[3] == " ":
                        continue
                    cpu_id = int(line[3:line.index(" ")])
                    if cpu_id not in self.cpu_ids:
                        continue
                    v = [int(x) for x in line.split()[1:]]
                    # busy = everything but idle(3) + iowait(4)
                    busy += sum(v) - v[3] - (v[4] if len(v) > 4 else 0)
        except OSError:  # pragma: no cover
            return 0.0
        return busy

    def _run(self):
        while not self._stop.is_set():
            self.samples.append((time.monotonic(), self._busy()))
            self._stop.wait(self.period)

    def __enter__(self):
        self.samples.append((time.monotonic(), self._busy()))
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=2)
        self.samples.append((time.monotonic(), self._busy()))

    def util_between(self, t0: float, t1: float) -> float | None:
        """Mean utilization (0..1 of the core set) over [t0, t1]."""
        hz = os.sysconf("SC_CLK_TCK")
        pts = [(t, b) for t, b in self.samples if t0 - 0.5 <= t <= t1 + 0.5]
        if len(pts) < 2 or t1 <= t0:
            return None
        dt = pts[-1][0] - pts[0][0]
        if dt <= 0:
            return None
        db = pts[-1][1] - pts[0][1]
        return round(db / (dt * hz * len(self.cpu_ids)), 3)


def run_suite() -> dict:
    _init_ray(NUM_CPUS)
    import __ray_entry__ as mod

    # warm Ray Data's executor/worker pool once so the first timed query
    # doesn't absorb the session's cold-start (~5-10 s on this host)
    import ray.data as rd

    rd.range(1000).map_batches(lambda b: b).count()

    qfns = mod.queries()
    headline = [
        "minhash_dup_flags", "minhash_clusters", "cminhash_dup_flags",
        "simhash_dup_flags", "exact_dedup_kept", "ngram_jaccard_pairs",
        "cosine_pairs_lsh", "cosine_topk", "top_tokens", "user_sessions",
        "doc_repetition_stats", "pack_sequences", "rho_dup_flags",
        "substring_dup_spans", "substring_dup_spans_sa",
        # round-4 corpus-quality lanes (heaviest of the new family)
        "doc_dup_ngram_fraction", "pmi_bigrams",
        # round-4 session-2 corpus-prep lanes (the two with real shuffles)
        "strip_boilerplate_lines", "source_token_kl",
        # round-5: the 100-TB-relevant similarity scale paths (VERDICT r4
        # #5) — correctness-verified since r4, now perf-tracked too
        "knn_graph_ivf", "tfidf_cosine_pairs", "lsh_query_candidates",
        # round-5 session-3 dedup tiers: normalization-keyed exact dedup,
        # keep-longest containment dedup, cross-doc duplicate-line signal
        "normalized_exact_dedup_kept", "containment_dedup_kept",
        "dup_line_fraction",
    ]
    probes = {"start": _host_probe()}
    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in headline:
        qfns[name](SF_DIR)  # untimed warm-up (page cache, actor spin-up)
        trials = []
        for _ in range(TRIALS):
            t0 = time.time()
            qfns[name](SF_DIR)
            trials.append(round(time.time() - t0, 3))
        times[name] = round(_median(trials), 3)
        spread[name] = [min(trials), max(trials)]
    probes["mid"] = _host_probe()

    # composite tier lane (snapshot → exact → near over planted re-captures)
    _tiered_webdedup(WEB_DOCS)  # warm-up (corpus generation + page cache)
    tiered = [_tiered_webdedup(WEB_DOCS) for _ in range(TRIALS)]
    tmed = sorted(tiered, key=lambda w: w["sec"])[len(tiered) // 2]
    times["webcorpus_tiered"] = tmed["sec"]
    spread["webcorpus_tiered"] = [min(w["sec"] for w in tiered),
                                  max(w["sec"] for w in tiered)]

    # untimed warm-up doubles as the recall measurement run (north rule:
    # throughput AND dup-pair recall >= 0.99 on the same config)
    warm = _flagship_webdedup(NUM_CPUS, WEB_DOCS, want_recall=True)
    webs = [_flagship_webdedup(NUM_CPUS, WEB_DOCS) for _ in range(TRIALS)]
    web = sorted(webs, key=lambda w: w["sec"])[len(webs) // 2]
    times["webcorpus_dedup"] = web["sec"]
    spread["webcorpus_dedup"] = [min(w["sec"] for w in webs),
                                 max(w["sec"] for w in webs)]
    probes["end"] = _host_probe()

    # auto-flag lanes measured while an adjacent probe read non-healthy —
    # their walls are host-inflated per the BASELINE.md protocol and must
    # not be read as engine regressions
    flagged: list[str] = []
    if any(probes[p]["verdict"] != "healthy" for p in ("start", "mid")):
        flagged += [n for n in headline]
    if any(probes[p]["verdict"] != "healthy" for p in ("mid", "end")):
        flagged += ["webcorpus_dedup", "webcorpus_tiered"]

    total = round(sum(times.values()), 3)
    return {
        "metric": "dedup+ops suite wall time (flagship: 50k-doc web corpus near-dup dedup)",
        "value": total, "unit": "sec", "queries": times,
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
        "trials_per_query": TRIALS, "query_spread_sec": spread,
        "web_docs": WEB_DOCS, "web_docs_per_sec": web["docs_per_sec"],
        "web_stage_sec": web["stages"],
        "web_tier_counts": tmed["tiers"],
        "web_tiered_docs_per_sec": tmed["docs_per_sec"],
        "web_dup_pair_recall": warm.get("recall"),
        "host_state": probes, "host_flagged_lanes": flagged,
    }


def run_worker(num_cpus: int) -> dict:
    _init_ray(num_cpus)
    # taskset pins this process (and every Ray subprocess) to cores
    # 0..N-1, so the sampler's core set matches the budget exactly
    with _CpuSampler(list(range(num_cpus))) as smp:
        t_start = time.monotonic()
        web = _flagship_webdedup(num_cpus, SCALE_DOCS)
    # per-stage utilization, attributed by the stages' sequential walls
    # (approximate: between-stage checkpoint I/O shifts boundaries by a
    # fraction of a second — fine for the ceiling-vs-overhead diagnostic)
    util: dict = {}
    cur = t_start
    for st, w in web["stages"].items():
        util[st] = smp.util_between(cur, cur + w)
        cur += w
    util["overall"] = smp.util_between(t_start, t_start + web["sec"])
    return {"num_cpus": num_cpus, **web, "stage_cpu_util": util}


SCALE_RUNGS = (2, 8, 16, 32)


def run_scaling() -> dict:
    """Same flagship job at N and 4N CPUs in fresh processes.

    Primary criterion pair: 2 vs 8 CPUs (N vs 4N inside this VM's linear
    scaling region).  The 16 rung (VERDICT r4 #6) brackets the host's
    ~16-physical-core boundary: 8→16 stays inside physical cores while
    16→32 crosses into SMT sharing, so their efficiencies + the per-stage
    CPU utilizations separate the hardware ceiling (high util, low
    speedup) from executor overhead (low util) — see BASELINE.md.
    """
    _corpus_dir(SCALE_DOCS)  # generate once, outside the timed runs
    trials = int(os.environ.get("RENSA_SCALE_TRIALS", "1"))
    probes = {"start": _host_probe()}
    results = {}
    for cpus in SCALE_RUNGS:
        best = None
        for _ in range(trials):
            cmd = [sys.executable, os.path.abspath(__file__), "--worker",
                   str(cpus)]
            if shutil.which("taskset"):
                # confine the WHOLE Ray runtime (raylet, object store,
                # driver) to the N cores — ray.init(num_cpus=N) only limits
                # task scheduling, letting system processes run on extra
                # host cores and inflate small-N throughput; a real N-node
                # cluster pays those costs inside its own nodes
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600)
            lines = proc.stdout.strip().splitlines()
            if proc.returncode != 0 or not lines:
                raise RuntimeError(
                    f"worker --worker {cpus} failed (rc={proc.returncode}): "
                    f"{proc.stderr[-2000:]}")
            r = json.loads(lines[-1])
            if best is None or r["docs_per_sec"] > best["docs_per_sec"]:
                best = r
        results[cpus] = best
    probes["end"] = _host_probe()
    t2, t8, t16, t32 = (results[c]["docs_per_sec"] for c in SCALE_RUNGS)
    eff_2_8 = (t8 / t2) / 4
    eff_8_32 = (t32 / t8) / 4
    return {
        "metric": "flagship web dedup scaling N→4N cpus (fresh ray sessions; "
                  "stand-in for N→4N nodes)",
        "value": round(eff_2_8, 3), "unit": "scaling_efficiency",
        "queries": {"docs_per_sec_2cpu": t2, "docs_per_sec_8cpu": t8,
                    "docs_per_sec_16cpu": t16, "docs_per_sec_32cpu": t32,
                    "sec_2cpu": results[2]["sec"], "sec_8cpu": results[8]["sec"],
                    "sec_16cpu": results[16]["sec"],
                    "sec_32cpu": results[32]["sec"],
                    "speedup_2_8": round(t8 / t2, 3),
                    "efficiency_2_8": round(eff_2_8, 3),
                    "speedup_8_16": round(t16 / t8, 3),
                    "efficiency_8_16": round((t16 / t8) / 2, 3),
                    "speedup_16_32": round(t32 / t16, 3),
                    "efficiency_16_32_hw_limited": round((t32 / t16) / 2, 3),
                    "speedup_8_32": round(t32 / t8, 3),
                    "efficiency_8_32_hw_limited": round(eff_8_32, 3)},
        "stage_cpu_util": {str(c): results[c].get("stage_cpu_util")
                           for c in SCALE_RUNGS},
        "host_state": probes,
        "sf": f"synthetic web corpus n={SCALE_DOCS}", "num_cpus": 32,
    }


def main():
    import ray

    if "--worker" in sys.argv:
        out = run_worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    elif "--scaling" in sys.argv:
        out = run_scaling()
    else:
        out = run_suite()
    print(json.dumps(out))
    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
