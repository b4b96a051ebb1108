"""Checkpoint/resume behavior of the flagship web-dedup pipeline.

North-rule requirement: a killed run must resume from the last completed
stage (per-partition lineage in manifest.json), skipping finished stages
and producing identical output.
"""

from __future__ import annotations

import shutil

import pandas as pd


def test_webdedup_resume_skips_finished_stages(ray_session, tmp_path):
    from rensa_ray.pipelines.dedup import DedupConfig
    from rensa_ray.pipelines.webdedup import run_web_dedup
    from rensa_ray.sources.corpus import write_corpus

    cdir, _ = write_corpus(str(tmp_path / "corpus"), n_docs=400, seed=7)
    out_dir = str(tmp_path / "out")
    cfg = DedupConfig(id_col="uid", num_parts=4, concurrency=None)

    out1, m1 = run_web_dedup(cdir, out_dir, cfg)
    df1 = out1.to_pandas().sort_values("uid").reset_index(drop=True)
    assert set(m1["stages"]) == {"signatures", "labels", "assignments"}
    # per-partition lineage present for every stage
    for st in m1["stages"].values():
        assert st["partitions"] and all(
            p["rows"] >= 0 and p["bytes"] > 0 for p in st["partitions"].values())

    sig_dir = tmp_path / "out" / "stage=signatures"
    mtimes = {f.name: f.stat().st_mtime_ns for f in sig_dir.iterdir()}

    # simulate a crash after labels: kill the final stage, rerun
    shutil.rmtree(tmp_path / "out" / "stage=assignments")
    out2, m2 = run_web_dedup(cdir, out_dir, cfg)
    df2 = out2.to_pandas().sort_values("uid").reset_index(drop=True)

    # earlier stages were NOT recomputed (files untouched on disk)
    assert {f.name: f.stat().st_mtime_ns for f in sig_dir.iterdir()} == mtimes
    pd.testing.assert_frame_equal(df1, df2)


def test_webdedup_refuses_resume_on_changed_input(ray_session, tmp_path):
    """ADVICE r4: _SUCCESS alone keyed the resume, so rerunning into an
    --out whose checkpoints came from a DIFFERENT effective input (e.g.
    --snapshot-dedup toggled, which swaps the input dir) silently reused
    stale stages.  Contract now: the manifest records the effective input
    and a mismatched resume is refused with a clear error; same-input
    resume and use_html flips are each their own fingerprint."""
    import pytest

    from rensa_ray.pipelines.dedup import DedupConfig
    from rensa_ray.pipelines.webdedup import run_web_dedup
    from rensa_ray.sources.corpus import write_corpus

    cdir_a, _ = write_corpus(str(tmp_path / "corpus_a"), n_docs=120, seed=7)
    cdir_b, _ = write_corpus(str(tmp_path / "corpus_b"), n_docs=120, seed=8)
    out_dir = str(tmp_path / "out")
    cfg = DedupConfig(id_col="uid", num_parts=4, concurrency=None)

    run_web_dedup(cdir_a, out_dir, cfg)
    # same effective input → normal resume
    run_web_dedup(cdir_a, out_dir, cfg)
    # different input dir → refuse, do not silently reuse stale stages
    with pytest.raises(ValueError, match="different effective input"):
        run_web_dedup(cdir_b, out_dir, cfg)
    # same dir but flipped extraction mode is a different effective input
    with pytest.raises(ValueError, match="different effective input"):
        run_web_dedup(cdir_a, out_dir, cfg, use_html=True)
    # a fresh out dir accepts the new input
    out_b, _ = run_web_dedup(cdir_b, str(tmp_path / "out_b"), cfg)
    assert out_b.count() == 120


def test_webdedup_full_restart_is_noop(ray_session, tmp_path):
    from rensa_ray.pipelines.dedup import DedupConfig
    from rensa_ray.pipelines.webdedup import run_web_dedup
    from rensa_ray.sources.corpus import write_corpus

    cdir, _ = write_corpus(str(tmp_path / "corpus"), n_docs=200, seed=11)
    out_dir = str(tmp_path / "out")
    cfg = DedupConfig(id_col="uid", num_parts=4, concurrency=None)

    out1, _ = run_web_dedup(cdir, out_dir, cfg)
    df1 = out1.to_pandas().sort_values("uid").reset_index(drop=True)
    asg_dir = tmp_path / "out" / "stage=assignments"
    mtimes = {f.name: f.stat().st_mtime_ns for f in asg_dir.iterdir()}

    out2, _ = run_web_dedup(cdir, out_dir, cfg)
    df2 = out2.to_pandas().sort_values("uid").reset_index(drop=True)
    # nothing recomputed, nothing rewritten
    assert {f.name: f.stat().st_mtime_ns for f in asg_dir.iterdir()} == mtimes
    pd.testing.assert_frame_equal(df1, df2)


def test_job_cli_smoke(tmp_path):
    """`python -m rensa_ray.job` — the ray-job-submit entrypoint — runs the
    checkpointed pipeline in its own process and emits the manifest JSON."""
    import json
    import subprocess
    import sys

    from rensa_ray.sources.corpus import write_corpus

    cdir, _ = write_corpus(str(tmp_path / "corpus"), n_docs=120, seed=5)
    out = subprocess.run(
        [sys.executable, "-m", "rensa_ray.job", "--input", cdir,
         "--out", str(tmp_path / "out"), "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo"})
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout)
    assert report["rows"] == 120
    assert set(report["stages"]) == {"signatures", "labels", "assignments"}


def test_job_rehearse_cli(tmp_path):
    """`python -m rensa_ray.job --rehearse` — the one-command scale
    rehearsal — must run flagship + kill/resume in its own process, assert
    stage-skip and output identity, and exit 0 with a JSON verdict."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "rensa_ray.job", "--rehearse",
         "--rehearse-docs", "3000", "--num-cpus", "2",
         "--out", str(tmp_path / "rhz")],
        capture_output=True, text=True, timeout=420,
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo"})
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout)
    assert report["rows"] == 3000
    assert report["resume_identical"] is True
    assert report["finished_stages_untouched"] is True
    assert report["failures"] == []


def test_webdedup_all_unique_corpus_checkpointed(ray_session, tmp_path):
    """A corpus with no LSH collisions produces an EMPTY labels stage; the
    checkpointer must still pin its schema and resume (Ray writes no
    directory at all for a 0-row dataset)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.dedup import DedupConfig
    from rensa_ray.pipelines.webdedup import run_web_dedup

    rng = np.random.default_rng(13)
    n = 60
    texts = [" ".join(f"u{i}_{rng.integers(0, 10**9)}_{j}" for j in range(40))
             for i in range(n)]
    cdir = tmp_path / "corpus"
    cdir.mkdir()
    pq.write_table(pa.table({
        "url": pa.array([f"https://u.test/{i}" for i in range(n)]),
        "text": pa.array(texts)}), str(cdir / "part-0.parquet"))

    out_dir = str(tmp_path / "out")
    cfg = DedupConfig(id_col="uid", num_parts=4, concurrency=None)
    out1, m1 = run_web_dedup(str(cdir), out_dir, cfg)
    df1 = out1.to_pandas()
    assert len(df1) == n and not df1["is_dup"].any()
    assert (tmp_path / "out" / "stage=labels").is_dir()

    # rerun resumes through the empty labels checkpoint
    out2, _ = run_web_dedup(str(cdir), out_dir, cfg)
    assert not out2.to_pandas()["is_dup"].any()


def test_webdedup_resume_discards_stale_partial_stage(ray_session, tmp_path):
    """Partial parquet files from a killed attempt (dir present, no
    _SUCCESS) must be WIPED before the rewrite — write_parquet appends
    under fresh UUID names, which previously doubled every row on resume."""
    import pandas as pd
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.dedup import DedupConfig
    from rensa_ray.pipelines.webdedup import run_web_dedup
    from rensa_ray.sources.corpus import write_corpus

    cdir, _ = write_corpus(str(tmp_path / "corpus"), n_docs=300, seed=9)
    out_dir = str(tmp_path / "out")
    cfg = DedupConfig(id_col="uid", num_parts=4, concurrency=None)

    out1, m1 = run_web_dedup(cdir, out_dir, cfg)
    df1 = out1.to_pandas().sort_values("uid").reset_index(drop=True)
    sig_rows = m1["stages"]["signatures"]["rows"]

    # simulate a crash mid-signatures-write: drop _SUCCESS, keep the files
    sig_dir = tmp_path / "out" / "stage=signatures"
    (sig_dir / "_SUCCESS").unlink()
    import shutil

    shutil.rmtree(tmp_path / "out" / "stage=labels")
    shutil.rmtree(tmp_path / "out" / "stage=assignments")

    out2, m2 = run_web_dedup(cdir, out_dir, cfg)
    df2 = out2.to_pandas().sort_values("uid").reset_index(drop=True)
    assert m2["stages"]["signatures"]["rows"] == sig_rows  # not doubled
    total = sum(pq.ParquetFile(f).metadata.num_rows
                for f in sig_dir.glob("*.parquet"))
    assert total == sig_rows
    pd.testing.assert_frame_equal(df1, df2)


def test_reserve_sentinel_uids_remaps_0_and_max():
    """VERDICT r3 #6: uid 0 (webdedup no-label sentinel) and u64::MAX (CC
    old-label sentinel) can never be document ids after ingest."""
    import numpy as np

    from rensa_ray.pipelines.webdedup import reserve_sentinel_uids

    mx = np.iinfo(np.uint64).max
    uids = np.array([0, 1, mx, 42, 0], np.uint64)
    out = reserve_sentinel_uids(uids.copy())
    assert 0 not in out and mx not in out
    assert out[1] == 1 and out[3] == 42          # non-sentinels untouched
    assert out[0] == out[4]                      # deterministic remap
    # empty batch
    assert len(reserve_sentinel_uids(np.empty(0, np.uint64))) == 0
    # copy-on-write API: the caller's array is never mutated in place …
    out2 = reserve_sentinel_uids(uids)
    assert uids[0] == 0 and uids[2] == mx
    assert 0 not in out2 and mx not in out2
    # … and read-only (zero-copy Arrow-backed) input is accepted
    ro = np.array([0, 7, mx], np.uint64)
    ro.setflags(write=False)
    out3 = reserve_sentinel_uids(ro)
    assert 0 not in out3 and mx not in out3 and out3[1] == 7
