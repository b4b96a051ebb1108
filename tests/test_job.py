"""Packaged-job entrypoint smoke test: ``python -m rensa_ray.job`` is what
``ray job submit -- python -m rensa_ray.job ...`` executes on a cluster.
Runs in a fresh subprocess (the job owns its own Ray session) and must
print one JSON report with per-stage lineage; a second identical submit
resumes from the checkpoints (all stages skipped, same output rows).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_job_submit_and_resume(tmp_path):
    from rensa_ray.sources.corpus import write_corpus

    cdir, _ = write_corpus(str(tmp_path / "c"), n_docs=1200, seed=5)
    out = str(tmp_path / "out")
    env = {**os.environ, "PYTHONPATH": REPO}
    cmd = [sys.executable, "-m", "rensa_ray.job", "--input", cdir,
           "--out", out, "--num-cpus", "4"]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=540,
                        cwd=REPO, env=env)
    assert r1.returncode == 0, r1.stderr[-2000:]
    rep1 = json.loads(r1.stdout[r1.stdout.index("{"):])
    assert rep1["rows"] == 1200
    assert set(rep1["stages"]) == {"signatures", "labels", "assignments"}
    assert all("partitions" in st for st in rep1["stages"].values())

    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=540,
                        cwd=REPO, env=env)
    assert r2.returncode == 0, r2.stderr[-2000:]
    rep2 = json.loads(r2.stdout[r2.stdout.index("{"):])
    assert rep2["rows"] == 1200
    # resume: stage manifests are the ORIGINAL runs' (walls unchanged)
    for k in rep1["stages"]:
        assert rep2["stages"][k]["rows"] == rep1["stages"][k]["rows"]


def test_job_tiered_mode(tmp_path):
    """--tiered runs the tier report CLI end-to-end on a documents dir and
    prints one JSON object with the per-tier counts."""
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    span = " ".join(f"s{i}" for i in range(12))
    tail_a = " ".join(f"x{i}" for i in range(40))
    tail_b = " ".join(f"y{i}" for i in range(40))
    # long distinct tails keep the span docs below the near-dup threshold,
    # so the shared 12-token run survives to the substring-cut tier
    texts = ["a b", "a b", " ".join(f"u{i}" for i in range(30)),
             f"{span} {tail_a}", f"{span} {tail_b}"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    proc = subprocess.run(
        [sys.executable, "-m", "rensa_ray.job", "--tiered",
         "--input", str(tmp_path), "--num-cpus", "4"],
        capture_output=True, text=True, timeout=280, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout)
    assert rep["n_input"] == 5
    assert rep["n_after_exact"] == 4          # the "a b" copy drops
    assert rep["tokens_removed_cut"] == 24    # the 12-token span, both docs


def test_job_snapshot_dedup_pre_stage(tmp_path):
    """--snapshot-dedup collapses canonical-url re-crawls before content
    dedup, checkpoints under stage=snapshots, and a re-run resumes it."""
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["old capture words here", "new capture words here",
             " ".join(f"u{i}" for i in range(20)),
             " ".join(f"v{i}" for i in range(20))]
    tbl = pa.table({
        "url": pa.array(["https://a.test/p?utm_source=x",
                         "https://a.test/p",
                         "https://b.test/q", "https://c.test/r"],
                        pa.string()),
        "warc_ts": pa.array([100, 200, 50, 60], pa.timestamp("us")),
        "html": pa.array([t.encode() for t in texts], pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 4, pa.string())})
    cdir = tmp_path / "corpus"
    cdir.mkdir()
    pq.write_table(tbl, str(cdir / "part0.parquet"))
    out = str(tmp_path / "out")

    cmd = [sys.executable, "-m", "rensa_ray.job", "--snapshot-dedup",
           "--input", str(cdir), "--out", out, "--num-cpus", "4"]
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=280, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout)
    # 4 pages -> 3 after the snapshot tier (the utm alias collapses to
    # the newest capture), and those 3 texts are mutually distinct
    assert rep["rows"] == 3
    assert rep["snapshot_stage"]["resumed"] is False
    assert rep["snapshot_stage"]["rows"] == 3
    assert sum(p["rows"] for p in
               rep["snapshot_stage"]["partitions"].values()) == 3
    snap_texts = pq.read_table(f"{out}/stage=snapshots")["text"].to_pylist()
    assert "new capture words here" in snap_texts
    assert "old capture words here" not in snap_texts

    proc2 = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=280, cwd="/root/repo")
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    rep2 = json.loads(proc2.stdout)
    assert rep2["snapshot_stage"]["resumed"] is True
    assert rep2["rows"] == 3
