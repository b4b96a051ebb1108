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
