"""Streaming execution under object-store pressure.

The 100-TB design leans on Ray's streaming executor + spill-to-disk instead
of fitting data in memory.  This test runs the flagship dedup on a corpus
whose working set exceeds a deliberately tiny object store (fresh Ray
session in a subprocess — the store size can't be changed in the shared
session fixture) and asserts the pipeline still completes with correct
row accounting.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import json, shutil, sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         object_store_memory=200 * 1024 * 1024, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from rensa_ray.sources.corpus import write_corpus
from rensa_ray.pipelines.webdedup import run_web_dedup
from rensa_ray.pipelines.dedup import DedupConfig
shutil.rmtree("/tmp/rensa_spill_test", ignore_errors=True)
cdir, _ = write_corpus("/tmp/rensa_spill_test", n_docs=60000, seed=7,
                       n_shards=16)
out, manifest = run_web_dedup(
    cdir, "/tmp/rensa_spill_test/out",
    DedupConfig(id_col="uid", num_parts=8, concurrency=2))
df = out.to_pandas()
print(json.dumps({"rows": len(df), "dups": int(df.is_dup.sum()),
                  "uids_unique": bool(df.uid.is_unique)}))
ray.shutdown()
shutil.rmtree("/tmp/rensa_spill_test", ignore_errors=True)
"""


def test_flagship_completes_with_tiny_object_store():
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                          capture_output=True, text=True, timeout=900,
                          cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["rows"] == 60000
    assert res["uids_unique"]
    assert res["dups"] > 0
