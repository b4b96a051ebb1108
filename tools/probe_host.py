"""Host-state probe for this sandbox's measured memory variance.

The VM faults guest pages in lazily; BASELINE.md documents identical code
measuring the 6M-doc flagship anywhere from 45.8 s (healthy) to 124 s
(degraded) with the first-touch fault rate as the telltale.  Run this
before any ladder/bench whose wall-clock you intend to compare:

    python tools/probe_host.py

Reference points measured on this box (2026-08-17/18):
  cold first-touch  >= ~1 GB/s   healthy window
  cold first-touch  ~100-200 MB/s  degraded window (ladders read eff ~0.65)
  cold first-touch  ~20-30 MB/s  catastrophic window (2-6x wall inflation)
Reuse throughput is always GB/s — only the FIRST touch measures the
hypervisor; later trials measure the recycled heap.
"""

from __future__ import annotations

import json
import time

import numpy as np


def probe(size_mb: int = 250, trials: int = 3) -> dict:
    rates = []
    for _ in range(trials):
        t0 = time.time()
        a = np.empty(size_mb * 1_000_000, np.uint8)
        a[::4096] = 1          # fault every page
        rates.append(size_mb / (time.time() - t0))
        del a
    return {"cold_mb_per_s": round(rates[0], 1),
            "reuse_mb_per_s": [round(r, 1) for r in rates[1:]],
            "verdict": ("healthy" if rates[0] >= 1000 else
                        "degraded" if rates[0] >= 60 else "catastrophic")}


if __name__ == "__main__":
    print(json.dumps(probe()))
