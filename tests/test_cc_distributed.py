"""Distributed connected-components path (iterative min-label propagation).

The driver fast path (local_min_labels) is covered via the dedup pipeline
tests; here we force the distributed loop with driver_cc_threshold=0 and
check it against the in-memory result on graphs with long chains (worst
case for label propagation) and multiple components.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))


def _run_both(src, dst, num_parts=4):
    from rensa_ray.pipelines.cc import connected_components, local_min_labels

    nodes, want = local_min_labels(np.asarray(src), np.asarray(dst))
    got = connected_components(_edges_ds(src, dst), num_parts=num_parts,
                               driver_cc_threshold=0).to_pandas()
    got = dict(zip(got["node"], got["label"]))
    assert set(got) == set(nodes.tolist())
    for n, w in zip(nodes, want):
        assert got[int(n)] == int(w), (n, got[int(n)], w)


def test_distributed_cc_chain(ray_session):
    # one long chain 0-1-2-...-30 plus a separate triangle and an isolated pair
    src = list(range(30)) + [100, 101, 102] + [200]
    dst = list(range(1, 31)) + [101, 102, 100] + [201]
    _run_both(src, dst)


def test_distributed_cc_random_graph(ray_session):
    rng = np.random.default_rng(3)
    src = rng.integers(0, 300, 500)
    dst = rng.integers(0, 300, 500)
    keep = src != dst
    _run_both(src[keep], dst[keep], num_parts=8)


def test_distributed_cc_star_heavy(ray_session):
    # LSH-typical shape: many stars sharing a hub via one bridge edge
    src = [0] * 50 + [1000] * 50 + [0]
    dst = list(range(1, 51)) + list(range(1001, 1051)) + [1000]
    _run_both(src, dst)


def _edges_ds_u64(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src": pa.array(src, pa.uint64()),
        "dst": pa.array(dst, pa.uint64())}))


def test_distributed_cc_uint64_high_bit_converges_early(ray_session, tmp_path):
    """Regression: fxhash64 node ids with the top bit set (the flagship's
    uid domain) must still trip the changed==0 early exit — the old int64
    -1 old-label sentinel compared a negative cast label against -1 every
    round, so propagation always burned all max_rounds.  Round count is
    observed via the per-round checkpoint dirs."""
    import os

    from rensa_ray.pipelines.cc import connected_components, local_min_labels

    base = np.uint64(1 << 63)
    # two star components + a bridge, all ids >= 2^63
    src = np.array([base + 1] * 10 + [base + 100] * 10 + [base + 1],
                   np.uint64)
    dst = np.array([base + np.uint64(2 + i) for i in range(10)]
                   + [base + np.uint64(101 + i) for i in range(10)]
                   + [base + 100], np.uint64)
    ck = str(tmp_path / "cc")
    max_rounds = 30
    got = connected_components(_edges_ds_u64(src, dst), num_parts=4,
                               max_rounds=max_rounds, checkpoint_dir=ck,
                               driver_cc_threshold=0).to_pandas()
    rounds = [d for d in os.listdir(ck) if d.startswith("cc_round=")]
    assert len(rounds) < max_rounds, "early exit never fired"
    nodes, want = local_min_labels(src, dst)
    gm = dict(zip(got["node"], got["label"]))
    for n, w in zip(nodes, want):
        assert gm[int(n)] == int(w)


def test_distributed_cc_checkpoint_resume(ray_session, tmp_path):
    """A killed run (simulated via max_rounds=1) resumes from the last
    COMPLETE round and finishes with the exact labels of a fresh run."""
    import os

    from rensa_ray.pipelines.cc import connected_components, local_min_labels

    src = np.asarray(list(range(25)) + [500], np.int64)   # long chain + pair
    dst = np.asarray(list(range(1, 26)) + [501], np.int64)
    ck = str(tmp_path / "cc")

    partial = connected_components(_edges_ds(src, dst), num_parts=4,
                                   max_rounds=1, checkpoint_dir=ck,
                                   driver_cc_threshold=0)
    partial.count()
    assert os.path.exists(os.path.join(ck, "cc_round=0", "_DONE"))

    resumed = connected_components(_edges_ds(src, dst), num_parts=4,
                                   checkpoint_dir=ck,
                                   driver_cc_threshold=0).to_pandas()
    done = sorted(d for d in os.listdir(ck) if d.startswith("cc_round="))
    assert len(done) > 1                      # continued past round 0
    nodes, want = local_min_labels(src, dst)
    gm = dict(zip(resumed["node"], resumed["label"]))
    for n, w in zip(nodes, want):
        assert gm[int(n)] == int(w)
