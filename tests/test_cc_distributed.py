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
