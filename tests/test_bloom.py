"""Bloom-filter dedup lane: kernel properties, streaming stage, incremental
flow (state/bloom.py)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest

from rensa_ray.state.bloom import (
    BloomFilter,
    StreamingBloomDedupStage,
    bits_contain,
    incremental_dedup_exact_bloom,
)


def _rand_keys(n: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 2**63, n, dtype=np.int64).astype(np.uint64)


def test_no_false_negatives_and_fp_near_target():
    b = BloomFilter(capacity=20_000, fp_rate=0.01, seed=3)
    keys = np.unique(_rand_keys(20_000, 0))
    b.add_many(keys)
    assert b.contains_many(keys).all()  # Bloom invariant: no false negatives
    probe = _rand_keys(100_000, 1)
    probe = probe[~np.isin(probe, keys)]
    fp = b.contains_many(probe).mean()
    assert fp < 0.03  # at full rated load, ~1% target with slack


def test_add_many_first_wins_within_call():
    b = BloomFilter(capacity=1000, fp_rate=1e-6, seed=1)
    keys = np.array([7, 8, 7, 9, 8, 7], dtype=np.uint64)
    seen = b.add_many(keys)
    assert seen.tolist() == [False, False, True, False, True, True]
    # and a second call sees everything
    assert b.add_many(keys).all()


def test_merge_equals_union():
    a = BloomFilter(capacity=5000, fp_rate=0.01, seed=9)
    b = BloomFilter(capacity=5000, fp_rate=0.01, seed=9)
    ka, kb = _rand_keys(2000, 2), _rand_keys(2000, 3)
    a.add_many(ka)
    b.add_many(kb)
    a.merge(b)
    assert a.contains_many(ka).all() and a.contains_many(kb).all()
    with pytest.raises(ValueError):
        a.merge(BloomFilter(capacity=5000, fp_rate=0.01, seed=10))


def test_serialization_roundtrip_and_module_probe():
    b = BloomFilter(capacity=3000, fp_rate=0.005, seed=4)
    keys = _rand_keys(1000, 5)
    b.add_many(keys)
    b2 = BloomFilter.from_bytes(b.to_bytes())
    assert b2.n_added == b.n_added and b2.num_hashes == b.num_hashes
    assert b2.contains_many(keys).all()
    # module-level probe over the raw bitset (the broadcast path) agrees
    assert bits_contain(b._bits, keys, b.num_bits, b.num_hashes,
                        b.seed).all()


def test_validation():
    with pytest.raises(ValueError):
        BloomFilter(0)
    with pytest.raises(ValueError):
        BloomFilter(10, fp_rate=1.5)


def test_streaming_bloom_stage_first_wins(ray_session):
    import ray.data as rd

    texts = ["alpha beta", "gamma delta", "alpha beta", "epsilon",
             "gamma delta", "alpha beta"]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()), "text": texts})
    out = (rd.from_arrow(t)
           .map_batches(StreamingBloomDedupStage,
                        fn_constructor_kwargs={"capacity": 10_000,
                                               "fp_rate": 1e-6},
                        concurrency=1, batch_size=2, batch_format="pyarrow")
           .to_pandas().set_index("doc_id").sort_index())
    assert out["is_dup"].tolist() == [False, False, True, False, True, True]


def test_incremental_bloom_flow(ray_session):
    """Two micro-batches: history collisions + in-batch collisions, exact at
    negligible fp; state survives the round-trip through the sidecar file."""
    import ray.data as rd

    batch1 = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["aa", "bb", "aa", "cc"]})          # 2 dups 0 (in batch)
    batch2 = pa.table({
        "doc_id": pa.array([4, 5, 6, 7], pa.int64()),
        "text": ["bb", "dd", "dd", "ee"]})          # 4 dups history; 6 dups 5
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "state.bloom")
        f1 = incremental_dedup_exact_bloom(
            rd.from_arrow(batch1), path, capacity=100_000, fp_rate=1e-6,
            num_parts=2).to_pandas().set_index("doc_id").sort_index()
        assert os.path.exists(path)
        f2 = incremental_dedup_exact_bloom(
            rd.from_arrow(batch2), path, capacity=100_000, fp_rate=1e-6,
            num_parts=2).to_pandas().set_index("doc_id").sort_index()
    assert f1["is_dup"].tolist() == [False, False, True, False]
    assert f2["is_dup"].tolist() == [True, False, True, False]


def test_bloom_warns_once_past_capacity():
    import warnings

    from rensa_ray.state.bloom import BloomFilter

    bf = BloomFilter(capacity=100, fp_rate=0.01, seed=1)
    keys = np.arange(1, 301, dtype=np.uint64)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bf.add_many(keys[:150])
        bf.add_many(keys[150:])
        hits = [x for x in w if issubclass(x.category, RuntimeWarning)
                and "capacity" in str(x.message)]
    assert len(hits) == 1                      # warned exactly once
    assert bf.n_added == 300
