"""HyperLogLog sketch: kernel exactness properties + the shuffle-free
approx-distinct operator vs the exact DuckDB count."""

from __future__ import annotations

import numpy as np
import pytest

from rensa_ray.kernels.hll import HyperLogLog, _clz64, _popcount64


def test_popcount_and_clz_exact():
    x = np.array([0, 1, 2, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63, (1 << 63) - 1],
                 dtype=np.uint64)
    assert _popcount64(x).tolist() == [0, 1, 1, 2, 64, 1, 63]
    assert _clz64(x).tolist() == [64, 63, 62, 62, 0, 0, 1]
    # exhaustive single-bit check (the float-log2 hazard cases)
    bits = np.uint64(1) << np.arange(64, dtype=np.uint64)
    assert (_clz64(bits) == 63 - np.arange(64)).all()


def test_estimate_within_error_bound():
    rng = np.random.default_rng(7)
    for n in (1000, 100_000):
        keys = rng.integers(0, 2**64, n, dtype=np.uint64)
        est = HyperLogLog(14).add_hashes(keys).estimate()
        assert abs(est - n) / n < 0.05  # 1.04/sqrt(2^14) = 0.8%; 5x slack


def test_merge_equals_single_pass_and_validation():
    rng = np.random.default_rng(1)
    k = rng.integers(0, 2**64, 50_000, dtype=np.uint64)
    a = HyperLogLog(12).add_hashes(k[:20_000])
    b = HyperLogLog(12).add_hashes(k[20_000:])
    whole = HyperLogLog(12).add_hashes(k)
    assert (a.merge(b).registers == whole.registers).all()
    with pytest.raises(ValueError):
        a.merge(HyperLogLog(13))
    with pytest.raises(ValueError):
        HyperLogLog(3)


def test_roundtrip_and_duplicates_do_not_inflate():
    rng = np.random.default_rng(2)
    k = rng.integers(0, 2**64, 10_000, dtype=np.uint64)
    h = HyperLogLog(14).add_hashes(np.tile(k, 5))  # 5x duplicated stream
    h2 = HyperLogLog.from_numpy(h.to_numpy())
    assert (h2.registers == h.registers).all()
    assert abs(h.estimate() - 10_000) / 10_000 < 0.05


def test_approx_distinct_tokens_vs_exact(ray_session):
    import duckdb

    from rensa_ray.pipelines.textops import approx_distinct_tokens

    sf = "/root/testdata/sf0.001"
    got = approx_distinct_tokens(sf)["approx_distinct"][0].as_py()
    exact = duckdb.sql(f"""
        SELECT COUNT(DISTINCT token) FROM (
          SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
          FROM read_parquet('{sf}/documents.parquet') WHERE trim(text) <> '')
    """).fetchone()[0]
    assert abs(got - exact) / exact < 0.03
