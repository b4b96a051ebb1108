"""Fault tolerance: Ray's task retry + lineage recomputation carry the
pipeline through worker loss mid-task.

On a real multi-node cluster the same mechanism covers node loss: a crashed
map task (or shuffle-reduce task) is retried and its inputs recomputed from
lineage.  We simulate worker loss with ``os._exit`` inside a batch kernel —
a hard process death, not a Python exception — gated by a filesystem marker
so exactly the first execution dies.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _crash_once_fn(marker: str):
    def _fn(b: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            try:
                open(marker, "x").close()
            except FileExistsError:
                pass
            else:
                os._exit(1)  # hard worker death, not an exception
        import pyarrow.compute as pc

        return b.set_column(0, b.column_names[0],
                            pc.add(b[b.column_names[0]], 1))
    return _fn


def test_map_task_survives_worker_crash(ray_session, tmp_path):
    import ray.data as rd

    marker = str(tmp_path / "crashed-map")
    t = pa.table({"x": pa.array(range(1000), pa.int64())})
    out = (rd.from_arrow(t)
           .map_batches(_crash_once_fn(marker), batch_format="pyarrow",
                        batch_size=100)
           .to_pandas())
    assert os.path.exists(marker)  # the crash really happened
    assert sorted(out["x"].tolist()) == list(range(1, 1001))


def test_shuffle_pipeline_survives_worker_crash(ray_session, tmp_path):
    """Crash inside a partition kernel AFTER the all-to-all shuffle: the
    reduce task is retried and upstream blocks recomputed from lineage;
    output must equal the crash-free run."""
    import ray.data as rd

    from rensa_ray.pipelines.common import np_col, partitionwise

    marker = str(tmp_path / "crashed-shuffle")
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 50, 5000).astype(np.uint64)
    t = pa.table({"k": pa.array(keys, pa.uint64()),
                  "v": pa.array(rng.integers(0, 100, 5000), pa.int64())})

    def _kernel_with_crash(g: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            try:
                open(marker, "x").close()
            except FileExistsError:
                pass
            else:
                os._exit(1)
        return _sum_kernel(g)

    def _sum_kernel(g: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(g, "k").aggregate([("v", "sum")])
        return agg.rename_columns(["k", "v_sum"])

    ds = rd.from_arrow(t)
    got = (partitionwise(ds, _kernel_with_crash, "k", 4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert os.path.exists(marker)
    want = (partitionwise(rd.from_arrow(t), _sum_kernel, "k", 4)
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert got.equals(want)


def test_textop_lane_survives_worker_crash(ray_session, tmp_path, monkeypatch):
    """An end-to-end REGISTRY lane (doc_dup_ngram_fraction: map combiner →
    gram shuffle → doc shuffle) survives a hard worker death in its map
    stage and produces the crash-free result — op-level evidence that the
    r4 corpus-quality family inherits Ray's lineage retry like the
    flagship does."""
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.textops import doc_dup_ngram_fraction

    texts = ["a b c d e", "a b c x y", "p q r s t"] * 50
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    want = doc_dup_ngram_fraction(str(tmp_path)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    marker = str(tmp_path / "crashed-lane")
    from rensa_ray.kernels import shingle

    real = shingle.batch_shingle_hashes

    def _crashing(texts_, ngram_size=3):
        if not os.path.exists(marker):
            try:
                open(marker, "x").close()
            except FileExistsError:
                pass
            else:
                os._exit(1)
        return real(texts_, ngram_size)

    monkeypatch.setattr(shingle, "batch_shingle_hashes", _crashing)
    got = doc_dup_ngram_fraction(str(tmp_path)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert os.path.exists(marker)
    assert (got["n_grams"] == want["n_grams"]).all()
    assert (got["dup_frac"] == want["dup_frac"]).all()
