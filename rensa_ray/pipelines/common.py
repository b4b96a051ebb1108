"""Partition-wise shuffle helpers.

Ray Data's per-group ``groupby().aggregate`` / ``map_groups`` call Python once
per group — ruinous for LSH band tables where group cardinality ≈ rows.  The
scale idiom used throughout this package is instead:

1. ``map_batches`` adds an explicit ``part = hash(key) % P`` column,
2. ``groupby("part").map_groups(kernel)`` shuffles once and hands each of the
   P partitions to a **vectorized** numpy/pyarrow kernel (P python calls
   total, not one per key group).

Keys are co-located, the kernel sorts/segments inside the partition, and P is
the only knob that must scale with cluster size (rule of thumb: 2–4× total
cores; each partition must fit in a worker's heap).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

PART_COL = "__part"


def suggest_num_parts(input_bytes: int, num_cpus: int,
                      target_partition_bytes: int = 256 << 20) -> int:
    """Shuffle partition count for a job: max(2× cores, input / 256 MB).

    The two constraints every keyed partitionwise pass has: enough
    partitions to keep all cores busy (2× cores), and each partition small
    enough to sort/group inside one worker's heap (~256 MB of input per
    partition leaves room for the kernel's sort order + output).  The
    cores term dominates on benchmark inputs; the bytes term takes over at
    cluster scale (100 TB / 256 MB ≈ 400k partitions across the fleet).
    """
    by_bytes = -(-int(input_bytes) // int(target_partition_bytes))
    return max(2 * int(num_cpus), by_bytes)


def dir_parquet_bytes(path: str) -> int:
    """Total bytes of the parquet files under ``path`` (one os.scandir, no
    data read) — the input-size estimate ``suggest_num_parts`` wants."""
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    if total == 0 and os.path.isfile(path):
        total = os.path.getsize(path)
    return total


def np_col(batch: pa.Table, name: str) -> np.ndarray:
    """Column → numpy (zero-copy when possible)."""
    return batch[name].to_numpy(zero_copy_only=False)


def add_part_from_uint(ds, key_col: str, num_parts: int):
    """Append ``part = key % num_parts`` (key already hash-distributed)."""

    def _add(batch: pa.Table) -> pa.Table:
        key = np_col(batch, key_col).astype(np.uint64)
        part = (key % np.uint64(num_parts)).astype(np.int32)
        return batch.append_column(PART_COL, pa.array(part, pa.int32()))

    return ds.map_batches(_add, batch_format="pyarrow")


def partitionwise(ds, kernel: Callable[[pa.Table], pa.Table], key_col: str,
                  num_parts: int, drop_part: bool = True,
                  coalesce: bool = False):
    """Hash-partition ``ds`` on ``key_col`` and apply a vectorized kernel per partition.

    ``kernel`` receives one pyarrow.Table holding ALL rows whose key hashes to
    the same partition and returns a pyarrow.Table.  This is the package's
    standard formulation of every keyed wide operation.

    Ray's sort-based shuffle carries driver/scheduling overhead quadratic in
    the input block count — keep upstream block counts ≈ num_parts (read with
    ``override_num_blocks``, avoid small map_batches ``batch_size``).
    ``coalesce=True`` inserts a repartition as a last resort; it is OFF by
    default because repartition is itself a materializing all-to-all barrier
    that breaks pipelining (measured slower than the fan-out it saves).
    """
    parted = add_part_from_uint(ds, key_col, num_parts)
    if coalesce:
        parted = parted.repartition(num_parts)

    def _run(group: pa.Table) -> pa.Table:
        if drop_part and PART_COL in group.column_names:
            group = group.drop_columns([PART_COL])
        return kernel(group)

    return parted.groupby(PART_COL).map_groups(_run, batch_format="pyarrow")


def run_ids(*key_arrays: np.ndarray,
            n_group_keys: int | None = None) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort rows by composite key and label equal-key runs.

    Returns ``(order, gid, counts)``: ``order`` sorts the rows, ``gid[i]`` is
    the run id of sorted row i, ``counts[g]`` the run size.  Rows sort by ALL
    ``key_arrays`` but group by only the first ``n_group_keys`` of them
    (default: all) — pass trailing tie-break keys (e.g. doc id) to make the
    first row of each run the group minimum.  Vectorized replacement for
    per-key grouping.
    """
    n = len(key_arrays[0])
    if n == 0:
        return (np.empty(0, np.int64),) * 2 + (np.empty(0, np.int64),)
    order = np.lexsort(tuple(reversed(key_arrays)))
    if n_group_keys is None:
        n_group_keys = len(key_arrays)
    boundary = np.zeros(n, dtype=bool)
    boundary[0] = True
    for arr in key_arrays[:n_group_keys]:
        s = arr[order]
        boundary[1:] |= s[1:] != s[:-1]
    gid = np.cumsum(boundary) - 1
    counts = np.bincount(gid)
    return order, gid, counts


def merge_flags(ids_ds, hit_ds, id_col: str, num_parts: int):
    """(all-ids dataset, hit-ids dataset) → (id, is_dup) per distinct id.

    The canonical flag merge: mark, union, one keyed pass taking max flag
    per id — used by every flags-shaped lane (batch, cross-corpus,
    incremental) so the kernel exists exactly once.
    """

    def _mark(v: int):
        def _m(b: pa.Table) -> pa.Table:
            return pa.table({id_col: b[id_col],
                             "__f": pa.array(np.full(len(b), v, np.int8))})
        return _m

    all_ids = ids_ds.map_batches(_mark(0), batch_format="pyarrow")
    hits = hit_ds.map_batches(_mark(1), batch_format="pyarrow")

    def _merge(group: pa.Table) -> pa.Table:
        ids = np_col(group, id_col)
        f = np_col(group, "__f")
        if len(ids) == 0:
            return pa.table({id_col: pa.array(ids),
                             "is_dup": pa.array([], pa.bool_())})
        order, gid, counts = run_ids(ids.astype(np.uint64))
        flag = np.zeros(len(counts), dtype=np.int8)
        np.maximum.at(flag, gid, f[order])
        first = np.zeros(len(gid), dtype=bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        return pa.table({id_col: pa.array(ids[order][first]),
                         "is_dup": pa.array(flag > 0)})

    return partitionwise(all_ids.union(hits), _merge, id_col, num_parts)


def distinct_pair_rows(g: pa.Table, col_a: str = "src",
                       col_b: str = "dst") -> pa.Table:
    """Distinct (col_a, col_b) rows of one partition (run partitionwise
    keyed on ``col_a``); preserves the input columns' arrow types exactly.

    Grouping runs in wrapped-uint64 space (bijective, so distinctness is
    unaffected by sign) but kept rows are TAKEN from the original columns —
    casting wrapped values back overflowed for negative signed ids.
    """
    a = np_col(g, col_a).astype(np.uint64)
    b = np_col(g, col_b).astype(np.uint64)
    if len(a) == 0:
        return pa.table({col_a: g[col_a], col_b: g[col_b]})
    o, gg, _ = run_ids(a, b)
    fst = np.zeros(len(gg), dtype=bool)
    fst[0] = True
    fst[1:] = gg[1:] != gg[:-1]
    keep = pa.array(o[fst])
    return pa.table({col_a: g[col_a].combine_chunks().take(keep),
                     col_b: g[col_b].combine_chunks().take(keep)})


def pairs_within_runs(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All unordered within-run pairs, fully vectorized.

    Given run sizes ``counts`` (for rows laid out run-contiguously, as after
    ``run_ids``), returns global row indices ``(i_idx, j_idx)`` enumerating
    every pair (i < j by sorted position) inside each run — the vectorized
    replacement for a python loop of ``np.triu_indices`` per bucket (the
    loop dominates when there are millions of small buckets).
    """
    counts = np.asarray(counts, dtype=np.int64)
    pair_counts = counts * (counts - 1) // 2
    total = int(pair_counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    run_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pair_start = np.concatenate([[0], np.cumsum(pair_counts)[:-1]])
    run_of = np.repeat(np.arange(len(counts)), pair_counts)
    p = np.arange(total, dtype=np.int64) - pair_start[run_of]
    c = counts[run_of]
    # invert the triangular layout: i = row within run, via float sqrt with
    # integer boundary correction (float error is at most ±1 row)
    cf = c.astype(np.float64)
    i = np.floor(((2 * cf - 1) - np.sqrt((2 * cf - 1) ** 2 - 8 * p)) / 2
                 ).astype(np.int64)
    np.clip(i, 0, c - 2, out=i)
    before = i * c - i * (i + 1) // 2
    over = before > p
    while over.any():
        i[over] -= 1
        before = i * c - i * (i + 1) // 2
        over = before > p
    nxt = (i + 1) * c - (i + 1) * (i + 2) // 2
    under = nxt <= p
    while under.any():
        i[under] += 1
        before = i * c - i * (i + 1) // 2
        nxt = (i + 1) * c - (i + 1) * (i + 2) // 2
        under = nxt <= p
    j = i + 1 + (p - before)
    return run_start[run_of] + i, run_start[run_of] + j


def capped_distinct_value_pairs(
        bucket_sorted: np.ndarray, value_boundary: np.ndarray,
        max_bucket: int | None) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                         np.ndarray, np.ndarray, np.ndarray]:
    """Skew-guarded distinct-value pair enumeration — the shared kernel of
    the simhash and cosine-LSH verify lanes.

    Rows are sorted by (bucket, value); ``value_boundary`` marks the first
    row of each (bucket, value) run.  Returns ``(vgid, vcounts, vstart,
    rep_rows, rep_vgroup, ii, jj)``: per-row value-group id, value-group
    sizes, first-row index per value group, then the CAP-FILTERED row index
    and value-group id of one representative per distinct value, and every
    pair ``(ii, jj)`` (indices into ``rep_rows``/``rep_vgroup``) of distinct
    values sharing a bucket.  Buckets holding more than ``max_bucket``
    DISTINCT values are dropped from pair emission entirely — the
    documented recall trade for boilerplate-class skew (equal-value groups
    are unaffected; callers flag/emit those separately at O(k))."""
    vgid = np.cumsum(value_boundary) - 1
    vcounts = np.bincount(vgid)
    vstart = np.flatnonzero(value_boundary)
    rep_key = bucket_sorted[vstart]
    nr = len(vstart)
    rb = np.ones(nr, bool)
    rb[1:] = rep_key[1:] != rep_key[:-1]
    rgid = np.cumsum(rb) - 1
    rcounts = np.bincount(rgid)
    rep_rows, rep_vgroup = vstart, np.arange(nr)
    if max_bucket is not None and (rcounts > max_bucket).any():
        keep = (rcounts <= max_bucket)[rgid]
        rep_rows, rep_vgroup = rep_rows[keep], rep_vgroup[keep]
        rcounts = rcounts[rcounts <= max_bucket]
    ii, jj = pairs_within_runs(rcounts)
    return vgid, vcounts, vstart, rep_rows, rep_vgroup, ii, jj


def explode_doc_token_tf(batch: pa.Table) -> pa.Table:
    """(doc_id, token, tf, __key=fxhash64(token)) per-batch term counts —
    the ONE definition of the whitespace-token explode stage shared by
    ``doc_tfidf``, ``doc_unigram_logprob`` and ``tfidf_cosine_pairs``, so
    the tokenization (lower → split_whitespace → drop empties) and the
    key scheme can never silently diverge from their common SQL-oracle
    convention."""
    import pyarrow.compute as pc

    from ..kernels.hashing import fxhash64_bytes_list

    toks = pc.utf8_split_whitespace(
        pc.utf8_lower(pc.fill_null(batch["text"], "")))
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    ids = np.repeat(np_col(batch, "doc_id"), lens)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "token": flat})
    tbl = tbl.filter(pc.not_equal(tbl["token"], ""))  # boundary empties
    tf = pa.TableGroupBy(tbl, ["doc_id", "token"]).aggregate(
        [("token", "count")]).rename_columns(["doc_id", "token", "tf"])
    key = fxhash64_bytes_list(
        [t.encode("utf-8") for t in tf["token"].to_pylist()])
    return tf.append_column("__key", pa.array(key, pa.uint64()))


def tf_df_weight(g: pa.Table, n_docs: int
                 ) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """In-partition TF-IDF weight kernel shared by ``doc_tfidf`` and
    ``tfidf_cosine_pairs``: re-sum (doc, token) tf partials split across
    input blocks, join per-token df (complete in the token partition),
    return (joined table, tf int64 array, tf·ln(N/df) float array)."""
    tf = pa.TableGroupBy(g, ["doc_id", "token"]).aggregate(
        [("tf", "sum")]).rename_columns(["doc_id", "token", "tf"])
    df_t = pa.TableGroupBy(tf, "token").aggregate(
        [("doc_id", "count")]).rename_columns(["token", "df"])
    j = tf.join(df_t, "token")
    tfv = np_col(j, "tf").astype(np.int64)
    w = tfv * np.log(float(n_docs) / np_col(j, "df").astype(np.float64))
    return j, tfv, w
