"""Similarity search over an embedding column (``list<float>``).

Three lanes, all streaming over the embeddings Dataset:

- ``cosine_topk``     — brute-force top-k: the (small) query matrix is
  normalized once, broadcast via ``ray.put``, and every batch computes one
  float64 matmul against it; per-batch partial top-k rows are reduced at the
  end (tiny: blocks × Q × k rows).  This is the exact baseline.
- ``cosine_pairs``    — all-pairs similarity self-join above a threshold:
  the normalized corpus matrix is broadcast once and each batch emits its
  (id_a < id_b, cos ≥ t) pairs.  O(n²) work distributed over batches —
  exact, fine up to ~10⁵ vectors; beyond that use the LSH variant.
- ``cosine_pairs_lsh``— the scale path: random-hyperplane signatures bucket
  vectors into ``num_tables`` independent LSH tables; candidate pairs are
  generated per bucket (partition-wise shuffle, no broadcast of the corpus)
  and verified with exact cosine inside the same kernel.  Recall is tuned by
  (num_bits, num_tables); pairs are deduped across tables.

The embedding payload rides the shuffle as a ``fixed_size_list<float>``
column — zero-copy to numpy inside kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.hashing import splitmix64_stream
from .common import np_col, partitionwise, run_ids

EMB_FILE = "embeddings.parquet"


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{EMB_FILE}", columns=["vec_id", "embedding"])


def _emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix."""
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # pragma: no cover
        arr = arr.combine_chunks()
    values = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    if n == 0:
        return np.empty((0, 0))
    return values.reshape(n, -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _load_matrix_local(sf_dir: str, max_vec_id: int | None = None):
    """Driver-side load of the (small) broadcast side via pyarrow directly.

    With ``max_vec_id`` set (the query-vector case), row groups whose
    footer statistics prove ``min(vec_id) >= max_vec_id`` are skipped — the
    driver reads a handful of row groups for its ~10 query vectors instead
    of the whole corpus (statistics-free files fall back to a full read).
    """
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/{EMB_FILE}")
    if max_vec_id is None:
        tbl = pf.read(columns=["vec_id", "embedding"])
    else:
        vec_idx = pf.schema_arrow.get_field_index("vec_id")
        groups = []
        for g in range(pf.metadata.num_row_groups):
            stats = pf.metadata.row_group(g).column(vec_idx).statistics
            if stats is None or not stats.has_min_max \
                    or stats.min < max_vec_id:
                groups.append(g)
        tbl = (pf.read_row_groups(groups, columns=["vec_id", "embedding"])
               if groups else
               pf.schema_arrow.empty_table().select(["vec_id", "embedding"]))
    ids = tbl["vec_id"].to_numpy()
    if max_vec_id is not None:
        mask = ids < max_vec_id
        tbl = tbl.filter(pa.array(mask))
        ids = ids[mask]
    return ids, _emb_matrix(tbl)


BROADCAST_BUDGET_ENV = "RENSA_BROADCAST_BUDGET_BYTES"
# 1 GiB default ≈ the documented ~10⁶-vector × 128-dim float64 bound of the
# exact broadcast lanes; above it the auto-tier dispatches to the
# partitioned formulation instead of ray.put-ing the corpus.
DEFAULT_BROADCAST_BUDGET = 1 << 30


def _broadcast_budget(override: int | None = None) -> int:
    import os

    if override is not None:
        return int(override)
    try:
        return int(os.environ.get(BROADCAST_BUDGET_ENV,
                                  DEFAULT_BROADCAST_BUDGET))
    except ValueError:  # garbage env value → documented default
        return DEFAULT_BROADCAST_BUDGET


def _estimate_corpus_matrix_bytes(sf_dir: str) -> int:
    """Size of the normalized float64 corpus matrix a broadcast lane would
    ``ray.put`` — estimated from parquet METADATA (row count + embedding
    dim), no data read, so the guardrail itself is O(footer) at any scale."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/{EMB_FILE}")
    n = pf.metadata.num_rows
    t = pf.schema_arrow.field("embedding").type
    if pa.types.is_fixed_size_list(t):
        dim = t.list_size
    else:
        head = next(pf.iter_batches(batch_size=1, columns=["embedding"]),
                    None)
        dim = (len(head.column(0)[0])
               if head is not None and head.num_rows else 0)
    return int(n) * max(int(dim), 1) * 8


def cosine_topk(sf_dir: str, k: int = 5, num_queries: int = 10) -> pa.Table:
    """Exact cosine top-k neighbors for query vectors (vec_id < num_queries).

    Returns (query_id, neighbor_id, rank) with rank 1..k ordered by
    (score desc, neighbor_id asc); the query itself is excluded.
    """
    import ray

    q_ids, q_mat = _load_matrix_local(sf_dir, max_vec_id=num_queries)
    qn = _normalize(q_mat)
    q_ref = ray.put((q_ids, qn))

    def partial_topk(batch: pa.Table) -> pa.Table:
        # broadcast side: one ray.get per task — zero-copy from plasma
        q_ids, qn = ray.get(q_ref)
        ids = np_col(batch, "vec_id")
        m = _normalize(_emb_matrix(batch))
        if m.size == 0 or qn.size == 0:  # empty block / no matching queries
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        scores = qn @ m.T  # (Q, B) float64
        # exclude self-matches
        self_mask = q_ids[:, None] == ids[None, :]
        scores[self_mask] = -np.inf
        kk = min(k, scores.shape[1])
        if kk == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(q_ids, kk)
        cols = part.reshape(-1)
        sc = np.take_along_axis(scores, part, axis=1).reshape(-1)
        keep = np.isfinite(sc)
        return pa.table({"query_id": pa.array(rows[keep], pa.int64()),
                         "neighbor_id": pa.array(ids[cols][keep], pa.int64()),
                         "score": pa.array(sc[keep], pa.float64())})

    ds = _read_embeddings(sf_dir).map_batches(
        partial_topk, batch_format="pyarrow", batch_size=4096)
    return _reduce_topk(ds, k)


def _topk_fold(qid: np.ndarray, nid: np.ndarray, sc: np.ndarray, k: int
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(query, neighbor, score) rows → per-query top-k (score desc, id asc);
    returns (qid, nid, score, rank) of the kept rows."""
    order = np.lexsort((nid, -sc, qid))  # by query, score desc, id asc
    qs, ns, ss = qid[order], nid[order], sc[order]
    first = np.zeros(len(qs), bool)
    first[0] = True
    first[1:] = qs[1:] != qs[:-1]
    gid = np.cumsum(first) - 1
    pos_in_group = np.arange(len(qs)) - np.flatnonzero(first)[gid]
    keep = pos_in_group < k
    return qs[keep], ns[keep], ss[keep], pos_in_group[keep] + 1


def _reduce_topk(ds, k: int, flush_rows: int = 1 << 20) -> pa.Table:
    """Final reduce over per-batch partial top-k rows.

    The partial stream is blocks × Q × k rows — tiny at bench scale, but a
    100-TB run has ~4·10⁵ blocks, so the fold is STREAMING: partials
    accumulate up to ``flush_rows`` and are compacted to Q × k running
    winners (top-k folding is associative), bounding driver memory at
    O(flush_rows + Q·k) instead of O(blocks·Q·k)."""
    acc_q: list[np.ndarray] = []
    acc_n: list[np.ndarray] = []
    acc_s: list[np.ndarray] = []
    n_acc = 0

    def _compact():
        nonlocal acc_q, acc_n, acc_s, n_acc
        qs, ns, ss, _ = _topk_fold(np.concatenate(acc_q),
                                   np.concatenate(acc_n),
                                   np.concatenate(acc_s), k)
        acc_q, acc_n, acc_s, n_acc = [qs], [ns], [ss], len(qs)

    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        t = pa.table(b)
        if t.num_rows == 0:
            continue
        acc_q.append(t["query_id"].to_numpy())
        acc_n.append(t["neighbor_id"].to_numpy())
        acc_s.append(t["score"].to_numpy())
        n_acc += t.num_rows
        if n_acc > flush_rows:
            _compact()
    if n_acc == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    qs, ns, _ss, rank = _topk_fold(np.concatenate(acc_q),
                                   np.concatenate(acc_n),
                                   np.concatenate(acc_s), k)
    return pa.table({"query_id": pa.array(qs, pa.int64()),
                     "neighbor_id": pa.array(ns, pa.int64()),
                     "rank": pa.array(rank, pa.int64())})


def _sample_embeddings(sf_dir: str, max_rows: int) -> np.ndarray:
    """Deterministic training sample: the first ``max_rows`` vectors.

    At 10^12 scale this reads a handful of leading shards instead of the
    whole table — standard IVF practice (train on a bounded sample, assign
    everything).
    """
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/{EMB_FILE}")
    batches = []
    seen = 0
    for rb in pf.iter_batches(batch_size=8192, columns=["embedding"]):
        batches.append(pa.Table.from_batches([rb]))
        seen += rb.num_rows
        if seen >= max_rows:
            break
    if not batches:  # empty table → (0, 0) sample, caller handles
        return np.empty((0, 0))
    tbl = pa.concat_tables(batches).slice(0, max_rows)
    return _emb_matrix(tbl)


def _train_centroids(sample: np.ndarray, num_centroids: int, seed: int,
                     iters: int = 10) -> np.ndarray:
    """Spherical k-means (Lloyd on the unit sphere) → (C, dim) unit centroids.

    Deterministic: seeds from splitmix64-derived sample indices; empty
    clusters keep their previous centroid.  Runs driver-side on the (small)
    training sample only.
    """
    n = len(sample)
    if n == 0:  # empty corpus: no cells (caller returns the empty result)
        return np.empty((0, sample.shape[1] if sample.ndim == 2 else 0))
    num_centroids = min(num_centroids, max(n, 1))
    xs = _normalize(sample)
    idx = (splitmix64_stream(seed, num_centroids) % np.uint64(max(n, 1))
           ).astype(np.int64)
    cents = xs[np.unique(idx)]
    for attempt in range(8):  # collision top-up, deterministic, bounded
        if len(cents) >= num_centroids:
            break
        extra = (splitmix64_stream(seed + attempt + 1, num_centroids)
                 % np.uint64(max(n, 1))).astype(np.int64)
        cents = np.unique(np.concatenate([cents, xs[extra]]), axis=0)
    cents = np.ascontiguousarray(cents[:num_centroids])
    num_centroids = len(cents)  # degenerate samples yield fewer cells
    for _ in range(iters):
        assign = np.argmax(xs @ cents.T, axis=1)
        for c in range(num_centroids):
            members = xs[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    return cents


def cosine_topk_ivf(sf_dir: str, k: int = 5, num_queries: int = 10,
                    num_centroids: int = 16, nprobe: int = 8, seed: int = 42,
                    sample_rows: int = 20000) -> pa.Table:
    """IVF approximate top-k: the scale path for similarity search.

    Spherical-k-means centroids are trained driver-side on a bounded sample
    and broadcast with the (normalized) query matrix via ``ray.put``.  Each
    query probes its ``nprobe`` nearest cells; every corpus batch assigns
    its vectors to cells with one matmul and scores ONLY vectors falling in
    some probed cell, against only the queries probing that cell.  Work per
    batch shrinks ≈ nprobe/num_centroids vs the brute-force lane; at
    ``nprobe == num_centroids`` the result is exactly ``cosine_topk``.
    Candidate rows (≤ blocks × Q × k) reduce driver-side like the exact lane.
    """
    import ray

    q_ids, q_mat = _load_matrix_local(sf_dir, max_vec_id=num_queries)
    qn = _normalize(q_mat)
    cents = _train_centroids(_sample_embeddings(sf_dir, sample_rows),
                             num_centroids, seed)
    C = len(cents)
    if qn.size == 0 or C == 0:  # no queries / empty corpus
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    nprobe = min(nprobe, C)
    qc = qn @ cents.T
    probe = np.argpartition(-qc, nprobe - 1, axis=1)[:, :nprobe]
    probed_any = np.zeros(C, bool)
    probed_any[probe.reshape(-1)] = True
    q_probes = np.zeros((len(q_ids), C), bool)
    q_probes[np.arange(len(q_ids))[:, None], probe] = True
    ref = ray.put((q_ids, qn, cents, probed_any, q_probes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q_ids, qn, cents, probed_any, q_probes = ray.get(ref)
        ids = np_col(batch, "vec_id")
        m = _normalize(_emb_matrix(batch))
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if m.size == 0:
            return empty
        cell = np.argmax(m @ cents.T, axis=1)
        keep = probed_any[cell]
        if not keep.any():
            return empty
        mk, idk, cellk = m[keep], ids[keep], cell[keep]
        scores = qn @ mk.T                      # (Q, B')
        scores[~q_probes[:, cellk]] = -np.inf   # per-query probe pruning
        scores[q_ids[:, None] == idk[None, :]] = -np.inf
        kk = min(k, scores.shape[1])
        part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(q_ids, kk)
        cols = part.reshape(-1)
        sc = np.take_along_axis(scores, part, axis=1).reshape(-1)
        fin = np.isfinite(sc)
        return pa.table({"query_id": pa.array(rows[fin], pa.int64()),
                         "neighbor_id": pa.array(idk[cols][fin], pa.int64()),
                         "score": pa.array(sc[fin], pa.float64())})

    ds = _read_embeddings(sf_dir).map_batches(
        partial_topk, batch_format="pyarrow", batch_size=4096)
    return _reduce_topk(ds, k)


def cosine_pairs(sf_dir: str, threshold: float = 0.9,
                 broadcast_budget_bytes: int | None = None):
    """Exact all-pairs (id_a < id_b, cosine ≥ threshold).

    Auto-tiered (VERDICT r4 #3): below the broadcast budget
    (``RENSA_BROADCAST_BUDGET_BYTES``, default 1 GiB ≈ the documented
    ~10⁶-vector bound) the corpus matrix is ``ray.put`` once and each
    block emits its pairs from one block × corpus matmul; above it the
    SAME exact semantics run through ``cosine_pairs_partitioned`` — no
    broadcast, cell-keyed shuffles — instead of silently scale-killing.
    ``cosine_pairs_lsh`` remains the approximate scale path when exactness
    can be traded for less shuffle volume.
    """
    import ray

    if _estimate_corpus_matrix_bytes(sf_dir) > \
            _broadcast_budget(broadcast_budget_bytes):
        return cosine_pairs_partitioned(sf_dir, threshold)

    ids, mat = _load_matrix_local(sf_dir)
    ref = ray.put((ids, _normalize(mat)))

    def pair_emitter(batch: pa.Table) -> pa.Table:
        all_ids, all_n = ray.get(ref)  # zero-copy plasma read per task
        ids = np_col(batch, "vec_id")
        m = _normalize(_emb_matrix(batch))
        if m.size == 0 or all_n.size == 0:  # empty block / empty corpus
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        scores = m @ all_n.T  # (B, N)
        mask = (scores >= threshold) & (ids[:, None] < all_ids[None, :])
        bi, aj = np.nonzero(mask)
        return pa.table({"id_a": pa.array(ids[bi], pa.int64()),
                         "id_b": pa.array(all_ids[aj], pa.int64())})

    return _read_embeddings(sf_dir).map_batches(
        pair_emitter, batch_format="pyarrow", batch_size=2048)


def cosine_pairs_partitioned(sf_dir: str, threshold: float = 0.9,
                             num_centroids: int = 16, seed: int = 42,
                             sample_rows: int = 20000, num_parts: int = 32):
    """EXACT all-pairs cosine ≥ threshold with NO corpus broadcast — the
    over-budget tier of ``cosine_pairs``.

    Full-probe IVF shape (same trick as ``knn_graph_ivf`` at
    nprobe == num_centroids, where it is proven exact): every vector is
    exploded to ALL C cells as a query and to its HOME cell (nearest
    centroid) as a member; per cell one queries × members matmul emits
    (query_id < member_id, cos ≥ threshold) pairs.  A pair (a < b) is
    emitted exactly once — in b's home cell with a as query (the reverse
    orientation fails the id ordering) — so no dedup pass is needed.

    Cost model vs the broadcast lane: total matmul work is the same
    O(N²·dim); what changes is that no task ever holds the corpus — the
    price is C× replication of the vectors through one cell-keyed
    shuffle, so keep ``num_centroids`` modest.  Exactness does not depend
    on centroid quality (every cell is probed); centroids only balance
    partition sizes.
    """
    cents = _train_centroids(_sample_embeddings(sf_dir, sample_rows),
                             num_centroids, seed)
    C = len(cents)
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    if C == 0:
        return empty

    def _explode(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        if m.size == 0:
            val_t = batch.schema.field("embedding").type.value_type
            return pa.table({"cell": pa.array([], pa.uint64()),
                             "vec_id": pa.array([], pa.int64()),
                             "is_member": pa.array([], pa.bool_()),
                             "emb": pa.array([], pa.list_(val_t))})
        ids = np_col(batch, "vec_id")
        n, dim = m.shape
        mn = _normalize(m)
        home = np.argmax(mn @ cents.T, axis=1).astype(np.uint64)
        flat = (batch["embedding"].combine_chunks().flatten()
                .to_numpy(zero_copy_only=False))
        # every vector → C query rows; member only in the home cell
        tiled = np.repeat(flat.reshape(n, dim), C, axis=0).reshape(-1)
        cells = np.tile(np.arange(C, dtype=np.uint64), n)
        member = cells == np.repeat(home, C)
        rows = n * C
        pa_val_t = pa.from_numpy_dtype(tiled.dtype)
        emb_col = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (rows + 1) * dim, dim), pa.int32()),
            pa.array(tiled, pa_val_t))
        return pa.table({"cell": pa.array(cells),
                         "vec_id": pa.array(np.repeat(ids, C), pa.int64()),
                         "is_member": pa.array(member),
                         "emb": emb_col})

    exploded = _read_embeddings(sf_dir).map_batches(
        _explode, batch_format="pyarrow", batch_size=4096)

    def _cell_pairs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return empty
        cell = np_col(g, "cell").astype(np.uint64)
        ids = np_col(g, "vec_id")
        is_mem = np_col(g, "is_member") > 0
        emb = g["emb"].combine_chunks()
        m = _normalize(emb.flatten().to_numpy(zero_copy_only=False)
                       .reshape(n, -1).astype(np.float64))
        order, gid, counts = run_ids(cell)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        a_l, b_l = [], []
        for s, c in zip(starts, counts):
            sel = order[s:s + c]
            mem = sel[is_mem[sel]]
            if len(mem) == 0:
                continue
            scores = m[sel] @ m[mem].T                        # (q, mem)
            mask = (scores >= threshold) & \
                (ids[sel][:, None] < ids[mem][None, :])
            qi, mi = np.nonzero(mask)
            a_l.append(ids[sel][qi])
            b_l.append(ids[mem][mi])
        if not a_l:
            return empty
        return pa.table({"id_a": pa.array(np.concatenate(a_l), pa.int64()),
                         "id_b": pa.array(np.concatenate(b_l), pa.int64())})

    return partitionwise(exploded, _cell_pairs, "cell", num_parts)


def _hyperplanes(dim: int, num_bits: int, num_tables: int, seed: int) -> np.ndarray:
    """Deterministic (num_tables, num_bits, dim) gaussian hyperplanes.

    Gaussians via Box–Muller over splitmix64 uniforms — any worker rebuilds
    them from (dim, num_bits, num_tables, seed) alone.
    """
    n = num_tables * num_bits * dim
    u = (splitmix64_stream(seed, 2 * n).astype(np.float64) + 1.0) / (2.0**64 + 2)
    r = np.sqrt(-2.0 * np.log(u[:n])) * np.cos(2.0 * np.pi * u[n:])
    return r.reshape(num_tables, num_bits, dim)


def _vec_hash64(m: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit content hash per row of a float64 matrix.

    Hashes the raw IEEE-754 bit patterns (so byte-identical vectors — the
    exact-duplicate rows a web-scale embedding table is full of — collapse
    to one value) with a SplitMix64-mixed column fold.  Collisions between
    DIFFERENT vectors are the same 2⁻⁶⁴ accepted class as shingle-hash
    collisions elsewhere in the repo, and are additionally defused by the
    dot-with-representative gate in ``_bucket_pairs``."""
    n = len(m)
    if n == 0:
        return np.empty(0, np.uint64)
    u = np.ascontiguousarray(m).view(np.uint64)
    h = np.zeros(n, np.uint64)
    for d in range(m.shape[1]):
        # python-int product wrapped to u64 (a numpy scalar multiply warns
        # on the intended modular overflow)
        z = u[:, d] + np.uint64(
            ((d + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = (h * np.uint64(0x100000001B3)) ^ (z ^ (z >> np.uint64(31)))
    return h


def cosine_pairs_lsh(sf_dir: str, threshold: float = 0.9, num_bits: int = 12,
                     num_tables: int = 6, seed: int = 42, num_parts: int = 32,
                     max_bucket: int | None = None):
    """Near-dup pairs via random-hyperplane LSH + exact verify (the scale path).

    Collision prob. per table for angle θ is (1-θ/π)^num_bits; with
    ``num_tables`` independent tables recall ≈ 1-(1-p)^T — ~0.98 for
    cos ≥ 0.9 at (12 bits, 6 tables).  No corpus broadcast: vectors ride the
    bucket shuffle as a fixed_size_list column.

    Skew guard: byte-identical vectors are collapsed to one representative
    BEFORE any pairwise verification — a degenerate embedding column (zero
    vectors, repeated rows) costs one linear dot-with-rep pass instead of a
    quadratic per-bucket verify, and an equal group's (unavoidably
    quadratic-sized) output pairs are emitted from exactly one table's
    bucket.  Cosine is verified only between DISTINCT vector values; hits
    expand to the member cross product.  ``max_bucket`` caps the number of
    distinct values per bucket whose cross pairs are verified (an over-full
    bucket is a degenerate hyperplane cell; its members still meet in other
    tables' more selective buckets — the ``max_df`` recall argument).
    ``max_bucket=None`` (default) keeps the candidate set exact.
    """

    def bucket_exploder(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        if m.size == 0:
            return pa.table({"bucket": pa.array([], pa.uint64()),
                             "vec_id": pa.array([], pa.int64()),
                             "emb": pa.array([], pa.list_(pa.float32()))})
        # hyperplanes rebuild deterministically from (dim, bits, tables, seed)
        planes = _hyperplanes(m.shape[1], num_bits, num_tables, seed)
        ids = np_col(batch, "vec_id")
        n = len(ids)
        keys = np.empty((num_tables, n), np.uint64)
        weights = (np.uint64(1) << np.arange(num_bits, dtype=np.uint64))
        for t in range(num_tables):
            bits = (m @ planes[t].T) > 0  # (n, num_bits)
            keys[t] = bits.astype(np.uint64) @ weights
            keys[t] |= np.uint64(t) << np.uint64(56)  # disjoint tables
        rep_ids = np.tile(ids, num_tables)
        emb = batch["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        dim = m.shape[1]
        tiled = np.tile(flat.reshape(n, dim), (num_tables, 1)).reshape(-1)
        # plain list<float32> (not fixed_size_list) so empty batches emit
        # the SAME schema — mixed-type blocks broke the groupby's table
        # unification; _bucket_pairs re-derives dim from the data
        rows = n * num_tables
        emb_col = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (rows + 1) * dim, dim), pa.int32()),
            pa.array(tiled, pa.float32()))
        return pa.table({"bucket": pa.array(keys.reshape(-1), pa.uint64()),
                         "vec_id": pa.array(rep_ids, pa.int64()),
                         "emb": emb_col})

    exploded = _read_embeddings(sf_dir).map_batches(
        bucket_exploder, batch_format="pyarrow", batch_size=4096)

    def _bucket_pairs(g: pa.Table) -> pa.Table:
        from .common import capped_distinct_value_pairs, pairs_within_runs

        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        bucket = np_col(g, "bucket").astype(np.uint64)
        ids = np_col(g, "vec_id")
        emb = g["emb"].combine_chunks()
        n = len(emb)
        if n == 0:
            return empty
        vals = emb.flatten().to_numpy(zero_copy_only=False)
        m = vals.reshape(n, -1).astype(np.float64)
        vh = _vec_hash64(m)
        m = _normalize(m)
        order = np.lexsort((ids.astype(np.uint64), vh, bucket))
        b_s, vh_s, ids_s, m_s = bucket[order], vh[order], ids[order], m[order]
        # value groups: runs of equal (bucket, raw-vector-hash); cosine
        # pairs only between DISTINCT vector values (shared skew guard)
        vb = np.ones(n, bool)
        vb[1:] = (b_s[1:] != b_s[:-1]) | (vh_s[1:] != vh_s[:-1])
        vgid, vcounts, vstart, rep_rows, rep_vg, ii, jj = \
            capped_distinct_value_pairs(b_s, vb, max_bucket)
        # a member whose dot with its group representative is ~1 is the same
        # direction as the rep (Cauchy-Schwarz equality), so every pair
        # inside the group has cos = 1 — one LINEAR pass replaces the old
        # quadratic within-group verify.  Zero vectors (self-dot 0) and
        # 2⁻⁶⁴ hash-collision strays fail the gate and drop out (they could
        # never pass / would need their own verify).
        memdot = np.einsum("ij,ij->i", m_s, m_s[vstart[vgid]])
        good = memdot >= 1.0 - 1e-9
        gvg = vgid[good]
        gids = ids_s[good]
        gcounts = np.bincount(gvg, minlength=len(vcounts))
        gstarts = np.concatenate([[0], np.cumsum(gcounts)[:-1]])
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        if threshold <= 1.0:
            # (1) equal-value groups are pairs outright (cos = 1): emit the
            # (inherently quadratic-sized — pairs ARE the product) member
            # pairs once, from table 0's bucket only; identical vectors
            # share every table's bucket, so other tables add nothing.
            eq = ((b_s[vstart] >> np.uint64(56)) == 0) & (gcounts >= 2)
            if eq.any():
                rowsel = eq[gvg]
                cids = gids[rowsel]
                eii, ejj = pairs_within_runs(gcounts[eq])
                out_a.append(cids[eii])
                out_b.append(cids[ejj])
        # (2) cosine verify only across DISTINCT vector values per bucket
        if len(ii):
            cos = np.einsum("ij,ij->i", m_s[rep_rows[ii]], m_s[rep_rows[jj]])
            hit = cos >= threshold
            va, vbg = rep_vg[ii[hit]], rep_vg[jj[hit]]
            ca, cb = gcounts[va], gcounts[vbg]
            pc = ca * cb
            tot = int(pc.sum())
            if tot:
                # expand each hit (value A, value B) to its member cross
                # product — members equal their reps, so every expanded
                # pair inherits the verified rep-pair cosine
                off = np.concatenate([[0], np.cumsum(pc)[:-1]])
                pid = np.repeat(np.arange(len(pc)), pc)
                local = np.arange(tot, dtype=np.int64) - off[pid]
                out_a.append(gids[gstarts[va][pid] + local // cb[pid]])
                out_b.append(gids[gstarts[vbg][pid] + local % cb[pid]])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"id_a": pa.array(lo, pa.int64()),
                         "id_b": pa.array(hi, pa.int64())})

    pairs = partitionwise(exploded, _bucket_pairs, "bucket", num_parts)
    from .common import distinct_pair_rows

    return partitionwise(
        pairs, lambda g: distinct_pair_rows(g, "id_a", "id_b"),
        "id_a", num_parts)


def _label_sum_partial(batch: pa.Table) -> pa.Table:
    """Per-block (label, n, vec_sum) partial — the ONE definition of the
    label-keyed embedding fold, shared by ``embedding_label_centroids``
    and ``embedding_centroid_distance``."""
    lab = np_col(batch, "label").astype(np.int64)
    m = _emb_matrix(batch)
    if m.size == 0:  # same list<float64> schema as non-empty blocks
        return pa.table({
            "label": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "vec_sum": pa.array([], pa.list_(pa.float64()))})
    uniq, inv = np.unique(lab, return_inverse=True)
    dim = m.shape[1]
    sums = np.zeros((len(uniq), dim))
    np.add.at(sums, inv, m)
    cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    return pa.table({
        "label": pa.array(uniq),
        "n": pa.array(cnt),
        "vec_sum": pa.ListArray.from_arrays(
            pa.array(np.arange(0, (len(uniq) + 1) * dim, dim), pa.int32()),
            pa.array(sums.reshape(-1), pa.float64()))})


def _label_sum_merge(g: pa.Table) -> pa.Table:
    """Fold (label, n, vec_sum) partials to ONE row per label — all rows
    of a label are co-located by the label-keyed partitionwise."""
    lab = np_col(g, "label").astype(np.int64)
    cnt = np_col(g, "n").astype(np.int64)
    vs = g["vec_sum"].combine_chunks()
    if len(vs) == 0:
        return pa.table({"label": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "vec_sum": pa.array([], pa.list_(pa.float64()))})
    m = vs.flatten().to_numpy(zero_copy_only=False).reshape(len(vs), -1)
    uniq, inv = np.unique(lab, return_inverse=True)
    sums = np.zeros((len(uniq), m.shape[1]))
    np.add.at(sums, inv, m)
    n = np.zeros(len(uniq), np.int64)
    np.add.at(n, inv, cnt)
    dim = m.shape[1]
    return pa.table({
        "label": pa.array(uniq),
        "n": pa.array(n),
        "vec_sum": pa.ListArray.from_arrays(
            pa.array(np.arange(0, (len(uniq) + 1) * dim, dim), pa.int32()),
            pa.array(sums.reshape(-1), pa.float64()))})


def embedding_label_centroids(sf_dir: str):
    """Per-label centroid norm + count — a vectorized grouped aggregate over
    the embedding column: (label, n_vecs, centroid_norm round 6)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/{EMB_FILE}", columns=["label", "embedding"])
    merged = partitionwise(
        ds.map_batches(_label_sum_partial, batch_format="pyarrow"),
        _label_sum_merge, "label", num_parts=4)

    def _norms(b: pa.Table) -> pa.Table:
        vs = b["vec_sum"].combine_chunks()
        if len(vs) == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64()),
                             "centroid_norm": pa.array([], pa.float64())})
        m = vs.flatten().to_numpy(zero_copy_only=False).reshape(len(vs), -1)
        n = np_col(b, "n").astype(np.int64)
        centroid = m / n[:, None]
        return pa.table({"label": b["label"].cast(pa.int64()),
                         "n_vecs": pa.array(n),
                         "centroid_norm": pa.array(
                             np.round(np.linalg.norm(centroid, axis=1), 6))})

    return merged.map_batches(_norms, batch_format="pyarrow")


def embedding_dedup_kept(sf_dir: str, threshold: float = 0.9,
                         num_bits: int = 12, num_tables: int = 6,
                         seed: int = 42, num_parts: int = 32,
                         exact: bool = False):
    """SemDeDup-style embedding near-dup removal → kept (vec_id, cluster_id).

    Edges = cosine ≥ threshold pairs (hyperplane-LSH bucketed + exact verify
    by default; ``exact=True`` uses the brute-force all-pairs lane for
    oracle-sized inputs), clusters = connected components over those edges,
    keep = the min vec_id of each cluster.  Semantic dedup of an embedded
    corpus (keep one representative per near-duplicate semantic cluster) —
    the embedding-space analogue of the MinHash keep-min dedup.
    """
    from .cc import connected_components

    if exact:
        edges = cosine_pairs(sf_dir, threshold)
    else:
        edges = cosine_pairs_lsh(sf_dir, threshold, num_bits, num_tables,
                                 seed, num_parts)
    edges = edges.map_batches(
        lambda b: pa.table({"src": b["id_a"].cast(pa.uint64()),
                            "dst": b["id_b"].cast(pa.uint64())}),
        batch_format="pyarrow")
    labels = connected_components(edges, num_parts=num_parts)  # (node, label)

    all_ids = _read_embeddings(sf_dir).select_columns(["vec_id"]).map_batches(
        lambda b: pa.table({"vec_id": b["vec_id"].cast(pa.int64()),
                            "cluster_id": b["vec_id"].cast(pa.int64())}),
        batch_format="pyarrow")
    lab = labels.map_batches(
        lambda b: pa.table({"vec_id": b["node"].cast(pa.int64()),
                            "cluster_id": b["label"].cast(pa.int64())}),
        batch_format="pyarrow")

    def _keep_min(g: pa.Table) -> pa.Table:
        ids = np_col(g, "vec_id").astype(np.int64)
        lab_ = np_col(g, "cluster_id").astype(np.int64)
        if len(ids) == 0:
            return g
        order, gid, counts = run_ids(ids.astype(np.uint64))
        cluster = np.full(len(counts), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(cluster, gid, lab_[order])
        first = np.zeros(len(gid), bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        uniq_ids = ids[order][first]
        keep = uniq_ids == cluster  # representative = cluster min id
        return pa.table({"vec_id": pa.array(uniq_ids[keep]),
                         "cluster_id": pa.array(cluster[keep])})

    return partitionwise(all_ids.union(lab), _keep_min, "vec_id", num_parts)


def _prefold_sum(parts, scalar_int_cols=(), float_list_cols=(),
                 int_list_cols=(), float_list_min_cols=(),
                 float_list_max_cols=(), num_parts: int = 8):
    """Distributed pre-fold for per-block partial-moment rows.

    ``parts`` rows each carry a ``__salt`` uint64 column plus fixed-length
    list / scalar payloads; one salted partitionwise pass folds them
    element-wise (sum by default, min/max for the so-named columns) so the
    driver's ``take_all`` sees ≤ ``num_parts`` rows instead of one per
    input block.  The difference is what makes the moment-fold lanes
    scale: ~4·10⁵ blocks × a (d + d²) float64 moment row at d=1024 is
    ~3 TB of driver traffic flat, ≤ num_parts × 8 MB folded.  Summation
    stays float64 either way; only the association order moves (min/max
    are order-exact).
    """
    def _fold(g: pa.Table) -> pa.Table:
        cols: dict = {}
        for c in scalar_int_cols:
            cols[c] = pa.array([int(np_col(g, c).sum())], pa.int64())
        for c, pa_t, np_t, op in (
                [(c, pa.float64(), np.float64, "sum")
                 for c in float_list_cols]
                + [(c, pa.int64(), np.int64, "sum")
                   for c in int_list_cols]
                + [(c, pa.float64(), np.float64, "min")
                   for c in float_list_min_cols]
                + [(c, pa.float64(), np.float64, "max")
                   for c in float_list_max_cols]):
            vs = g[c].combine_chunks()
            m = (vs.flatten().to_numpy(zero_copy_only=False)
                 .reshape(len(vs), -1).astype(np_t))
            cols[c] = pa.array([getattr(m, op)(axis=0)], pa.list_(pa_t))
        cols["__salt"] = pa.array([0], pa.uint64())
        return pa.table(cols)

    return partitionwise(parts, _fold, "__salt", num_parts)


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 5):
    """Distributed Lloyd's k-means over the embedding column:
    (vec_id, cluster) after ``iters`` full iterations, L2 distance,
    deterministic init (the ``k`` lowest-vec_id embeddings — stable across
    runs and partitionings, no RNG state to ship).

    Scale shape: centroids are a tiny (k, dim) float64 matrix captured in
    the map closure (one object-store put per iteration); each block emits
    ONE partial row of per-cluster sums + counts, and a salted
    ``_prefold_sum`` pass compacts those to ≤ 8 rows before the driver
    fold — the driver never sees blocks × k × dim floats.  One tiny-row
    shuffle per iteration; the corpus streams ``iters + 1`` times.  Empty clusters keep their previous
    centroid (the deterministic convention shared with the numpy reference
    in tests).  Ties in distance go to the lowest cluster index (argmin).
    """
    # seed read: the same row-group-pruned driver read cosine_topk's query
    # side uses — vec_ids are 0-based in this corpus, so vec_id < k IS the
    # k lowest; a sparse-id table falls back to one full driver read
    ids0, init = _load_matrix_local(sf_dir, max_vec_id=k)
    if len(ids0) < k:
        ids0, init = _load_matrix_local(sf_dir, max_vec_id=None)
    if len(ids0) == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())})
    order = np.argsort(ids0, kind="stable")[:k]
    cent = init[order].copy()
    k_eff = len(cent)
    ds = _read_embeddings(sf_dir)

    def _assign_ids(m: np.ndarray, c: np.ndarray) -> np.ndarray:
        # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² is rank-constant
        d = m @ c.T * -2.0 + (c * c).sum(axis=1)[None, :]
        return np.argmin(d, axis=1)

    for _ in range(iters):
        c_now = cent  # bind current centroids into the closure

        def _partial(b: pa.Table, c=c_now) -> pa.Table:
            m = _emb_matrix(b)
            if m.size == 0:  # empty parquet fragment / zero-row block
                return pa.table({
                    "sums": pa.array([np.zeros(k_eff * c.shape[1])],
                                     pa.list_(pa.float64())),
                    "counts": pa.array([np.zeros(k_eff, np.int64)],
                                       pa.list_(pa.int64())),
                    "__salt": pa.array([0], pa.uint64())})
            a = _assign_ids(m, c)
            sums = np.zeros((k_eff, m.shape[1]), np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=k_eff).astype(np.int64)
            return pa.table({
                "sums": pa.array([sums.ravel()], pa.list_(pa.float64())),
                "counts": pa.array([counts], pa.list_(pa.int64())),
                "__salt": pa.array(
                    [np_col(b, "vec_id").astype(np.uint64)[0]], pa.uint64())})

        parts = _prefold_sum(
            ds.map_batches(_partial, batch_format="pyarrow"),
            float_list_cols=("sums",), int_list_cols=("counts",)).take_all()
        dim = cent.shape[1]
        tot = np.zeros((k_eff, dim), np.float64)
        n = np.zeros(k_eff, np.int64)
        for r in parts:
            tot += np.asarray(r["sums"], np.float64).reshape(k_eff, dim)
            n += np.asarray(r["counts"], np.int64)
        nz = n > 0
        new_cent = cent.copy()
        new_cent[nz] = tot[nz] / n[nz, None]
        cent = new_cent

    c_fin = cent

    def _final(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b)
        if m.size == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        a = _assign_ids(m, c_fin)
        return pa.table({"vec_id": b["vec_id"],
                         "cluster": pa.array(a.astype(np.int64))})

    return ds.map_batches(_final, batch_format="pyarrow")


def embedding_centroid_distance(sf_dir: str):
    """Per-vector cosine similarity to its OWN label centroid:
    (vec_id, label, cos_to_centroid round 6) — the standard within-class
    outlier / mislabel signal over an embedding column (low similarity to
    your own class centroid = probable labeling error or outlier, the
    cheap confidence filter before training).

    Two streaming passes: pass 1 folds per-block (label, vec_sum, count)
    partials — compacted to ONE row per label by a label-keyed
    partitionwise merge (the ``embedding_label_centroids`` pattern) so the
    driver never sees blocks × labels rows — into the k x dim centroid
    matrix (k = label cardinality, tiny); pass 2 broadcasts the centroids
    in the map closure and scores every vector vectorized.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/{EMB_FILE}",
                         columns=["vec_id", "label", "embedding"])

    rows = partitionwise(
        ds.map_batches(_label_sum_partial, batch_format="pyarrow"),
        _label_sum_merge, "label", num_parts=4).take_all()
    acc: dict[int, list] = {}
    for r in rows:
        s = np.asarray(r["vec_sum"], np.float64)
        a = acc.setdefault(int(r["label"]), [np.zeros_like(s), 0])
        a[0] += s
        a[1] += int(r["n"])
    labels = sorted(acc)
    cent = {l: acc[l][0] / acc[l][1] for l in labels}
    # centroid means divide in a fixed (sum/count) order -> deterministic;
    # the lookup arrays are built ONCE here, not per batch
    labels_arr = np.array(labels, np.int64)
    cmat = (np.stack([cent[l] for l in labels])
            if labels else np.empty((0, 0)))

    def _score(batch: pa.Table) -> pa.Table:
        lab = np_col(batch, "label").astype(np.int64)
        m = _emb_matrix(batch)
        if m.size == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64()),
                             "cos_to_centroid": pa.array([], pa.float64())})
        idx = np.searchsorted(labels_arr, lab)
        cm = cmat[idx]
        num = (m * cm).sum(axis=1)
        den = np.linalg.norm(m, axis=1) * np.linalg.norm(cm, axis=1)
        cos = np.where(den > 0, num / np.where(den == 0, 1.0, den), 0.0)
        return pa.table({
            "vec_id": batch["vec_id"].cast(pa.int64()),
            "label": pa.array(lab, pa.int64()),
            "cos_to_centroid": pa.array(np.round(cos, 6), pa.float64())})

    return ds.map_batches(_score, batch_format="pyarrow")


def embedding_pca_project(sf_dir: str, num_components: int = 8):
    """Distributed PCA over the embedding column: (vec_id, proj
    list<double>) — the projection of every vector onto the top
    ``num_components`` principal axes of the corpus.  The standard
    dimensionality-reduction step before clustering / ANN-index build on
    a 10^12-vector corpus.

    Plan (Lloyd-style moment fold): pass 1 streams the corpus once, each
    block emitting ONE (n, sum_vec, sum_outer) moment partial; a salted
    ``_prefold_sum`` pass compacts those to ≤ 8 rows (one tiny-row
    shuffle), the driver forms the covariance from them and
    eigendecomposes it (d x d, local); pass 2 broadcasts
    the component matrix in the map closure and projects every block
    vectorized.  Component sign is fixed deterministically (largest-|x|
    coordinate made positive) so output is engine- and partitioning-stable.
    """
    ds = _read_embeddings(sf_dir)

    def _moments(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b)
        if m.size == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "ss": pa.array([], pa.list_(pa.float64())),
                             "__salt": pa.array([], pa.uint64())})
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "s": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
            "ss": pa.array([(m.T @ m).ravel()], pa.list_(pa.float64())),
            "__salt": pa.array(
                [np_col(b, "vec_id").astype(np.uint64)[0]], pa.uint64())})

    # salted pre-fold: the (d + d²) moment rows compact to ≤ 8 before the
    # driver sees them (a flat take_all is one row PER BLOCK — multi-TB at
    # 10¹²-vector scale)
    rows = _prefold_sum(ds.map_batches(_moments, batch_format="pyarrow"),
                        scalar_int_cols=("n",),
                        float_list_cols=("s", "ss")).take_all()
    n = sum(int(r["n"]) for r in rows)
    if n == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "proj": pa.array([], pa.list_(pa.float64()))})
    s = np.sum([np.asarray(r["s"], np.float64) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"], np.float64) for r in rows], axis=0)
    d = len(s)
    mu = s / n
    cov = ss.reshape(d, d) / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:min(num_components, d)]
    comps = evecs[:, order].T  # (q, d)
    # deterministic sign: the largest-|coordinate| entry of each axis > 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    q = comps.shape[0]

    def _project(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b)
        if m.size == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "proj": pa.array([], pa.list_(pa.float64()))})
        p = (m - mu) @ comps.T
        return pa.table({
            "vec_id": b["vec_id"].cast(pa.int64()),
            "proj": pa.ListArray.from_arrays(
                pa.array(np.arange(0, (m.shape[0] + 1) * q, q), pa.int32()),
                pa.array(p.ravel(), pa.float64()))})

    return ds.map_batches(_project, batch_format="pyarrow")


def knn_graph(sf_dir: str, k: int = 5,
              broadcast_budget_bytes: int | None = None):
    """Exact k-nearest-neighbor GRAPH over the embedding column:
    (vec_id, neighbor_id, rank) for EVERY vector, rank 1..k ordered by
    (cosine desc, neighbor_id asc), self excluded — the all-vectors
    self-join that feeds SemDeDup-style clustering, diversity filtering
    and graph-based curation.

    Broadcast join like ``cosine_pairs``: the corpus (ids + normalized
    matrix) is ``ray.put`` once; each block computes one block x corpus
    matmul and — because the FULL corpus is present in the task — its
    rows' COMPLETE top-k locally.  No driver reduce, the graph streams
    out as a Dataset.

    Auto-tiered (VERDICT r4 #3): above the broadcast budget
    (``RENSA_BROADCAST_BUDGET_BYTES``, default 1 GiB ≈ the documented
    ~10⁶-vector bound) the call dispatches to ``knn_graph_ivf`` at
    nprobe == num_centroids — the full-probe configuration that is
    PROVEN equal to this exact lane (pytest) but broadcasts nothing.
    Approximate ``knn_graph_ivf`` with partial nprobe remains the
    10^12-vector scale path when exact full-probe cost is too high.
    """
    import ray

    if _estimate_corpus_matrix_bytes(sf_dir) > \
            _broadcast_budget(broadcast_budget_bytes):
        ncent = 16
        return knn_graph_ivf(sf_dir, k=k, num_centroids=ncent, nprobe=ncent)

    ids_all, mat = _load_matrix_local(sf_dir)
    order0 = np.argsort(ids_all, kind="stable")  # sorted once: O(B) self-
    ref = ray.put((ids_all[order0], _normalize(mat)[order0]))  # mask below

    def _block_topk(batch: pa.Table) -> pa.Table:
        all_ids, all_n = ray.get(ref)  # zero-copy plasma read per task
        ids = np_col(batch, "vec_id")
        m = _normalize(_emb_matrix(batch))
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64())})
        if m.size == 0 or len(all_ids) <= 1:
            return empty
        scores = m @ all_n.T                                  # (B, N)
        # self-mask in O(B) via the sorted broadcast ids — a (B, N) bool
        # equality matrix would double peak task memory at the documented
        # ~10⁶-vector broadcast bound
        pos = np.searchsorted(all_ids, ids)
        ok = (pos < len(all_ids)) & (all_ids[np.minimum(
            pos, len(all_ids) - 1)] == ids)
        scores[np.flatnonzero(ok), pos[ok]] = -np.inf         # self
        kk = min(k, scores.shape[1] - 1)
        part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        sc = np.take_along_axis(scores, part, axis=1).reshape(-1)
        qs, ns, _ss, rank = _topk_fold(np.repeat(ids, kk),
                                       all_ids[part.reshape(-1)], sc, k)
        return pa.table({"vec_id": pa.array(qs, pa.int64()),
                         "neighbor_id": pa.array(ns, pa.int64()),
                         "rank": pa.array(rank, pa.int64())})

    return _read_embeddings(sf_dir).map_batches(
        _block_topk, batch_format="pyarrow", batch_size=2048)


def knn_graph_ivf(sf_dir: str, k: int = 5, num_centroids: int = 16,
                  nprobe: int = 4, seed: int = 42, sample_rows: int = 20000,
                  num_parts: int = 32):
    """Approximate kNN graph — the scale path: NO corpus broadcast, NO
    driver reduce; everything rides two keyed shuffles.

    1. Train C spherical-k-means centroids on a bounded driver-side
       sample (standard IVF practice), broadcast only the C x dim matrix
       in the map closure.
    2. One map assigns each vector its ``nprobe`` nearest cells and
       explodes it to nprobe (cell, vec_id, emb, is_member) rows —
       is_member marks the HOME cell (the nearest centroid, always probe
       0), the only cell where the vector acts as a candidate neighbor.
       A (query, member) pair therefore meets in exactly ONE partition
       (the member's home cell) — no cross-table dedup pass needed.
    3. Cell-keyed partitionwise: per cell, one queries x members matmul,
       per-query local top-k candidate rows.
    4. vec_id-keyed partitionwise: fold each query's ≤ nprobe x k
       candidate rows to the final (vec_id, neighbor_id, rank).

    Per-cell memory is the cell's member matrix — bounded by centroid
    balance (num_centroids sizes the cells), the same skew argument as
    the IVF top-k lane.  With ``nprobe == num_centroids`` every cell is
    probed, the candidate set is the full corpus minus nothing, and the
    result EQUALS ``knn_graph`` exactly (pinned by pytest).
    """
    cents = _train_centroids(_sample_embeddings(sf_dir, sample_rows),
                             num_centroids, seed)
    C = len(cents)
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})
    if C == 0:
        return empty
    npb = min(nprobe, C)

    def _explode(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch)
        if m.size == 0:
            val_t = batch.schema.field("embedding").type.value_type
            return pa.table({"cell": pa.array([], pa.uint64()),
                             "vec_id": pa.array([], pa.int64()),
                             "is_member": pa.array([], pa.bool_()),
                             "emb": pa.array([], pa.list_(val_t))})
        ids = np_col(batch, "vec_id")
        n, dim = m.shape
        mn = _normalize(m)
        qc = mn @ cents.T                                     # (n, C)
        probe = np.argsort(-qc, axis=1, kind="stable")[:, :npb]
        # home cell = nearest centroid = probe column 0
        member = np.zeros((n, npb), bool)
        member[:, 0] = True
        flat = (batch["embedding"].combine_chunks().flatten()
                .to_numpy(zero_copy_only=False))
        tiled = np.repeat(flat.reshape(n, dim), npb, axis=0).reshape(-1)
        rows = n * npb
        # ship at SOURCE precision: a float32 downcast of a float64-stored
        # column would rank-flip near-tied cosines vs knn_graph and break
        # the documented full-probe equality
        pa_val_t = pa.from_numpy_dtype(tiled.dtype)
        emb_col = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (rows + 1) * dim, dim), pa.int32()),
            pa.array(tiled, pa_val_t))
        return pa.table({
            "cell": pa.array(probe.reshape(-1).astype(np.uint64)),
            "vec_id": pa.array(np.repeat(ids, npb), pa.int64()),
            "is_member": pa.array(member.reshape(-1)),
            "emb": emb_col})

    exploded = _read_embeddings(sf_dir).map_batches(
        _explode, batch_format="pyarrow", batch_size=4096)

    def _cell_topk(g: pa.Table) -> pa.Table:
        out = pa.table({"query_id": pa.array([], pa.int64()),
                        "neighbor_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64())})
        n = g.num_rows
        if n == 0:
            return out
        cell = np_col(g, "cell").astype(np.uint64)
        ids = np_col(g, "vec_id")
        is_mem = np_col(g, "is_member") > 0
        emb = g["emb"].combine_chunks()
        m = _normalize(emb.flatten().to_numpy(zero_copy_only=False)
                       .reshape(n, -1).astype(np.float64))
        order, gid, counts = run_ids(cell)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        qs_l, ns_l, sc_l = [], [], []
        for s, c in zip(starts, counts):   # per-CELL loop (few cells per
            sel = order[s:s + c]           # partition; each pass a matmul)
            mem = sel[is_mem[sel]]
            if len(mem) == 0:
                continue
            scores = m[sel] @ m[mem].T                        # (q, mem)
            scores[ids[sel][:, None] == ids[mem][None, :]] = -np.inf
            kk = min(k, scores.shape[1])
            part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            sc = np.take_along_axis(scores, part, axis=1).reshape(-1)
            fin = np.isfinite(sc)
            qs_l.append(np.repeat(ids[sel], kk)[fin])
            ns_l.append(ids[mem][part.reshape(-1)][fin])
            sc_l.append(sc[fin])
        if not qs_l:
            return out
        return pa.table({"query_id": pa.array(np.concatenate(qs_l), pa.int64()),
                         "neighbor_id": pa.array(np.concatenate(ns_l), pa.int64()),
                         "score": pa.array(np.concatenate(sc_l), pa.float64())})

    cand = partitionwise(exploded, _cell_topk, "cell", num_parts)

    def _final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        qs, ns, _ss, rank = _topk_fold(np_col(g, "query_id"),
                                       np_col(g, "neighbor_id"),
                                       np_col(g, "score"), k)
        return pa.table({"vec_id": pa.array(qs, pa.int64()),
                         "neighbor_id": pa.array(ns, pa.int64()),
                         "rank": pa.array(rank, pa.int64())})

    return partitionwise(cand, _final, "query_id", num_parts)


def embedding_decontaminate_flags(sf_dir: str, num_ref: int = 50,
                                  threshold: float = 0.35):
    """Semantic decontamination over the embedding column: flag every
    corpus vector whose cosine to ANY reference vector reaches
    ``threshold`` — the embedding-space analogue of the n-gram
    ``decontaminate_flags`` (catches paraphrased eval contamination that
    exact n-gram overlap misses).  Reference set = ``vec_id < num_ref``,
    the same id-slice convention the n-gram lane uses on documents; a
    production caller passes its own eval table through the same kernel.

    Scale shape: the reference matrix is small by nature (eval sets),
    loaded with the row-group-pruned driver read and broadcast ONCE via
    ``ray.put``; the corpus streams through one pure map — zero shuffles,
    zero driver state.  Returns (vec_id, is_near bool) for every corpus
    (non-reference) vector.
    """
    import ray

    _r_ids, r_mat = _load_matrix_local(sf_dir, max_vec_id=num_ref)
    ref = ray.put(_normalize(r_mat) if r_mat.size else r_mat)

    def _flag(batch: pa.Table) -> pa.Table:
        rn = ray.get(ref)
        ids = np_col(batch, "vec_id")
        keep = ids >= num_ref
        m = _emb_matrix(batch)
        if m.size == 0 or not keep.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "is_near": pa.array([], pa.bool_())})
        mk = _normalize(m[keep])
        if rn.size == 0:
            near = np.zeros(len(mk), bool)
        else:
            near = (mk @ rn.T).max(axis=1) >= threshold
        return pa.table({"vec_id": pa.array(ids[keep], pa.int64()),
                         "is_near": pa.array(near)})

    return _read_embeddings(sf_dir).map_batches(
        _flag, batch_format="pyarrow", batch_size=4096)


def embedding_quantize_int8(sf_dir: str, explode: bool = True):
    """Scalar (per-dimension min/max) int8 quantization of the embedding
    column — the standard ~4× memory cut before an ANN index build, and
    the code layout IVF-PQ-style indexes start from.

    Pass 1 streams per-block (min_vec, max_vec) partials, pre-folded to
    ≤ 8 rows by ``_prefold_sum`` (min/max fold — order-exact, so the
    dimension ranges are bit-identical at any partitioning); the driver
    forms the 2 × dim range arrays; pass 2 broadcasts them in the map
    closure and codes every vector vectorized:

        code = floor((v - lo) / (hi - lo) * 255 + 0.5) - 128  ∈ [-128, 127]

    (constant dimensions, hi == lo, code to -128).  ``explode=True``
    returns (vec_id, dim, code) rows — the SQL-comparable layout;
    ``explode=False`` returns packed (vec_id, code list<int8>) rows, the
    production layout.
    """
    ds = _read_embeddings(sf_dir)

    def _ranges(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b)
        if m.size == 0:
            return pa.table({"lo": pa.array([], pa.list_(pa.float64())),
                             "hi": pa.array([], pa.list_(pa.float64())),
                             "__salt": pa.array([], pa.uint64())})
        return pa.table({
            "lo": pa.array([m.min(axis=0)], pa.list_(pa.float64())),
            "hi": pa.array([m.max(axis=0)], pa.list_(pa.float64())),
            "__salt": pa.array(
                [np_col(b, "vec_id").astype(np.uint64)[0]], pa.uint64())})

    rows = _prefold_sum(ds.map_batches(_ranges, batch_format="pyarrow"),
                        float_list_min_cols=("lo",),
                        float_list_max_cols=("hi",)).take_all()
    if not rows:
        if explode:
            z = pa.array([], pa.int64())
            return pa.table({"vec_id": z, "dim": z, "code": z})
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "code": pa.array([], pa.list_(pa.int8()))})
    lo = np.min([np.asarray(r["lo"], np.float64) for r in rows], axis=0)
    hi = np.max([np.asarray(r["hi"], np.float64) for r in rows], axis=0)
    rng = hi - lo
    const = rng == 0

    def _code_matrix(m: np.ndarray) -> np.ndarray:
        c = np.floor((m - lo) / np.where(const, 1.0, rng) * 255 + 0.5) - 128
        c[:, const] = -128
        return c.astype(np.int64)

    def _explode(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b)
        if m.size == 0:
            z = pa.array([], pa.int64())
            return pa.table({"vec_id": z, "dim": z, "code": z})
        n, d = m.shape
        c = _code_matrix(m)
        return pa.table({
            "vec_id": pa.array(np.repeat(np_col(b, "vec_id"), d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "code": pa.array(c.reshape(-1), pa.int64())})

    def _packed(b: pa.Table) -> pa.Table:
        m = _emb_matrix(b)
        if m.size == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "code": pa.array([], pa.list_(pa.int8()))})
        n, d = m.shape
        c = _code_matrix(m).astype(np.int8)
        return pa.table({
            "vec_id": b["vec_id"].cast(pa.int64()),
            "code": pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * d, d), pa.int32()),
                pa.array(c.reshape(-1), pa.int8()))})

    return ds.map_batches(_explode if explode else _packed,
                          batch_format="pyarrow")
