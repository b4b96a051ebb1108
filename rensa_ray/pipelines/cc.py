"""Distributed connected components via iterative min-label propagation.

Cluster semantics generalize the reference README recipe (README.md:94-123,
"keep the smaller doc id") to full transitive closure: every node's label
converges to the minimum doc id reachable through candidate edges.

Formulation (all partition-wise, no per-key python):

    labels(node, label) ← nodes(edges), label = node
    repeat:
        messages  = for each edge (u, v): (v, label(u)) and (u, label(v))
        labels'   = min over {labels, messages} grouped by node
    until no label changed (sum of changes == 0) or max_rounds

Each round is two hash-partitioned shuffles over (|V| + 2|E|) rows.  Rounds
grow with component diameter; LSH candidate graphs are star-heavy so this
converges in a handful of rounds.  ``checkpoint_dir`` writes labels (+ a
``_DONE`` marker) per round, and a re-invocation with the same dir resumes
from the last COMPLETE round — labels are monotone, so resuming from any
completed round is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import np_col, partitionwise, run_ids


def _distinct_nodes(edges, num_parts: int):
    both = edges.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays(
            [b["src"].combine_chunks(), b["dst"].combine_chunks()])}),
        batch_format="pyarrow")

    def _uniq(g: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(np.unique(np_col(g, "node")))})

    return partitionwise(both, _uniq, "node", num_parts)


def local_min_labels(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """In-memory CC: vectorized min-label propagation with pointer jumping.

    Returns (nodes, labels) where labels[i] = min node id reachable from
    nodes[i].  O((V+E) · log) fully-numpy; used when the candidate-edge set
    fits one machine (edges are a tiny fraction of the corpus — the knob
    ``driver_cc_threshold`` bounds the driver's memory).
    """
    both = np.concatenate([src, dst])
    nodes, idx = np.unique(both, return_inverse=True)
    m = len(src)
    s, d = idx[:m], idx[m:]
    # one upfront sort by receiving endpoint turns every iteration's
    # neighbor-min into a gather + 1-D reduceat (the np.minimum.at scatter
    # it replaces is an order of magnitude slower per round)
    recv = np.concatenate([d, s])
    send = np.concatenate([s, d])
    order = np.argsort(recv, kind="stable")
    recv_s = recv[order]
    send_s = send[order]
    starts = np.flatnonzero(
        np.concatenate([[True], recv_s[1:] != recv_s[:-1]]))
    recv_ids = recv_s[starts]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        mins = np.minimum.reduceat(label[send_s], starts)
        l2 = label.copy()
        l2[recv_ids] = np.minimum(l2[recv_ids], mins)
        while True:
            l3 = l2[l2]
            if np.array_equal(l3, l2):
                break
            l2 = l3
        if np.array_equal(l2, label):
            break
        label = l2
    return nodes, nodes[label]


def driver_cc_capacity() -> int:
    """Edge count the driver fast path may safely collapse in-heap.

    ``local_min_labels`` peaks at ~100 B/edge (the concat table + sort order
    + per-edge label gathers); budget a quarter of the machine's currently
    AVAILABLE memory so the threshold scales with driver heap instead of
    being a fixed constant, clamped to [10M, 500M] edges.
    """
    try:
        import psutil

        avail = psutil.virtual_memory().available
    except Exception:  # pragma: no cover
        avail = 8 << 30
    return int(min(max(avail // 4 // 100, 10_000_000), 500_000_000))


def connected_components(edges, num_parts: int = 64, max_rounds: int = 30,
                         checkpoint_dir: str | None = None,
                         driver_cc_threshold: int | None = None):
    """edges(src, dst) → labels(node, label) with label = min reachable node.

    Only nodes that appear in some edge are labeled (isolated docs default to
    self-labels at attach time, see ``near_dup_clusters``).  Edge sets up to
    ``driver_cc_threshold`` rows (default: memory-adaptive via
    ``driver_cc_capacity``, ~50M edges per 20 GB of free driver RAM)
    collapse on the driver (they are ~pairs of near-dups, a small fraction
    of the corpus); larger graphs run the distributed label-propagation
    loop.
    """
    if driver_cc_threshold is None:
        import os

        env = os.environ.get("RENSA_RAY_DRIVER_CC_THRESHOLD")
        # ops knob: 0 forces the distributed label-propagation loop (the
        # path a 10^12-doc cluster run takes) even when the edge set would
        # fit the driver — used by `job --rehearse --force-distributed-cc`
        try:
            driver_cc_threshold = (int(env) if env not in (None, "")
                                   else driver_cc_capacity())
        except ValueError as e:
            raise ValueError(
                "RENSA_RAY_DRIVER_CC_THRESHOLD must be an integer edge "
                f"count (0 forces the distributed loop), got {env!r}") from e
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return edges.map_batches(
            lambda b: pa.table({"node": b["src"], "label": b["dst"]}),
            batch_format="pyarrow")

    if n_edges <= driver_cc_threshold:
        import ray
        import ray.data as rd

        # empty blocks may carry a column-less schema — drop them before concat
        tbl = pa.concat_tables(
            [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows > 0])
        src = tbl["src"].to_numpy(zero_copy_only=False)
        dst = tbl["dst"].to_numpy(zero_copy_only=False)
        nodes, labels = local_min_labels(src, dst)
        out = pa.table({"node": pa.array(nodes, tbl.schema.field("src").type),
                        "label": pa.array(labels, tbl.schema.field("src").type)})
        return rd.from_arrow(out)

    start_round = 0
    labels = None
    if checkpoint_dir is not None:
        # resume from the last COMPLETE round (dir + _DONE marker): a killed
        # run restarts label propagation where it left off instead of from
        # self-labels.  Labels are monotone non-increasing, so resuming from
        # any completed round is always correct.
        import os

        import ray.data as rd

        done = sorted(
            int(d.split("=", 1)[1]) for d in (
                os.listdir(checkpoint_dir) if os.path.isdir(checkpoint_dir)
                else [])
            if d.startswith("cc_round=") and os.path.exists(
                os.path.join(checkpoint_dir, d, "_DONE")))
        if done:
            labels = rd.read_parquet(
                f"{checkpoint_dir}/cc_round={done[-1]}").materialize()
            start_round = done[-1] + 1
    if labels is None:
        labels = _distinct_nodes(edges, num_parts).map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["node"]}),
            batch_format="pyarrow").materialize()

    for rnd in range(start_round, max_rounds):
        new_labels, changed = _propagate_round(edges, labels, num_parts)
        labels = new_labels.materialize()
        # the sort's output block count tracks its INPUT block count, and
        # each round unions labels back in twice (lab_rows + jmp) — without
        # a cap the per-round block count (hence sort scheduling cost)
        # doubles every round.  Rows are unchanged, so this repartition is a
        # cheap metadata-sized pass.
        if labels.num_blocks() > 2 * num_parts:
            labels = labels.repartition(num_parts).materialize()
        if checkpoint_dir is not None:
            import os
            import shutil

            rdir = os.path.join(checkpoint_dir, f"cc_round={rnd}")
            # a killed attempt leaves a partial round dir with no _DONE;
            # write_parquet would APPEND fresh-UUID files beside the stale
            # ones (rows today are identical-valued and washed out by the
            # first-per-node reduce, but the checkpoint grows and any reader
            # assuming one row per node breaks) — wipe it first, mirroring
            # webdedup._Checkpointer.save
            if os.path.isdir(rdir) and not os.path.exists(
                    os.path.join(rdir, "_DONE")):
                shutil.rmtree(rdir)
            labels.write_parquet(rdir)
            with open(os.path.join(rdir, "_DONE"), "w") as f:
                f.write("ok")
        if changed == 0:
            break
    return labels


def _propagate_round(edges, labels, num_parts: int, pointer_jump: bool = True):
    """One min-label round; returns (new_labels, #nodes whose label changed)."""
    # join labels onto edge endpoints partition-wise:
    # rows kind 0: (key=node, a=label, b=-)      — label records
    # rows kind 1: (key=src,  a=dst,   b=-)      — edge, forward
    # rows kind 2: (key=dst,  a=src,   b=-)      — edge, backward
    lab_rows = labels.map_batches(
        lambda b: pa.table({"key": b["node"], "val": b["label"],
                            "kind": pa.array(np.zeros(len(b), np.int8))}),
        batch_format="pyarrow")
    fwd = edges.map_batches(
        lambda b: pa.table({"key": b["src"], "val": b["dst"],
                            "kind": pa.array(np.ones(len(b), np.int8))}),
        batch_format="pyarrow")
    bwd = edges.map_batches(
        lambda b: pa.table({"key": b["dst"], "val": b["src"],
                            "kind": pa.array(np.ones(len(b), np.int8))}),
        batch_format="pyarrow")
    unioned = lab_rows.union(fwd).union(bwd)
    if pointer_jump:
        # pointer jumping: a dynamic edge (label(n) → n) each round lets n
        # learn label(label(n)), so path lengths halve and long chains
        # converge in O(log diameter) rounds instead of O(diameter).  Labels
        # are always node ids with label rows of their own, so the
        # searchsorted join stays total.
        jmp = labels.map_batches(
            lambda b: pa.table({"key": b["label"], "val": b["node"],
                                "kind": pa.array(np.ones(len(b), np.int8))}),
            batch_format="pyarrow")
        unioned = unioned.union(jmp)

    def _emit_messages(g: pa.Table) -> pa.Table:
        key = np_col(g, "key")
        val = np_col(g, "val")
        kind = np_col(g, "kind")
        is_lab = kind == 0
        lk, lv = key[is_lab], val[is_lab]
        o = np.argsort(lk, kind="stable")
        lk, lv = lk[o], lv[o]
        ek, ev = key[~is_lab], val[~is_lab]
        # label of each edge endpoint (every edge node has a label row)
        pos = np.searchsorted(lk, ek)
        msg_label = lv[pos] if len(ek) else ev[:0]
        # messages to neighbors + existing labels (keeps labels monotone).
        # ``old`` rides along in the UINT64 domain with u64::MAX as the
        # "message row, no old label" sentinel (an int64 -1 sentinel broke
        # convergence detection for fxhash64 ids >= 2^63: the negative cast
        # label always lost to -1 under max, so ``changed`` never reached 0
        # and every run burned all max_rounds).  A label of u64::MAX is
        # impossible for the flagship: ingest remaps it out of the uid
        # space (webdedup.reserve_sentinel_uids); for direct callers with
        # their own id scheme it remains a 2^-64 note.
        node = np.concatenate([ev, lk])
        lab = np.concatenate([msg_label, lv])
        return pa.table({"node": pa.array(node), "lab": pa.array(lab),
                         "old": pa.array(np.concatenate(
                             [np.full(len(ev), np.iinfo(np.uint64).max,
                                      np.uint64),
                              lv.astype(np.uint64)]))})

    messages = partitionwise(unioned, _emit_messages, "key", num_parts)

    def _min_label(g: pa.Table) -> pa.Table:
        node = np_col(g, "node")
        lab = np_col(g, "lab").astype(np.uint64)
        old = np_col(g, "old")
        if len(node) == 0:
            return pa.table({"node": pa.array(node),
                             "label": pa.array(lab.astype(node.dtype)),
                             "changed": pa.array([], pa.int64())})
        order, gid, counts = run_ids(node.astype(np.uint64))
        first = np.zeros(len(gid), dtype=bool)
        first[0] = True
        first[1:] = gid[1:] != gid[:-1]
        newlab = np.full(len(counts), np.iinfo(np.uint64).max, np.uint64)
        np.minimum.at(newlab, gid, lab[order])
        # every node has exactly one label row, so min-with-MAX-sentinel
        # recovers its old label exactly (all-uint64 comparison — see
        # _emit_messages for why the old int64 sentinel was wrong)
        oldlab = np.full(len(counts), np.iinfo(np.uint64).max, np.uint64)
        np.minimum.at(oldlab, gid, old[order].astype(np.uint64))
        changed = (newlab != oldlab).astype(np.int64)
        return pa.table({"node": pa.array(node[order][first]),
                         "label": pa.array(newlab.astype(node.dtype)),
                         "changed": pa.array(changed)})

    merged = partitionwise(messages, _min_label, "node", num_parts).materialize()
    changed = merged.sum("changed", ignore_nulls=True) or 0
    return merged.select_columns(["node", "label"]), changed
