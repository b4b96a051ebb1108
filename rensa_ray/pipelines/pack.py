"""Sequence packing for LLM training batches.

Greedily packs documents into fixed-capacity context windows ("packs") so a
trainer can consume the corpus with minimal padding.  Packing is inherently
sequential, so it runs independently per hash partition: each partition
sorts its docs by doc_id and fills windows in that order.  At 100 TB this is
the right contract — a global greedy order would serialize the whole corpus
through one node, while per-partition packing streams and scales linearly
(pack quality is statistically identical when partitions hold thousands of
docs).  ``pack_id`` is the doc_id of the pack's first document: globally
unique and deterministic given the partitioning, with no cross-partition
coordination.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import np_col, partitionwise

DEFAULT_PARTS = 16


def pack_sequences(sf_dir: str, capacity: int = 2048, num_parts: int = DEFAULT_PARTS):
    """Assign every doc to a training pack of <= ``capacity`` BPE tokens.

    Docs longer than ``capacity`` get a singleton pack (whether to truncate
    is the trainer's choice; the count is reported untruncated).  Output:
    (doc_id, pack_id, pack_pos, n_bpe_tokens).
    """
    from .textops import doc_bpe_token_counts

    counts = doc_bpe_token_counts(sf_dir)
    return pack_token_counts(counts, capacity=capacity, num_parts=num_parts)


def pack_token_counts(counts_ds, capacity: int = 2048,
                      num_parts: int = DEFAULT_PARTS):
    """Pack a (doc_id, n_bpe_tokens) dataset (see ``pack_sequences``)."""
    cap = int(capacity)

    def _pack(g: pa.Table) -> pa.Table:
        ids = np_col(g, "doc_id")
        toks = np_col(g, "n_bpe_tokens")
        order = np.argsort(ids, kind="stable")
        ids, toks = ids[order], toks[order]
        nrows = len(ids)
        if nrows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "pack_id": z, "pack_pos": z,
                             "n_bpe_tokens": z})
        # Greedy fill via cumsum + searchsorted: one Python iteration per
        # PACK (not per doc) — a partition of millions of docs costs
        # thousands of searchsorted jumps.
        capped = np.minimum(toks, cap)
        cum = np.concatenate([np.zeros(1, np.int64), np.cumsum(capped)])
        starts = []
        i = 0
        while i < nrows:
            starts.append(i)
            j = int(np.searchsorted(cum, cum[i] + cap, side="right")) - 1
            i = max(j, i + 1)
        starts = np.asarray(starts, np.int64)
        is_start = np.zeros(nrows, np.int64)
        is_start[starts] = 1
        pack_idx = np.cumsum(is_start) - 1
        pack_id = ids[starts][pack_idx]
        pack_pos = np.arange(nrows, dtype=np.int64) - starts[pack_idx]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "pack_id": pa.array(pack_id, pa.int64()),
                         "pack_pos": pa.array(pack_pos, pa.int64()),
                         "n_bpe_tokens": pa.array(toks, pa.int64())})

    return partitionwise(counts_ds, _pack, "doc_id", num_parts)
