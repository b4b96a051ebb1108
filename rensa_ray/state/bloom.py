"""Bloom-filter membership state for bounded-memory exact dedup.

Why a Bloom lane at all: the band-table incremental path
(``state/stream.py: incremental_dedup_against_checkpoint``) joins every
micro-batch against a history table that GROWS with the corpus — exact, but
the per-increment cost is O(history ∩ partitions touched).  A Bloom sidecar
is constant-size state (≈ 9.6 bits/key at 1% fp): each increment does an
O(new batch) vectorized membership probe against a broadcast bitset and never
re-reads history.  False positives drop a bounded, tunable fraction of unique
docs (never the reverse — no false negatives), which is the standard trade
web-pipeline exact dedup makes (CCNet/Dolma-style Bloom dedup).

Scale note (10^12 keys): one monolithic filter would be ~1.2 TB of bits.  The
deployment shape is one filter PER key-range partition (the same fxhash64
ranges ``pipelines.common.partitionwise`` uses), each sized for its share and
checkpointed beside the partition's parquet — any worker loads only its
partition's bitset.  This module implements the single-filter kernel plus
serialization; the partition loop is the caller's (see
``incremental_dedup_exact_bloom`` below for the single-filter flow).

All probing is vectorized: k probe positions per key via double hashing
(Kirsch–Mitzenmacher, h1 + i*h2 — published construction) over SplitMix64
mixes of the key, ``np.bitwise_or.at`` for the scatter.
"""

from __future__ import annotations

import numpy as np

from ..kernels.rho import splitmix64_vec

_SEED_MIX = np.uint64(0x9E3779B97F4A7C15)


def probe_positions(keys: np.ndarray, num_bits: int, num_hashes: int,
                    seed: int) -> np.ndarray:
    """(k, n) bit positions via double hashing of SplitMix64 mixes —
    module-level so map_batches tasks can probe a broadcast bitset without
    reconstructing a filter object."""
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    salt = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    h1 = splitmix64_vec(keys ^ salt)
    h2 = splitmix64_vec(h1) | np.uint64(1)  # odd → full-period stride
    i = np.arange(num_hashes, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return (h1[None, :] + i * h2[None, :]) % np.uint64(num_bits)


def bits_contain(bits: np.ndarray, keys: np.ndarray, num_bits: int,
                 num_hashes: int, seed: int) -> np.ndarray:
    """Membership probe against a raw uint64 bitset (no false negatives)."""
    keys = np.asarray(keys, dtype=np.uint64)
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = probe_positions(keys, num_bits, num_hashes, seed)
    word = (pos >> np.uint64(6)).astype(np.int64)
    bit = np.uint64(1) << (pos & np.uint64(63))
    return ((bits[word] & bit) != 0).all(axis=0)


class BloomFilter:
    """Vectorized Bloom filter over uint64 keys.

    ``capacity`` is the expected number of distinct keys; ``fp_rate`` the
    target false-positive probability at that load.  Bit count m and probe
    count k follow the textbook optima m = -n ln p / (ln 2)^2,
    k = (m/n) ln 2.
    """

    def __init__(self, capacity: int, fp_rate: float = 0.01, seed: int = 42):
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        if not (0.0 < fp_rate < 1.0):
            raise ValueError("fp_rate must be in (0, 1)")
        m = int(np.ceil(-capacity * np.log(fp_rate) / (np.log(2.0) ** 2)))
        self.num_bits = max(64, (m + 63) // 64 * 64)
        self.num_hashes = max(1, int(round(self.num_bits / capacity * np.log(2.0))))
        self.capacity = int(capacity)
        self.fp_rate = float(fp_rate)
        self.seed = int(seed)
        self.n_added = 0
        self._over_capacity_warned = False
        self._bits = np.zeros(self.num_bits // 64, dtype=np.uint64)

    # -------------------------------------------------------------- probes

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        return probe_positions(keys, self.num_bits, self.num_hashes, self.seed)

    # ------------------------------------------------------------- queries

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Boolean mask: True = possibly present (no false negatives)."""
        return bits_contain(self._bits, keys, self.num_bits, self.num_hashes,
                            self.seed)

    def add_many(self, keys: np.ndarray) -> np.ndarray:
        """Insert keys; returns the pre-insert ``contains_many`` mask.

        Duplicate keys WITHIN the call are resolved first-wins: only the
        first occurrence of a key reads False.
        """
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        # first-occurrence mask within the call (stable, order-preserving)
        _, first_idx = np.unique(keys, return_index=True)
        is_first = np.zeros(len(keys), dtype=bool)
        is_first[first_idx] = True
        seen = self.contains_many(keys) | ~is_first
        fresh = keys[first_idx]
        pos = self._positions(fresh)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self._bits, word.ravel(), bit.ravel())
        self.n_added += int(len(fresh))
        if self.n_added > self.capacity and not self._over_capacity_warned:
            # past the sized load the REAL fp rate (here: unique docs
            # wrongly flagged duplicate and dropped) grows without bound —
            # surface it once instead of silently discarding data
            import warnings

            warnings.warn(
                f"BloomFilter exceeded sized capacity ({self.n_added} > "
                f"{self.capacity}): effective false-positive rate now "
                f"above the configured {self.fp_rate}; re-size the filter "
                f"or rotate the sidecar", RuntimeWarning, stacklevel=2)
            self._over_capacity_warned = True
        return seen

    def add(self, key: int) -> bool:
        """Scalar convenience: True if the key was possibly already present."""
        return bool(self.add_many(np.array([key], dtype=np.uint64))[0])

    def __contains__(self, key: int) -> bool:
        return bool(self.contains_many(np.array([key], dtype=np.uint64))[0])

    def __len__(self) -> int:
        return self.n_added

    # -------------------------------------------------------- merge / (de)ser

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """OR-union with a same-config filter (distributive: partitions can
        build partials independently and tree-merge)."""
        if (other.num_bits != self.num_bits
                or other.num_hashes != self.num_hashes
                or other.seed != self.seed):
            raise ValueError("cannot merge differently-configured filters")
        self._bits |= other._bits
        self.n_added += other.n_added
        return self

    def to_bytes(self) -> bytes:
        header = np.array([self.capacity, self.num_bits, self.num_hashes,
                           self.seed, self.n_added], dtype=np.uint64)
        return header.tobytes() + np.float64(self.fp_rate).tobytes() \
            + self._bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        header = np.frombuffer(data[:40], dtype=np.uint64)
        obj = cls.__new__(cls)
        obj.capacity = int(header[0])
        obj.num_bits = int(header[1])
        obj.num_hashes = int(header[2])
        obj.seed = int(header[3])
        obj.n_added = int(header[4])
        obj.fp_rate = float(np.frombuffer(data[40:48], dtype=np.float64)[0])
        obj._over_capacity_warned = False
        obj._bits = np.frombuffer(data[48:], dtype=np.uint64).copy()
        if len(obj._bits) * 64 != obj.num_bits:
            raise ValueError("corrupt bloom payload")
        return obj


class StreamingBloomDedupStage:
    """map_batches actor: (id, text) → (id, is_dup) exact-dup streaming lane.

    Arrival-order first-wins over fxhash64(text) content keys with
    constant-memory state — the Bloom analogue of ``StreamingDedupStage``
    (which holds an exact LSH index).  ``concurrency=1`` gives a globally
    consistent stream; an actor pool after a content-hash repartition gives
    the partition-sharded deployment shape.
    """

    def __init__(self, capacity: int = 1_000_000, fp_rate: float = 0.01,
                 seed: int = 42, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.bloom = BloomFilter(capacity, fp_rate, seed)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch):
        import pyarrow as pa

        from ..functions.textstats import content_hash_u64

        texts = ["" if t is None else t
                 for t in batch[self.text_col].to_pylist()]
        keys = content_hash_u64(texts)
        seen = self.bloom.add_many(keys)
        return pa.table({self.id_col: batch[self.id_col],
                         "is_dup": pa.array(seen)})


def incremental_dedup_exact_bloom(new_ds, bloom_path: str,
                                  capacity: int = 1_000_000,
                                  fp_rate: float = 0.01, seed: int = 42,
                                  id_col: str = "doc_id",
                                  text_col: str = "text", num_parts: int = 8,
                                  write_back: bool = True):
    """Micro-batch EXACT dedup against a constant-size Bloom history.

    ``new_ds``: (id, text).  Returns (id, is_dup) where is_dup means the
    doc's content key collides with history (Bloom probe — possible false
    positives at ``fp_rate``, never false negatives) OR with a lower-id doc
    of the same micro-batch (exact, via one keyed shuffle).  The filter is
    loaded from ``bloom_path`` if present, updated with the batch's keys, and
    written back — the next micro-batch sees them.

    Contrast with ``incremental_dedup_against_checkpoint`` (band-table join):
    that lane is exact and supports NEAR-dup, but each increment joins a
    history table that grows with the corpus; this lane is exact-dup-only
    with O(new batch) work and O(capacity) state regardless of history size.
    The bitset ships to workers once per increment via ``ray.put``.
    """
    import os

    import pyarrow as pa
    import ray

    from ..functions.textstats import content_hash_u64
    from ..pipelines.common import np_col, partitionwise

    if os.path.exists(bloom_path):
        with open(bloom_path, "rb") as f:
            bloom = BloomFilter.from_bytes(f.read())
    else:
        bloom = BloomFilter(capacity, fp_rate, seed)
    shape = (bloom.num_bits, bloom.num_hashes, bloom.seed)
    bits_ref = ray.put(bloom._bits)

    def _key_flag(b: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in b[text_col].to_pylist()]
        keys = content_hash_u64(texts)
        hist = bits_contain(ray.get(bits_ref), keys, *shape)
        return pa.table({id_col: b[id_col],
                         "__key": pa.array(keys, pa.uint64()),
                         "__hist": pa.array(hist)})

    keyed = new_ds.map_batches(_key_flag, batch_format="pyarrow")

    def _resolve(g: pa.Table) -> pa.Table:
        keys = np_col(g, "__key").astype(np.uint64)
        ids = np_col(g, id_col)
        hist = np_col(g, "__hist").astype(bool)
        order = np.lexsort((ids, keys))
        k_s, ids_s, hist_s = keys[order], ids[order], hist[order]
        first = np.ones(len(k_s), dtype=bool)
        first[1:] = k_s[1:] != k_s[:-1]
        is_dup = ~first | hist_s  # equal keys share one hist verdict
        return pa.table({id_col: pa.array(ids_s),
                         "is_dup": pa.array(is_dup),
                         "__key": pa.array(k_s, pa.uint64())})

    out = partitionwise(keyed, _resolve, "__key", num_parts).materialize()

    if write_back:
        # Driver-side state update: micro-batch-sized. At 10^12 keys, shard
        # one filter per key-range partition and fold the update into the
        # partition task instead (see module docstring).
        for b in out.iter_batches(batch_format="pyarrow", batch_size=65536):
            bloom.add_many(np_col(b, "__key").astype(np.uint64))
        parent = os.path.dirname(bloom_path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        # atomic sidecar update: a crash mid-write must not leave a
        # truncated file that from_bytes rejects, bricking the lane
        tmp_path = bloom_path + f".tmp.{os.getpid()}"
        with open(tmp_path, "wb") as f:
            f.write(bloom.to_bytes())
        os.replace(tmp_path, bloom_path)
    return out.select_columns([id_col, "is_dup"])
