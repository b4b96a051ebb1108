"""LSH band explode stage.

The reference's LSH index is an in-memory ``FxHashMap`` per band
(src/lsh.rs:58-75).  At scale the index is a *table*, not a data structure:
each document explodes into ``num_bands`` rows ``(doc_id, band_id,
band_hash)`` and every index operation (insert / query / duplicate flags)
becomes a keyed operation on that table (src/lsh/one_shot.rs:294-332
semantics re-expressed as a shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.hashing import band_hash_matrix
from .sign import SIG_COL, sig_from_arrow


def validate_bands(num_perm: int, num_bands: int) -> int:
    """num_perm % num_bands == 0 (src/lsh/config.rs:150-175); returns band_size."""
    if num_bands <= 0 or num_bands > num_perm:
        raise ValueError("num_bands must be between 1 and num_perm")
    if num_perm % num_bands != 0:
        raise ValueError("num_perm must be divisible by num_bands")
    return num_perm // num_bands


def band_hashes_matrix(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """(n, P) signature matrix → (n, num_bands) uint64 band hashes."""
    n, num_perm = sig.shape
    band_size = validate_bands(num_perm, num_bands)
    out = np.empty((n, num_bands), dtype=np.uint64)
    for b in range(num_bands):
        out[:, b] = band_hash_matrix(sig[:, b * band_size : (b + 1) * band_size])
    return out


class BandExploder:
    """map_batches stage: (id, sig) → num_bands rows (id, band_id, band_hash)."""

    def __init__(self, num_bands: int = 8, id_col: str = "doc_id"):
        self.num_bands = num_bands
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = sig_from_arrow(batch[SIG_COL])
        if sig.dtype != np.uint32:
            # C-MinHash u64 signatures band-hash their u32 digest view (v >> 32)
            sig = (sig.astype(np.uint64) >> np.uint64(32)).astype(np.uint32)
        n = len(sig)
        bh = band_hashes_matrix(sig, self.num_bands)  # (n, B)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.num_bands)),
            "band_id": pa.array(np.tile(np.arange(self.num_bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
        })
