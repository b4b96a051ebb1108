"""Accuracy metrics for comparing dedup lanes (reference
benchmarks/full_benchmark.py:631-660 ``mismatch_stats`` /
``jaccard_similarity`` of kept sets).

Used to compare two engines' duplicate flags / kept sets (e.g. the Ray
pipeline vs the scalar oracle, or vs datasketch where that package is
installed — it is not baked into this container, so the cross-check lane is
gated on import).
"""

from __future__ import annotations

import numpy as np


def flag_mismatch_stats(flags_a, flags_b) -> dict:
    """Element-wise duplicate-flag comparison → mismatch rate + confusion
    counts (reference mismatch_stats)."""
    a = np.asarray(flags_a, dtype=bool)
    b = np.asarray(flags_b, dtype=bool)
    if a.shape != b.shape:
        raise ValueError(f"length mismatch: {a.shape} vs {b.shape}")
    n = len(a)
    mism = a != b
    return {
        "n": int(n),
        "mismatches": int(mism.sum()),
        "mismatch_rate": float(mism.mean()) if n else 0.0,
        "a_only": int((a & ~b).sum()),
        "b_only": int((b & ~a).sum()),
        "both_flagged": int((a & b).sum()),
    }


def kept_set_jaccard(kept_a, kept_b) -> float:
    """Jaccard similarity of two kept-document id sets (reference
    jaccard_similarity of kept sets — its headline accuracy number)."""
    sa, sb = set(kept_a), set(kept_b)
    if not sa and not sb:
        return 1.0
    union = len(sa | sb)
    return len(sa & sb) / union if union else 1.0


def dup_pair_recall(pairs_got, pairs_want) -> float:
    """Fraction of wanted (unordered) dup pairs present in got."""
    norm = lambda ps: {(min(a, b), max(a, b)) for a, b in ps}
    want = norm(pairs_want)
    if not want:
        return 1.0
    return len(norm(pairs_got) & want) / len(want)
