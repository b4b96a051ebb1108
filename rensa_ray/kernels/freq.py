"""Mergeable frequency / quantile summaries for single-pass streams.

Two shuffle-free sketches for the aggregates that would otherwise need a
full all-to-all at 100 TB:

- ``HeavyHitterSummary`` — a SpaceSaving-style mergeable top-m summary.
  Each block keeps only its ``capacity`` highest-count tokens plus the
  largest DROPPED count as an overcount bound; merging sums counts and
  propagates the bound.  ``top-k`` answers come with a per-token error
  interval, so callers can tell "guaranteed exact" from "within ±err".
  (Public algorithm: Metwally et al.'s SpaceSaving / Misra-Gries family;
  this is the batch-mergeable formulation, vectorized over Arrow counts.)

- ``LogBucketSketch`` — fixed-resolution log-bucketed histogram for
  non-negative floats.  Bucket i covers [base^i, base^(i+1)); quantile
  answers carry a guaranteed relative error ≤ base - 1.  Registers are a
  plain int64 vector → merge is elementwise add (associative, exact), so
  per-block sketches fold shuffle-free exactly like the HLL kernel.
"""

from __future__ import annotations

import numpy as np

__all__ = ["HeavyHitterSummary", "LogBucketSketch"]


class HeavyHitterSummary:
    """Mergeable top-``capacity`` token summary with per-token error bounds.

    ``tokens``/``counts`` hold lower-bound counts; ``err`` is the maximum
    undercount any RETAINED token may carry (mass dropped by truncations on
    this summary's lineage).  A dropped token's true count is ≤ ``err``.
    """

    __slots__ = ("capacity", "tokens", "counts", "err")

    def __init__(self, capacity: int,
                 tokens: np.ndarray | None = None,
                 counts: np.ndarray | None = None,
                 err: int = 0):
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        self.capacity = int(capacity)
        self.tokens = (np.empty(0, object) if tokens is None
                       else np.asarray(tokens, object))
        self.counts = (np.empty(0, np.int64) if counts is None
                       else np.asarray(counts, np.int64))
        self.err = int(err)

    @classmethod
    def from_exact_counts(cls, capacity: int, tokens, counts
                          ) -> "HeavyHitterSummary":
        """Build from one block's EXACT (token, count) table, truncating to
        the ``capacity`` highest counts (ties kept deterministically by
        token asc)."""
        tokens = np.asarray(tokens, object)
        counts = np.asarray(counts, np.int64)
        s = cls(capacity)
        if len(tokens) <= capacity:
            order = np.lexsort((tokens.astype("U"), -counts))
            s.tokens, s.counts = tokens[order], counts[order]
            return s
        order = np.lexsort((tokens.astype("U"), -counts))
        s.tokens = tokens[order[:capacity]]
        s.counts = counts[order[:capacity]]
        s.err = int(counts[order[capacity]])  # largest dropped exact count
        return s

    def merge(self, other: "HeavyHitterSummary") -> "HeavyHitterSummary":
        """Merge two summaries: counts add where tokens meet; a token absent
        from one side may be undercounted by that side's ``err``.  The
        result is re-truncated to ``capacity`` and the bound updated."""
        cap = min(self.capacity, other.capacity)
        toks = np.concatenate([self.tokens, other.tokens])
        cnts = np.concatenate([self.counts, other.counts])
        if len(toks) == 0:
            return HeavyHitterSummary(cap, err=self.err + other.err)
        u = toks.astype("U")
        order = np.argsort(u, kind="stable")
        u_s, c_s = u[order], cnts[order]
        first = np.ones(len(u_s), bool)
        first[1:] = u_s[1:] != u_s[:-1]
        gid = np.cumsum(first) - 1
        summed = np.zeros(int(gid[-1]) + 1, np.int64)
        np.add.at(summed, gid, c_s)
        uniq = u_s[first]
        err = self.err + other.err
        out = HeavyHitterSummary.from_exact_counts(cap, uniq.astype(object),
                                                   summed)
        # from_exact_counts' truncation bound is on ALREADY-undercounted
        # values; total bound stacks the lineage error on top
        out.err += err
        return out

    def topk(self, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(tokens, lower_counts, exact_mask) for the k highest counts.
        ``exact_mask[i]`` is True when entry i's rank among the TRUE counts
        is guaranteed.  A retained entry's true count lies in
        [cnt_j, cnt_j + err]; a dropped token's true count is ≤ err.  Rank
        i+1 is therefore guaranteed iff (a) every entry ABOVE it truly
        outranks it — the weakest such lower bound is cnt_{i-1}, so require
        cnt_{i-1} > cnt_i + err — and (b) every contender BELOW truly ranks
        under it: cnt_i strictly beats the next retained entry's upper
        bound cnt_{i+1} + err (when one exists) and the dropped-mass bound
        err.  Strict, because at equality a contender could tie the true
        count and win the (cnt DESC, token ASC) tie-break.  Comparing only
        against contenders OUTSIDE the top-k (the pre-r4 behavior) was
        unsound: two top-k entries within err of each other could both be
        flagged while their true order is unknown.
        When err == 0 nothing was ever dropped: the summary IS the exact
        count table and its (count desc, token asc) order already resolves
        ties exactly like the exact lane, so every entry is guaranteed."""
        k = min(k, len(self.tokens))
        toks, cnts = self.tokens[:k], self.counts[:k]
        if k == 0:
            return toks, cnts, np.empty(0, bool)
        if self.err == 0:
            return toks, cnts, np.ones(k, bool)
        n = len(self.counts)
        idx = np.arange(k)
        nxt = np.concatenate([self.counts[1:], [0]])[:k]
        below_upper = np.where(idx < n - 1, nxt + self.err, self.err)
        ok_below = cnts > below_upper
        prev = np.concatenate([[np.iinfo(np.int64).max],
                               self.counts[:k - 1]]).astype(np.int64)
        ok_above = prev > cnts + self.err
        return toks, cnts, ok_below & ok_above


class LogBucketSketch:
    """Signed log-bucketed histogram with exact merge.

    ``base`` > 1 sets the resolution: answers carry relative error
    ≤ base - 1 in MAGNITUDE (sign is always exact).  Negative values get a
    mirrored bank of buckets, laid out so ascending register index equals
    ascending value — quantiles stay one cumsum + searchsorted.  Values
    with |x| < lo land in the zero bucket of their sign (returned as 0.0).
    Registers are int64 counts → merging = vector add.
    """

    def __init__(self, base: float = 1.01, lo: float = 1e-12,
                 hi: float = 1e12, counts: np.ndarray | None = None):
        if base <= 1.0:
            raise ValueError("base must be > 1")
        self.base = float(base)
        self.lo = float(lo)
        self.hi = float(hi)
        # magnitude buckets 0 (underflow) .. n_mag-1 per sign
        self.n_mag = int(np.ceil(
            np.log(self.hi / self.lo) / np.log(self.base))) + 2
        self.n_buckets = 2 * self.n_mag
        self.counts = (np.zeros(self.n_buckets, np.int64) if counts is None
                       else np.asarray(counts, np.int64))
        if len(self.counts) != self.n_buckets:
            raise ValueError("counts length mismatch")

    def _mag_bucket(self, a: np.ndarray) -> np.ndarray:
        clipped = np.clip(a, self.lo, self.hi)
        idx = np.floor(np.log(clipped / self.lo) / np.log(self.base)
                       ).astype(np.int64) + 1
        idx = np.clip(idx, 1, self.n_mag - 1)
        idx[a < self.lo] = 0
        return idx

    def _bucket(self, x: np.ndarray) -> np.ndarray:
        # layout: [neg magnitudes descending | pos magnitudes ascending]
        # index n_mag-1-m for x<0, n_mag+m for x>=0 → index order == value
        # order across the sign boundary
        x = np.asarray(x, np.float64)
        m = self._mag_bucket(np.abs(x))
        return np.where(x < 0, self.n_mag - 1 - m, self.n_mag + m)

    def add(self, x: np.ndarray) -> "LogBucketSketch":
        np.add.at(self.counts, self._bucket(x), 1)
        return self

    def merge(self, other: "LogBucketSketch") -> "LogBucketSketch":
        if (other.base != self.base or other.lo != self.lo
                or other.hi != self.hi):
            raise ValueError("sketch configs differ")
        return LogBucketSketch(self.base, self.lo, self.hi,
                               self.counts + other.counts)

    def quantile(self, q: float) -> float:
        """Value v with relative error ≤ base-1 (in magnitude) such that
        ≥ q of the mass is ≤ v (bucket at the q-th cumulative count)."""
        n = int(self.counts.sum())
        if n == 0:
            return float("nan")
        target = q * (n - 1)
        cum = np.cumsum(self.counts)
        b = int(np.searchsorted(cum, target + 1))
        if b >= self.n_mag:
            m = b - self.n_mag
            if m == 0:
                return 0.0
            # geometric midpoint of bucket m: [lo*base^(m-1), lo*base^m)
            return float(self.lo * self.base ** (m - 0.5))
        m = self.n_mag - 1 - b
        if m == 0:
            return 0.0
        return float(-(self.lo * self.base ** (m - 0.5)))
