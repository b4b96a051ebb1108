"""Property-based tests (hypothesis) for the combinatorial core kernels.

These kernels back every shuffle in the engine — run_ids (sort+segment),
pairs_within_runs (triangular enumeration), the simhash bit-plane kernel
and the substring rolling-window hash — so they get randomized differential
checks against brute-force references, not just fixed vectors.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from rensa_ray.pipelines.common import pairs_within_runs, run_ids

SETTINGS = dict(deadline=None, max_examples=30)


@settings(**SETTINGS)
@given(st.lists(st.integers(0, 9), max_size=40))
def test_pairs_within_runs_matches_brute(counts):
    counts = np.asarray(counts, np.int64)
    ii, jj = pairs_within_runs(counts)
    want = []
    start = 0
    for c in counts:
        for x in range(c):
            for y in range(x + 1, c):
                want.append((start + x, start + y))
        start += c
    got = sorted(zip(ii.tolist(), jj.tolist()))
    assert got == sorted(want)


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 5)), max_size=60))
def test_run_ids_matches_dict_grouping(pairs):
    if not pairs:
        return
    k1 = np.array([a for a, _ in pairs], np.uint64)
    k2 = np.array([b for _, b in pairs], np.uint64)
    order, gid, counts = run_ids(k1, k2)
    # groups partition the rows, keys are constant per group, sorted order
    assert counts.sum() == len(pairs)
    seen = {}
    for row, g in zip(order.tolist(), gid.tolist()):
        key = (int(k1[row]), int(k2[row]))
        seen.setdefault(g, key)
        assert seen[g] == key
    # group ids appear in sorted key order
    keys_in_order = [seen[g] for g in sorted(seen)]
    assert keys_in_order == sorted(set(keys_in_order))
    from collections import Counter

    want_counts = Counter(zip(k1.tolist(), k2.tolist()))
    assert sorted(counts.tolist()) == sorted(want_counts.values())


@settings(**SETTINGS)
@given(st.data())
def test_simhash_matches_naive(data):
    sizes = data.draw(st.lists(st.integers(0, 30), min_size=1, max_size=12))
    offsets = np.zeros(len(sizes) + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    total = int(offsets[-1])
    seed = data.draw(st.integers(0, 2**32 - 1))
    rng = np.random.default_rng(seed)
    hashes = rng.integers(0, 2**64, total, dtype=np.uint64)

    from rensa_ray.functions.simhash import simhash64_from_csr

    got = simhash64_from_csr(hashes, offsets)
    for d, sz in enumerate(sizes):
        seg = hashes[offsets[d]:offsets[d + 1]]
        if sz == 0:
            assert got[d] == 0
            continue
        acc = np.zeros(64, np.int64)
        for h in seg:
            for b in range(64):
                acc[b] += 1 if (int(h) >> b) & 1 else -1
        want = 0
        for b in range(64):
            if acc[b] > 0:
                want |= 1 << b
        assert int(got[d]) == want


@settings(**SETTINGS)
@given(st.data())
def test_window_hashes_match_scalar(data):
    from rensa_ray.pipelines.substring import _RK, _window_hashes

    sizes = data.draw(st.lists(st.integers(0, 25), min_size=1, max_size=8))
    L = data.draw(st.integers(1, 12))
    offsets = np.zeros(len(sizes) + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    words = rng.integers(0, 2**64, int(offsets[-1]), dtype=np.uint64)

    H, didx, pos = _window_hashes(words, offsets, L)
    k = 0
    with np.errstate(over="ignore"):
        for d, sz in enumerate(sizes):
            seg = words[offsets[d]:offsets[d + 1]]
            for t in range(max(sz - L + 1, 0)):
                want = np.uint64(0)
                mult = np.uint64(1)
                for j in range(L):
                    want = want + seg[t + j] * mult
                    mult = mult * _RK
                assert didx[k] == d and pos[k] == t
                assert H[k] == want
                k += 1
    assert k == len(H)


@given(st.lists(st.text(alphabet=" abcdeé\t\n字", max_size=30), max_size=12))
@settings(max_examples=150, deadline=None)
def test_repetition_stats_matches_scalar(texts):
    from collections import Counter

    from rensa_ray.functions.textstats import repetition_stats

    dwf, tbf = repetition_stats(texts)
    for i, t in enumerate(texts):
        w = t.lower().split()
        want_dwf = 1 - len(set(w)) / len(w) if w else 0.0
        assert dwf[i] == want_dwf, (t, dwf[i], want_dwf)
        if len(w) >= 2:
            c = Counter(zip(w, w[1:]))
            want_tbf = max(c.values()) / (len(w) - 1)
        else:
            want_tbf = 0.0
        assert tbf[i] == want_tbf, (t, tbf[i], want_tbf)


@given(st.lists(st.integers(min_value=0, max_value=5000), min_size=1,
                max_size=200),
       st.integers(min_value=1, max_value=2048))
@settings(max_examples=100, deadline=None)
def test_pack_greedy_kernel_invariants(tokens, cap):
    """The greedy packer (cumsum+searchsorted jumps) fills each pack to the
    last doc that fits — byte-for-byte the sequential greedy rule."""
    import numpy as np

    capped = np.minimum(np.asarray(tokens, np.int64), cap)
    cum = np.concatenate([np.zeros(1, np.int64), np.cumsum(capped)])
    starts = []
    i = 0
    while i < len(tokens):
        starts.append(i)
        j = int(np.searchsorted(cum, cum[i] + cap, side="right")) - 1
        i = max(j, i + 1)
    # scalar greedy reference
    ref_starts, acc = [0], capped[0]
    for k in range(1, len(tokens)):
        if acc + capped[k] > cap:
            ref_starts.append(k)
            acc = capped[k]
        else:
            acc += capped[k]
    assert starts == ref_starts


def test_suggest_num_parts_bounds():
    from rensa_ray.pipelines.common import suggest_num_parts

    # cores term dominates small inputs
    assert suggest_num_parts(10 << 20, 32) == 64
    # bytes term dominates big inputs: 100 TB / 256 MB = 409600
    assert suggest_num_parts(100 * (1 << 40), 256 * 32) == 409600
    assert suggest_num_parts(0, 8) == 16


@settings(deadline=None, max_examples=30)
@given(st.data())
def test_rho_matrix_matches_scalar_property(data):
    """Randomized CSR rows across every budget regime: the vectorized rho
    kernel equals the scalar transcription row-for-row, sidecar included."""
    from rensa_ray.kernels import rho as R

    num_perm = data.draw(st.sampled_from([64, 128]))
    n = data.draw(st.integers(1, 12))
    sizes = [data.draw(st.integers(0, 140)) for _ in range(n)]
    flat = np.array([data.draw(st.integers(0, 2**64 - 1)) for _ in range(sum(sizes))],
                    dtype=np.uint64)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    seed = data.draw(st.integers(0, 2**32 - 1))
    mat, sc = R.rho_digest_matrix(flat, offsets, num_perm, seed)
    for i in range(n):
        row_tok = flat[offsets[i]:offsets[i + 1]]
        row, non_empty, used = R.rho_digest_scalar(row_tok, num_perm, seed)
        assert mat[i].tolist() == row
        assert int(sc.non_empty_counts[i]) == non_empty
        if sc.sparse_active[i] and sc.sparse_verify_perm:
            want = R.sparse_verify_signature_scalar(used, seed,
                                                    sc.sparse_verify_perm)
            assert sc.sparse_signatures[i].tolist() == want


@settings(deadline=None, max_examples=40)
@given(st.integers(1, 5000), st.integers(1, 4096))
def test_midpoint_sampler_property(total, limit):
    """Closed form == iterative; indices strictly increasing and in range."""
    from rensa_ray.kernels import rho as R

    if limit >= total:
        return
    it = R.midpoint_sample_indices_scalar(total, limit)
    cf = R._midpoint_indices_closed_form(
        np.full(limit, total), np.full(limit, limit),
        np.arange(limit, dtype=np.int64))
    assert it == cf.tolist()
    assert all(0 <= i < total for i in it)
    assert all(b > a for a, b in zip(it, it[1:]))


@settings(deadline=None, max_examples=20)
@given(st.data())
def test_fxhash64_flat_property(data):
    """Gather-based fxhash64_flat == scalar fxhash64 on random bytes of
    random lengths (every regime boundary)."""
    from rensa_ray.kernels import hashing as H

    n = data.draw(st.integers(1, 60))
    items = [bytes(data.draw(st.binary(min_size=0, max_size=70)))
             for _ in range(n)]
    lengths = np.array([len(b) for b in items], np.int64)
    starts = np.zeros(n, np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    flat = np.frombuffer(b"".join(items), np.uint8)
    got = H.fxhash64_flat(flat, starts, lengths)
    want = np.array([H.fxhash64(it) for it in items], np.uint64)
    assert (got == want).all()


def test_capped_distinct_value_pairs_matches_brute():
    """Randomized differential check of the shared skew-guard kernel used by
    BOTH the simhash and cosine-LSH verify lanes: value groups, rep pairs,
    and the max_bucket drop semantics all match a dict-based reference."""
    import itertools

    from rensa_ray.pipelines.common import capped_distinct_value_pairs

    rng = np.random.default_rng(7)
    for trial in range(200):
        n = int(rng.integers(0, 60))
        if n == 0:
            continue
        buckets = rng.integers(0, 5, n).astype(np.uint64)
        values = rng.integers(0, 4, n).astype(np.uint64)
        order = np.lexsort((values, buckets))
        b_s, v_s = buckets[order], values[order]
        vb = np.ones(n, bool)
        vb[1:] = (b_s[1:] != b_s[:-1]) | (v_s[1:] != v_s[:-1])
        max_bucket = [None, 1, 2, 3][trial % 4]
        vgid, vcounts, vstart, rep_rows, rep_vg, ii, jj = \
            capped_distinct_value_pairs(b_s, vb, max_bucket)
        # per-row value-group id and sizes
        want_groups: dict = {}
        for i in range(n):
            want_groups.setdefault((b_s[i], v_s[i]), []).append(i)
        assert len(vcounts) == len(want_groups)
        for g, rows in want_groups.items():
            gids = {vgid[r] for r in rows}
            assert len(gids) == 1
            assert vcounts[gids.pop()] == len(rows)
        # vstart = first row of each value group
        assert (np.array(sorted(vstart))
                == np.array(sorted(min(r) for r in want_groups.values()))).all()
        # expected rep pairs: distinct values sharing a bucket, buckets with
        # more than max_bucket DISTINCT values dropped entirely
        per_bucket: dict = {}
        for (b, v) in want_groups:
            per_bucket.setdefault(b, set()).add(v)
        want_pairs = set()
        for b, vals in per_bucket.items():
            if max_bucket is not None and len(vals) > max_bucket:
                continue
            for va, vb_ in itertools.combinations(sorted(vals), 2):
                want_pairs.add((b, va, vb_))
        got_pairs = set()
        for a, c in zip(ii, jj):
            ra, rc = rep_rows[a], rep_rows[c]
            assert b_s[ra] == b_s[rc]
            va, vc = sorted((v_s[ra], v_s[rc]))
            got_pairs.add((b_s[ra], va, vc))
            # rep_vg indexes the value group of each rep
            assert vgid[ra] == rep_vg[a] and vgid[rc] == rep_vg[c]
        assert got_pairs == want_pairs, (trial, max_bucket)


_URL_CHARS = st.text(
    alphabet="abcXYZ019-._~:/?#[]@!$&'()*+,;= %ü", max_size=40)
_URLISH = st.one_of(
    _URL_CHARS,
    st.builds(
        lambda scheme, host, port, path, q, frag:
            f"{scheme}://{host}{port}/{path}?{q}#{frag}",
        st.sampled_from(["http", "https", "HTTP", "ftp"]),
        st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True),
        st.sampled_from(["", ":80", ":443", ":8080", ":bad"]),
        st.from_regex(r"[A-Za-z0-9/._-]{0,20}", fullmatch=True),
        st.from_regex(r"([a-z]{1,5}=[a-z0-9]{0,4}&?){0,3}", fullmatch=True),
        st.from_regex(r"[a-z0-9]{0,6}", fullmatch=True)))


@settings(**SETTINGS)
@given(_URLISH)
def test_canonicalize_url_idempotent_and_total(url):
    """canonicalize is total (never raises on crawl garbage) and
    idempotent — a canonical form is its own canonical form, so
    re-canonicalizing checkpointed output can't re-split groups."""
    from rensa_ray.functions.url import canonicalize_url

    once = canonicalize_url(url)
    assert isinstance(once, str)
    assert canonicalize_url(once) == once


@settings(**SETTINGS)
@given(_URLISH)
def test_registrable_domain_total_and_suffix(url):
    """registrable_domain is total and always a suffix of the host with at
    most two labels (the documented approximation)."""
    from rensa_ray.functions.url import registrable_domain, url_host

    d = registrable_domain(url)
    h = url_host(url)
    assert isinstance(d, str)
    assert h.endswith(d)
    assert d == "" or len(d.split(".")) <= 2


@settings(**SETTINGS)
@given(st.from_regex(r"https?://[a-z0-9-]{1,10}(\.[a-z0-9-]{1,8}){0,3}"
                     r"(/[a-zA-Z0-9%._~!$&'()*+,;=:@-]{1,12}){0,4}",
                     fullmatch=True))
def test_fast_canonical_shape_is_a_fixed_point(url):
    """Every string matching FAST_CANONICAL_RE must be a fixed point of
    canonicalize_url — the batch kernel skips urlsplit for matches, so a
    counterexample here would silently split snapshot groups."""
    import re

    from rensa_ray.functions.url import FAST_CANONICAL_RE, canonicalize_url

    if re.fullmatch(FAST_CANONICAL_RE[1:-1], url):
        assert canonicalize_url(url) == url
