"""End-to-end near-dup pipeline tests vs an in-process brute-force oracle.

The oracle recomputes one-shot duplicate flags (src/lsh/one_shot.rs:294-332
semantics) and union-find clusters directly from the scalar kernels, so the
Ray pipeline's shuffle formulation is checked against an independent
implementation of the same math.
"""

import numpy as np
import pyarrow as pa
import pytest

from rensa_ray.kernels.shingle import shingle_hashes_scalar
from rensa_ray.kernels.sketch import rmin_digest_scalar, jaccard_from_signatures
from rensa_ray.kernels.hashing import band_hash
from rensa_ray.pipelines.dedup import (
    DedupConfig, compute_signatures, duplicate_flags, near_dup_clusters, dedup,
)

CFG = DedupConfig(num_perm=32, num_bands=8, threshold=0.8, seed=42,
                  ngram_size=3, num_parts=8, batch_size=64, concurrency=2)


def make_corpus():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(400)]
    docs = []
    # unique docs
    for i in range(120):
        words = rng.choice(vocab, size=rng.integers(10, 60))
        docs.append(" ".join(words))
    # exact duplicates
    for i in range(30):
        docs.append(docs[i])
    # near duplicates: single-word edits
    for i in range(30, 70):
        words = docs[i].split()
        j = int(rng.integers(0, len(words)))
        words[j] = "edited"
        docs.append(" ".join(words))
    # adversarial
    docs += ["", "   ", "one", "one two", "common prefix " * 5]
    return docs


def oracle(docs, cfg: DedupConfig):
    """Brute-force flags + union-find clusters with scalar kernels."""
    sigs = [rmin_digest_scalar(shingle_hashes_scalar(t, cfg.ngram_size),
                               cfg.num_perm, cfg.seed) for t in docs]
    band_size = cfg.num_perm // cfg.num_bands
    n = len(docs)
    flags = [False] * n
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for b in range(cfg.num_bands):
        buckets = {}
        for i in range(n):
            h = band_hash(sigs[i][b * band_size:(b + 1) * band_size])
            buckets.setdefault(h, []).append(i)
        for members in buckets.values():
            if len(members) >= 2:
                for m in members:
                    flags[m] = True
                    union(members[0], m)
    clusters = [find(i) for i in range(n)]
    return flags, clusters, sigs


@pytest.fixture(scope="module")
def corpus_and_oracle():
    docs = make_corpus()
    flags, clusters, sigs = oracle(docs, CFG)
    return docs, flags, clusters, sigs


def _ds_from_docs(docs):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array(np.arange(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    return rd.from_arrow(t).repartition(4)


def test_signatures_match_scalar(ray_session, corpus_and_oracle):
    docs, _, _, sigs = corpus_and_oracle
    ds = _ds_from_docs(docs)
    out = compute_signatures(ds, CFG).to_pandas().sort_values("doc_id")
    for i, row in zip(out["doc_id"], out["sig"]):
        assert list(row) == sigs[int(i)], f"sig mismatch doc {i}"


def test_duplicate_flags_match_oracle(ray_session, corpus_and_oracle):
    docs, flags, _, _ = corpus_and_oracle
    ds = _ds_from_docs(docs)
    out = duplicate_flags(ds, CFG).to_pandas().sort_values("doc_id")
    assert len(out) == len(docs)
    got = out["is_dup"].tolist()
    assert got == flags


def test_clusters_match_oracle(ray_session, corpus_and_oracle):
    docs, _, clusters, _ = corpus_and_oracle
    ds = _ds_from_docs(docs)
    out = near_dup_clusters(ds, CFG).to_pandas().sort_values("doc_id")
    assert len(out) == len(docs)
    got = out["cluster_id"].tolist()
    assert got == clusters


def test_dedup_keeps_cluster_minima(ray_session, corpus_and_oracle):
    docs, _, clusters, _ = corpus_and_oracle
    ds = _ds_from_docs(docs)
    kept = dedup(ds, CFG).to_pandas().sort_values("doc_id")
    expected = sorted(set(clusters))
    assert kept["doc_id"].tolist() == expected
    # payload preserved
    for i, t in zip(kept["doc_id"], kept["text"]):
        assert t == docs[int(i)]


def test_verify_gate_removes_low_jaccard_pairs(ray_session):
    # two docs that collide in some band but with jaccard < 1: with a very
    # high threshold the verified clustering must keep them separate while
    # the unverified one merges them.
    docs = ["a b c d e f g h i j", "a b c d e f g h i j", "z y x w v u t s r q"]
    ds = _ds_from_docs(docs)
    cfg = DedupConfig(num_perm=32, num_bands=8, threshold=1.01, seed=42,
                      num_parts=4, batch_size=8, concurrency=1, verify=True)
    # jaccard(exact dup) == 1.0 < 1.01 → the verify gate cuts every edge
    out = near_dup_clusters(ds, cfg).to_pandas().sort_values("doc_id")
    assert out["cluster_id"].tolist() == [0, 1, 2]
    cfg2 = DedupConfig(num_perm=32, num_bands=8, threshold=0.99, seed=42,
                       num_parts=4, batch_size=8, concurrency=1, verify=True)
    out2 = near_dup_clusters(ds, cfg2).to_pandas().sort_values("doc_id")
    assert out2["cluster_id"].tolist() == [0, 0, 2]


def test_salted_edges_preserve_clusters(ray_session, corpus_and_oracle):
    """num_salts>1 splits hot buckets but must yield identical clusters."""
    docs, _, clusters, _ = corpus_and_oracle
    # amplify skew: append a block of identical docs (one giant bucket)
    docs = list(docs) + ["hot bucket doc " * 10] * 60
    ds = _ds_from_docs(docs)
    base_cfg = CFG
    from dataclasses import replace

    salted_cfg = replace(base_cfg, num_salts=4)
    plain = near_dup_clusters(ds, base_cfg).to_pandas().sort_values("doc_id")
    salted = near_dup_clusters(ds, salted_cfg).to_pandas().sort_values("doc_id")
    assert plain["cluster_id"].tolist() == salted["cluster_id"].tolist()


def test_oph_rescued_flags(ray_session):
    """Sparse-row ≥2-band rule: never flags MORE than plain OPH, keeps every
    exact duplicate (all bands collide), and agrees with plain OPH on dense
    docs (token count ≥ num_perm shingles is not reachable here, so force
    density by using a tiny num_perm)."""
    from dataclasses import replace

    from rensa_ray.pipelines.dedup import duplicate_flags_oph_rescued

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(100)]
    short = [" ".join(rng.choice(vocab, 5)) for _ in range(60)]   # sparse
    docs = short + short[:10] + ["", "one two three"]
    ds = _ds_from_docs(docs)
    cfg = replace(CFG, algo="oph")

    plain = duplicate_flags(ds, cfg).to_pandas().sort_values("doc_id")
    resc = duplicate_flags_oph_rescued(ds, cfg).to_pandas().sort_values("doc_id")
    p = np.asarray(plain["is_dup"]); r = np.asarray(resc["is_dup"])
    assert not (r & ~p).any()          # rescued ⊆ plain
    # exact dups (60..69 vs 0..9) must stay flagged under the rescue rule
    assert r[60:70].all() and r[:10].all()

    # dense lane: num_perm=2 makes every 5-token doc dense → identical flags
    cfg_dense = DedupConfig(num_perm=2, num_bands=2, seed=42, num_parts=8,
                            batch_size=64, concurrency=2, algo="oph")
    plain_d = duplicate_flags(ds, cfg_dense).to_pandas().sort_values("doc_id")
    resc_d = duplicate_flags_oph_rescued(ds, cfg_dense).to_pandas().sort_values("doc_id")
    assert plain_d["is_dup"].tolist() == resc_d["is_dup"].tolist()


def test_dedup_config_from_env(monkeypatch):
    monkeypatch.setenv("RENSA_RAY_NUM_PARTS", "128")
    monkeypatch.setenv("RENSA_RAY_CONCURRENCY", "none")
    monkeypatch.setenv("RENSA_RAY_VERIFY", "true")
    monkeypatch.setenv("RENSA_RAY_THRESHOLD", "0.9")
    cfg = DedupConfig.from_env(threshold=0.8)
    assert cfg.threshold == 0.8       # code override wins over env
    assert cfg.num_parts == 128
    assert cfg.concurrency is None
    assert cfg.verify is True


def test_detect_hot_buckets_finds_planted_bucket(ray_session):
    import ray.data as rd
    from dataclasses import replace

    from rensa_ray.pipelines.dedup import _detect_hot_buckets

    n_hot, n_uniq = 4000, 1000
    t = pa.table({
        "doc_id": pa.array(np.arange(n_hot + n_uniq), pa.int64()),
        "band_id": pa.array(np.zeros(n_hot + n_uniq, np.int32)),
        "band_hash": pa.array(np.concatenate([
            np.full(n_hot, 7, np.uint64),
            np.arange(n_uniq).astype(np.uint64) + 100]), pa.uint64()),
    })
    cfg = replace(CFG, hot_bucket_rows=500, salt_sample_shift=0)
    keys, salts, sampled = _detect_hot_buckets(rd.from_arrow(t), cfg)
    assert keys.tolist() == [7]
    assert 2 <= salts[0] <= cfg.num_parts
    assert sampled[0] == n_hot


def test_hot_bucket_auto_salting(ray_session):
    """north_rule skew story: a planted 1e5-row identical-doc bucket flows
    through duplicate_flags AND near_dup_clusters in bounded time, and
    auto-salting (forced via a low hot threshold) reproduces the unsalted
    cluster labels exactly."""
    from dataclasses import replace

    n_hot = 100_000
    docs = (["boilerplate nav footer copyright " * 4] * n_hot
            + [f"unique doc number {i} alpha beta gamma delta" for i in range(50)])
    ds = _ds_from_docs(docs)
    fast = replace(CFG, batch_size=4096, concurrency=None)
    auto = replace(fast, num_salts=0, hot_bucket_rows=1000, salt_sample_shift=0)
    plain = replace(fast, num_salts=1)

    flags = duplicate_flags(ds, plain).to_pandas().sort_values("doc_id")
    assert flags["is_dup"].to_numpy()[:n_hot].all()
    # auto mode: the hot bucket bypasses the band shuffle; flags identical
    flags_auto = duplicate_flags(ds, auto).to_pandas().sort_values("doc_id")
    assert flags_auto["is_dup"].tolist() == flags["is_dup"].tolist()

    lab_auto = near_dup_clusters(ds, auto).to_pandas().sort_values("doc_id")
    lab_plain = near_dup_clusters(ds, plain).to_pandas().sort_values("doc_id")
    assert lab_auto["cluster_id"].tolist() == lab_plain["cluster_id"].tolist()
    assert (lab_auto["cluster_id"].to_numpy()[:n_hot] == 0).all()


def test_near_dup_pairs_connectivity(ray_session):
    """The star-edge pair set has the same transitive closure as the
    cluster assignment (pairs are what CC consumes)."""
    import ray.data as rd

    from rensa_ray.pipelines.cc import local_min_labels
    from rensa_ray.pipelines.dedup import DedupConfig, near_dup_clusters, near_dup_pairs

    sf = "/root/testdata/sf0.001"
    cfg = DedupConfig(num_parts=8, concurrency=None)

    def _ds():
        return rd.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])

    pairs = near_dup_pairs(_ds(), cfg).to_pandas()
    assert (pairs.id_a < pairs.id_b).all()
    assert not pairs.duplicated().any()

    clusters = near_dup_clusters(_ds(), cfg).to_pandas()
    want = dict(zip(clusters.doc_id, clusters.cluster_id))
    if len(pairs):
        nodes, labels = local_min_labels(pairs.id_a.to_numpy(),
                                         pairs.id_b.to_numpy())
        got = dict(zip(nodes.tolist(), labels.tolist()))
        for n, lab in got.items():
            assert want[n] == lab
    # docs in no pair must be singleton clusters
    import numpy as np

    paired = set(pairs.id_a) | set(pairs.id_b)
    lonely = clusters[~clusters.doc_id.isin(paired)]
    assert (lonely.doc_id == lonely.cluster_id).all()


def test_duplicate_flags_against_matches_lsh_query(ray_session):
    """Cross-corpus flags == querying an LSH index prebuilt from the
    reference corpus (insert_matrix + query_duplicate_flags_matrix), and
    new-vs-new duplicates must NOT flag."""
    import ray.data as rd

    from rensa_ray.kernels.shingle import tokenize_to_ngrams
    from rensa_ray.pipelines.dedup import duplicate_flags_against
    from rensa_ray.state.lsh import RMinHashLSH
    from rensa_ray.state.minhash import RMinHash

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    ref_docs = [" ".join(rng.choice(vocab, rng.integers(15, 50)))
                for _ in range(60)]
    new_docs = [" ".join(rng.choice(vocab, rng.integers(15, 50)))
                for _ in range(60)]
    new_docs[5] = ref_docs[10]          # exact copy of a ref doc
    w = ref_docs[20].split()
    w[0] = "changed"
    new_docs[17] = " ".join(w)          # near-dup of a ref doc
    new_docs[40] = new_docs[33]         # new-vs-new duplicate: must NOT flag

    def _ds(docs, start):
        t = pa.table({"doc_id": pa.array(np.arange(start, start + len(docs)),
                                         pa.int64()),
                      "text": pa.array(docs)})
        return rd.from_arrow(t).repartition(3)

    got = (duplicate_flags_against(_ds(new_docs, 0), _ds(ref_docs, 1000), CFG)
           .to_pandas().sort_values("doc_id"))
    assert len(got) == len(new_docs)

    # scalar oracle: LSH index of the reference, matrix query of the new side
    ref_mat = RMinHash.digest_matrix_from_token_sets(
        [tokenize_to_ngrams(t, CFG.ngram_size) for t in ref_docs],
        CFG.num_perm, CFG.seed)
    new_mat = RMinHash.digest_matrix_from_token_sets(
        [tokenize_to_ngrams(t, CFG.ngram_size) for t in new_docs],
        CFG.num_perm, CFG.seed)
    lsh = RMinHashLSH(CFG.threshold, CFG.num_perm, CFG.num_bands)
    lsh.insert_matrix(list(range(1000, 1000 + len(ref_docs))), ref_mat)
    want = lsh.query_duplicate_flags_matrix(new_mat)

    assert got["is_dup"].tolist() == want
    flagged = set(got[got.is_dup]["doc_id"])
    assert {5, 17} <= flagged           # planted cross-corpus dups caught
    assert 40 not in flagged and 33 not in flagged  # new-vs-new ignored


def test_flags_invariant_to_input_partitioning(ray_session, corpus_and_oracle):
    """Identical output whatever the input block structure — no
    arrival-order or per-block state leaks into the distributed result."""
    import ray.data as rd

    docs, flags, _, _ = corpus_and_oracle
    t = pa.table({"doc_id": pa.array(np.arange(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    for nblocks in (1, 7):
        ds = rd.from_arrow(t).repartition(nblocks)
        out = (duplicate_flags(ds, CFG)
               .to_pandas().sort_values("doc_id"))
        assert out["is_dup"].tolist() == flags, f"nblocks={nblocks}"


def test_verify_gate_links_member_member_pairs(ray_session):
    """README-recipe parity: jac(A,B) can pass while jac(rep,A) and
    jac(rep,B) both fail — the verify lane must link A-B (the old star-only
    gate emitted nothing for this bucket)."""
    import ray.data as rd

    from rensa_ray.pipelines.dedup import DedupConfig, _candidate_edges_plain
    from rensa_ray.stages.sign import SIG_COL, sig_to_arrow

    rng = np.random.default_rng(4)
    sig1 = rng.integers(0, 2**32, 128, dtype=np.uint64).astype(np.uint32)
    sig2 = rng.integers(0, 2**32, 128, dtype=np.uint64).astype(np.uint32)
    sig3 = sig2.copy()                       # jac(2,3) = 1.0; jac(1,*) ~ 0
    band_tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "band_id": pa.array([0, 0, 0], pa.int32()),
        "band_hash": pa.array([77, 77, 77], pa.uint64()),
        SIG_COL: sig_to_arrow(np.stack([sig1, sig2, sig3])),
    })
    cfg = DedupConfig(num_parts=2, verify=True, threshold=0.8)
    edges = _candidate_edges_plain(rd.from_arrow(band_tbl), cfg,
                                   with_sig=True).to_pandas()
    got = {tuple(sorted(r)) for r in edges[["src", "dst"]].itertuples(index=False)}
    assert (2, 3) in got
    assert not any(1 in p for p in got)


def test_hot_bucket_proof_needs_two_distinct_docs(ray_session, tmp_path):
    """A single degenerate doc (constant signature → one band_hash repeated
    across all its bands) must NOT self-prove a hot bucket: the old
    row-count pass flagged such a unique doc as a duplicate at small
    hot_bucket_rows."""
    import dataclasses

    import pyarrow.parquet as pq
    import ray.data as rd

    from rensa_ray.pipelines.dedup import DedupConfig, duplicate_flags

    rng = np.random.default_rng(8)
    texts = [" ".join(f"w{rng.integers(0, 500)}" for _ in range(50))
             for _ in range(30)]
    texts.append("")                         # ONE empty doc — unique content
    sf = tmp_path
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}), str(sf / "documents.parquet"))
    ds = rd.read_parquet(str(sf / "documents.parquet"),
                         columns=["doc_id", "text"])
    cfg = dataclasses.replace(
        DedupConfig(num_parts=4, concurrency=None),
        hot_bucket_rows=16, salt_sample_shift=0)  # count EVERY row
    out = duplicate_flags(ds, cfg).to_pandas().set_index("doc_id")
    assert not bool(out.loc[len(texts) - 1, "is_dup"])  # unique empty doc
    # and two empty docs ARE still flagged as true duplicates of each other
    texts.append("")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}), str(sf / "documents.parquet"))
    ds2 = rd.read_parquet(str(sf / "documents.parquet"),
                          columns=["doc_id", "text"])
    out2 = duplicate_flags(ds2, cfg).to_pandas().set_index("doc_id")
    assert bool(out2.loc[len(texts) - 2, "is_dup"])
    assert bool(out2.loc[len(texts) - 1, "is_dup"])


def test_near_dup_pairs_uint64_high_bit_ids(ray_session):
    """Pairs lane must not int64-cast uint64 ids >= 2^63 (fxhash id spaces)."""
    import ray.data as rd

    from rensa_ray.pipelines.dedup import DedupConfig, near_dup_pairs

    base = 1 << 63
    text = " ".join(f"t{i}" for i in range(80))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([base + 1, base + 2, base + 9], pa.uint64()),
        "text": pa.array([text, text, "something else entirely here okay"])}))
    cfg = DedupConfig(num_parts=2, concurrency=None)
    out = near_dup_pairs(ds, cfg).to_pandas()
    assert {tuple(sorted(r)) for r in out.itertuples(index=False)} == {
        (base + 1, base + 2)}


def test_local_star_edges_preserves_connectivity():
    """Kernel check: the spanning reduction has the exact transitive closure
    of the input pair list, with at most one edge per non-root row."""
    from rensa_ray.pipelines.dedup import _local_star_edges

    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(2, 40))
        n_pairs = int(rng.integers(0, 60))
        ii = rng.integers(0, n, n_pairs)
        jj = rng.integers(0, n, n_pairs)
        # naive union-find truth
        root = list(range(n))

        def find(x):
            while root[x] != x:
                root[x] = root[root[x]]
                x = root[x]
            return x

        for a, b in zip(ii, jj):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                root[max(ra, rb)] = min(ra, rb)
        want = [find(x) for x in range(n)]

        src, dst = _local_star_edges(ii, jj, n)
        assert len(src) <= n - 1
        got_root = list(range(n))
        for a, b in zip(src, dst):
            ra = min(int(a), int(b))
            assert got_root[max(int(a), int(b))] in (max(int(a), int(b)), ra)
            got_root[max(int(a), int(b))] = ra

        def gfind(x):
            while got_root[x] != x:
                x = got_root[x]
            return x

        assert [gfind(x) for x in range(n)] == want


def test_verify_spanning_edges_link_members_without_pair_blowup(ray_session):
    """ADVICE r3: verify-mode clusters must not ship O(k²) edges for a
    bucket of k duplicates.  Spanning mode emits ≤ k-1 star edges with the
    member-member connectivity (incl. the rep-fails-but-A-B-passes case)
    intact."""
    import ray.data as rd

    from rensa_ray.pipelines.dedup import DedupConfig, _candidate_edges_plain
    from rensa_ray.stages.sign import SIG_COL, sig_to_arrow

    rng = np.random.default_rng(4)
    sig1 = rng.integers(0, 2**32, 128, dtype=np.uint64).astype(np.uint32)
    sig2 = rng.integers(0, 2**32, 128, dtype=np.uint64).astype(np.uint32)
    k = 50
    sigs = np.stack([sig1] + [sig2] * k)      # doc 1 unrelated; docs 2..k+1 equal
    band_tbl = pa.table({
        "doc_id": pa.array(range(1, k + 2), pa.int64()),
        "band_id": pa.array([0] * (k + 1), pa.int32()),
        "band_hash": pa.array([77] * (k + 1), pa.uint64()),
        SIG_COL: sig_to_arrow(sigs),
    })
    cfg = DedupConfig(num_parts=2, verify=True, threshold=0.8)
    full = _candidate_edges_plain(rd.from_arrow(band_tbl), cfg,
                                  with_sig=True).to_pandas()
    span = _candidate_edges_plain(rd.from_arrow(band_tbl), cfg,
                                  with_sig=True, spanning=True).to_pandas()
    assert len(full) == k * (k - 1) // 2      # pairs lane: the full product
    assert len(span) == k - 1                 # clusters lane: one star
    # identical connectivity: every member hangs off the min id (2)
    assert set(span["src"]) == {2}
    assert set(span["dst"]) == set(range(3, k + 2))


def test_verified_clusters_match_between_spanning_and_pair_edges(ray_session, tmp_path):
    """near_dup_clusters(verify=True) now rides spanning edges; cluster
    assignments must equal the old full-pair-edge run."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from rensa_ray.pipelines.cc import connected_components
    from rensa_ray.pipelines.dedup import (
        DedupConfig, _edges_from_sigs, compute_signatures, near_dup_clusters)

    docs = ([" ".join(f"w{i}" for i in range(100))] * 4
            + [" ".join(f"w{i}" for i in range(99)) + " zz"]
            + [" ".join(f"u{j}_{i}" for i in range(50)) for j in range(5)])
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs)})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    ds = rd.read_parquet(str(tmp_path / "documents.parquet"))
    # concurrency=1: the 4-CPU test session can't host a 4-actor signer pool
    # twice (CPU-reservation deadlock — see .claude/skills/verify gotchas)
    cfg = DedupConfig(num_parts=4, verify=True, concurrency=1)

    got = near_dup_clusters(ds, cfg).to_pandas().sort_values("doc_id")

    sig_ds = compute_signatures(ds, cfg)
    pair_edges = _edges_from_sigs(sig_ds, cfg, spanning=False)
    labels = connected_components(pair_edges, num_parts=4).to_pandas()
    lab = dict(zip(labels["node"].astype(int), labels["label"].astype(int)))
    want = [min(lab.get(i, i), i) for i in range(len(docs))]
    assert got["cluster_id"].astype(int).tolist() == want


def test_lsh_query_all_matches_scalar(ray_session):
    """Distributed query_all == the state API's RMinHashLSH.query_all as a
    SET per query, on a planted corpus with near-dup groups."""
    import ray.data as rd

    from rensa_ray.kernels.shingle import tokenize_to_ngrams
    from rensa_ray.pipelines.dedup import DedupConfig, lsh_query_all
    from rensa_ray.state.lsh import RMinHashLSH
    from rensa_ray.state.minhash import RMinHash

    rng = np.random.default_rng(11)
    base = " ".join(f"w{i}" for i in range(80))
    docs = []
    for i in range(120):
        if i % 4 == 0:
            docs.append(base)                       # one big near-dup group
        elif i % 4 == 1:
            docs.append(base.replace("w3", f"v{i}"))
        else:
            docs.append(" ".join(
                f"u{i}_{j}" for j in range(int(rng.integers(40, 70)))))
    cfg = DedupConfig(num_parts=8, concurrency=None)
    t = pa.table({"doc_id": pa.array(np.arange(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    got = lsh_query_all(rd.from_arrow(t).repartition(5), cfg,
                        query_mod=10).to_pandas()
    got_sets: dict[int, set] = {}
    for q, c in got.itertuples(index=False):
        got_sets.setdefault(q, set()).add(c)

    lsh = RMinHashLSH(cfg.threshold, cfg.num_perm, cfg.num_bands)
    mhs = []
    for i, d in enumerate(docs):
        mh = RMinHash(cfg.num_perm, cfg.seed)
        mh.update(tokenize_to_ngrams(d, cfg.ngram_size))
        mhs.append(mh)
        lsh.insert(i, mh)
    for q in range(0, len(docs), 10):
        want = set(lsh.query(mhs[q]))
        assert got_sets.get(q, set()) == want, q
    # every distributed query id is a real query
    assert set(got_sets) <= set(range(0, len(docs), 10))
