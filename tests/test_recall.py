"""Dup-pair recall at the reference config (num_perm=128, bands=8, t=0.8).

Two layers, per BASELINE.json:

1. **Parity recall == 1.0**: our distributed clusters equal the scalar
   one-shot-LSH oracle exactly (signatures are bit-identical to the
   reference math, so LSH collisions — hence cluster assignments — are
   reproduced with recall 1.0 by construction).
2. **Truth recall**: against the corpus generator's planted ground truth
   (true word-3-gram Jaccard per pair).  Exact duplicates must always be
   found; high-Jaccard near-dups (j ≥ 0.95) must reach the recall an
   S-curve at 8×16 predicts (≥ 0.97 incl. transitive closure).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rensa_ray.kernels.hashing import band_hash, fxhash64
from rensa_ray.kernels.shingle import shingle_hashes_scalar
from rensa_ray.kernels.sketch import rmin_digest_scalar
from rensa_ray.pipelines.dedup import DedupConfig
from rensa_ray.sources.corpus import generate_corpus

N_DOCS = 1500
CFG = DedupConfig(num_perm=128, num_bands=8, threshold=0.8, seed=42,
                  num_parts=8, batch_size=512, concurrency=2, id_col="uid")


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(N_DOCS, seed=42)


@pytest.fixture(scope="module")
def ray_clusters(ray_session, corpus, tmp_path_factory):
    import pyarrow.parquet as pq

    from rensa_ray.pipelines.webdedup import run_web_dedup

    tbl, truth = corpus
    d = tmp_path_factory.mktemp("recall")
    pq.write_table(tbl, str(d / "corpus.parquet"))
    out, _ = run_web_dedup(str(d / "corpus.parquet"), str(d / "out"), CFG,
                           use_html=True)
    df = out.to_pandas()
    return dict(zip(df["url"], df["cluster_uid"]))


def _scalar_oracle_clusters(tbl) -> dict[str, int]:
    """Scalar one-shot LSH + union-find with keep-min-uid labels."""
    urls = tbl["url"].to_pylist()
    texts = tbl["text"].to_pylist()
    uids = [fxhash64(u.encode()) for u in urls]
    sigs = [rmin_digest_scalar(shingle_hashes_scalar(t), CFG.num_perm, CFG.seed)
            for t in texts]
    n = len(urls)
    order = sorted(range(n), key=lambda i: uids[i])
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if uids[ra] > uids[rb]:
                ra, rb = rb, ra
            parent[rb] = ra

    bs = CFG.num_perm // CFG.num_bands
    for b in range(CFG.num_bands):
        buckets: dict[int, list[int]] = {}
        for i in order:
            h = band_hash(sigs[i][b * bs : (b + 1) * bs])
            buckets.setdefault(h, []).append(i)
        for members in buckets.values():
            for m in members[1:]:
                union(members[0], m)
    return {urls[i]: uids[find(i)] for i in range(n)}


def test_parity_recall_is_one(ray_clusters, corpus):
    """Distributed clusters == scalar oracle clusters — dup-pair recall 1.0
    vs the reference-config assignments."""
    tbl, _ = corpus
    oracle = _scalar_oracle_clusters(tbl)
    assert set(oracle) == set(ray_clusters)
    mismatches = [u for u in oracle if oracle[u] != ray_clusters[u]]
    assert not mismatches, f"{len(mismatches)} cluster mismatches"


def _pair_recall(ray_clusters, truth, jmin, jmax=1.01, kinds=("exact", "near")):
    t = truth.to_pandas()
    planted = t[(t.kind.isin(kinds)) & (t.url != t.root_url)
                & (t.true_jaccard_to_root >= jmin)
                & (t.true_jaccard_to_root < jmax)]
    if len(planted) == 0:
        return None, 0
    hit = sum(int(ray_clusters[r.url] == ray_clusters[r.root_url])
              for r in planted.itertuples())
    return hit / len(planted), len(planted)


def test_exact_pairs_always_found(ray_clusters, corpus):
    _, truth = corpus
    recall, n = _pair_recall(ray_clusters, truth, 0.999, kinds=("exact",))
    assert n > 100
    assert recall == 1.0


def test_high_jaccard_near_pairs_found(ray_clusters, corpus):
    _, truth = corpus
    recall, n = _pair_recall(ray_clusters, truth, 0.95, kinds=("near",))
    assert n > 10, f"only {n} planted pairs at j>=0.95"
    assert recall >= 0.97, f"recall {recall} over {n} pairs"


def test_low_jaccard_pairs_mostly_not_merged(ray_clusters, corpus):
    """Precision side: pairs far below the 8×16 S-curve midpoint (~0.88)
    should rarely collide — guards against a degenerate everything-merges
    pipeline."""
    _, truth = corpus
    recall, n = _pair_recall(ray_clusters, truth, 0.0, 0.55, kinds=("near",))
    if n:
        assert recall < 0.25, f"spurious merge rate {recall} over {n} pairs"
