"""URL canonicalization kernels + crawl-snapshot dedup stages
(input_hint schema: url, warc_ts, html, text, lang)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rensa_ray.functions.url import (
    canonicalize_url,
    registrable_domain,
    url_host,
)


def test_canonicalize_url_policy():
    # tracking params dropped, survivors sorted, fragment dropped
    assert canonicalize_url(
        "https://Example.COM:443/a//b/?utm_source=x&b=2&a=1&fbclid=z#frag"
    ) == "https://example.com/a/b?a=1&b=2"
    # default port dropped only for the matching scheme
    assert canonicalize_url("http://host:80/p/") == "http://host/p"
    assert canonicalize_url("http://host:8080/p") == "http://host:8080/p"
    # root path keeps its slash; userinfo dropped
    assert canonicalize_url("https://user:pw@host/") == "https://host/"
    # blank query values survive, order normalized
    assert canonicalize_url("https://h/p?b=&a=") == "https://h/p?a=&b="
    # garbage comes back stripped, not raised
    assert canonicalize_url("  not a url  ") == "not a url"
    # ADVICE r4: the bare 'ref' key is load-bearing (git refs, API object
    # references) and must SURVIVE default canonicalization …
    assert canonicalize_url("https://h/repo?ref=main") \
        == "https://h/repo?ref=main"
    # … while an explicit per-corpus key set can still drop it
    assert canonicalize_url("https://h/repo?ref=main",
                            tracking_keys=frozenset({"ref"})) \
        == "https://h/repo"


def test_domain_helpers():
    assert url_host("https://Sub.Example.org:9/x") == "sub.example.org"
    assert registrable_domain("https://a.b.example.org/x") == "example.org"
    assert registrable_domain("https://localhost/x") == "localhost"


def _write_corpus(tmp_path, rows):
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "text": pa.array([r[2] for r in rows], pa.string())})
    path = str(tmp_path / "corpus.parquet")
    pq.write_table(tbl, path)
    return path


def test_keep_latest_snapshot(ray_session, tmp_path):
    """Tracking-param aliases and re-crawls of a page collapse to the
    newest capture; the tie breaks to the smallest original url."""
    import ray.data as rd

    from rensa_ray.pipelines.weburl import keep_latest_snapshot

    rows = [
        ("https://a.test/p?utm_source=x", 100, "old"),
        ("https://a.test/p", 300, "new"),          # same canonical, newest
        ("https://a.test/p?gclid=42", 200, "mid"),
        ("https://b.test/q", 50, "only"),
        ("https://c.test/r?z=1", 70, "tie-b"),
        # equal ts: smallest ORIGINAL url wins ('?u' < '?z')
        ("https://c.test/r?utm_x=1&z=1", 70, "tie-a"),
    ]
    path = _write_corpus(tmp_path, rows)
    got = (keep_latest_snapshot(rd.read_parquet(path)).to_pandas()
           .sort_values("url").reset_index(drop=True))
    assert got["text"].tolist() == ["new", "only", "tie-a"]
    assert got["url"].tolist() == [
        "https://a.test/p", "https://b.test/q",
        "https://c.test/r?utm_x=1&z=1"]
    # original (pre-canonicalization) columns survive untouched
    assert set(got.columns) == {"url", "warc_ts", "text"}


def test_domain_counts_and_blocklist(ray_session, tmp_path):
    import ray.data as rd

    from rensa_ray.pipelines.weburl import (
        domain_doc_counts,
        filter_blocked_domains,
    )

    rows = [(u, 1, "t") for u in (
        "https://x.spam.test/1", "https://y.spam.test/2",
        "https://ok.test/3", "https://www.ok.test/4")]
    path = _write_corpus(tmp_path, rows)
    ds = rd.read_parquet(path)

    counts = (domain_doc_counts(ds).to_pandas()
              .sort_values("domain").reset_index(drop=True))
    assert counts.values.tolist() == [["ok.test", 2], ["spam.test", 2]]

    kept = filter_blocked_domains(ds, {"spam.test"}).to_pandas()
    assert sorted(kept["url"]) == [
        "https://ok.test/3", "https://www.ok.test/4"]


def test_canonicalize_url_garbage_ports_do_not_raise():
    """Regression: SplitResult.port parses lazily — garbage ports raised
    ValueError past the guard and killed the pipeline."""
    assert canonicalize_url("http://example.com:bad/path") \
        == "http://example.com:bad/path"
    assert canonicalize_url("http://e.com:99999999/") \
        == "http://e.com:99999999/"


def test_registrable_domain_trailing_dot():
    """Regression: 'spam.test.' (valid FQDN form) returned bare 'test.'
    and bypassed the blocklist."""
    assert registrable_domain("https://x.spam.test./1") == "spam.test"
    assert url_host("https://Host.Example.COM./x") == "host.example.com"


def test_keep_latest_snapshot_null_url(ray_session, tmp_path):
    """Regression: a null url poisoned the object-array lexsort tiebreak
    with a str/None comparison."""
    import ray.data as rd

    from rensa_ray.pipelines.weburl import keep_latest_snapshot

    tbl = pa.table({
        "url": pa.array(["https://a.test/p", None, None], pa.string()),
        "warc_ts": pa.array([10, 5, 9], pa.timestamp("us")),
        "text": pa.array(["real", "null-old", "null-new"], pa.string())})
    path = str(tmp_path / "corpus.parquet")
    pq.write_table(tbl, path)
    got = (keep_latest_snapshot(rd.read_parquet(path)).to_pandas()
           .sort_values("text").reset_index(drop=True))
    # both null urls canonicalize to "" -> one group, newest ts wins
    assert got["text"].tolist() == ["null-new", "real"]
    assert got["url"].tolist()[0] is None   # original null survives


def test_keep_latest_snapshot_null_ts(ray_session, tmp_path):
    """Regression (ADVICE r4): a null warc_ts raised ArrowInvalid in the
    election's cast().to_numpy(), aborting the whole pre-stage on one
    garbage row.  Contract: a null-ts capture deterministically LOSES to
    any dated capture of the same page; output rows keep their null; an
    all-null group still elects exactly one row (url tiebreak)."""
    import ray.data as rd

    from rensa_ray.pipelines.weburl import keep_latest_snapshot

    tbl = pa.table({
        "url": pa.array(["https://a.test/p", "https://a.test/p?utm_x=1",
                         "https://b.test/q?utm_2=2", "https://b.test/q?utm_1=1"],
                        pa.string()),
        "warc_ts": pa.array([7, None, None, None], pa.timestamp("us")),
        "text": pa.array(["dated", "null-ts", "null-b", "null-a"],
                         pa.string())})
    path = str(tmp_path / "corpus.parquet")
    pq.write_table(tbl, path)
    got = (keep_latest_snapshot(rd.read_parquet(path)).to_pandas()
           .sort_values("text").reset_index(drop=True))
    # group a: the dated capture beats the null-ts alias; group b (all
    # null): smallest original url wins, null survives in the output
    assert got["text"].tolist() == ["dated", "null-a"]
    assert got["url"].tolist() == ["https://a.test/p",
                                   "https://b.test/q?utm_1=1"]
    assert pd.isna(got["warc_ts"].tolist()[1])


def test_keep_latest_snapshot_block_structure_invariant(ray_session, tmp_path):
    """The elected winners are identical whether the corpus arrives as one
    file or many small shards (different Ray block boundaries) — the
    partitioning-independence contract every dedup lane carries."""
    import ray.data as rd

    from rensa_ray.pipelines.weburl import keep_latest_snapshot

    rng = np.random.default_rng(41)
    n = 200
    rows = []
    for i in range(n):
        page = int(rng.integers(0, 60))          # ~3 snapshots per page
        alias = ["", "?utm_source=x", "?gclid=7"][int(rng.integers(0, 3))]
        rows.append((f"https://s{page % 7}.test/p{page}{alias}",
                     int(rng.integers(0, 10_000)), f"capture {i}"))

    one = tmp_path / "one"
    many = tmp_path / "many"
    one.mkdir()
    many.mkdir()
    tbl = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "text": pa.array([r[2] for r in rows], pa.string())})
    pq.write_table(tbl, str(one / "all.parquet"))
    for s in range(8):
        pq.write_table(tbl.slice(s * 25, 25), str(many / f"p{s}.parquet"))

    a = (keep_latest_snapshot(rd.read_parquet(str(one))).to_pandas()
         .sort_values("url").reset_index(drop=True))
    b = (keep_latest_snapshot(rd.read_parquet(str(many))).to_pandas()
         .sort_values("url").reset_index(drop=True))
    assert a.values.tolist() == b.values.tolist()
    n_pages = len({u.split("?")[0] for u, _, _ in rows})
    assert len(a) == n_pages


def test_web_tiered_dedup_planted_corpus(ray_session, tmp_path):
    """End-to-end tier composition over a corpus with planted snapshot
    re-captures: tier 1 collapses exactly the canonical-url groups, tier 2
    exactly the identical-text groups among latest captures, tier 3 only
    merges further (and does merge the planted near-dups)."""
    import collections

    from rensa_ray.pipelines.curate import web_tiered_dedup
    from rensa_ray.pipelines.dedup import DedupConfig
    from rensa_ray.sources.corpus import write_corpus

    cdir, _tpath = write_corpus(str(tmp_path), n_docs=600, seed=7,
                                snapshot_dup_frac=0.2)
    corpus = pq.read_table(cdir)

    # ground truth, computed independently with the scalar url kernel
    groups: dict[str, tuple] = {}
    ts = corpus["warc_ts"].to_numpy(zero_copy_only=False)
    for url, t, text in zip(corpus["url"].to_pylist(), ts,
                            corpus["text"].to_pylist()):
        c = canonicalize_url(url)
        best = groups.get(c)
        if best is None or (t, ) > (best[0], ):
            groups[c] = (t, url, text)
    latest_texts = [v[2] for v in groups.values()]
    want_snap = len(groups)
    want_exact = len(set(latest_texts))
    assert corpus.num_rows > want_snap > want_exact  # both tiers have work

    cfg = DedupConfig(id_col="uid", num_parts=8, concurrency=2)
    kept, report = web_tiered_dedup(cdir, cfg=cfg, num_parts=8)
    row = report.to_pylist()[0]
    assert row["n_input"] == corpus.num_rows
    assert row["n_after_snapshot"] == want_snap
    assert row["n_after_exact"] == want_exact
    # near tier merges the planted near-dup clusters — strictly shrinks
    assert row["n_after_near"] < row["n_after_exact"]
    df = kept.to_pandas()
    assert len(df) == row["n_after_near"]
    # survivors still unique by text (tier 3 never resurrects a duplicate)
    assert df["text"].nunique() == len(df)
