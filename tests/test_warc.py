"""WARC source: spec-shaped parse, record filtering, and WARC → dedup e2e."""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa
import pytest

from rensa_ray.sources.corpus import extract_text_from_html, wrap_html
from rensa_ray.sources.warc import (
    _http_body,
    _parse_warc_stream,
    read_warc,
    write_warc,
)


def _pages(n):
    rng = np.random.default_rng(9)
    texts = [" ".join(f"w{v}" for v in rng.integers(0, 200, 40))
             for _ in range(n)]
    return texts


def test_read_warc_gz_and_plain(ray_session, tmp_path):
    texts = _pages(25)
    recs = [(f"https://x.test/{i}", "2024-01-02T03:04:05Z", wrap_html(t))
            for i, t in enumerate(texts)]
    write_warc(str(tmp_path / "a.warc.gz"), recs[:13])  # multi-member gzip
    write_warc(str(tmp_path / "b.warc"), recs[13:], gzip_per_record=False)
    df = (read_warc([str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc")])
          .to_pandas())
    assert list(df.columns) == ["url", "warc_ts", "html"]
    assert len(df) == 25
    df["i"] = df.url.str.rsplit("/", n=1).str[-1].astype(int)
    df = df.sort_values("i").reset_index(drop=True)
    assert all(extract_text_from_html(h) == t
               for h, t in zip(df["html"], texts))
    assert str(df.loc[0, "warc_ts"]) == "2024-01-02 03:04:05"


def test_non_response_records_are_skipped(ray_session, tmp_path):
    """warcinfo/request records (always present in real CC files) must not
    surface as pages."""
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Type: application/warc-fields\r\n"
            b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n")
    path = str(tmp_path / "c.warc")
    write_warc(path, [("https://x.test/keep", "2024-01-01T00:00:00Z",
                       b"<html>k</html>")], gzip_per_record=False)
    with open(path, "rb") as f:
        body = f.read()
    with open(path, "wb") as f:
        f.write(info + body)
    df = read_warc([path]).to_pandas()
    assert df.url.tolist() == ["https://x.test/keep"]


def test_parser_units():
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 5\r\n"
           b"\r\nhello\r\n\r\n")
    out = list(_parse_warc_stream(__import__("io").BytesIO(rec * 3)))
    assert len(out) == 3 and all(r["block"] == b"hello" for r in out)
    assert _http_body(b"HTTP/1.1 200 OK\r\nX: y\r\n\r\n<html>") == b"<html>"
    assert _http_body(b"no header split") == b"no header split"
    with pytest.raises(ValueError):
        list(_parse_warc_stream(__import__("io").BytesIO(b"GARBAGE\r\n")))


def test_warc_to_dedup_end_to_end(ray_session, tmp_path):
    """Common-Crawl-shaped input straight into the near-dup pipeline:
    planted exact duplicates across two archives come back flagged."""
    import pyarrow.compute as pc  # noqa: F401  (parity with pipeline imports)

    from rensa_ray.pipelines.dedup import DedupConfig, duplicate_flags

    texts = _pages(30)
    texts[7] = texts[3]          # planted dups
    texts[22] = texts[3]
    texts[29] = texts[15]
    recs = [(f"https://x.test/{i}", "2024-01-01T00:00:00Z", wrap_html(t))
            for i, t in enumerate(texts)]
    write_warc(str(tmp_path / "p1.warc.gz"), recs[:15])
    write_warc(str(tmp_path / "p2.warc.gz"), recs[15:])
    ds = read_warc([str(tmp_path / "p1.warc.gz"), str(tmp_path / "p2.warc.gz")])

    def _extract(b: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[-1]) for u in b["url"].to_pylist()]
        txt = [extract_text_from_html(h) for h in b["html"].to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(txt, pa.string())})

    pages = ds.map_batches(_extract, batch_format="pyarrow")
    flags = (duplicate_flags(pages, DedupConfig(num_parts=4, concurrency=None))
             .to_pandas().set_index("doc_id").sort_index())
    assert len(flags) == 30
    dup_ids = set(flags[flags.is_dup].index)
    # one-shot matrix semantics: EVERY member of a colliding cluster is
    # flagged (keep-min selection happens in the clusters/dedup lanes)
    assert dup_ids == {3, 7, 22, 15, 29}


def test_read_warc_directory_skips_non_warc_files(ray_session, tmp_path):
    """A crawl directory with manifest/README sidecars: only *.warc[.gz]
    files shard into read tasks (file_extensions is forwarded to the
    datasource — a bare class attribute never filtered anything)."""
    texts = _pages(6)
    recs = [(f"https://d.test/{i}", "2024-01-02T03:04:05Z", wrap_html(t))
            for i, t in enumerate(texts)]
    d = tmp_path / "crawl"
    d.mkdir()
    write_warc(str(d / "seg-0.warc.gz"), recs)
    (d / "MANIFEST.txt").write_text("not a warc\n")
    (d / "checksums.sha256").write_text("deadbeef  seg-0.warc.gz\n")
    df = read_warc([str(d)]).to_pandas()
    assert len(df) == 6
