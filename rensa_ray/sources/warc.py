"""WARC (Web ARChive) source — the Common Crawl container format, parsed
with the standard library only.

``read_warc`` is a Ray Data ``FileBasedDatasource``: files shard across read
tasks like any other source, each task streams its file record-by-record
(never holding the whole archive), and emits Arrow blocks with the engine's
canonical page schema ``(url:string, warc_ts:timestamp[us], html:binary)``
— exactly the BASELINE.json input_hint shape, ready for
``pipelines.webdedup.run_web_dedup``.

Format notes (ISO 28500): a WARC file is a sequence of records —

    WARC/1.0\r\n
    <Name>: <value>\r\n ...          (headers)
    \r\n
    <Content-Length bytes of block>
    \r\n\r\n                          (record separator)

Common Crawl gzips each record individually and concatenates the members;
``gzip.GzipFile`` reads multi-member streams transparently, so the same
parser covers .warc and .warc.gz.  ``response`` records carry an HTTP
message as the block; the page body is everything after the first blank
line.  ``write_warc`` produces spec-shaped archives for tests/export.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pyarrow as pa

_CANON_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
])


def _parse_warc_stream(stream) -> Iterator[dict]:
    """Yield {headers, block} per record from a (decompressed) WARC stream."""
    while True:
        # skip inter-record blank lines
        line = stream.readline()
        while line in (b"\r\n", b"\n"):
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"malformed WARC record start: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            raw = stream.readline()
            if raw in (b"\r\n", b"\n", b""):
                break
            k, _, v = raw.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        block = stream.read(length)
        yield {"headers": headers, "block": block}


def _http_body(block: bytes) -> bytes:
    """HTTP response message → body (everything after the first blank line)."""
    for sep in (b"\r\n\r\n", b"\n\n"):
        i = block.find(sep)
        if i >= 0:
            return block[i + len(sep):]
    return block


def _ts_us(warc_date: str):
    """WARC-Date (ISO-8601, e.g. 2024-01-01T00:00:00Z) → us timestamp."""
    import datetime as dt

    try:
        d = dt.datetime.fromisoformat(warc_date.replace("Z", "+00:00"))
        return int(d.timestamp() * 1_000_000)
    except ValueError:
        return None


try:
    from ray.data.datasource import FileBasedDatasource
except ImportError:  # allows import before ray is available
    FileBasedDatasource = object  # type: ignore[misc,assignment]


class WarcDatasource(FileBasedDatasource):
    """Streaming WARC/WARC.gz reader emitting (url, warc_ts, html) blocks."""

    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(self, paths, record_types: tuple[str, ...] = ("response",),
                 batch_rows: int = 512, **kwargs):
        # FileBasedDatasource only filters via the constructor arg — a bare
        # class attribute is inert, and a crawl dir's manifest/README files
        # would otherwise shard into read tasks and fail the parse
        kwargs.setdefault("file_extensions", self._FILE_EXTENSIONS)
        super().__init__(paths, **kwargs)
        self._record_types = record_types
        self._batch_rows = batch_rows

    def _read_stream(self, f, path: str):
        # Ray/pyarrow auto-decompress .gz at open (compression inferred from
        # the extension), so the stream here is already plain WARC bytes.
        raw: io.BufferedIOBase = io.BufferedReader(PyArrowFileShim(f))
        urls: list[str] = []
        tss: list[int | None] = []
        bodies: list[bytes] = []

        def _flush() -> pa.Table:
            t = pa.table({"url": pa.array(urls, pa.string()),
                          "warc_ts": pa.array(tss, pa.timestamp("us")),
                          "html": pa.array(bodies, pa.binary())})
            urls.clear(), tss.clear(), bodies.clear()
            return t

        for rec in _parse_warc_stream(raw):
            h = rec["headers"]
            if h.get("warc-type") not in self._record_types:
                continue
            urls.append(h.get("warc-target-uri", ""))
            tss.append(_ts_us(h.get("warc-date", "")))
            block = rec["block"]
            ctype = h.get("content-type", "")
            bodies.append(_http_body(block)
                          if ctype.startswith("application/http") else block)
            if len(urls) >= self._batch_rows:
                yield _flush()
        if urls:
            yield _flush()


class PyArrowFileShim(io.RawIOBase):
    """Minimal file-object adapter over a pyarrow.NativeFile for gzip/io."""

    def __init__(self, f):
        self._f = f

    def readable(self) -> bool:
        return True

    def readinto(self, b) -> int:
        data = self._f.read(len(b))
        b[: len(data)] = data
        return len(data)


def read_warc(paths, record_types: tuple[str, ...] = ("response",),
              override_num_blocks: int | None = None):
    """WARC/WARC.gz files → Dataset(url, warc_ts, html binary)."""
    import ray.data as rd

    return rd.read_datasource(
        WarcDatasource(paths, record_types=record_types),
        override_num_blocks=override_num_blocks)


def write_warc(path: str, records, gzip_per_record: bool = True) -> None:
    """Write (url, warc_date_iso, html_bytes) records as a WARC response
    archive (Common-Crawl-shaped: one gzip member per record when
    ``gzip_per_record``); for tests and small exports."""
    out = open(path, "wb")
    try:
        for url, date_iso, html in records:
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Content-Length: " + str(len(html)).encode()
                    + b"\r\n\r\n" + html)
            hdr = ("WARC/1.0\r\n"
                   "WARC-Type: response\r\n"
                   f"WARC-Target-URI: {url}\r\n"
                   f"WARC-Date: {date_iso}\r\n"
                   "Content-Type: application/http;msgtype=response\r\n"
                   f"Content-Length: {len(http)}\r\n\r\n").encode()
            rec = hdr + http + b"\r\n\r\n"
            out.write(gzip.compress(rec) if gzip_per_record else rec)
    finally:
        out.close()
