"""WARC source: read Common-Crawl-style WARC files into the pages table
shape (url, warc_ts, html, text, lang).

Parallelism model is the standard one for WARC on Spark: file-granular.
`spark.read.format("binaryFile")` distributes WHOLE files to tasks (WARC
members can't be split mid-stream without an index), and an Arrow-batched
mapInPandas parses each file's records — so a 100 TB crawl dump with
~1 GB segment files parallelizes across ~100k tasks with zero driver
involvement. For splittable access at petabyte scale, pair the dump with
its CDX index and push url/offset filters into the index scan instead.

The parser is a minimal, dependency-free WARC/1.0 reader (the container
has no warcio): CRLF header block + Content-Length framed body + CRLF
CRLF record separator, gzip-transparent per FILE (.warc.gz as a single
gzip stream; per-member gzip needs the index anyway). Only
`WARC-Type: response` records become rows; the HTTP response headers are
stripped so `html` is the raw payload, matching the pages input_hint.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .pages import PAGES_TABLE_SCHEMA


def parse_warc_stream(raw: bytes) -> Iterator[dict]:
    """Yield {url, warc_ts, html} dicts for each response record.
    Pure function (unit-testable without Spark)."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    buf = io.BytesIO(raw)
    while True:
        # skip inter-record blank lines
        line = buf.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record boundary: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body = buf.read(length)
        if headers.get("warc-type") == "response":
            url = headers.get("warc-target-uri", "")
            ts = _parse_ts(headers.get("warc-date"))
            yield {"url": url, "warc_ts": ts, "html": _strip_http_headers(body)}


def _parse_ts(s: Optional[str]):
    if not s:
        return None
    try:
        return datetime.fromisoformat(s.replace("Z", "+00:00")).astimezone(
            timezone.utc
        ).replace(tzinfo=None)
    except ValueError:
        return None


def _strip_http_headers(body: bytes) -> bytes:
    """WARC response bodies embed the HTTP response; the payload starts
    after the first blank line."""
    sep = body.find(b"\r\n\r\n")
    if sep == -1:
        sep = body.find(b"\n\n")
        return body[sep + 2 :] if sep != -1 else body
    return body[sep + 4 :]


def read_warc(spark: SparkSession, path: str, permissive: bool = True) -> DataFrame:
    """WARC files → pages-shaped DataFrame (text/lang NULL — they come
    from the extraction stage). One task per file; records stream through
    Arrow batches, bytes never touch the driver.

    permissive=True (the 100k-file default): a file whose stream breaks
    mid-way (truncated member, bad framing — real crawl dumps have them)
    yields the records parsed up to the break instead of failing the
    whole job; permissive=False fails fast for fixture validation."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                rows = []
                try:
                    for r in parse_warc_stream(bytes(content)):
                        rows.append((r["url"], r["warc_ts"], r["html"], None, None))
                except (ValueError, OSError, EOFError):
                    if not permissive:
                        raise
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["url", "warc_ts", "html", "text", "lang"]
                    )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(parse, PAGES_TABLE_SCHEMA)


def write_warc_file(rows: list[dict], path: str, compress: bool = False) -> None:
    """Minimal WARC/1.0 writer for fixtures/round-tripping: one response
    record per {url, warc_ts, html} dict."""
    out = io.BytesIO()
    for r in rows:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + r["html"]
        ts = r.get("warc_ts")
        ts_s = (ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts else "2024-01-01T00:00:00Z")
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {ts_s}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            "\r\n"
        ).encode()
        out.write(hdr + http + b"\r\n\r\n")
    data = out.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
