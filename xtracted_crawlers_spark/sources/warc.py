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
from pyspark.sql import functions as F

from .pages import PAGES_TABLE_SCHEMA


def _iter_warc_records(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """(headers, body) per record — the framing shared by response
    (WARC/HTML) and conversion (WET/text) readers."""
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
        yield headers, body


def parse_warc_stream(raw: bytes) -> Iterator[dict]:
    """Yield {url, warc_ts, html} dicts for each response record.
    Pure function (unit-testable without Spark)."""
    for headers, body in _iter_warc_records(raw):
        if headers.get("warc-type") == "response":
            url = headers.get("warc-target-uri", "")
            ts = _parse_ts(headers.get("warc-date"))
            yield {"url": url, "warc_ts": ts, "html": _strip_http_headers(body)}


def parse_wet_stream(raw: bytes) -> Iterator[dict]:
    """Yield {url, warc_ts, text} dicts for each CONVERSION record —
    the WET (extracted-text) sibling of parse_warc_stream. Conversion
    bodies are bare text/plain (no HTTP envelope to strip)."""
    for headers, body in _iter_warc_records(raw):
        if headers.get("warc-type") == "conversion":
            url = headers.get("warc-target-uri", "")
            ts = _parse_ts(headers.get("warc-date"))
            yield {"url": url, "warc_ts": ts, "text": body.decode("utf-8", "replace")}


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


def render_record(url: str, ts, payload: bytes) -> bytes:
    """One WARC/1.0 response record, byte-deterministic: fixed header
    order, timestamp from the row (never a local clock), HTTP envelope
    matching what _strip_http_headers removes on read."""
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
    ts_s = ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts else "2024-01-01T00:00:00Z"
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts_s}\r\n"
        f"Content-Length: {len(http)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        "\r\n"
    ).encode()
    return hdr + http + b"\r\n\r\n"


def write_warc_file(rows: list[dict], path: str, compress: bool = False) -> None:
    """Minimal WARC/1.0 writer for fixtures/round-tripping: one response
    record per {url, warc_ts, html} dict."""
    out = io.BytesIO()
    for r in rows:
        out.write(render_record(r["url"], r.get("warc_ts"), r["html"]))
    data = out.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)


def _open_part(tmp: str, compress: bool):
    """Open a part file for writing; gzip headers are made deterministic
    (mtime=0, no embedded filename) so compressed part bytes are a pure
    function of the rows — identical across task attempts and runs, not
    just the uncompressed record stream. GzipFile.close() closes
    ``myfileobj`` when set (the same hook gzip.open relies on), so the
    callers' single sink.close() suffices."""
    if not compress:
        return open(tmp, "wb")
    raw = open(tmp, "wb")
    gz = gzip.GzipFile(filename="", fileobj=raw, mode="wb", mtime=0)
    gz.myfileobj = raw
    return gz


WARC_SINK_MANIFEST_SCHEMA = "path string, n_records long, n_bytes long"


def warc_sink(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    compress: bool = True,
) -> DataFrame:
    """Distributed WARC export — the write-side twin of read_warc: each
    partition streams its rows through the same record framing into ONE
    ``part-<id>.warc[.gz]`` under out_dir and emits a single manifest
    row (path, n_records, n_bytes of uncompressed record bytes). Bytes
    never touch the driver; the returned manifest DataFrame is one row
    per non-empty partition (collect it or write it as the export's
    index). Record bytes are a pure function of the rows (fixed header
    order, warc_ts from the column), so a repartition+sortWithinPartitions
    upstream makes the whole export reproducible. At cluster scale
    out_dir must be a shared filesystem/fuse mount; size partitions to
    the ~1 GB segment convention with repartition before calling.

    Lazy like any transformation — nothing is written until the manifest
    is acted on; act on it EXACTLY ONCE. Each task attempt writes an
    attempt-unique temp file and atomically renames it into place on
    success, so concurrent attempts of the same partition (speculation,
    zombie executors, retries) can never interleave bytes — and because
    record bytes are a pure function of the rows, whichever attempt's
    rename lands last leaves the identical content. A killed attempt
    leaves only a ``.tmp`` file that never shadows the real part."""
    import os

    from pyspark import TaskContext

    sel = df.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts") if ts_col in df.columns
        else F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col(payload_col).alias("payload"),
    )
    render = lambda url, ts, payload: render_record(url, ts, bytes(payload))  # noqa: E731
    suffix = ".warc.gz" if compress else ".warc"
    return _manifest_sink(sel, out_dir, suffix, render, compress)


def _manifest_sink(sel, out_dir: str, suffix: str, render, compress: bool) -> DataFrame:
    """The shared per-partition part-file writer behind warc_sink and
    wet_sink: sel must carry (url, warc_ts, payload); render(url, ts,
    payload) -> record bytes. Same attempt-unique-tmp + atomic-rename
    + deterministic-gzip contract as documented on warc_sink."""
    import os

    from pyspark import TaskContext

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        path = os.path.join(out_dir, f"part-{ctx.partitionId():05d}{suffix}")
        tmp = f"{path}.attempt-{ctx.taskAttemptId()}.tmp"
        n = 0
        raw_bytes = 0
        sink = None
        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if sink is None:
                    os.makedirs(out_dir, exist_ok=True)
                    sink = _open_part(tmp, compress)
                for url, ts, payload in zip(
                    pdf["url"], pdf["warc_ts"], pdf["payload"]
                ):
                    rec = render(url, None if pd.isna(ts) else ts, payload)
                    sink.write(rec)
                    raw_bytes += len(rec)
                    n += 1
        except BaseException:
            if sink is not None:
                sink.close()
                sink = None
                os.remove(tmp)
            raise
        finally:
            if sink is not None:
                sink.close()
        if n:
            os.replace(tmp, path)
            yield pd.DataFrame({"path": [path], "n_records": [n], "n_bytes": [raw_bytes]})

    return sel.mapInPandas(write, WARC_SINK_MANIFEST_SCHEMA)


def render_conversion_record(url: str, ts, text: str) -> bytes:
    """One WARC/1.0 CONVERSION record (the WET record type): bare
    text/plain body, byte-deterministic like render_record."""
    body = text.encode("utf-8")
    ts_s = ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts else "2024-01-01T00:00:00Z"
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts_s}\r\n"
        f"Content-Length: {len(body)}\r\n"
        "Content-Type: text/plain\r\n"
        "\r\n"
    ).encode()
    return hdr + body + b"\r\n\r\n"


def wet_sink(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    compress: bool = True,
) -> DataFrame:
    """Distributed WET export — Common-Crawl-style extracted-text
    conversion records (`part-<id>.warc.wet[.gz]`), the standard hand-off
    format from a crawl to an LLM-data pipeline. Same distributed-write
    contract as warc_sink (per-partition part file, manifest row per
    non-empty partition, atomic rename, deterministic gzip); rows with
    NULL text are skipped (they have no conversion — export their pages
    via warc_sink instead)."""
    sel = df.filter(F.col(text_col).isNotNull()).select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts") if ts_col in df.columns
        else F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col(text_col).alias("payload"),
    )
    render = lambda url, ts, payload: render_conversion_record(url, ts, str(payload))  # noqa: E731
    suffix = ".warc.wet.gz" if compress else ".warc.wet"
    return _manifest_sink(sel, out_dir, suffix, render, compress)


WET_TABLE_SCHEMA = "url string, warc_ts timestamp, text string"


def read_wet(spark: SparkSession, path: str, permissive: bool = True) -> DataFrame:
    """WET files → (url, warc_ts, text): the conversion-record twin of
    read_warc, file-granular parallelism, Arrow-batched, bytes never on
    the driver."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                rows = []
                try:
                    for r in parse_wet_stream(bytes(content)):
                        rows.append((r["url"], r["warc_ts"], r["text"]))
                except (ValueError, OSError, EOFError):
                    if not permissive:
                        raise
                if rows:
                    yield pd.DataFrame(rows, columns=["url", "warc_ts", "text"])

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(parse, WET_TABLE_SCHEMA)


CDX_SCHEMA = (
    "urlkey string, url string, warc_ts timestamp, path string, "
    "warc_offset long, warc_length long"
)


def warc_sink_cdx(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    compress: bool = True,
) -> DataFrame:
    """warc_sink + a CDX-style index in one pass: writes the same
    part-<id>.warc[.gz] files and returns one row PER RECORD —
    (urlkey, url, warc_ts, path, warc_offset, warc_length) — instead of
    the per-file manifest. urlkey is the SURT sort key (urlnorm.surt_key,
    JVM-side before the sink), offsets index the UNCOMPRESSED record
    stream of the part (whole-file gzip: one streaming decompress, then
    every offset is a seek — the Common-Crawl access pattern). Sorting
    the returned index by urlkey IS the CDX; feed any subset back to
    read_warc_records for splittable point reads without rescanning the
    dump."""
    import os

    from pyspark import TaskContext

    from .. import urlnorm

    sel = df.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts") if ts_col in df.columns
        else F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col(payload_col).alias("payload"),
        urlnorm.surt_key(F.col(url_col)).alias("urlkey"),
    )

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        suffix = ".warc.gz" if compress else ".warc"
        path = os.path.join(out_dir, f"part-{ctx.partitionId():05d}{suffix}")
        tmp = f"{path}.attempt-{ctx.taskAttemptId()}.tmp"
        offset = 0
        sink = None
        # index rows buffer until the part file is atomically in place —
        # emitting them earlier would hand out offsets into a temp file
        # that a failed attempt deletes (the buffer is metadata-sized:
        # ~100 bytes/record, bounded by the partition's row count)
        rows: list[tuple] = []
        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if sink is None:
                    os.makedirs(out_dir, exist_ok=True)
                    sink = _open_part(tmp, compress)
                for url, ts, payload, urlkey in zip(
                    pdf["url"], pdf["warc_ts"], pdf["payload"], pdf["urlkey"]
                ):
                    ts = None if pd.isna(ts) else ts
                    rec = render_record(url, ts, bytes(payload))
                    sink.write(rec)
                    rows.append((urlkey, url, ts, path, offset, len(rec)))
                    offset += len(rec)
        except BaseException:
            if sink is not None:
                sink.close()
                sink = None
                os.remove(tmp)
            raise
        finally:
            if sink is not None:
                sink.close()
        if rows:
            os.replace(tmp, path)
            yield pd.DataFrame(
                rows,
                columns=[
                    "urlkey", "url", "warc_ts", "path",
                    "warc_offset", "warc_length",
                ],
            )

    return sel.mapInPandas(write, CDX_SCHEMA)


def read_warc_records(spark: SparkSession, cdx: DataFrame) -> DataFrame:
    """Splittable point reads off a CDX index: repartition the requested
    index rows by part file, open each file ONCE per task (gzip: one
    streaming decompress), slice each record at
    [warc_offset, warc_offset+warc_length) and parse exactly those
    records — no rescan of the dump, bytes never touch the driver.
    Returns the pages table shape. This is the 'pair the dump with its
    CDX index and push url/offset filters into the index scan' path the
    read_warc docstring points at for petabyte-scale access."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # O(record) memory: a forward-streaming handle per file — plain
        # files seek; gzip streams decompress-and-discard up to each
        # offset (offsets arrive sorted, so one decompression pass per
        # file total). Never materializes a whole (decompressed) segment.
        cur_path: Optional[str] = None
        stream = None
        is_gz = False
        pos = 0

        def open_at(path: str):
            f = open(path, "rb")
            gz = f.read(2) == b"\x1f\x8b"
            f.seek(0)
            return (gzip.GzipFile(fileobj=f) if gz else f), gz

        def close():
            nonlocal stream
            if stream is not None:
                stream.close()
                stream = None

        try:
            for pdf in batches:
                rows = []
                for path, off, length in zip(
                    pdf["path"], pdf["warc_offset"], pdf["warc_length"]
                ):
                    off, length = int(off), int(length)
                    if path != cur_path or off < pos:
                        close()
                        stream, is_gz = open_at(path)
                        cur_path, pos = path, 0
                    if is_gz:
                        skip = off - pos
                        while skip > 0:
                            chunk = stream.read(min(skip, 1 << 20))
                            if not chunk:
                                break
                            skip -= len(chunk)
                    else:
                        stream.seek(off)
                    data = stream.read(length)
                    pos = off + length
                    for r in parse_warc_stream(data):
                        rows.append((r["url"], r["warc_ts"], r["html"], None, None))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["url", "warc_ts", "html", "text", "lang"]
                    )
        finally:
            close()

    part = cdx.select("path", "warc_offset", "warc_length").repartition("path")
    # offsets MUST be read in file order: the gzip path streams forward
    part = part.sortWithinPartitions("path", "warc_offset")
    return part.mapInPandas(fetch, PAGES_TABLE_SCHEMA)
