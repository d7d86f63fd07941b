"""WARC source: round-trip fixture files through the file-granular
binaryFile + mapInPandas reader; the crawl must run off WARC input
unchanged (same pages-table shape)."""

import gzip
from datetime import datetime

from pyspark.sql import functions as F

from xtracted_crawlers_spark.sources import parse_warc_stream, read_warc, write_warc_file


def _rows(n, host="h.test"):
    return [
        {
            "url": f"https://{host}/dp/B0{i:08d}",
            "warc_ts": datetime(2024, 1, 1, 0, 0, i % 60),
            "html": f"<html><body>doc {i}</body></html>".encode(),
        }
        for i in range(n)
    ]


def test_parse_roundtrip_pure(tmp_path):
    rows = _rows(5)
    p = str(tmp_path / "a.warc")
    write_warc_file(rows, p)
    got = list(parse_warc_stream(open(p, "rb").read()))
    assert [r["url"] for r in got] == [r["url"] for r in rows]
    assert [r["html"] for r in got] == [r["html"] for r in rows]
    assert got[0]["warc_ts"] == rows[0]["warc_ts"]


def test_parse_gzip_whole_file(tmp_path):
    rows = _rows(3)
    p = str(tmp_path / "b.warc.gz")
    write_warc_file(rows, p, compress=True)
    raw = open(p, "rb").read()
    assert raw[:2] == b"\x1f\x8b" and gzip.decompress(raw)
    got = list(parse_warc_stream(raw))
    assert len(got) == 3


def test_read_warc_spark_multi_file(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    write_warc_file(_rows(20, "a.test"), str(d / "seg0.warc"))
    write_warc_file(_rows(30, "b.test"), str(d / "seg1.warc.gz"), compress=True)
    df = read_warc(spark, str(d))
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert df.count() == 50
    hosts = {r["h"]: r["n"] for r in df.select(
        F.parse_url("url", F.lit("HOST")).alias("h")).groupBy("h").agg(
        F.count("*").alias("n")).collect()}
    assert hosts == {"a.test": 20, "b.test": 30}


def test_crawl_runs_off_warc_input(spark, tmp_path):
    """End-to-end: WARC segments as the pages source for a crawl."""
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, load_frontier, run_crawl

    rows = _rows(12)
    d = tmp_path / "warcs2"
    d.mkdir()
    write_warc_file(rows, str(d / "seg.warc"))
    pages = read_warc(spark, str(d))
    seeds = spark.createDataFrame(
        [("u", 1, i, rows[i]["url"]) for i in range(8)],
        "user_id string, job_id long, seed_idx int, url string",
    )
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    ms = run_crawl(spark, cat, pages, seeds, cfg=CrawlConfig(max_rounds=4))
    fr = load_frontier(spark, cat)
    stats = {r["status"]: r["n"] for r in fr.groupBy("status").agg(F.count("*").alias("n")).collect()}
    # fixture html has no ASIN payload element, so extraction fails and
    # retries exhaust — the point is the source plumbing feeds the loop
    assert sum(stats.values()) == 8
    assert any(m["selected"] > 0 for m in ms)


from hypothesis import given, settings
from hypothesis import strategies as st

_url_chars = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=30
)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(_url_chars, st.binary(max_size=500)),
        min_size=1,
        max_size=10,
    )
)
def test_warc_roundtrip_property(items):
    """Content-Length framing must survive arbitrary payload bytes —
    including payloads that contain 'WARC/' markers or CRLFCRLF."""
    from datetime import datetime

    rows = [
        {"url": f"https://h.test/{u}", "warc_ts": datetime(2024, 1, 1), "html": b}
        for u, b in items
    ]
    import io
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.warc")
        write_warc_file(rows, p)
        got = list(parse_warc_stream(open(p, "rb").read()))
    assert [r["url"] for r in got] == [r["url"] for r in rows]
    assert [r["html"] for r in got] == [r["html"] for r in rows]


def test_read_warc_permissive_skips_corrupt_tail(spark, tmp_path):
    """A truncated/garbled segment yields its good prefix records in
    permissive mode; strict mode fails the job."""
    import pytest as _pytest

    d = tmp_path / "warcs3"
    d.mkdir()
    write_warc_file(_rows(5), str(d / "good.warc"))
    good = open(str(d / "good.warc"), "rb").read()
    with open(str(d / "bad.warc"), "wb") as f:
        f.write(good + b"GARBAGE NOT A RECORD\r\n more garbage")
    assert read_warc(spark, str(d), permissive=True).count() == 10  # 5 + 5-before-break
    with _pytest.raises(Exception):
        read_warc(spark, str(d / "bad.warc"), permissive=False).count()


def test_warc_sink_distributed_roundtrip(spark, tmp_path):
    """Distributed sink → reader round-trip: bytes identical per url,
    manifest counts match, one part file per non-empty partition."""
    from xtracted_crawlers_spark import fixtures
    from xtracted_crawlers_spark.sources import read_warc
    from xtracted_crawlers_spark.sources.warc import warc_sink

    pages = fixtures.gen_pages(spark, 80, n_hosts=5).repartition(4, "url")
    out = str(tmp_path / "dump")
    manifest = warc_sink(pages, out, compress=True).collect()
    assert sum(m["n_records"] for m in manifest) == 80
    assert len(manifest) <= 4 and all(m["path"].endswith(".warc.gz") for m in manifest)

    back = read_warc(spark, out)
    assert back.count() == 80
    j = (
        pages.select("url", F.col("html").alias("orig"))
        .join(back.select("url", F.col("html").alias("got")), "url")
    )
    assert j.count() == 80
    assert j.filter(F.col("orig") != F.col("got")).count() == 0
    # timestamps survive at second granularity (the WARC-Date format)
    tdiff = (
        pages.select("url", F.col("warc_ts").alias("a"))
        .join(back.select("url", F.col("warc_ts").alias("b")), "url")
        .filter(F.date_trunc("second", "a") != F.date_trunc("second", "b"))
    )
    assert tdiff.count() == 0


def test_warc_sink_empty_and_uncompressed(spark, tmp_path):
    from xtracted_crawlers_spark import fixtures
    from xtracted_crawlers_spark.sources import read_warc
    from xtracted_crawlers_spark.sources.warc import warc_sink

    pages = fixtures.gen_pages(spark, 6, n_hosts=2)
    empty = pages.filter(F.lit(False))
    out0 = str(tmp_path / "none")
    assert warc_sink(empty, out0).collect() == []

    out1 = str(tmp_path / "plain")
    manifest = warc_sink(pages.repartition(1), out1, compress=False).collect()
    assert len(manifest) == 1 and manifest[0]["n_records"] == 6
    import os

    # uncompressed: manifest n_bytes == the file's actual size
    assert os.path.getsize(manifest[0]["path"]) == manifest[0]["n_bytes"]
    assert read_warc(spark, out1).count() == 6


def test_warc_cdx_index_and_point_reads(spark, tmp_path):
    """One-pass dump+index: every CDX offset slices to exactly its
    record, and feeding a subset of the index back through
    read_warc_records returns precisely those pages byte-identically."""
    import gzip as _gz

    from xtracted_crawlers_spark import fixtures
    from xtracted_crawlers_spark.sources.warc import (
        parse_warc_stream,
        read_warc_records,
        warc_sink_cdx,
    )

    pages = fixtures.gen_pages(spark, 60, n_hosts=4).repartition(3, "url")
    out = str(tmp_path / "dump")
    cdx = warc_sink_cdx(pages, out, compress=True).cache()
    assert cdx.count() == 60
    assert cdx.select("urlkey").distinct().count() == 60

    # offsets are slice-exact against the decompressed part stream
    one = cdx.orderBy("urlkey").limit(5).collect()
    by_path: dict = {}
    for r in one:
        if r["path"] not in by_path:
            by_path[r["path"]] = _gz.decompress(open(r["path"], "rb").read())
        raw = by_path[r["path"]]
        recs = list(parse_warc_stream(raw[r["warc_offset"]: r["warc_offset"] + r["warc_length"]]))
        assert len(recs) == 1 and recs[0]["url"] == r["url"]

    # point reads of an arbitrary subset
    want = cdx.filter(F.col("urlkey").contains("/dp/b00000000"))
    n_want = want.count()
    assert 0 < n_want < 60
    got = read_warc_records(spark, want)
    assert got.count() == n_want
    j = (
        pages.select("url", F.col("html").alias("orig"))
        .join(got.select("url", F.col("html").alias("back")), "url")
    )
    assert j.count() == n_want
    assert j.filter(F.col("orig") != F.col("back")).count() == 0
    cdx.unpersist()


def test_surt_key_jvm_matches_python_twin(spark):
    from xtracted_crawlers_spark import urlnorm

    urls = [
        "https://www.example.com/dp/B012345678",
        "http://Example.COM:8080/Path/To?Q=UPPER&b=2",
        "https://a.b.c.example.org/",
        "https://example.com",
        "https://www.example.com?onlyquery=1",
        "http://shop00001.example.test/dp/B000000001?v=2#frag",
        "https://WWW.UPPER.NET/X",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["k"]
        for r in df.select("url", urlnorm.surt_key("url").alias("k")).collect()
    }
    for u in urls:
        assert got[u] == urlnorm.py_surt_key(u), u
    # domain-contiguity: all example.com URLs sort together under SURT
    keys = sorted(got.values())
    com = [k for k in keys if k.startswith("com,example")]
    i = keys.index(com[0])
    assert keys[i: i + len(com)] == com


def test_warc_gz_part_bytes_deterministic(spark, tmp_path):
    """Compressed part bytes must be a pure function of the rows: the
    gzip member header carries mtime=0 and no filename (a wall-clock
    mtime or the attempt-unique tmp name would differ per attempt/run,
    breaking the byte-identical reproducibility contract)."""
    from xtracted_crawlers_spark.sources.warc import warc_sink

    pages = spark.createDataFrame(
        [(f"https://ex.com/p{i}", b"<html>x</html>") for i in range(50)],
        "url string, html binary",
    ).repartition(2, "url").sortWithinPartitions("url")
    outs = []
    for d in ("w1", "w2"):
        out = str(tmp_path / d)
        manifest = warc_sink(pages, out, compress=True).collect()
        parts = sorted(r.path for r in manifest)
        outs.append([open(p, "rb").read() for p in parts])
    assert outs[0] == outs[1]
    for blob in outs[0]:
        assert blob[:2] == b"\x1f\x8b"
        assert blob[4:8] == b"\x00\x00\x00\x00"  # MTIME pinned to 0
        assert blob[3] & 0x08 == 0  # FLG.FNAME unset: no tmp-file name leak


# ---- WET (conversion / extracted-text) export ------------------------


def test_wet_sink_roundtrip_and_mixed_dump(spark, tmp_path):
    """pages → wet_sink → read_wet must round-trip text exactly; a file
    holding BOTH record types routes responses to read_warc and
    conversions to read_wet with no cross-talk."""
    from xtracted_crawlers_spark.sources import read_wet, wet_sink
    from xtracted_crawlers_spark.sources.warc import (
        render_conversion_record,
        render_record,
    )

    rows = [
        (f"https://h.test/dp/B0{i:08d}", datetime(2024, 1, 1, 0, 0, i), f"doc {i}\nline two {i}")
        for i in range(40)
    ] + [("https://h.test/null", datetime(2024, 1, 2), None)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string").repartition(3)
    out = str(tmp_path / "wet")
    manifest = wet_sink(df, out).collect()
    assert sum(m.n_records for m in manifest) == 40  # NULL text skipped
    assert all(m.path.endswith(".warc.wet.gz") for m in manifest)
    back = read_wet(spark, out + "/*.warc.wet.gz")
    got = {r.url: (r.warc_ts, r.text) for r in back.collect()}
    assert got == {u: (ts, t) for u, ts, t in rows if t is not None}

    # mixed dump: one stream with a response AND a conversion record
    mixed = render_record("https://h.test/a", datetime(2024, 1, 1), b"<html>x</html>") + \
        render_conversion_record("https://h.test/a", datetime(2024, 1, 1), "x text")
    p = tmp_path / "mixed.warc"
    p.write_bytes(mixed)
    html = list(parse_warc_stream(p.read_bytes()))
    from xtracted_crawlers_spark.sources import parse_wet_stream
    text = list(parse_wet_stream(p.read_bytes()))
    assert len(html) == 1 and html[0]["html"] == b"<html>x</html>"
    assert len(text) == 1 and text[0]["text"] == "x text"


def test_wet_gz_part_bytes_deterministic(spark, tmp_path):
    """Two independent exports of the same rows must be byte-identical
    per part — the same deterministic-gzip contract as warc_sink."""
    from xtracted_crawlers_spark.sources import wet_sink

    rows = [(f"https://h.test/{i}", datetime(2024, 1, 1), f"text {i}") for i in range(30)]
    df = (
        spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
        .repartition(2, "url")
        .sortWithinPartitions("url")
    )
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    pa = sorted(m.path for m in wet_sink(df, a).collect())
    pb = sorted(m.path for m in wet_sink(df, b).collect())
    assert len(pa) == len(pb) == 2
    for x, y in zip(pa, pb):
        assert open(x, "rb").read() == open(y, "rb").read()
