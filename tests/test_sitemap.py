"""Sitemap source: parse subset, seed ordering, index walking, and the
sitemap → frontier ingest loop (idempotent re-harvest)."""

from pyspark.sql import functions as F

from xtracted_crawlers_spark import frontier
from xtracted_crawlers_spark.sources import sitemap

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc> https://a.test/p/1 </loc><lastmod>2026-01-02</lastmod></url>
<url><loc>/rel/2?x=1</loc></url>
<url><loc>../up/3</loc><lastmod>2026-02-03T04:05:06Z</lastmod></url>
<url><loc></loc></url>
<url><loc>https://a.test/p/1</loc></url>
</urlset>"""

INDEX = """<sitemapindex>
<sitemap><loc>https://a.test/sm/part1.xml</loc><lastmod>2026-03-01</lastmod></sitemap>
<sitemap><loc>part2.xml</loc></sitemap>
</sitemapindex>"""


def _docs(spark):
    return spark.createDataFrame(
        [("https://a.test/x/sitemap.xml", URLSET), ("https://a.test/sm/index.xml", INDEX)],
        "url string, body string",
    )


def test_entries_parse_subset(spark):
    rows = {
        (r["kind"], r["pos"]): r
        for r in sitemap.sitemap_entries(_docs(spark)).collect()
    }
    # urlset: trimmed, relative + dot-segment locs resolved, empty dropped
    assert rows[("url", 0)]["loc"] == "https://a.test/p/1"
    assert rows[("url", 0)]["lastmod"] == "2026-01-02"
    assert rows[("url", 1)]["loc"] == "https://a.test/rel/2?x=1"
    assert rows[("url", 1)]["lastmod"] is None
    assert rows[("url", 2)]["loc"] == "https://a.test/up/3"
    # the empty <loc> entry is dropped but later positions keep their pos
    assert rows[("url", 4)]["loc"] == "https://a.test/p/1"
    # index: nested sitemaps tagged 'sitemap', relative loc resolves
    # against the index URL (urlset has no <sitemap> rows and vice versa)
    assert rows[("sitemap", 0)]["loc"] == "https://a.test/sm/part1.xml"
    assert rows[("sitemap", 1)]["loc"] == "https://a.test/sm/part2.xml"
    assert len([k for k in rows if k[0] == "url"]) == 4
    assert len([k for k in rows if k[0] == "sitemap"]) == 2


def test_seeds_first_wins_and_order(spark):
    seeds = sitemap.seeds_from_sitemaps(_docs(spark), "u1", 7).collect()
    # duplicate loc (pos 0 and 4) keeps the first occurrence only
    urls = [r["url"] for r in sorted(seeds, key=lambda r: r["seed_idx"])]
    assert urls == [
        "https://a.test/p/1",
        "https://a.test/rel/2?x=1",
        "https://a.test/up/3",
    ]
    assert [r["seed_idx"] for r in sorted(seeds, key=lambda r: r["seed_idx"])] == [0, 1, 2]
    assert all(r["user_id"] == "u1" and r["job_id"] == 7 for r in seeds)


PRODUCT_URLSET = """<urlset>
<url><loc>https://a.test/dp/B011111111</loc></url>
<url><loc>/dp/B022222222?ref=sm</loc></url>
<url><loc>https://a.test/about</loc></url>
</urlset>"""


def test_index_walk_then_ingest_idempotent(spark):
    """The crawl-loop usage: round N fetches the index, kind='sitemap'
    rows become next round's fetches, their urlset entries become seeds;
    unroutable locs drop at ingest (extractor_factory returns None) and
    re-harvesting the same sitemaps adds zero new frontier rows."""
    entries = sitemap.sitemap_entries(_docs(spark))
    nested = [r["loc"] for r in entries.filter(F.col("kind") == "sitemap").collect()]
    assert nested == ["https://a.test/sm/part1.xml", "https://a.test/sm/part2.xml"]
    prod = spark.createDataFrame(
        [("https://a.test/products/sitemap.xml", PRODUCT_URLSET)], "url string, body string"
    )
    part = spark.createDataFrame(
        [(nested[0], "<urlset><url><loc>https://a.test/dp/B033333333</loc></url></urlset>")],
        "url string, body string",
    )
    seeds1 = sitemap.seeds_from_sitemaps(prod, "u1", 7)
    assert seeds1.count() == 3  # harvest keeps all locs; routing is ingest's job
    fr = frontier.ingest_seeds(seeds1)
    n1 = fr.count()
    assert n1 == 2  # /about routes to no extractor and is dropped
    # nested sitemap fetched next round: its seeds append with higher seq
    seeds2 = sitemap.seeds_from_sitemaps(part, "u1", 7)
    new2 = frontier.ingest_seeds(seeds2, frontier=fr)
    assert new2.count() == 1
    assert new2.select(F.min("job_urls_seq")).first()[0] == n1 + 1
    fr2 = fr.unionByName(new2)
    # idempotent re-harvest of everything seen so far
    again = frontier.ingest_seeds(
        sitemap.seeds_from_sitemaps(prod, "u1", 7).unionByName(
            sitemap.seeds_from_sitemaps(part, "u1", 7)
        ),
        frontier=fr2,
    )
    assert again.count() == 0


def test_render_parse_roundtrip(spark, sf_dir):
    """render_sitemap ∘ sitemap_entries is the identity on the URL set
    (per host, sorted) — the fixture twin is honest."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    urls = docs.select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 5).cast("string"), F.lit(".test/d/"),
                 F.col("doc_id").cast("string")).alias("u"),
        F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string"), F.lit(".test")).alias("g"),
    )
    rendered = sitemap.render_sitemap(urls, "g", "u")
    parsed = sitemap.sitemap_entries(rendered).filter(F.col("kind") == "url")
    assert sorted(r["loc"] for r in parsed.collect()) == sorted(r["u"] for r in urls.collect())


def test_crawl_from_sitemap_channel(spark, tmp_path):
    """End-to-end: cfg.sitemap_seeds harvests an index -> urlsets walk
    from the pages table itself, ingests the product locs as seeds under
    the sitemap user, and the crawl completes exactly those URLs."""
    from xtracted_crawlers_spark import fixtures
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, load_frontier, run_crawl

    pages = fixtures.gen_pages(spark, 30, n_hosts=3)
    listed = [r["url"] for r in pages.orderBy("url").limit(6).collect()]
    part = lambda i: f"https://seeds.test/sm/part{i}.xml"
    urlset = lambda urls: "<urlset>" + "".join(
        f"<url><loc>{u}</loc></url>" for u in urls) + "</urlset>"
    sm_rows = [
        ("https://seeds.test/sitemap.xml",
         f"<sitemapindex><sitemap><loc>{part(1)}</loc></sitemap>"
         f"<sitemap><loc>{part(2)}</loc></sitemap></sitemapindex>".encode()),
        (part(1), urlset(listed[:3]).encode()),
        (part(2), urlset(listed[3:]).encode()),
    ]
    sm_df = spark.createDataFrame(sm_rows, "url string, html binary").select(
        "url", F.lit(None).cast("timestamp").alias("warc_ts"), "html",
        F.lit(None).cast("string").alias("text"), F.lit(None).cast("string").alias("lang"),
    )
    all_pages = pages.select("url", "warc_ts", "html", "text", "lang").unionByName(sm_df)
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(max_rounds=5, sitemap_seeds=["https://seeds.test/sitemap.xml"])
    metrics = run_crawl(spark, cat, all_pages, seeds=None, cfg=cfg)
    assert sum(m.get("completed", 0) for m in metrics) == 6
    fr = load_frontier(spark, cat)
    done = fr.filter(F.col("status") == "complete")
    assert sorted(r["url"] for r in done.collect()) == sorted(listed)
    assert all(r["user_id"] == "sitemap" for r in done.collect())


def test_crawl_priority_from_scores(spark, tmp_path):
    """host_scores at bootstrap reorder the crawl: with a global budget
    of one round's worth, the authoritative host completes first even
    though its seeds were submitted last."""
    from xtracted_crawlers_spark import fixtures
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, load_frontier, run_crawl

    pages = fixtures.gen_pages(spark, 40, n_hosts=4)
    hosts = sorted(r["h"] for r in pages.select(
        F.expr("lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))").alias("h")
    ).distinct().collect())
    hot = hosts[-1]  # lexically last => its seeds sort last under FIFO
    seeds = pages.select(
        F.lit("u1").alias("user_id"), F.lit(1).cast("long").alias("job_id"),
        F.row_number().over(__import__("pyspark.sql.window", fromlist=["Window"]).Window
                            .orderBy("url")).cast("int").alias("seed_idx"),
        F.col("url"),
    )
    scores = spark.createDataFrame([(hot, 10_000)], "host string, score long")
    hot_total = pages.filter(F.expr(f"url like 'https://{hot}/%'")).count()
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(max_rounds=1, global_budget=hot_total)
    run_crawl(spark, cat, pages, seeds=seeds, cfg=cfg, host_scores=scores)
    done = load_frontier(spark, cat).filter(F.col("status") == "complete").collect()
    assert len(done) == hot_total
    assert all(r["host"] == hot for r in done), sorted({r["host"] for r in done})


def test_fuzz_parse_vs_elementtree(spark):
    """Differential fuzz: on well-formed documents the regex subset must
    agree with a real XML parser (ElementTree) — entries, order, trim,
    lastmod nullability — across whitespace layouts, container
    attributes, and mixed url/sitemap docs."""
    import random
    import xml.etree.ElementTree as ET

    rng = random.Random(20260817)
    alphabet = "abcdefghij0123456789-._~/?=%"
    docs, expected = [], {}
    for d in range(40):
        su = f"https://fuzz{d}.test/sitemap.xml"
        is_index = rng.random() < 0.3
        tag, attrs = ("sitemapindex", "") if is_index else ("urlset", "")
        if rng.random() < 0.5:
            attrs = ' xmlns:x="http://example.test/ns" data-k="v"'
        parts = [f"<?xml version=\"1.0\"?><{tag}{attrs}>"]
        entries = []
        for i in range(rng.randrange(0, 6)):
            loc = "https://h%d.test/%s" % (
                rng.randrange(3), "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 12))))
            ws1, ws2 = rng.choice(["", " ", "\n  ", "\t"]), rng.choice(["", " ", "\n"])
            lastmod = None
            lm_xml = ""
            if rng.random() < 0.5:
                lastmod = "2026-0%d-1%d" % (rng.randrange(1, 9), rng.randrange(0, 9))
                lm_xml = f"<lastmod>{ws1}{lastmod}{ws2}</lastmod>"
            etag = "sitemap" if is_index else "url"
            nl = rng.choice(["", "\n", "\n  "])
            parts.append(f"{nl}<{etag}><loc>{ws1}{loc}{ws2}</loc>{lm_xml}</{etag}>")
            entries.append((("sitemap" if is_index else "url"), i, loc, lastmod))
        parts.append(f"</{tag}>")
        xml = "".join(parts)
        # ET ground truth (namespace-free docs; xmlns:x is a no-op here)
        root = ET.fromstring(xml)
        et_entries = []
        for i, el in enumerate(root):
            loc = (el.findtext("loc") or "").strip()
            lm = el.findtext("lastmod")
            et_entries.append((el.tag, i, loc, lm.strip() if lm is not None else None))
        assert et_entries == entries  # generator and ET agree on intent
        docs.append((su, xml))
        expected[su] = entries
    df = spark.createDataFrame(docs, "url string, body string")
    got: dict = {}
    for r in sitemap.sitemap_entries(df).collect():
        got.setdefault(r["sitemap_url"], []).append(
            (r["kind"], r["pos"], r["loc"], r["lastmod"])
        )
    for su, ents in expected.items():
        assert sorted(got.get(su, [])) == sorted(ents), su


def test_robots_sitemap_directive(spark):
    robots = spark.createDataFrame(
        [
            ("a.test", "User-agent: *\nDisallow: /x\nSitemap: https://a.test/sm.xml\n"
                       "User-agent: bot\nSiteMap:   https://a.test/sm2.xml  "),
            ("b.test", "# no sitemap here\nUser-agent: *\nAllow: /"),
            ("c.test", "sitemap: https://a.test/sm.xml"),  # dup across hosts
        ],
        "host string, robots_txt string",
    )
    # group-independent (RFC 9309 2.2.4), case-insensitive, deduped, sorted
    assert sitemap.sitemaps_from_robots(robots) == [
        "https://a.test/sm.xml", "https://a.test/sm2.xml",
    ]


def _corpus_with_sitemaps(spark, lastmods=None):
    """fixtures pages + an index and two urlsets listing 6 of them; the
    robots table advertises the index. Returns (all_pages, robots,
    listed_urls)."""
    from xtracted_crawlers_spark import fixtures

    pages = fixtures.gen_pages(spark, 30, n_hosts=3)
    listed = [r["url"] for r in pages.orderBy("url").limit(6).collect()]
    lastmods = lastmods or {}
    ent = lambda u: (
        f"<url><loc>{u}</loc>" +
        (f"<lastmod>{lastmods[u]}</lastmod>" if u in lastmods else "") + "</url>")
    urlset = lambda urls: "<urlset>" + "".join(ent(u) for u in urls) + "</urlset>"
    part = lambda i: f"https://seeds.test/sm/part{i}.xml"
    sm_rows = [
        ("https://seeds.test/sitemap.xml",
         f"<sitemapindex><sitemap><loc>{part(1)}</loc></sitemap>"
         f"<sitemap><loc>{part(2)}</loc></sitemap></sitemapindex>".encode()),
        (part(1), urlset(listed[:3]).encode()),
        (part(2), urlset(listed[3:]).encode()),
    ]
    sm_df = spark.createDataFrame(sm_rows, "url string, html binary").select(
        "url", F.lit(None).cast("timestamp").alias("warc_ts"), "html",
        F.lit(None).cast("string").alias("text"), F.lit(None).cast("string").alias("lang"),
    )
    all_pages = pages.select("url", "warc_ts", "html", "text", "lang").unionByName(sm_df)
    robots = spark.createDataFrame(
        [("seeds.test", "User-agent: *\nAllow: /\nSitemap: https://seeds.test/sitemap.xml",
          None, None)],
        "host string, robots_txt string, crawl_delay_s double, max_tokens int",
    )
    return all_pages, robots, listed


def test_crawl_sitemap_autodiscovery_from_robots(spark, tmp_path):
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, load_frontier, run_crawl

    all_pages, robots, listed = _corpus_with_sitemaps(spark)
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(max_rounds=5, sitemap_from_robots=True)
    metrics = run_crawl(spark, cat, all_pages, seeds=None, robots=robots, cfg=cfg)
    assert sum(m.get("completed", 0) for m in metrics) == 6
    done = load_frontier(spark, cat).filter(F.col("status") == "complete")
    assert sorted(r["url"] for r in done.collect()) == sorted(listed)


def test_refresh_stale_recrawls_updated_lastmod(spark, tmp_path):
    """lastmod freshness: after a full crawl, republishing the sitemap
    with future lastmods on two URLs resets exactly those to pending;
    the next crawl re-fetches only them."""
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import (
        CrawlConfig, load_frontier, refresh_stale, run_crawl,
    )

    all_pages, robots, listed = _corpus_with_sitemaps(spark)
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(max_rounds=5, sitemap_from_robots=True)
    run_crawl(spark, cat, all_pages, seeds=None, robots=robots, cfg=cfg)

    # a lastmod BETWEEN the first crawl's commits and the re-crawl:
    # stale now, fresh again once re-fetched (a future lastmod would be
    # perpetually stale by the spec-true reading - lastmod vs fetch time)
    from datetime import datetime, timezone

    now_iso = datetime.now(timezone.utc).isoformat()  # micros + offset
    stale_urls = sorted(listed)[:2]
    lastmods = {stale_urls[0]: now_iso, stale_urls[1]: now_iso}
    lastmods[sorted(listed)[2]] = "1999-01-01"  # older than the fetch -> fresh
    updated_pages, _, _ = _corpus_with_sitemaps(spark, lastmods=lastmods)
    out = refresh_stale(spark, cat, updated_pages,
                        ["https://seeds.test/sitemap.xml"])
    assert out["stale"] == 2
    fr = load_frontier(spark, cat)
    pend = {r["url"] for r in fr.filter(F.col("status") == "pending").collect()}
    assert pend == set(stale_urls)
    # resume re-fetches exactly the stale pair
    m2 = run_crawl(spark, cat, updated_pages, seeds=None, robots=robots, cfg=cfg)
    assert sum(m.get("completed", 0) for m in m2) == 2
    assert load_frontier(spark, cat).filter(F.col("status") != "complete").count() == 0
    # idempotent: same sitemap again finds nothing stale
    assert refresh_stale(spark, cat, updated_pages,
                         ["https://seeds.test/sitemap.xml"])["stale"] == 0


def test_sitemap_parse_plan_is_jvm_only(spark):
    """Plan shape: the parse is JVM regexp + Generate (posexplode) —
    zero Python evaluation and zero shuffle until the caller aggregates."""
    df = _docs(spark)
    plan = sitemap.sitemap_entries(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan  # no BatchEvalPython / ArrowEvalPython


def test_loc_entity_unescape_and_render_escape(spark):
    """Spec compliance: <loc> URLs arrive entity-escaped; parse
    unescapes (&amp; last, so '&amp;lt;' stays literal '&lt;'), render
    escapes, and the pair round-trips an &-carrying query string."""
    xml = ("<urlset><url><loc>https://a.test/dp/B01?x=1&amp;y=2</loc></url>"
           "<url><loc>https://a.test/p?q=&amp;lt;tag&amp;gt;</loc></url></urlset>")
    df = spark.createDataFrame([("https://a.test/sm.xml", xml)], "url string, body string")
    locs = [r["loc"] for r in sitemap.sitemap_entries(df).orderBy("pos").collect()]
    assert locs == ["https://a.test/dp/B01?x=1&y=2", "https://a.test/p?q=&lt;tag&gt;"]
    urls = spark.createDataFrame(
        [("https://h.test/dp/B0?x=1&y=2", "h.test")], "u string, g string"
    )
    body = sitemap.render_sitemap(urls, "g", "u").first()["body"]
    assert "<loc>https://h.test/dp/B0?x=1&amp;y=2</loc>" in body
    parsed = sitemap.sitemap_entries(sitemap.render_sitemap(urls, "g", "u")).first()
    assert parsed["loc"] == "https://h.test/dp/B0?x=1&y=2"


def test_sitemap_channel_picks_up_new_locs_on_resume(spark, tmp_path):
    """A resumed crawl re-harvests the sitemap channel: locs the
    publisher added after the first run are ingested and crawled
    (review fix: the harvest used to be bootstrap-gated on a missing
    frontier, silently inert on resume)."""
    from xtracted_crawlers_spark import fixtures
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, load_frontier, run_crawl

    pages = fixtures.gen_pages(spark, 30, n_hosts=3)
    listed = [r["url"] for r in pages.orderBy("url").limit(4).collect()]
    urlset = lambda urls: ("<urlset>" + "".join(
        f"<url><loc>{u}</loc></url>" for u in urls) + "</urlset>").encode()

    def with_sitemap(urls):
        sm = spark.createDataFrame(
            [("https://seeds.test/sitemap.xml", urlset(urls))], "url string, html binary"
        ).select(
            "url", F.lit(None).cast("timestamp").alias("warc_ts"), "html",
            F.lit(None).cast("string").alias("text"), F.lit(None).cast("string").alias("lang"),
        )
        return pages.select("url", "warc_ts", "html", "text", "lang").unionByName(sm)

    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(max_rounds=5, sitemap_seeds=["https://seeds.test/sitemap.xml"])
    m1 = run_crawl(spark, cat, with_sitemap(listed[:2]), seeds=None, cfg=cfg)
    assert sum(m.get("completed", 0) for m in m1) == 2
    # publisher adds two locs; the SAME command (resume) picks them up
    m2 = run_crawl(spark, cat, with_sitemap(listed), seeds=None, cfg=cfg)
    assert sum(m.get("completed", 0) for m in m2) == 2
    done = load_frontier(spark, cat).filter(F.col("status") == "complete")
    assert sorted(r["url"] for r in done.collect()) == sorted(listed)
    # and a third resume with the unchanged sitemap ingests nothing new
    m3 = run_crawl(spark, cat, with_sitemap(listed), seeds=None, cfg=cfg)
    assert sum(m.get("completed", 0) for m in m3) == 0


def test_refresh_stale_keeps_jobs_table_consistent(spark, tmp_path):
    """Review fix: refresh_stale recommits the jobs table, so the
    re-fetch is not double-counted by the incremental jobs delta and
    n_complete ends exactly at n_total."""
    from xtracted_crawlers_spark import quota as QT
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import (
        CrawlConfig, load_frontier, refresh_stale, run_crawl,
    )

    all_pages, robots, listed = _corpus_with_sitemaps(spark)
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(max_rounds=5, sitemap_from_robots=True)
    run_crawl(spark, cat, all_pages, seeds=None, robots=robots, cfg=cfg)

    from datetime import datetime, timezone

    now_iso = datetime.now(timezone.utc).isoformat()
    lastmods = {u: now_iso for u in sorted(listed)[:2]}
    updated_pages, _, _ = _corpus_with_sitemaps(spark, lastmods=lastmods)
    assert refresh_stale(spark, cat, updated_pages,
                         ["https://seeds.test/sitemap.xml"])["stale"] == 2
    # jobs table already reflects the reset (not 'complete' over pending)
    jobs_mid = {(r["user_id"], r["job_id"]): r for r in cat.load(spark, QT.JOBS_TABLE).collect()}
    sm_job = jobs_mid[("sitemap", 0)]
    assert sm_job["job_status"] != "complete"
    assert sm_job["n_complete"] == sm_job["n_total"] - 2
    run_crawl(spark, cat, updated_pages, seeds=None, robots=robots, cfg=cfg)
    jobs = {(r["user_id"], r["job_id"]): r for r in cat.load(spark, QT.JOBS_TABLE).collect()}
    final = jobs[("sitemap", 0)]
    assert final["n_complete"] == final["n_total"]  # counted exactly once
    assert final["job_status"] == "complete"


def test_lastmod_ts_naive_values_pin_to_utc(spark):
    """Naive and date-only <lastmod> values must parse as UTC instants
    regardless of spark.sql.session.timeZone — refresh_stale compares
    them against commit times recorded in UTC, so a session-tz parse
    shifts staleness by the UTC offset (docs/ROUND5.md ADVICE item)."""
    from xtracted_crawlers_spark.sources.sitemap import lastmod_ts

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        rows = None
        vals = [
            ("2026-01-02",),                      # date-only
            ("2026-01-02T03:04:05",),             # naive datetime
            ("2026-01-02T03:04:05Z",),            # zulu
            ("2026-01-02T05:04:05+02:00",),       # offset (same instant)
            ("garbage",),                         # junk -> NULL
        ]
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = spark.createDataFrame(vals, "lastmod string")
            got = [
                r.e
                for r in df.select(
                    F.unix_timestamp(lastmod_ts("lastmod")).alias("e")
                ).collect()
            ]
            if rows is None:
                rows = got
            assert got == rows, tz
        assert rows[4] is None
        assert rows[1] == rows[0] + 3 * 3600 + 4 * 60 + 5
        assert rows[1] == rows[2] == rows[3]
        # 2026-01-02T00:00:00Z
        import datetime as dt
        assert rows[0] == int(
            dt.datetime(2026, 1, 2, tzinfo=dt.timezone.utc).timestamp()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
