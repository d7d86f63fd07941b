"""Sitemap source: sitemap.xml / sitemap-index parsing as a seed channel.

The reference's only seed source is the job payload's explicit URL list
(crawlers_services.py:76-95 inserts the submitted urls); sitemaps are the
web-native seed channel a Common-Crawl-scale crawler actually harvests,
so this source is NEW surface, documented as such. It turns fetched
sitemap bodies (already in the pages table — a sitemap is just a URL the
crawler fetched) into seed rows for ``frontier.ingest_seeds``.

Scale shape: parsing is pure JVM regexp (codegen'd, map-only — zero
Python, zero shuffle until the seed-ordering window, which runs over the
extracted seed list, not the corpus). Supported subset of the sitemap
protocol (sitemaps.org, 2008): ``<urlset><url><loc>/<lastmod>`` and
``<sitemapindex><sitemap><loc>/<lastmod>``, attributes on the container
tags tolerated, the five predefined XML entities unescaped in ``<loc>``
(the protocol REQUIRES entity-escaping URLs there), un-prefixed tag
names only, no CDATA and no numeric character references — the same
documented-regex-subset policy as linkgraph.HREF_PATTERN. Per the spec
``<loc>`` must be absolute, but relative locs resolve against the
sitemap's own URL (same RFC 3986 resolver as link extraction, so dot
segments normalize identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.linkgraph import _resolve_expr

# (?s): blocks span lines. \b keeps <url> from matching <urlset> — both
# Java regex and DuckDB's RE2 support \b and (?s), so the DuckDB oracle
# runs the identical patterns.
URL_BLOCK_RE = "(?s)<url\\b[^>]*>(.*?)</url>"
SITEMAP_BLOCK_RE = "(?s)<sitemap\\b[^>]*>(.*?)</sitemap>"
LOC_RE = "<loc>\\s*([^<]*?)\\s*</loc>"
LASTMOD_RE = "<lastmod>\\s*([^<]*?)\\s*</lastmod>"

# the five predefined XML entities — the sitemap protocol REQUIRES
# entity-escaping loc URLs (an &-carrying query string arrives as
# &amp;). Unescape order: &amp; LAST, so '&amp;lt;' round-trips to the
# literal '&lt;' and not '<'; the escape order is its mirror image.
_XML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")]


def xml_unescape(col):
    for ent, ch in _XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def xml_escape(col):
    for ent, ch in reversed(_XML_ENTITIES):
        col = F.replace(col, F.lit(ch), F.lit(ent))
    return col


def _entries_of_kind(sitemaps: DataFrame, url_col: str, xml_col: str, block_re: str, kind: str) -> DataFrame:
    xml = F.col(xml_col).cast("string")  # pages.html is binary; UTF-8 decode
    blocks = sitemaps.select(
        F.col(url_col).alias("sitemap_url"),
        F.posexplode(F.regexp_extract_all(xml, F.lit(block_re), F.lit(1))).alias(
            "pos", "block"
        ),
    )
    loc = xml_unescape(F.regexp_extract("block", LOC_RE, 1))
    lastmod = F.regexp_extract("block", LASTMOD_RE, 1)
    return (
        blocks.withColumn("_loc", loc)
        .filter(F.col("_loc") != "")
        .select(
            "sitemap_url",
            F.lit(kind).alias("kind"),
            F.col("pos").cast("int").alias("pos"),
            _resolve_expr(F.col("sitemap_url"), F.col("_loc")).alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
    )


def sitemap_entries(sitemaps: DataFrame, url_col: str = "url", xml_col: str = "body") -> DataFrame:
    """(sitemap_url, kind, pos, loc, lastmod) for every entry of every
    sitemap document: kind='url' from <urlset> entries (crawlable pages),
    kind='sitemap' from <sitemapindex> entries (nested sitemaps the
    caller fetches next round — one level per fetch round, exactly how a
    polite crawler walks an index). pos is the entry's in-document
    position (sitemap order = the publisher's discovery order)."""
    return _entries_of_kind(sitemaps, url_col, xml_col, URL_BLOCK_RE, "url").unionByName(
        _entries_of_kind(sitemaps, url_col, xml_col, SITEMAP_BLOCK_RE, "sitemap")
    )


def seeds_from_entries(entries: DataFrame, user_id: str, job_id: int) -> DataFrame:
    """Entry rows → seed rows (user_id, job_id, seed_idx, url) ready for
    ``frontier.ingest_seeds``: page entries only, first-wins on duplicate
    locs across sitemaps (lowest depth wins when a harvest carries one),
    seed_idx = global discovery order (depth, sitemap_url, in-document
    position). The ordering windows run over the seed list (size =
    entries, not corpus) and ingest_seeds re-checks against the
    frontier's seen set, so re-harvesting the same sitemaps next round
    is idempotent."""
    entries = entries.filter(F.col("kind") == "url")
    depth = F.col("depth") if "depth" in entries.columns else F.lit(0)
    entries = entries.withColumn("_d", depth)
    w_dup = Window.partitionBy("loc").orderBy("_d", "sitemap_url", "pos")
    first = (
        entries.withColumn("_rn", F.row_number().over(w_dup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    w_idx = Window.orderBy("_d", "sitemap_url", "pos")
    return first.select(
        F.lit(user_id).alias("user_id"),
        F.lit(job_id).cast("long").alias("job_id"),
        (F.row_number().over(w_idx) - 1).cast("int").alias("seed_idx"),
        F.col("loc").alias("url"),
    )


def seeds_from_sitemaps(
    sitemaps: DataFrame,
    user_id: str,
    job_id: int,
    url_col: str = "url",
    xml_col: str = "body",
) -> DataFrame:
    """One-level convenience: parse the given sitemap documents and
    assemble seeds (see seeds_from_entries)."""
    return seeds_from_entries(sitemap_entries(sitemaps, url_col, xml_col), user_id, job_id)


def harvest(
    pages: DataFrame,
    start_urls: list[str],
    max_depth: int = 2,
    url_col: str = "url",
    xml_col: str = "body",
) -> DataFrame:
    """Walk sitemap indexes breadth-first over the pages table and return
    every entry discovered, with a ``depth`` column (0 = the start
    documents). 'Fetching' a sitemap is what fetching is everywhere in
    this engine — a join against the pages table on url — so the walk is
    max_depth joins + parses, all LAZY (zero driver actions; the plan
    materializes when the caller ingests the seeds). Nested sitemaps
    already visited at a shallower depth are anti-joined out, so an
    index cycle cannot loop; depth is the hard bound either way. The
    sitemap index protocol nests one level (index → urlset), so
    max_depth=2 covers the spec; deeper chains just cost one more join
    each."""
    spark = pages.sparkSession
    page_side = pages.select(F.col(url_col).alias("_sm_url"), F.col(xml_col).alias("_sm_body"))
    frontier_urls = spark.createDataFrame([(u,) for u in start_urls], "_sm_url string")
    visited = frontier_urls
    out = None
    for d in range(max_depth):
        docs = page_side.join(frontier_urls, "_sm_url")
        entries = sitemap_entries(docs, "_sm_url", "_sm_body").withColumn(
            "depth", F.lit(d).cast("int")
        )
        out = entries if out is None else out.unionByName(entries)
        if d == max_depth - 1:
            break
        nested = entries.filter(F.col("kind") == "sitemap").select(
            F.col("loc").alias("_sm_url")
        ).distinct()
        frontier_urls = nested.join(visited, "_sm_url", "left_anti")
        visited = visited.unionByName(frontier_urls)
    return out


def sitemaps_from_robots(robots: DataFrame) -> list[str]:
    """Sitemap URLs advertised by robots.txt — the ``Sitemap:`` directive
    (sitemaps.org autodiscovery; per RFC 9309 §2.2.4 it is group-
    independent, so it is read from the WHOLE file, not just the
    'User-agent: *' group, and its value is an absolute URL). One JVM
    regexp over the tiny robots table; the collect is bounded by the
    number of advertised sitemaps (a handful per host — this module is
    off the per-round hot path, which stays collect-free). Sorted for
    deterministic harvest/seed order."""
    hits = robots.select(
        F.explode(
            F.regexp_extract_all(
                F.col("robots_txt"), F.lit("(?im)^\\s*sitemap\\s*:\\s*(\\S+)"), F.lit(1)
            )
        ).alias("sm")
    ).distinct()
    return sorted(r["sm"] for r in hits.collect())


def lastmod_ts(col):
    """W3C-datetime <lastmod> → timestamp column: date-only
    ('2026-01-02'), naive datetime, and offset/Z-carrying datetime all
    parse; anything else is NULL (never an error — sitemaps in the wild
    carry junk).

    Naive and date-only values are pinned to UTC by appending an
    explicit offset before parsing, NOT parsed in the Spark session
    timezone: refresh_stale compares these against commit times recorded
    in UTC, and a session-tz parse would shift the staleness test by the
    UTC offset (spuriously re-crawling or missing by up to a day)."""
    c = F.col(col) if isinstance(col, str) else col
    has_off = c.rlike("(Z|z|[+-][0-9]{2}:[0-9]{2}|[+-][0-9]{4})$")
    return F.coalesce(
        # offset/Z-carrying: the generic parser reads it as an instant
        # (arbitrary fraction digits ok); session tz never consulted
        F.when(has_off, F.try_to_timestamp(c)),
        # date-only → midnight UTC
        F.try_to_timestamp(
            F.concat(c, F.lit("T00:00:00Z")), F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")
        ),
        # naive datetime → pin to UTC by appending Z, then generic parse
        F.when(~has_off, F.try_to_timestamp(F.concat(c, F.lit("Z")))),
    )


def render_sitemap(urls: DataFrame, group_col: str, loc_col: str, lastmod_col=None) -> DataFrame:
    """Fixture twin: render one <urlset> document per group from a URL
    table — (url, body) rows shaped like fetched sitemap pages. Used by
    tests and the contract query so parse ∘ render is checkable against
    an independent oracle; deterministic (entries sorted by loc)."""
    lastmod = (
        F.concat(F.lit("<lastmod>"), F.col(lastmod_col), F.lit("</lastmod>"))
        if lastmod_col
        else F.lit("")
    )
    entry = F.concat(
        F.lit("<url><loc>"), xml_escape(F.col(loc_col)), F.lit("</loc>"), lastmod, F.lit("</url>")
    )
    return (
        urls.select(F.col(group_col).alias("g"), entry.alias("e"), F.col(loc_col).alias("_loc"))
        .groupBy("g")
        .agg(F.array_join(F.array_sort(F.collect_list(F.struct("_loc", "e"))).e, "").alias("entries"))
        .select(
            F.concat(F.lit("https://"), F.col("g"), F.lit("/sitemap.xml")).alias("url"),
            F.concat(
                F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset>'),
                F.col("entries"),
                F.lit("</urlset>"),
            ).alias("body"),
        )
    )
