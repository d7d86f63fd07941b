"""URL template mining: collapse volatile tokens, count URL shapes.

A crawler facing an unknown site needs to know the site's URL *shapes*:
``/product/{n}/view`` is a finite catalog, ``/calendar/{n}/{n}/{n}`` is
an infinite trap, ``/item/{h}?session={h}`` is the same page behind a
session id.  Collapsing volatile tokens (digit runs, long hex runs) in
the path+query and counting URLs per (host, template) turns a frontier
of billions of URLs into a few hundred templates per host — the signal
behind crawl-budget allocation, trap quarantine (see operators/traps,
which targets two specific trap families; templates generalize), and
dedup-by-structure.

Scale shape: template derivation is three map-only JVM regex ops per
row (no Python, no shuffle); the only shuffle is the (host, template)
groupBy, whose output is template-vocabulary-sized — tiny relative to
the frontier.  distinct-URL counting rides the same aggregate.

Collapse rules (applied to the path+query only — the host is its own
grouping column, and hostnames legitimately contain digits):
1. hex runs of >=8 chars -> ``{h}``   (ids, hashes, session tokens)
2. remaining digit runs  -> ``{n}``   (keys, pages, dates)
Hex first: a hex run usually contains digit runs, and collapsing
digits first would shred it into ``{n}x{n}...`` fragments.

The reference crawler has no URL analytics; this extends the trap/
politeness surface of the §2 contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xtracted_crawlers_spark import urlnorm

HEX_RUN = "[0-9a-fA-F]{8,}"
DIGIT_RUN = "[0-9]+"
PATH_QUERY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"


def path_query(url: Column) -> Column:
    """Everything after the authority ('' for a bare host URL)."""
    return F.regexp_replace(url, PATH_QUERY_RE, "$1")


def url_template(url: Column) -> Column:
    """Collapsed path+query: hex runs -> {h}, then digit runs -> {n}."""
    t = path_query(url)
    t = F.regexp_replace(t, HEX_RUN, "{h}")
    return F.regexp_replace(t, DIGIT_RUN, "{n}")


def template_counts(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, template, n_urls, n_distinct) — URL-shape census per host.

    n_urls counts rows (frontier pressure), n_distinct counts distinct
    URLs (how many real pages hide behind the shape); a template with
    huge n_urls and tiny n_distinct is re-discovery churn, huge
    n_distinct with one template is a trap candidate.
    """
    u = F.col(url_col)
    return (
        urls.select(
            urlnorm.host(u).alias("host"),
            url_template(u).alias("template"),
            u.alias("_url"),
        )
        .filter(F.col("host").isNotNull() & (F.col("host") != ""))
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("_url").alias("n_distinct"),
        )
    )
