"""URL-level quality filtering for crawl frontiers and corpus prep —
the C4/RefinedWeb-style gate that drops junk URLs BEFORE fetch (saving
the fetch+extract cost) or before corpus admission: blocklisted hosts,
digit-heavy paths (calendars, session ids), parameter-stuffed queries
(faceted-search explosions), over-deep or over-long URLs.

All features are single-pass JVM column expressions (map-only, no
Python, no shuffle); the host blocklist — real-world lists are
10^4-10^6 hosts, comfortably broadcastable — joins as a broadcast
left join + null test, so the URL side (the 10^10-row frontier)
never shuffles.

Reference: the reference crawler admits every submitted URL that an
extractor routes (xtracted/crawlers.py); URL-quality gating is new
surface for the corpus-prep tier (thresholds follow the C4 and
RefinedWeb heuristics, tunable per call).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import urlnorm


def _path(url: Column) -> Column:
    return F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))


def _query(url: Column) -> Column:
    return F.try_parse_url(url, F.lit("QUERY"))


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append (host, depth, digit_ratio, n_params, url_len) — the raw
    signals the keep gate thresholds. digit_ratio is the digit share of
    the path, rounded to 4 decimals (oracle-stable)."""
    url = F.col(url_col)
    path = _path(url)
    q = _query(url)
    digits = F.length(F.regexp_replace(path, "[^0-9]", ""))
    plen = F.greatest(F.length(path), F.lit(1))
    return (
        df.withColumn("host", urlnorm.host(url))
        .withColumn(
            "depth",
            (F.length(path) - F.length(F.regexp_replace(path, "/", ""))).cast("long"),
        )
        .withColumn(
            "digit_ratio",
            F.round(digits.cast("double") / plen.cast("double"), 4),
        )
        .withColumn(
            "n_params",
            F.when(q.isNull(), F.lit(0)).otherwise(F.size(F.split(q, "&"))).cast("long"),
        )
        .withColumn("url_len", F.length(url).cast("long"))
    )


def url_keep(
    df: DataFrame,
    url_col: str = "url",
    blocked_hosts: Optional[DataFrame] = None,
    max_digit_ratio: float = 0.5,
    max_params: int = 3,
    max_url_len: int = 2048,
    max_depth: int = 12,
) -> DataFrame:
    """url_features plus a boolean `keep`: true iff the URL passes every
    threshold and its host is not blocklisted. blocked_hosts is a
    (host) DataFrame; the hint is explicit because a blocklist is small
    by construction — never let it plan as the build side of a
    shuffled join against the frontier."""
    feats = url_features(df, url_col)
    keep = (
        (F.col("digit_ratio") <= F.lit(max_digit_ratio))
        & (F.col("n_params") <= F.lit(max_params))
        & (F.col("url_len") <= F.lit(max_url_len))
        & (F.col("depth") <= F.lit(max_depth))
    )
    if blocked_hosts is not None:
        b = blocked_hosts.select("host").distinct().withColumn("_blocked", F.lit(True))
        feats = feats.join(F.broadcast(b), "host", "left")
        keep = keep & F.col("_blocked").isNull()
        return feats.withColumn("keep", keep).drop("_blocked")
    return feats.withColumn("keep", keep)
