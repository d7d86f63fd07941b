"""Crawl-trap detection: flag hosts whose URL space explodes without
adding content, so the scheduler can quarantine them before they eat
the politeness budget.

The classic traps (Heydon & Najork, "Mercator: A scalable, extensible
web crawler", WWW 1999 §3; every production crawler since):

- **calendar / path-repetition traps** — links that keep appending the
  same segments (``/cal/2024/01/2024/01/...``): unbounded depth, the
  same page forever. Detected per URL as repeated path segments and
  excessive depth.
- **session-id / parameter explosions** — the same path under millions
  of distinct query strings (``/p?sid=<hash>``): detected per host as
  many URLs over few distinct paths.

The reference crawler never needed this (its frontier is a bounded,
human-submitted ASIN list — pg_crawl_job_worker.py processes what the
jobs table holds), but a frontier that EXPANDS (crawl.py's C3 variant
discovery, sitemap ingest) does: at a 10^10-URL frontier one trap host
can dominate a round's selection. All features are pure column
expressions over the URL string (split + array ops — codegen, no UDF);
the host rollup is one partial-aggregating groupBy, so the whole
detector is a single shuffle of per-host partial aggregates. Integer
thresholds only (cross-engine hash-exact; no float ratios).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import urlnorm

# conservative defaults: a polite product/article URL space stays far
# below all three
MAX_DEPTH = 8  # path segments before we call it a loop
MIN_SEGMENT_REPEATS = 3  # same segment appearing 3+ times in ONE path
URLS_PER_PATH = 3  # host-level: n_urls >= 3 * n_distinct_paths


def _path(url: Column) -> Column:
    return F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))


def _segments(url: Column) -> Column:
    """Non-empty path segments ('/a//b/' -> [a, b])."""
    return F.filter(F.split(_path(url), "/"), lambda s: s != "")


def path_depth(url: Column) -> Column:
    """Number of non-empty path segments."""
    return F.size(_segments(url))


def max_segment_repeat(url: Column) -> Column:
    """Highest occurrence count of any single segment within the path —
    2 for /a/x/a, 1 for distinct segments, 0 for the root path.
    Computed as segments minus distinct segments plus one occupied slot:
    exact for the dominating segment when one segment repeats (the trap
    shape); a conservative overcount when several distinct segments
    each repeat — fine for a gate that only ever quarantines."""
    seg = _segments(url)
    return F.when(F.size(seg) == 0, F.lit(0)).otherwise(
        F.size(seg) - F.size(F.array_distinct(seg)) + 1
    )


def url_trap_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL trap features: host, path, depth, max segment repeat,
    has_query. Map-only projection."""
    u = F.col(url_col)
    return df.withColumns(
        {
            "host": urlnorm.host(u),
            "path": _path(u),
            "depth": path_depth(u),
            "seg_repeat": max_segment_repeat(u),
            "has_query": F.try_parse_url(u, F.lit("QUERY")).isNotNull(),
        }
    )


def trap_hosts(
    df: DataFrame,
    url_col: str = "url",
    max_depth: int = MAX_DEPTH,
    min_segment_repeats: int = MIN_SEGMENT_REPEATS,
    urls_per_path: int = URLS_PER_PATH,
) -> DataFrame:
    """Per-host trap verdict. Output: host, n_urls, n_paths, max_depth,
    n_looping (URLs whose path repeats a segment >= min_segment_repeats
    or exceeds max_depth), n_query, is_trap.

    is_trap fires when ANY of:
    - a looping URL exists on the host (depth/repetition trap), or
    - n_urls >= urls_per_path * n_paths AND the overflow is query-borne
      (n_query * 2 >= n_urls) — the session-id explosion shape.

    One shuffle: the per-URL features are projections, the rollup is a
    partial-aggregating groupBy(host); countDistinct(path) rewrites to
    a two-stage exact aggregate. At 10^10 URLs the output is one row
    per host — small enough to broadcast back into the scheduler as a
    quarantine rule table."""
    feats = url_trap_features(df, url_col)
    looping = (F.col("seg_repeat") >= min_segment_repeats) | (
        F.col("depth") > max_depth
    )
    agg = feats.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("path").alias("n_paths"),
        F.max("depth").alias("max_depth"),
        F.sum(looping.cast("long")).alias("n_looping"),
        F.sum(F.col("has_query").cast("long")).alias("n_query"),
    )
    explosion = (F.col("n_urls") >= urls_per_path * F.col("n_paths")) & (
        F.col("n_query") * 2 >= F.col("n_urls")
    )
    return agg.withColumn("is_trap", (F.col("n_looping") > 0) | explosion)


def quarantine(selectable: DataFrame, traps: DataFrame) -> DataFrame:
    """Drop rows whose host is trap-flagged — the scheduler-side gate.
    traps is one row per host (broadcast-sized at any corpus scale)."""
    bad = traps.filter(F.col("is_trap")).select("host")
    return selectable.join(F.broadcast(bad), "host", "left_anti")


# --- incremental (round-loop) form ------------------------------------------
# trap_hosts() above rescans its whole input — right for a one-shot audit
# and for the hash-exact oracle, wrong inside the crawl loop where the
# frontier only ever GROWS by a bounded per-round delta. The state below
# is one row per host and fully mergeable, so the loop pays O(delta) per
# round instead of O(frontier): counters merge by sum/max, and the
# distinct-path count (the session-explosion denominator) is a
# Datasketches HLL union (exact in sparse mode at per-host path counts
# below ~2^lg_k, ±~1.6% beyond — fine for a heuristic gate; the exact
# rollup remains the audit/oracle surface).

PATHS_LG_K = 12


def host_trap_state(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Mergeable per-host trap state from a URL slice: (host, n_urls,
    n_query, max_depth, n_looping, paths_sketch). One partial-agg
    shuffle over the slice."""
    feats = url_trap_features(df, url_col)
    looping = (F.col("seg_repeat") >= MIN_SEGMENT_REPEATS) | (
        F.col("depth") > MAX_DEPTH
    )
    return feats.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.col("has_query").cast("long")).alias("n_query"),
        F.max("depth").alias("max_depth"),
        F.sum(looping.cast("long")).alias("n_looping"),
        F.hll_sketch_agg("path", F.lit(PATHS_LG_K)).alias("paths_sketch"),
    )


def merge_trap_state(state: DataFrame, delta_state: DataFrame) -> DataFrame:
    """Fold a delta's per-host state into the committed state: counters
    add, depth maxes, path sketches HLL-union. Both sides are one row
    per host, so this is a tiny aggregate."""
    return (
        state.unionByName(delta_state)
        .groupBy("host")
        .agg(
            F.sum("n_urls").alias("n_urls"),
            F.sum("n_query").alias("n_query"),
            F.max("max_depth").alias("max_depth"),
            F.sum("n_looping").alias("n_looping"),
            F.hll_union_agg("paths_sketch", F.lit(False)).alias("paths_sketch"),
        )
    )


def trap_verdicts(
    state: DataFrame,
    urls_per_path: int = URLS_PER_PATH,
) -> DataFrame:
    """Per-host is_trap from the mergeable state — same rules as
    trap_hosts, with n_paths estimated from the HLL sketch."""
    n_paths = F.hll_sketch_estimate("paths_sketch").cast("long")
    explosion = (F.col("n_urls") >= urls_per_path * n_paths) & (
        F.col("n_query") * 2 >= F.col("n_urls")
    )
    return state.select(
        "host",
        "n_urls",
        n_paths.alias("n_paths"),
        "max_depth",
        "n_looping",
        "n_query",
        ((F.col("n_looping") > 0) | explosion).alias("is_trap"),
    )
