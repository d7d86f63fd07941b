"""Adaptive re-crawl policy from OBSERVED change rates — the revisit
strategy of incremental crawlers (Cho & Garcia-Molina, "Effective Page
Refresh Policies for Web Crawlers", TODS 2003): pages that changed
between past fetches are revisited often, pages that never change decay
to the maximum interval. The reference engine re-crawls only on
explicit run_job resets; sitemap-lastmod freshness (crawl.refresh_stale)
needs the PUBLISHER to announce changes — this operator derives the
schedule from the crawler's own observations, which works for the long
tail of sites with no sitemaps.

Estimator: the integer twin of the Poisson-rate MLE. With n_obs
observations of a page and n_changes observed fingerprint changes, the
expected fetches-per-change is n_obs / n_changes; the interval used is

    recrawl_interval = clamp(floor(n_obs / (n_changes + 1)),
                             min_interval, max_interval)

(+1 in the denominator = Laplace smoothing: a single observation or a
never-changed page doesn't divide by zero and starts conservative).
Integer arithmetic end-to-end, so the DuckDB oracle reproduces the
schedule byte-for-byte — the float-λ estimator (-ln(1 - X/n)) orders
pages identically for fixed n_obs, and what the crawl consumes is the
clamped integer interval anyway (documented deviation).

Scale shape: one lag-window pass per url (shuffle keyed on url_id, the
same key the frontier already uses) + one aggregate; the due-filter is
a broadcast-size join of intervals against the completed frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_stats(
    history: DataFrame,
    id_col: str = "url_id",
    time_col: str = "round",
    fp_col: str = "fp",
    min_interval: int = 1,
    max_interval: int = 16,
) -> DataFrame:
    """history (id, time, fingerprint) → per-id
    (n_obs, n_changes, last_time, recrawl_interval). A change is a
    fingerprint differing from the PREVIOUS observation in time order;
    the first observation is baseline, never a change."""
    if min_interval < 1 or max_interval < min_interval:
        raise ValueError(f"bad interval clamp [{min_interval}, {max_interval}]")
    w = Window.partitionBy(id_col).orderBy(time_col)
    h = history.withColumn(
        "_changed",
        (F.col(fp_col) != F.lag(fp_col).over(w)).cast("int"),
    )
    g = h.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.coalesce(F.sum("_changed"), F.lit(0)).cast("long").alias("n_changes"),
        F.max(time_col).cast("long").alias("last_time"),
    )
    interval = F.least(
        F.lit(max_interval).cast("long"),
        F.greatest(
            F.lit(min_interval).cast("long"),
            F.floor(F.col("n_obs") / (F.col("n_changes") + F.lit(1))),
        ),
    )
    return g.withColumn("recrawl_interval", interval)


def due_for_recrawl(
    stats: DataFrame, current_time: int, id_col: str = "url_id"
) -> DataFrame:
    """ids whose last observation is at least recrawl_interval old."""
    return stats.filter(
        F.col("last_time") + F.col("recrawl_interval") <= F.lit(int(current_time))
    ).select(id_col, "recrawl_interval", "last_time")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """Crawl-over-crawl delta: (key, change, old_fp, new_fp) with change
    in {'added','removed','changed','unchanged'} — the snapshot diff a
    re-crawl pipeline feeds into refresh scheduling (changed/added ->
    re-extract; removed -> tombstone) and incremental dedup (only
    added/changed enter the near-dup candidate pool).

    One full-outer equi-join on the key; at 100 TB both snapshots come
    out of the same catalog bucketed by the key, so the join co-locates
    without a shuffle. Fingerprints are whatever content hash the crawl
    committed (text_fingerprint / md5) — this operator only compares."""
    o = old.select(F.col(key_col).alias("_k"), F.col(fp_col).alias("old_fp"))
    n = new.select(F.col(key_col).alias("_k"), F.col(fp_col).alias("new_fp"))
    j = o.join(n, "_k", "full_outer")
    return j.select(
        F.col("_k").alias(key_col),
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
        "old_fp",
        "new_fp",
    )
