"""Adaptive re-crawl from observed change rates: estimator math, the
due filter, and the end-to-end loop — crawl, adapt, re-crawl against a
changed web, intervals back off for stable pages and stay tight for
churning ones."""

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark import fixtures
from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
from xtracted_crawlers_spark.crawl import (
    CrawlConfig,
    load_completion_history,
    load_frontier,
    refresh_by_change_rate,
    run_crawl,
)
from xtracted_crawlers_spark.operators import freshness


def _hist(spark, rows):
    return spark.createDataFrame(rows, "url_id string, round long, fp string")


def test_change_stats_estimator(spark):
    rows = (
        # A: 4 obs, never changes -> floor(4/1)=4
        [("A", r, "x") for r in range(1, 5)]
        # B: 4 obs, changes every time -> floor(4/4)=1
        + [("B", r, f"f{r}") for r in range(1, 5)]
        # C: 4 obs, one change -> floor(4/2)=2
        + [("C", 1, "a"), ("C", 2, "a"), ("C", 3, "b"), ("C", 4, "b")]
        # D: single observation -> floor(1/1)=1 (explore early)
        + [("D", 9, "z")]
    )
    out = {r["url_id"]: r for r in freshness.change_stats(_hist(spark, rows)).collect()}
    assert out["A"]["recrawl_interval"] == 4 and out["A"]["n_changes"] == 0
    assert out["B"]["recrawl_interval"] == 1 and out["B"]["n_changes"] == 3
    assert out["C"]["recrawl_interval"] == 2 and out["C"]["n_changes"] == 1
    assert out["D"]["recrawl_interval"] == 1 and out["D"]["n_obs"] == 1
    # clamp
    capped = freshness.change_stats(_hist(spark, rows), max_interval=3)
    assert {r["url_id"]: r["recrawl_interval"] for r in capped.collect()}["A"] == 3
    with pytest.raises(ValueError):
        freshness.change_stats(_hist(spark, rows), min_interval=0)


def test_due_filter(spark):
    rows = [("A", r, "x") for r in range(1, 5)] + [("B", r, f"f{r}") for r in range(1, 5)]
    stats = freshness.change_stats(_hist(spark, rows))
    # A: last 4, interval 4 -> due at 8; B: last 4, interval 1 -> due at 5
    assert {r["url_id"] for r in freshness.due_for_recrawl(stats, 5).collect()} == {"B"}
    assert {r["url_id"] for r in freshness.due_for_recrawl(stats, 8).collect()} == {"A", "B"}


def test_adaptive_recrawl_end_to_end(spark, tmp_path):
    """Crawl a static web (1 obs each, interval 1 — explore), refresh
    resets everything; crawl again against a web where SOME pages
    changed; the second round of stats backs off unchanged pages
    (interval 2) and keeps changed pages tight (interval 1)."""
    out = str(tmp_path / "corpus")
    paths = fixtures.write_corpus(spark, out, 40, 20, n_hosts=4)
    pages = spark.read.parquet(paths["pages"])
    seeds = spark.read.parquet(paths["seeds"])
    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    run_crawl(spark, catalog, pages, seeds, cfg=CrawlConfig(max_rounds=6))

    hist1 = load_completion_history(spark, catalog)
    n_done = hist1.count()
    assert n_done > 0
    assert hist1.select("url_id").distinct().count() == n_done  # 1 obs each

    m = refresh_by_change_rate(spark, catalog)
    assert m["stale"] == n_done  # single-obs intervals explore: all due

    # mutate half the pages' visible text (extraction picks it up)
    changed = F.conv(F.substring(F.md5("url"), 1, 2), 16, 10) % 2 == 0
    pages2 = pages.withColumn(
        "html",
        F.when(
            changed,
            F.regexp_replace(
                F.col("html").cast("string"), "</body>", "<p>updated v2</p></body>"
            ).cast("binary"),
        ).otherwise(F.col("html")),
    )
    run_crawl(spark, catalog, pages2, cfg=CrawlConfig(max_rounds=6))

    hist2 = load_completion_history(spark, catalog)
    stats = freshness.change_stats(hist2).cache()
    two_obs = stats.filter(F.col("n_obs") == 2)
    assert two_obs.count() > 0
    changed_stats = two_obs.filter(F.col("n_changes") == 1)
    stable_stats = two_obs.filter(F.col("n_changes") == 0)
    assert changed_stats.count() > 0 and stable_stats.count() > 0
    assert changed_stats.filter(F.col("recrawl_interval") != 1).count() == 0
    assert stable_stats.filter(F.col("recrawl_interval") != 2).count() == 0
    stats.unpersist()

    # frontier is whole again: every reset row re-completed
    fr = load_frontier(spark, catalog)
    assert fr.filter(F.col("status") == "pending").count() == 0


def test_snapshot_diff_all_outcomes(spark):
    from xtracted_crawlers_spark.operators import freshness

    old = spark.createDataFrame(
        [("a", "f1"), ("b", "f2"), ("c", "f3")], "url string, fp string"
    )
    new = spark.createDataFrame(
        [("a", "f1"), ("b", "X2"), ("d", "f4")], "url string, fp string"
    )
    got = {
        r.url: (r.change, r.old_fp, r.new_fp)
        for r in freshness.snapshot_diff(old, new).collect()
    }
    assert got == {
        "a": ("unchanged", "f1", "f1"),
        "b": ("changed", "f2", "X2"),
        "c": ("removed", "f3", None),
        "d": ("added", None, "f4"),
    }
