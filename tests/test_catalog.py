import os

import pytest

from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog


@pytest.fixture()
def cat(tmp_path):
    return ParquetSnapshotCatalog(str(tmp_path / "warehouse"))


def test_commit_load_roundtrip(spark, cat):
    df = spark.range(10).withColumnRenamed("id", "x")
    sid = cat.commit(df, "t", round_id=0, metrics={"rows": 10})
    assert sid == 0
    out = cat.load(spark, "t")
    assert out.count() == 10
    man = cat.manifest("t", 0)
    assert man.metrics["rows"] == 10
    assert man.files and all(f["bytes"] > 0 for f in man.files)


def test_time_travel_and_history(spark, cat):
    cat.commit(spark.range(5), "t", round_id=1)
    cat.commit(spark.range(7), "t", round_id=2)
    cat.commit(spark.range(9), "t", round_id=3)
    assert cat.latest_snapshot("t") == 2
    assert cat.load(spark, "t").count() == 9
    assert cat.load(spark, "t", snapshot_id=0).count() == 5  # time travel
    hist = cat.history("t")
    assert [m.round_id for m in hist] == [1, 2, 3]
    assert hist[2].parent_snapshot_id == 1


def test_crash_before_manifest_is_invisible(spark, cat):
    cat.commit(spark.range(5), "t")
    # simulate a crashed writer: data dir exists, no manifest
    orphan = cat._data_dir("t", 1)
    spark.range(99).write.parquet(orphan)
    assert cat.latest_snapshot("t") == 0
    assert cat.load(spark, "t").count() == 5
    # next commit reclaims the orphan dir
    sid = cat.commit(spark.range(3), "t")
    assert sid == 1
    assert cat.load(spark, "t").count() == 3


def test_missing_table_raises(spark, cat):
    with pytest.raises(FileNotFoundError):
        cat.load(spark, "nope")
    assert not cat.exists("nope")


def test_iceberg_catalog_gated(spark):
    """The Iceberg-native catalog refuses to construct without the
    runtime (this sandbox has no iceberg jar); on a configured cluster
    the same test body runs the real DDL path."""
    from xtracted_crawlers_spark import catalog_iceberg as CI

    if CI.iceberg_available(spark):  # pragma: no cover - cluster only
        cat = CI.IcebergSnapshotCatalog(spark)
        df = spark.createDataFrame([("u", 1, "B1")], "user_id string, job_id long, url_id string")
        cat.commit(df, "frontier", round_id=0, metrics={"event": "bootstrap"})
        assert cat.exists("frontier")
        assert cat.load(spark, "frontier").count() == 1
    else:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="Iceberg runtime"):
            CI.IcebergSnapshotCatalog(spark)


def test_expire_snapshots_keeps_mor_chain(spark, tmp_path):
    """Storage GC: snapshots older than the newest retained base are
    deleted; the current merge-on-read state is bit-unchanged and resume
    still works. Bounded storage at 10^10 scale depends on this."""
    import os

    from xtracted_crawlers_spark import fixtures
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import (
        FRONTIER_TABLE, CrawlConfig, load_frontier, run_crawl,
    )

    corpus = fixtures.write_corpus(spark, str(tmp_path / "c"), 60, 30, n_hosts=4)
    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    # compact_every=3 so several bases + interleaved deltas exist
    run_crawl(spark, cat, pages, seeds, cfg=CrawlConfig(max_rounds=8, compact_every=3, global_budget=6))

    hist = cat.history(FRONTIER_TABLE)
    bases = [m.snapshot_id for m in hist if m.metrics.get("kind", "base") == "base"]
    assert len(bases) >= 2, "fixture must produce at least two bases"
    before = {
        (r["user_id"], r["job_id"], r["url_id"]): (r["status"], r["retries"], r["round"])
        for r in load_frontier(spark, cat).collect()
    }

    expired = cat.expire_snapshots(FRONTIER_TABLE, keep_bases=1)
    assert expired, "old snapshots should have been expired"
    assert all(s < bases[-1] for s in expired)
    # manifests + data gone
    remaining = {m.snapshot_id for m in cat.history(FRONTIER_TABLE)}
    assert remaining.isdisjoint(expired)
    for m in hist:
        assert os.path.isdir(m.data_path) == (m.snapshot_id in remaining)
    # oldest retained snapshot is a base (MoR chain intact)
    first = cat.history(FRONTIER_TABLE)[0]
    assert first.metrics.get("kind", "base") == "base"

    after = {
        (r["user_id"], r["job_id"], r["url_id"]): (r["status"], r["retries"], r["round"])
        for r in load_frontier(spark, cat).collect()
    }
    assert after == before
    # resume continues cleanly from the retained chain
    ms = run_crawl(spark, cat, pages, cfg=CrawlConfig(max_rounds=3, compact_every=3, global_budget=6))
    assert ms, "resume after expiration must run"
    # idempotent when nothing is expirable
    cat.expire_snapshots(FRONTIER_TABLE, keep_bases=1)
    import pytest as _pt

    with _pt.raises(ValueError):
        cat.expire_snapshots(FRONTIER_TABLE, keep_bases=0)
