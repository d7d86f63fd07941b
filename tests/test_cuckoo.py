"""Partitioned cuckoo filter: no false negatives (the safety contract),
bounded false-positive rate, deletion (the capability bloom lacks),
incremental merge, and the sliding-window seen-set composition."""

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark import cuckoo

N_BUCKETS = 8


def _keys(spark, lo, hi, job=1):
    return (
        spark.range(lo, hi)
        .select(
            F.concat(F.lit("u"), (F.col("id") % 5).cast("string")).alias("user_id"),
            F.lit(job).cast("long").alias("job_id"),
            F.concat(F.lit("B0"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("url_id"),
        )
    )


@pytest.fixture(scope="module")
def filt(spark):
    return cuckoo.build_cuckoo(
        _keys(spark, 0, 5000), n_buckets=N_BUCKETS, expected_per_bucket=1500
    ).cache()


def test_no_false_negatives(spark, filt):
    probed = cuckoo.cuckoo_maybe_seen(_keys(spark, 0, 5000), filt, N_BUCKETS)
    assert probed.count() == 5000
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_bounded(spark, filt):
    fresh = cuckoo.cuckoo_maybe_seen(_keys(spark, 100_000, 120_000), filt, N_BUCKETS)
    fp = fresh.filter(F.col("maybe_seen")).count()
    # 16-bit fingerprints, 2 buckets x 4 slots: fpr ~ 8/65535 ~ 0.012%
    assert fp / 20_000 < 0.005, fp


def test_merge_then_probe(spark, filt):
    merged = cuckoo.merge_cuckoo(filt, _keys(spark, 5000, 6000), N_BUCKETS)
    probed = cuckoo.cuckoo_maybe_seen(_keys(spark, 0, 6000), merged, N_BUCKETS)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_delete_retires_exactly_the_window(spark, filt):
    """The sliding-window path: retire keys 0..2000, keep 2000..5000 —
    deleted keys (minus fingerprint collisions) probe fresh again,
    retained keys still always hit."""
    smaller = cuckoo.delete_cuckoo(filt, _keys(spark, 0, 2000), N_BUCKETS).cache()
    kept = cuckoo.cuckoo_maybe_seen(_keys(spark, 2000, 5000), smaller, N_BUCKETS)
    assert kept.filter(~F.col("maybe_seen")).count() == 0  # never a false negative
    retired = cuckoo.cuckoo_maybe_seen(_keys(spark, 0, 2000), smaller, N_BUCKETS)
    still = retired.filter(F.col("maybe_seen")).count()
    # residual hits are only fingerprint collisions with retained keys
    assert still / 2000 < 0.005, still
    smaller.unpersist()


def test_filter_is_compact(spark, filt):
    rows = filt.collect()
    assert len(rows) == N_BUCKETS
    total = sum(len(r["table"]) for r in rows)
    # 5000 keys in ~2 bytes/slot tables: well under 100 KB total
    assert total < 100_000, total


def test_prunes_exact_antijoin_like_bloom(spark, filt):
    """Composition check: filter says 'definitely new' for most fresh
    candidates, so the exact anti-join's probe side shrinks to ~the
    true duplicates — same contract seen.dedup_new_urls relies on."""
    cand = _keys(spark, 4000, 7000)  # 1000 dupes + 2000 fresh
    probed = cuckoo.cuckoo_maybe_seen(cand, filt, N_BUCKETS)
    maybe = probed.filter(F.col("maybe_seen"))
    n_maybe = maybe.count()
    assert 1000 <= n_maybe < 1000 + 20  # dupes + at most a few collisions
    existing = _keys(spark, 0, 5000)
    truly_new = probed.join(existing, ["user_id", "job_id", "url_id"], "left_anti")
    assert truly_new.count() == 2000


def test_merge_into_initially_empty_buckets(spark):
    """Regression: build from a tiny seed set (most of the 64 partitions
    untouched), merge keys that hash to the empty buckets — every merged
    key must probe maybe_seen (the old code silently dropped them)."""
    seed = _keys(spark, 0, 30)
    filt = cuckoo.build_cuckoo(seed, n_buckets=64, expected_per_bucket=100)
    assert filt.count() == 64  # every bucket has state, touched or not
    merged = cuckoo.merge_cuckoo(filt, _keys(spark, 30, 400), n_buckets=64)
    probed = cuckoo.cuckoo_maybe_seen(_keys(spark, 0, 400), merged, 64)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_overfull_filter_never_false_negative(spark):
    """Regression: insert far past the sized capacity — kick-exhausted
    fingerprints (which may be displaced VICTIMS of earlier inserts)
    must land in the stash, not be dropped."""
    filt = cuckoo.build_cuckoo(
        _keys(spark, 0, 200), n_buckets=2, expected_per_bucket=64, slots=2
    )
    over = cuckoo.merge_cuckoo(filt, _keys(spark, 200, 2000), n_buckets=2)
    rows = over.collect()
    assert sum(len(r["stash"]) for r in rows) > 0, "expected stash use at this load"
    probed = cuckoo.cuckoo_maybe_seen(_keys(spark, 0, 2000), over, 2)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    # delete drains stash entries too
    smaller = cuckoo.delete_cuckoo(over, _keys(spark, 0, 2000), 2)
    left = sum(
        (r["stash"] is not None and len(r["stash"]))
        + sum(1 for b in memoryview(r["table"]).cast("H") if b != 0)
        for r in smaller.collect()
    )
    # fingerprint collisions mean a few duplicate fps shared one slot;
    # the table must be nearly empty after deleting everything
    assert left < 60, left


def test_probe_raises_on_bucket_count_mismatch(spark):
    """Probing with a different n_buckets than the build must fail loudly
    (merge/delete already did): candidates that hash to a bucket with no
    state row would otherwise come back maybe_seen=False — a silent
    false negative for every such key."""
    filt = cuckoo.build_cuckoo(_keys(spark, 0, 100), n_buckets=4)
    with pytest.raises(Exception, match="n_buckets"):
        cuckoo.cuckoo_maybe_seen(_keys(spark, 0, 100), filt, n_buckets=64).collect()


# --- crawl-loop wiring: seen_filter='cuckoo' -------------------------------


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    from xtracted_crawlers_spark import fixtures

    out = str(tmp_path_factory.mktemp("cuckoo_corpus"))
    return fixtures.write_corpus(spark, out, 60, 40, n_hosts=6)


def test_crawl_parity_bloom_vs_cuckoo(spark, corpus, tmp_path):
    """Both filters are PRE-filters — the exact anti-join is the
    authority — so a crawl with seen_filter='cuckoo' must end in a final
    frontier byte-identical to the bloom run on the same corpus, while
    committing its own seen_cuckoo snapshots at the frontier commit
    points (resume-consistent pair)."""
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, load_frontier, run_crawl

    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"]).limit(10)
    states = {}
    for kind in ("bloom", "cuckoo"):
        cat = ParquetSnapshotCatalog(str(tmp_path / kind))
        cfg = CrawlConfig(
            max_rounds=3,
            expand_variants=True,
            seen_filter=kind,
            bloom_buckets=N_BUCKETS,
            cuckoo_expected_per_bucket=512,
        )
        metrics = run_crawl(spark, cat, pages, seeds, cfg=cfg)
        assert any(m.get("discovered", 0) > 0 for m in metrics)
        assert cat.exists(f"seen_{kind}")
        states[kind] = {
            (r["user_id"], r["job_id"], r["url_id"]): r
            for r in load_frontier(spark, cat).collect()
        }
    b, c = states["bloom"], states["cuckoo"]
    assert set(b) == set(c), "URL-seen set differs between filters"
    for k in b:
        for col in ("status", "retries", "job_urls_seq", "payload_json"):
            assert b[k][col] == c[k][col], (k, col)


def test_crawl_cuckoo_filter_state_covers_frontier(spark, corpus, tmp_path):
    """The committed seen_cuckoo state must answer maybe_seen=True for
    every key the crawl discovered or seeded (no false negatives across
    the merge/commit/reload cycle), and support retiring an expiry
    window via delete_cuckoo — the sliding-window re-crawl story."""
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, load_frontier, run_crawl

    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"]).limit(10)
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(
        max_rounds=3,
        expand_variants=True,
        seen_filter="cuckoo",
        bloom_buckets=N_BUCKETS,
        cuckoo_expected_per_bucket=512,
    )
    run_crawl(spark, cat, pages, seeds, cfg=cfg)
    filt = cat.load(spark, "seen_cuckoo")
    keys = load_frontier(spark, cat).select("user_id", "job_id", "url_id")
    flagged = cuckoo.cuckoo_maybe_seen(keys, filt, N_BUCKETS)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
    # retire a window: deleted keys stop probing as seen (modulo the
    # bounded FPR from OTHER keys' fingerprints), so a re-crawl would
    # re-admit them through the filter
    expire = keys.limit(5)
    pruned = cuckoo.delete_cuckoo(filt, expire, N_BUCKETS)
    still = cuckoo.cuckoo_maybe_seen(expire, pruned, N_BUCKETS)
    assert still.filter(F.col("maybe_seen")).count() <= 1  # FPR slack


def test_seen_filter_kind_validation():
    from xtracted_crawlers_spark.crawl import CrawlConfig, seen_filter_kind

    assert seen_filter_kind(CrawlConfig()) == "none"
    assert seen_filter_kind(CrawlConfig(use_bloom=True)) == "bloom"
    assert seen_filter_kind(CrawlConfig(seen_filter="cuckoo")) == "cuckoo"
    # explicit seen_filter wins over the legacy alias
    assert seen_filter_kind(CrawlConfig(use_bloom=True, seen_filter="cuckoo")) == "cuckoo"
    with pytest.raises(ValueError):
        seen_filter_kind(CrawlConfig(seen_filter="xor"))


def test_mid_crawl_bootstrap_keeps_filter_complete(spark, corpus, tmp_path):
    """Regression (round-5 review): a mid-crawl bootstrap (sitemap
    re-harvest / recurring ingest) adds frontier keys; the committed
    seen filter must learn them at the same commit point, or a later
    variant colliding with an ingested key would probe maybe_seen=False
    and bypass the exact anti-join. Checked for BOTH filter kinds: after
    a second bootstrap, every frontier key still probes maybe-seen."""
    from xtracted_crawlers_spark import seen
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import (
        CrawlConfig, bootstrap, load_frontier, run_crawl,
    )

    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    for kind, probe in (("cuckoo", cuckoo.cuckoo_maybe_seen),
                        ("bloom", seen.bloom_maybe_seen)):
        cfg = CrawlConfig(
            max_rounds=2,
            expand_variants=True,
            seen_filter=kind,
            bloom_buckets=N_BUCKETS,
            cuckoo_expected_per_bucket=512,
        )
        cat = ParquetSnapshotCatalog(str(tmp_path / f"wh_{kind}"))
        run_crawl(spark, cat, pages, seeds.limit(10), cfg=cfg)
        assert cat.exists(f"seen_{kind}")
        # mid-crawl ingest of NEW keys (rows 10..20 of the seed list)
        extra = seeds.subtract(seeds.limit(10)).limit(10)
        assert extra.count() > 0
        bootstrap(spark, cat, extra, cfg=cfg)
        filt = cat.load(spark, f"seen_{kind}")
        keys = load_frontier(spark, cat).select("user_id", "job_id", "url_id")
        flagged = probe(keys, filt, N_BUCKETS)
        assert flagged.filter(~F.col("maybe_seen")).count() == 0, kind
