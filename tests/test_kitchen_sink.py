"""Feature-composition crawls: every opt-in politeness feature ON at
once. Each feature is parity- or unit-tested in isolation elsewhere;
the risk zone is their interaction order (robots gate → host budget →
domain cut → global cut → quota; filter/trap/jobs state commits), so
this file runs the full stack end-to-end.

1. Engine ≡ simulator with robots + carry-over token buckets +
   fair_users + domain_budget + per-user quota simultaneously.
2. A smoke of the engine-only features the simulator doesn't model
   (variant expansion + cuckoo seen filter + trap quarantine) stacked
   on top — resumable, state tables all committed and consistent.
"""

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark import fixtures
from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
from xtracted_crawlers_spark.crawl import (
    TRAP_STATE_TABLE, CrawlConfig, load_frontier, run_crawl,
)
from xtracted_crawlers_spark.simulator import ReferenceSimulator


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ks_corpus"))
    return fixtures.write_corpus(spark, out, 60, 40, n_hosts=6)


def _final_state(spark, catalog):
    return {
        (r["user_id"], r["job_id"], r["url_id"]): r
        for r in load_frontier(spark, catalog).collect()
    }


def test_all_politeness_features_parity(spark, corpus, tmp_path):
    pages_df = spark.read.parquet(corpus["pages"])
    seeds_df = spark.read.parquet(corpus["seeds"])
    robots_df = spark.read.parquet(corpus["robots"])
    quota_df = spark.createDataFrame(
        # tight budget for the first user, unlimited for the rest
        [(r["user_id"], 7) for r in seeds_df.select("user_id").distinct().collect()][:1],
        "user_id string, requests long",
    )
    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(
        global_budget=12,
        max_rounds=25,
        round_seconds=60.0,
        token_carryover=True,
        fair_users=True,
        domain_budget=3,
        frontier_storage="delta",
        compact_every=4,
    )
    run_crawl(spark, catalog, pages_df, seeds_df, robots=robots_df,
              cfg=cfg, quota=quota_df)

    pages = {r["url"]: bytes(r["html"]).decode() for r in pages_df.collect()}
    robots = {r["host"]: r["robots_txt"] for r in robots_df.collect()}
    max_tokens = {r["host"]: r["max_tokens"] for r in robots_df.collect()}
    quota = {r["user_id"]: r["requests"] for r in quota_df.collect()}
    sim = ReferenceSimulator(
        pages, robots=robots, max_tokens=max_tokens, round_seconds=60.0,
        global_budget=12, token_carryover=True, fair_users=True,
        domain_budget=3, quota=quota,
    )
    by_job: dict = {}
    for s in sorted(
        seeds_df.collect(), key=lambda r: (r["user_id"], r["job_id"], r["seed_idx"])
    ):
        by_job.setdefault((s["user_id"], s["job_id"]), []).append(s["url"])
    for (u, j), urls in sorted(by_job.items()):
        sim.submit(u, j, urls)
    sim.run(max_rounds=25)

    eng = _final_state(spark, catalog)
    srows = {(r["user_id"], r["job_id"], r["url_id"]): r for r in sim.frontier_rows()}
    assert set(eng) == set(srows), "URL-seen set differs"
    for k, s in srows.items():
        assert eng[k]["status"] == s["status"], k
        assert eng[k]["retries"] == s["retries"], k
        assert eng[k]["job_urls_seq"] == s["job_urls_seq"], k
        assert eng[k]["payload_json"] == s["payload_json"], k


def test_engine_only_features_stack_and_resume(spark, corpus, tmp_path):
    """expansion + cuckoo filter + trap quarantine + domain budget all
    ON: runs, resumes, and every auxiliary state table stays consistent
    (filter covers the frontier; trap state counts it)."""
    from xtracted_crawlers_spark import cuckoo
    from xtracted_crawlers_spark.operators import traps

    pages_df = spark.read.parquet(corpus["pages"])
    seeds_df = spark.read.parquet(corpus["seeds"]).limit(12)
    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(
        max_rounds=3,
        expand_variants=True,
        seen_filter="cuckoo",
        bloom_buckets=8,
        cuckoo_expected_per_bucket=512,
        trap_quarantine=True,
        domain_budget=50,
        global_budget=40,
    )
    m1 = run_crawl(spark, catalog, pages_df, seeds_df, cfg=cfg)
    assert any(x.get("discovered", 0) > 0 for x in m1)
    # resume: no seeds, continues from committed state
    m2 = run_crawl(spark, catalog, pages_df, None, cfg=cfg)
    assert m2, "resume ran no rounds"
    fr = load_frontier(spark, catalog)
    keys = fr.select("user_id", "job_id", "url_id")
    filt = catalog.load(spark, "seen_cuckoo")
    flagged = cuckoo.cuckoo_maybe_seen(keys, filt, 8)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
    state = catalog.load(spark, TRAP_STATE_TABLE)
    v = traps.trap_verdicts(state).collect()
    assert sum(r["n_urls"] for r in v) == fr.count()
    assert not any(r["is_trap"] for r in v)  # product URL space is clean
