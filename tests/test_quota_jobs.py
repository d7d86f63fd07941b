"""Per-user api_requests quota (A5) + derived job status bookkeeping.

Reference observables mirrored:
- context.py:147-150 — each completion decrements the user's
  api_requests counter; here additionally no user can exceed it (budget
  2 with 3 crawlable URLs ⇒ 2 complete, 1 still pending, counter 0).
- pg_crawl_job_worker.py:123-136 + tests/integration/
  test_pg_crawl_job_worker.py:97-135 — job-granularity status: running
  while URLs remain, and run_job flips a finished job back to running.
"""

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark import fixtures
from xtracted_crawlers_spark import quota as QT
from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
from xtracted_crawlers_spark.crawl import CrawlConfig, load_frontier, rerun_job, run_crawl


@pytest.fixture(scope="module")
def qcorpus(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("qcorpus"))
    return fixtures.write_corpus(spark, out, 40, 12, n_hosts=3)


def _users(spark, corpus):
    return [
        r["user_id"]
        for r in spark.read.parquet(corpus["seeds"]).select("user_id").distinct().collect()
    ]


def test_quota_blocks_beyond_budget_and_decrements(spark, qcorpus, tmp_path):
    pages = spark.read.parquet(qcorpus["pages"])
    seeds = spark.read.parquet(qcorpus["seeds"])
    users = _users(spark, qcorpus)
    capped, free = users[0], users[1]

    # how many of capped's URLs are actually crawlable (present in pages)?
    crawlable = (
        seeds.filter(F.col("user_id") == capped)
        .join(pages.select("url"), "url", "inner")
        .count()
    )
    assert crawlable >= 3, "fixture must give the capped user >=3 crawlable URLs"
    budget = 2

    quota = spark.createDataFrame(
        [(capped, budget), (free, 10**6)], "user_id string, requests long"
    )
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    run_crawl(spark, cat, pages, seeds, cfg=CrawlConfig(max_rounds=10), quota=quota)

    fr = load_frontier(spark, cat)
    by_status = {
        (r["user_id"], r["status"]): r["n"]
        for r in fr.groupBy("user_id", "status").agg(F.count("*").alias("n")).collect()
    }
    # reference observable: budget 2 ⇒ exactly 2 completions, the rest of
    # the crawlable URLs still pending (never attempted, not failed)
    assert by_status.get((capped, "complete"), 0) == budget
    assert by_status.get((capped, "pending"), 0) >= crawlable - budget

    q = {r["user_id"]: r["requests"] for r in cat.load(spark, QT.QUOTA_TABLE).collect()}
    assert q[capped] == 0  # decremented once per completion
    assert q[free] == 10**6 - sum(
        n for (u, s), n in by_status.items() if u == free and s == "complete"
    )

    # metrics record the exclusions
    hist = [m.metrics for m in cat.history("frontier")]
    assert any(m.get("quota_excluded", 0) > 0 for m in hist)


def test_job_status_lifecycle(spark, qcorpus, tmp_path):
    pages = spark.read.parquet(qcorpus["pages"])
    seeds = spark.read.parquet(qcorpus["seeds"])
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh2"))
    run_crawl(spark, cat, pages, seeds, cfg=CrawlConfig(max_rounds=10))

    jobs = {(r["user_id"], r["job_id"]): r for r in cat.load(spark, QT.JOBS_TABLE).collect()}
    fr = load_frontier(spark, cat)
    assert jobs, "jobs table must be committed per round"
    # every job finished: no selectable rows remain, so all 'complete'
    assert all(r["job_status"] == "complete" for r in jobs.values())
    n_fr = fr.count()
    assert sum(r["n_total"] for r in jobs.values()) == n_fr
    for r in jobs.values():
        assert r["n_complete"] + r["n_given_up"] <= r["n_total"]
        assert r["last_fetched_round"] is not None  # heartbeat recorded

    # run_job on a finished job flips it back to running (reference
    # test_pg_crawl_job_worker 'job status running after run_job')
    (user_id, job_id) = next(iter(jobs))
    rerun_job(spark, cat, user_id, job_id)
    jobs2 = {(r["user_id"], r["job_id"]): r for r in cat.load(spark, QT.JOBS_TABLE).collect()}
    assert jobs2[(user_id, job_id)]["job_status"] == "running"
    # other jobs' derived state untouched
    for k, r in jobs2.items():
        if k != (user_id, job_id):
            assert r["job_status"] == jobs[k]["job_status"]

    # finish the rerun: back to complete
    run_crawl(spark, cat, pages, cfg=CrawlConfig(max_rounds=10))
    jobs3 = {(r["user_id"], r["job_id"]): r for r in cat.load(spark, QT.JOBS_TABLE).collect()}
    assert jobs3[(user_id, job_id)]["job_status"] == "complete"


def test_apply_quota_order_matches_scheduler(spark):
    """The quota cut must keep the FIRST rows in crawl order (priority,
    seq) — not arbitrary rows."""
    rows = [
        ("u", 1, f"B{i}", f"https://h.test/dp/B{i}", 0 if i < 2 else 1, i + 1)
        for i in range(6)
    ]
    sel = spark.createDataFrame(
        rows,
        "user_id string, job_id long, url_id string, url string, priority int, job_urls_seq long",
    )
    quota = spark.createDataFrame([("u", 3)], "user_id string, requests long")
    kept = sorted(r["url_id"] for r in QT.apply_quota(sel, quota).collect())
    # priority 0 rows (B0, B1) first, then lowest seq among priority 1 (B2)
    assert kept == ["B0", "B1", "B2"]
    # NULL requests = unlimited; absent user = unlimited
    quota_null = spark.createDataFrame([("u", None)], "user_id string, requests long")
    assert QT.apply_quota(sel, quota_null).count() == 6
    other = spark.createDataFrame([("someone-else", 1)], "user_id string, requests long")
    assert QT.apply_quota(sel, other).count() == 6


def test_incremental_jobs_equals_full_derive(spark, qcorpus, tmp_path):
    """The per-round incremental jobs update (job_status_delta) must end
    at exactly the state a full derive from the final frontier gives."""
    pages = spark.read.parquet(qcorpus["pages"])
    seeds = spark.read.parquet(qcorpus["seeds"])
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh3"))
    run_crawl(spark, cat, pages, seeds, cfg=CrawlConfig(max_rounds=10))
    # >1 jobs snapshot means incremental path actually ran after round 1
    assert len(cat.snapshots(QT.JOBS_TABLE)) > 1
    committed = {
        (r["user_id"], r["job_id"]): (
            r["job_status"], r["n_total"], r["n_complete"], r["n_given_up"],
            r["last_fetched_round"],
        )
        for r in cat.load(spark, QT.JOBS_TABLE).collect()
    }
    derived = {
        (r["user_id"], r["job_id"]): (
            r["job_status"], r["n_total"], r["n_complete"], r["n_given_up"],
            r["last_fetched_round"],
        )
        for r in QT.job_status(load_frontier(spark, cat)).collect()
    }
    assert committed == derived


def test_ingest_into_existing_job_updates_job_totals(spark, tmp_path):
    """Round-2 advice (medium): a mid-crawl seed ingest into an EXISTING
    job must update the jobs table's n_total immediately — otherwise the
    incremental job_status_delta path leaves n_total stale (counters sum
    beyond total, job flips 'complete' while ingested URLs are pending)."""
    from xtracted_crawlers_spark.crawl import bootstrap

    pages = fixtures.gen_pages(spark, 10, n_hosts=2, partitions=1)
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh_ing"))
    seeds1 = spark.createDataFrame(
        [("u", 1, 0, fixtures.page_url(0, 2))],
        "user_id string, job_id long, seed_idx int, url string",
    )
    run_crawl(spark, cat, pages, seeds1, cfg=CrawlConfig(max_rounds=5))
    j1 = cat.load(spark, QT.JOBS_TABLE).collect()
    assert len(j1) == 1 and j1[0]["n_total"] == 1 and j1[0]["job_status"] == "complete"

    # ingest a SECOND url into the finished job (bootstrap on an existing
    # frontier = the mid-crawl ingest path)
    seeds2 = spark.createDataFrame(
        [("u", 1, 1, fixtures.page_url(1, 2))],
        "user_id string, job_id long, seed_idx int, url string",
    )
    bootstrap(spark, cat, seeds2)
    j2 = cat.load(spark, QT.JOBS_TABLE).collect()
    assert j2[0]["n_total"] == 2, "jobs table must learn the ingested row's total"
    assert j2[0]["n_complete"] == 1
    assert j2[0]["job_status"] == "running", "new pending URL must reopen the job"

    # finish the crawl: the incremental path must converge to the full derive
    run_crawl(spark, cat, pages, cfg=CrawlConfig(max_rounds=5))
    j3 = {(r["user_id"], r["job_id"]): r for r in cat.load(spark, QT.JOBS_TABLE).collect()}
    full = {(r["user_id"], r["job_id"]): r for r in QT.job_status(load_frontier(spark, cat)).collect()}
    for k in full:
        for c in ("job_status", "n_total", "n_complete", "n_given_up"):
            assert j3[k][c] == full[k][c], (k, c, j3[k][c], full[k][c])
    assert j3[("u", 1)]["n_total"] == 2 and j3[("u", 1)]["n_complete"] == 2
    assert j3[("u", 1)]["job_status"] == "complete"


def test_quota_parity_engine_vs_simulator(spark, qcorpus, tmp_path):
    """Engine with per-user quota must reach the same final frontier
    state AND the same remaining budgets as the pure-Python simulator."""
    from xtracted_crawlers_spark.simulator import ReferenceSimulator

    pages_df = spark.read.parquet(qcorpus["pages"])
    seeds_df = spark.read.parquet(qcorpus["seeds"])
    users = _users(spark, qcorpus)
    budgets = {u: 3 + i for i, u in enumerate(sorted(users))}

    quota = spark.createDataFrame(list(budgets.items()), "user_id string, requests long")
    cat = ParquetSnapshotCatalog(str(tmp_path / "whp"))
    run_crawl(spark, cat, pages_df, seeds_df, cfg=CrawlConfig(max_rounds=10), quota=quota)

    pages = {r["url"]: bytes(r["html"]).decode() for r in pages_df.collect()}
    sim = ReferenceSimulator(pages, quota=dict(budgets))
    by_job: dict = {}
    for s in sorted(seeds_df.collect(), key=lambda r: (r["user_id"], r["job_id"], r["seed_idx"])):
        by_job.setdefault((s["user_id"], s["job_id"]), []).append(s["url"])
    for (u, j), urls in sorted(by_job.items()):
        sim.submit(u, j, urls)
    sim.run(max_rounds=10)

    eng = {
        (r["user_id"], r["job_id"], r["url_id"]): (r["status"], r["retries"])
        for r in load_frontier(spark, cat).collect()
    }
    simst = {
        (r["user_id"], r["job_id"], r["url_id"]): (r["status"], r["retries"])
        for r in sim.frontier_rows()
    }
    assert eng == simst
    eng_quota = {r["user_id"]: r["requests"] for r in cat.load(spark, QT.QUOTA_TABLE).collect()}
    assert eng_quota == sim.quota


def test_external_frontier_writer_triggers_jobs_recommit(spark, qcorpus, tmp_path):
    """The optimistic jobs-delta write (round 4): an EXTERNAL writer that
    commits frontier rows for a job the jobs table has never seen trips
    the ride-along unseen observation, and the corrective full-derive
    recommit repairs the jobs table before the round returns."""
    from xtracted_crawlers_spark import frontier as FR
    from xtracted_crawlers_spark.crawl import FRONTIER_TABLE, run_round

    pages = spark.read.parquet(qcorpus["pages"])
    seeds = spark.read.parquet(qcorpus["seeds"])
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh_ext"))
    cfg = CrawlConfig(max_rounds=2)
    run_crawl(spark, cat, pages, seeds, cfg=cfg)

    # simulate an external writer: frontier rows for a brand-new job
    # appended WITHOUT jobs_apply_ingest (bypassing bootstrap)
    fr = load_frontier(spark, cat)
    foreign = (
        fr.limit(3)
        .withColumn("job_id", F.lit(9999).cast(fr.schema["job_id"].dataType))
        .withColumn("url_id", F.concat(F.lit("X"), F.col("url_id")))
        .withColumn("status", F.lit("pending"))
        .withColumn("retries", F.lit(0))
        .withColumn("round", F.lit(0))
    )
    cat.commit(
        fr.unionByName(foreign), FRONTIER_TABLE, metrics={"event": "external", "kind": "base"}
    )
    hist_before = len(cat.history(QT.JOBS_TABLE))
    m = run_round(spark, cat, pages, 50, cfg)
    assert m["selected"] > 0  # the foreign pending rows are selectable
    # corrective recommit happened: two jobs commits for this round
    hist = cat.history(QT.JOBS_TABLE)
    assert len(hist) == hist_before + 2
    assert hist[-1].metrics.get("event") == "job_status_full_recommit"
    # and the final jobs table knows the foreign job with correct totals
    jobs = {
        (r["user_id"], r["job_id"]): r
        for r in cat.load(spark, QT.JOBS_TABLE).collect()
    }
    foreign_rows = [r for (u, j), r in jobs.items() if j == 9999]
    assert len(foreign_rows) == len({r["user_id"] for r in foreign.collect()})
    derived = {
        (r["user_id"], r["job_id"]): r
        for r in QT.job_status(load_frontier(spark, cat)).collect()
    }
    for k, r in derived.items():
        assert jobs[k]["n_total"] == r["n_total"], k
        assert jobs[k]["n_complete"] == r["n_complete"], k
