"""Crawl-trap detection (operators/traps.py): calendar/path-repetition
loops, session-id parameter explosions, clean hosts stay unflagged, and
the scheduler-side quarantine join."""

from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators import traps


def _urls(spark):
    rows = []
    # calendar trap: repeated segments, growing depth
    for i in range(6):
        rows.append(("https://cal.test/cal" + "/2024/01" * (i + 1),))
    # session-id explosion: one path, many queries
    for i in range(30):
        rows.append((f"https://sid.test/p?sid=s{i:04d}",))
    # deep-but-distinct host: depth over the limit, no repeats
    rows.append(("https://deep.test/" + "/".join(f"s{j}" for j in range(12)),))
    # clean host: distinct product paths, some queries
    for i in range(30):
        q = "?ref=x" if i % 3 == 0 else ""
        rows.append((f"https://ok.test/dp/B{i:09d}{q}",))
    return spark.createDataFrame(rows, "url string")


def test_trap_hosts_flags_each_shape(spark):
    out = {r["host"]: r.asDict() for r in traps.trap_hosts(_urls(spark)).collect()}
    assert out["cal.test"]["is_trap"] and out["cal.test"]["n_looping"] > 0
    assert out["sid.test"]["is_trap"] and out["sid.test"]["n_paths"] == 1
    assert out["deep.test"]["is_trap"]  # depth > 8 counts as looping
    assert not out["ok.test"]["is_trap"], out["ok.test"]
    # the explosion rule needs the overflow to be query-borne: a host
    # with 30 urls on 10 paths but NO queries is not a session trap
    dup_no_q = spark.createDataFrame(
        [(f"https://d.test/p{i % 10}/x{i % 10}",) for i in range(30)], "url string"
    )
    d = traps.trap_hosts(dup_no_q).collect()[0]
    assert d["n_urls"] == 30 and d["n_paths"] == 10 and not d["is_trap"]


def test_url_trap_features_values(spark):
    df = spark.createDataFrame(
        [
            ("https://h.test/cal/2024/01/2024/01",),
            ("https://h.test/a/b/c?x=1",),
            ("https://h.test/",),
        ],
        "url string",
    )
    rows = traps.url_trap_features(df).orderBy("url").collect()
    by_path = {r["path"]: r for r in rows}
    r = by_path["/cal/2024/01/2024/01"]
    assert r["depth"] == 5 and r["seg_repeat"] == 3 and not r["has_query"]
    r = by_path["/a/b/c"]
    assert r["depth"] == 3 and r["seg_repeat"] == 1 and r["has_query"]
    r = by_path["/"]
    assert r["depth"] == 0 and r["seg_repeat"] == 0


def test_quarantine_drops_only_trap_hosts(spark):
    urls = _urls(spark)
    t = traps.trap_hosts(urls)
    sel = urls.withColumn(
        "host", F.lower(F.regexp_extract("url", "://([^/?#]*)", 1))
    )
    kept = traps.quarantine(sel, t)
    hosts = {r["host"] for r in kept.select("host").distinct().collect()}
    assert hosts == {"ok.test"}
    from xtracted_crawlers_spark import plans

    assert plans.has_broadcast_join(kept)  # trap table is per-host tiny


def test_trap_detector_is_map_side_plus_one_shuffle(spark):
    """Plan guard: the detector reads the input once and shuffles only
    the per-host partial aggregates — no window, no join, no Python."""
    from xtracted_crawlers_spark import plans

    out = traps.trap_hosts(_urls(spark))
    assert plans.python_eval_nodes(out) == []
    plan = plans.physical_plan(out)
    assert "Window" not in plan and "Join" not in plan
    assert plan.count("Exchange") <= 2  # partial agg + countDistinct expand


def test_crawl_loop_trap_quarantine(spark, tmp_path):
    """CrawlConfig.trap_quarantine: rows on a trap host (routable ASIN
    URLs whose paths loop — the shape variant expansion can discover)
    are never selected, so they stay pending with zero retries while
    clean hosts progress; with the flag off the same rows burn
    retries."""
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, load_frontier, run_crawl

    seeds = spark.createDataFrame(
        [("u", 1, i, f"https://trap.test/dp/B0{i:08d}" + "/2024/01" * 4)
         for i in range(6)]
        + [("u", 1, 100 + i, f"https://ok.test/dp/BT{i:08d}") for i in range(6)],
        "user_id string, job_id long, seed_idx int, url string",
    )
    pages = spark.createDataFrame([], "url string, html binary, text string")
    states = {}
    for flag in (True, False):
        cat = ParquetSnapshotCatalog(str(tmp_path / f"wh_{flag}"))
        run_crawl(spark, cat, pages, seeds,
                  cfg=CrawlConfig(max_rounds=2, trap_quarantine=flag))
        states[flag] = {
            r["url_id"]: r for r in load_frontier(spark, cat).collect()
        }
    on, off = states[True], states[False]
    trap_ids = {k for k, r in on.items() if "trap.test" in r["url"]}
    assert trap_ids and len(on) == 12
    for k in trap_ids:
        assert on[k]["retries"] == 0 and on[k]["status"] == "pending", k
        assert off[k]["retries"] > 0, k  # unguarded: budget burned
    for k in set(on) - trap_ids:  # clean host progressed in both modes
        assert on[k]["retries"] > 0, k


def test_trap_state_matches_exact_rollup(spark):
    """The incremental per-host state (host_trap_state → trap_verdicts,
    HLL paths) agrees with the exact one-shot rollup on every verdict,
    and merging two halves equals building from the whole (the
    mergeability the round loop relies on)."""
    urls = _urls(spark)
    exact = {r["host"]: r["is_trap"] for r in traps.trap_hosts(urls).collect()}
    whole = traps.trap_verdicts(traps.host_trap_state(urls))
    got = {r["host"]: r["is_trap"] for r in whole.collect()}
    assert got == exact
    # split-merge equivalence (HLL union + counter sums)
    a = urls.filter(F.xxhash64("url") % 2 == 0)
    b = urls.filter(F.xxhash64("url") % 2 != 0)
    merged = traps.merge_trap_state(
        traps.host_trap_state(a), traps.host_trap_state(b)
    )
    got2 = {r["host"]: r["is_trap"] for r in traps.trap_verdicts(merged).collect()}
    assert got2 == exact
    # n_paths estimates are exact at these cardinalities (HLL sparse mode)
    exact_paths = {r["host"]: r["n_paths"] for r in traps.trap_hosts(urls).collect()}
    est_paths = {r["host"]: r["n_paths"] for r in traps.trap_verdicts(merged).collect()}
    assert est_paths == exact_paths


def test_crawl_trap_state_is_incremental(spark, tmp_path):
    """The round loop seeds trap_state once and folds only discoveries;
    a mid-crawl bootstrap folds its ingested rows — the committed state
    covers the whole frontier without any per-round frontier rescan."""
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import (
        TRAP_STATE_TABLE, CrawlConfig, bootstrap, load_frontier, run_crawl,
    )

    seeds = spark.createDataFrame(
        [("u", 1, i, f"https://ok.test/dp/BT{i:08d}") for i in range(6)],
        "user_id string, job_id long, seed_idx int, url string",
    )
    pages = spark.createDataFrame([], "url string, html binary, text string")
    cat = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    cfg = CrawlConfig(max_rounds=2, trap_quarantine=True)
    run_crawl(spark, cat, pages, seeds, cfg=cfg)
    assert cat.exists(TRAP_STATE_TABLE)
    # mid-crawl ingest on a NEW trap host folds into the state
    extra = spark.createDataFrame(
        [("u", 1, 100 + i, f"https://trap.test/dp/B0{i:08d}" + "/2024/01" * 4)
         for i in range(4)],
        "user_id string, job_id long, seed_idx int, url string",
    )
    bootstrap(spark, cat, extra, cfg=cfg)
    state = cat.load(spark, TRAP_STATE_TABLE)
    v = {r["host"]: r for r in traps.trap_verdicts(state).collect()}
    assert v["trap.test"]["is_trap"] and not v["ok.test"]["is_trap"]
    # state covers the full frontier's URL counts
    n_frontier = load_frontier(spark, cat).count()
    assert sum(r["n_urls"] for r in v.values()) == n_frontier
