"""End-to-end crawl: Spark engine vs the pure-Python reference simulator.

Same seeds + same pages + same politeness budget ⇒ identical final
frontier state: statuses, retries, job_urls_seq (crawl-order invariant
F1), URL-seen set, and byte-identical payload_json/text per url
(BASELINE.json north_rule + input_hint).
"""

import json

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark import fixtures
from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
from xtracted_crawlers_spark.crawl import CrawlConfig, FRONTIER_TABLE, load_frontier, run_crawl
from xtracted_crawlers_spark.simulator import ReferenceSimulator

N_PAGES, N_SEEDS, N_HOSTS = 60, 40, 6


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus"))
    paths = fixtures.write_corpus(spark, out, N_PAGES, N_SEEDS, n_hosts=N_HOSTS)
    return paths


def _sim_inputs(spark, corpus):
    pages = {
        r["url"]: bytes(r["html"]).decode()
        for r in spark.read.parquet(corpus["pages"]).collect()
    }
    seeds = sorted(
        spark.read.parquet(corpus["seeds"]).collect(),
        key=lambda r: (r["user_id"], r["job_id"], r["seed_idx"]),
    )
    robots = {
        r["host"]: r["robots_txt"] for r in spark.read.parquet(corpus["robots"]).collect()
    }
    max_tokens = {
        r["host"]: r["max_tokens"] for r in spark.read.parquet(corpus["robots"]).collect()
    }
    return pages, seeds, robots, max_tokens


def _run_sim(spark, corpus, with_robots, max_rounds=10, **kw):
    pages, seeds, robots, max_tokens = _sim_inputs(spark, corpus)
    sim = ReferenceSimulator(
        pages,
        robots=robots if with_robots else None,
        max_tokens=max_tokens if with_robots else None,
        **kw,
    )
    by_job: dict = {}
    for s in seeds:
        by_job.setdefault((s["user_id"], s["job_id"]), []).append(s["url"])
    for (u, j), urls in sorted(by_job.items()):
        sim.submit(u, j, urls)
    sim.run(max_rounds=max_rounds)
    return sim


def _final_state(spark, catalog):
    df = load_frontier(spark, catalog)
    return {
        (r["user_id"], r["job_id"], r["url_id"]): r
        for r in df.collect()
    }


def _assert_parity(engine_state, sim):
    sim_rows = {(r["user_id"], r["job_id"], r["url_id"]): r for r in sim.frontier_rows()}
    assert set(engine_state.keys()) == set(sim_rows.keys()), "URL-seen set differs"
    for key, s in sim_rows.items():
        e = engine_state[key]
        assert e["status"] == s["status"], (key, e["status"], s["status"])
        assert e["retries"] == s["retries"], (key, e["retries"], s["retries"])
        assert e["job_urls_seq"] == s["job_urls_seq"], (
            "crawl-order invariant broken",
            key,
            e["job_urls_seq"],
            s["job_urls_seq"],
        )
        assert e["payload_json"] == s["payload_json"], key  # byte-identical
        assert e["text"] == s["text"], key
        assert list(e["errors"]) == s["errors"], key


def test_parity_unbounded_budget(spark, corpus, tmp_path):
    """budget=∞ ⇒ the schedule degenerates to the reference's pure FIFO."""
    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    metrics = run_crawl(spark, catalog, pages, seeds, cfg=CrawlConfig(max_rounds=10))
    sim = _run_sim(spark, corpus, with_robots=False)
    _assert_parity(_final_state(spark, catalog), sim)
    # dead URLs exhausted their 3 retries
    assert any(m.get("fetch_missed", 0) > 0 for m in metrics)
    final = _final_state(spark, catalog)
    exhausted = [r for r in final.values() if r["retries"] >= 3]
    assert exhausted and all(len(r["errors"]) == 3 for r in exhausted)
    # no text mismatches: extraction reproduced the golden text everywhere
    assert all(m.get("text_mismatch", 0) == 0 for m in metrics)


def test_parity_with_politeness(spark, corpus, tmp_path):
    """robots rules + host budgets + global cut: same ordering both sides."""
    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    robots = spark.read.parquet(corpus["robots"])
    cfg = CrawlConfig(round_seconds=10.0, global_budget=7, max_rounds=20)
    run_crawl(spark, catalog, pages, seeds, robots=robots, cfg=cfg)
    sim = _run_sim(
        spark, corpus, with_robots=True, max_rounds=20, round_seconds=10.0, global_budget=7
    )
    _assert_parity(_final_state(spark, catalog), sim)


def test_parity_with_priority(spark, corpus, tmp_path):
    """Authority-priority scheduling parity: the same host_scores table
    drives both the engine (bootstrap → with_host_priority stamps
    log-decade buckets) and the simulator (the _host_priority twin).
    Under a tight global budget and bounded rounds the cross-host
    schedule — and therefore which rows completed at all — is
    priority-driven, so any bucket or ordering drift between the two
    implementations fails the final-state compare. One host is left
    unscored to exercise the absent→last-bucket path, and the
    priority-ordered run must differ from plain FIFO (i.e. the stamp
    actually changed the schedule)."""
    from xtracted_crawlers_spark.urlnorm import py_host

    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    hosts = sorted({py_host(r["url"]) for r in seeds.collect()})
    # spread hosts across decades: digits 1..3 → priorities 3,2,1;
    # the lexicographically last host stays unscored → priority 4
    scores = {h: 10 ** (i % 3) + i for i, h in enumerate(hosts[:-1])}
    hs_df = spark.createDataFrame(list(scores.items()), "host string, score long")

    cfg = CrawlConfig(global_budget=7, max_rounds=3, round_seconds=10.0)
    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    run_crawl(spark, catalog, pages, seeds, cfg=cfg, host_scores=hs_df)
    sim = _run_sim(
        spark, corpus, with_robots=False, max_rounds=3,
        round_seconds=10.0, global_budget=7, host_scores=scores,
    )
    engine_state = _final_state(spark, catalog)
    _assert_parity(engine_state, sim)
    # the stamped buckets themselves must match the twin
    sim_rows = {(r["user_id"], r["job_id"], r["url_id"]): r for r in sim.frontier_rows()}
    for key, e in engine_state.items():
        assert e["priority"] == sim_rows[key]["priority"], key

    # control: FIFO (no scores) must schedule a DIFFERENT completed set,
    # or the priority stamp was a no-op on this corpus
    cat_fifo = ParquetSnapshotCatalog(str(tmp_path / "fifo"))
    run_crawl(spark, cat_fifo, pages, seeds, cfg=cfg)
    done = lambda st: {k for k, r in st.items() if r["status"] == "complete"}
    assert done(engine_state) != done(_final_state(spark, cat_fifo))


def test_resume_from_snapshot(spark, corpus, tmp_path):
    """Kill between rounds, restart, final state identical to uninterrupted."""
    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    cfg_one = CrawlConfig(global_budget=10, max_rounds=1)
    cfg_all = CrawlConfig(global_budget=10, max_rounds=30)

    cat_a = ParquetSnapshotCatalog(str(tmp_path / "a"))
    run_crawl(spark, cat_a, pages, seeds, cfg=cfg_all)

    cat_b = ParquetSnapshotCatalog(str(tmp_path / "b"))
    run_crawl(spark, cat_b, pages, seeds, cfg=cfg_one)  # round 1 then "crash"
    run_crawl(spark, cat_b, pages, seeds, cfg=cfg_all)  # resume

    a = _final_state(spark, cat_a)
    b = _final_state(spark, cat_b)
    assert set(a) == set(b)
    for k in a:
        assert a[k]["status"] == b[k]["status"], k
        assert a[k]["job_urls_seq"] == b[k]["job_urls_seq"], k
        assert a[k]["payload_json"] == b[k]["payload_json"], k
    # lineage: every round left a manifest with metrics
    hist = cat_b.history(FRONTIER_TABLE)
    assert len(hist) >= 3
    assert all(m.files for m in hist)


def test_delta_storage_equals_full_rewrite(spark, corpus, tmp_path):
    """Merge-on-read delta commits (only touched rows per round, periodic
    compaction) must yield the same final state as full rewrites."""
    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    cat_d = ParquetSnapshotCatalog(str(tmp_path / "d"))
    cat_f = ParquetSnapshotCatalog(str(tmp_path / "f"))
    run_crawl(spark, cat_d, pages, seeds,
              cfg=CrawlConfig(global_budget=9, max_rounds=30,
                              frontier_storage="delta", compact_every=3))
    run_crawl(spark, cat_f, pages, seeds,
              cfg=CrawlConfig(global_budget=9, max_rounds=30, frontier_storage="full"))
    d, f = _final_state(spark, cat_d), _final_state(spark, cat_f)
    assert set(d) == set(f)
    for k in d:
        for col in ("status", "retries", "job_urls_seq", "payload_json", "errors"):
            assert d[k][col] == f[k][col], (k, col)
    kinds = [m.metrics.get("kind") for m in cat_d.history(FRONTIER_TABLE)]
    assert "delta" in kinds and kinds.count("base") >= 2  # bootstrap + compaction
    # delta snapshots are small: write amplification bounded by round size
    hist = cat_d.history(FRONTIER_TABLE)
    delta_bytes = [sum(fl["bytes"] for fl in m.files) for m in hist if m.metrics.get("kind") == "delta"]
    base_bytes = [sum(fl["bytes"] for fl in m.files) for m in hist if m.metrics.get("kind") == "base"]
    assert min(delta_bytes) < max(base_bytes)


def test_variant_expansion_discovers_new_urls(spark, corpus, tmp_path):
    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"]).limit(10)
    cfg = CrawlConfig(max_rounds=3, expand_variants=True, use_bloom=True, bloom_buckets=8)
    metrics = run_crawl(spark, catalog, pages, seeds, cfg=cfg)
    assert any(m.get("discovered", 0) > 0 for m in metrics)
    fr = load_frontier(spark, catalog)
    # discovered rows carry unique seqs continuing the per-user sequence
    per_user = fr.groupBy("user_id").agg(
        F.count("*").alias("n"), F.countDistinct("job_urls_seq").alias("d"),
        F.max("job_urls_seq").alias("mx"),
    ).collect()
    for r in per_user:
        assert r["n"] == r["d"] == r["mx"]
    # bloom state committed for resume
    assert catalog.exists("seen_bloom")


def test_rerun_job_resets_and_recrawls(spark, corpus, tmp_path):
    """Reference §3.1: rerunning a job resets its rows and re-crawls them;
    other jobs' state is untouched (pg_crawl_job_worker reset-on-rerun)."""
    from pyspark.sql import functions as F

    from xtracted_crawlers_spark.crawl import rerun_job

    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    run_crawl(spark, catalog, pages, seeds, cfg=CrawlConfig(max_rounds=10))
    before = _final_state(spark, catalog)
    target = next(k for k, r in before.items() if r["status"] == "complete")
    user_id, job_id, _ = target

    rerun_job(spark, catalog, user_id, job_id)
    mid = _final_state(spark, catalog)
    assert mid[target]["status"] == "pending"
    assert mid[target]["payload_json"] is None and mid[target]["retries"] == 0
    # rows of other (user, job) pairs untouched
    for k, r in mid.items():
        if (k[0], k[1]) != (user_id, job_id):
            assert r["status"] == before[k]["status"]
            assert r["payload_json"] == before[k]["payload_json"]

    run_crawl(spark, catalog, pages, cfg=CrawlConfig(max_rounds=10))
    after = _final_state(spark, catalog)
    # re-crawled to the same terminal state, byte-identical payloads
    for k, r in after.items():
        assert r["status"] == before[k]["status"], k
        assert r["payload_json"] == before[k]["payload_json"], k
        assert r["job_urls_seq"] == before[k]["job_urls_seq"], k  # seq survives reset
    # and the rerun-job rows were freshly attempted and re-extracted
    # (round numbering restarts after a rerun — a fresh job run)
    rerun_rows = [r for k, r in after.items() if (k[0], k[1]) == (user_id, job_id)
                  and r["status"] == "complete"]
    assert rerun_rows and all(r["payload_json"] is not None for r in rerun_rows)
    hist_events = [m.metrics.get("event") for m in catalog.history(FRONTIER_TABLE)]
    assert "rerun_job" in hist_events


def test_export_corpus_partitioned_and_gated(spark, corpus, tmp_path):
    """The training-data product: completed rows exported as parquet
    partitioned by predicted language, with quality/lang gates applied;
    text round-trips byte-identically and only complete rows ship."""
    import os

    from xtracted_crawlers_spark.crawl import export_corpus
    from xtracted_crawlers_spark.operators import textops

    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    run_crawl(spark, catalog, pages, seeds, cfg=CrawlConfig(max_rounds=10))

    out = str(tmp_path / "corpus_out")
    export_corpus(spark, catalog, out)
    back = spark.read.parquet(out)
    done = load_frontier(spark, catalog).filter(
        (F.col("status") == "complete") & F.col("text").isNotNull()
    )
    assert back.count() == done.count() > 0
    # hive partitioning on pred_lang, values match a recomputed lang_id
    parts = {d for d in os.listdir(out) if d.startswith("pred_lang=")}
    assert parts
    want = {r["url"]: r["l"] for r in done.select(
        "url", textops.lang_id(F.col("text")).alias("l")).collect()}
    got = {r["url"]: (r["pred_lang"], r["text"]) for r in back.collect()}
    src_text = {r["url"]: r["text"] for r in done.collect()}
    for u, (lang, text) in got.items():
        assert lang == want[u]
        assert text == src_text[u]  # byte-identical round trip
    # gates: an impossible quality floor ships nothing
    out2 = str(tmp_path / "corpus_out2")
    export_corpus(spark, catalog, out2, min_quality=2.0)
    assert spark.read.parquet(out2).count() == 0
    # lang allow-list keeps only those partitions
    out3 = str(tmp_path / "corpus_out3")
    export_corpus(spark, catalog, out3, langs=["en"])
    b3 = spark.read.parquet(out3)
    assert b3.count() == done.filter(textops.lang_id(F.col("text")) == "en").count()
    assert {r["pred_lang"] for r in b3.select("pred_lang").distinct().collect()} <= {"en"}


def test_full_product_crawl_export_split_pack(spark, corpus, tmp_path):
    """The engine's whole story in one lineage: crawl the fixture web,
    export the training corpus with a deterministic split stamp, then
    lay the train split into packed training windows — counts and
    offsets consistent end to end."""
    from xtracted_crawlers_spark.crawl import export_corpus
    from xtracted_crawlers_spark.operators import packing

    pages = spark.read.parquet(corpus["pages"])
    seeds = spark.read.parquet(corpus["seeds"])
    catalog = ParquetSnapshotCatalog(str(tmp_path / "wh"))
    run_crawl(spark, catalog, pages, seeds, cfg=CrawlConfig(max_rounds=10))

    out = str(tmp_path / "corpus_split")
    n = export_corpus(spark, catalog, out, split_fracs=(0.7, 0.15))
    back = spark.read.parquet(out)
    assert back.count() == n > 0
    splits = {r["split"] for r in back.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # stamp is deterministic: re-export agrees row for row
    out2 = str(tmp_path / "corpus_split2")
    export_corpus(spark, catalog, out2, split_fracs=(0.7, 0.15))
    j = back.select("url_id", "split").join(
        spark.read.parquet(out2).select("url_id", F.col("split").alias("s2")),
        "url_id",
    )
    assert j.filter(F.col("split") != F.col("s2")).count() == 0

    train = back.filter(F.col("split") == "train")
    plan = packing.pack_documents(
        train, window=64, n_shards=4, id_col="url_id", len_col="n_tokens"
    )
    assert plan.count() == train.count()
    stats = packing.packing_stats(plan, window=64)
    assert stats.agg(F.sum("n_tokens")).first()[0] == train.agg(
        F.sum("n_tokens")
    ).first()[0]
