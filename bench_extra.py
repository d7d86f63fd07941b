"""Round-6 profiling/benchmark extras (guide §1). bench.py is FROZEN for
measurement, so everything exploratory lives here:

- ``queries [name ...]``: per-query isolation with the noop sink
  (guide §1.4) — every column of every row computed, output discarded —
  plus the frozen bench's materialize-agg for comparison, and an
  .explain("formatted") dump to plans/r06/<name>_<tag>.txt.
- ``extract``: rep study of the extraction kernel (bench.py's
  crawl_extract entry) to separate cold-start from steady state.
- ``crawl``: the bench's crawl loop with per-phase wall timing
  (bootstrap / per-round) so the 4-actions-per-round budget is visible.

Usage: SPARK_GRAFT_SF_DIR=... python bench_extra.py <mode> [args...]
Results print as one JSON line per mode, mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
PLAN_TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "")  # "before"/"after" or "" = no dump


def _spark():
    from xtracted_crawlers_spark.session import get_spark

    spark = get_spark(app_name="xcs-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _materialize(df) -> int:
    from pyspark.sql import functions as F

    row = df.agg(F.count("*").alias("n"), F.max(F.xxhash64(*df.columns)).alias("chk")).first()
    return int(row["n"])


def _dump_plan(df, name: str) -> None:
    if not PLAN_TAG:
        return
    os.makedirs(PLAN_DIR, exist_ok=True)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    with open(os.path.join(PLAN_DIR, f"{name}_{PLAN_TAG}.txt"), "w") as f:
        f.write(plan)


def mode_queries(names: list[str]) -> None:
    import __spark_entry__ as entrymod

    spark = _spark()
    qs = entrymod.queries()
    names = names or list(qs)
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r06:{name}")
        noop_ts, mat_ts = [], []
        for _ in range(REPS):
            t0 = time.time()
            _noop(qs[name](spark, SF_DIR))
            noop_ts.append(round(time.time() - t0, 3))
        for _ in range(REPS):
            t0 = time.time()
            _materialize(qs[name](spark, SF_DIR))
            mat_ts.append(round(time.time() - t0, 3))
        _dump_plan(qs[name](spark, SF_DIR), name)
        out[name] = {
            "noop_med": round(median(noop_ts), 3), "noop": noop_ts,
            "mat_med": round(median(mat_ts), 3), "mat": mat_ts,
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"mode": "queries", "sf_dir": SF_DIR, "results": out}))


def mode_extract() -> None:
    from pyspark.sql import functions as F

    from xtracted_crawlers_spark.extract import with_extraction

    spark = _spark()
    import bench as benchmod

    pages_path = benchmod._ensure_pages(spark, benchmod._sf_from_dir(SF_DIR))
    warm = spark.read.parquet(pages_path).limit(4 * CPUS).repartition(2 * CPUS)
    t0 = time.time()
    _ = with_extraction(warm).count()
    warm_s = round(time.time() - t0, 3)
    pages = spark.read.parquet(pages_path).repartition(CPUS).cache()
    t0 = time.time()
    n_pages = pages.count()
    cache_s = round(time.time() - t0, 3)
    reps = []
    for _ in range(max(REPS, 4)):
        t0 = time.time()
        ext = with_extraction(pages)
        ext.agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("error").isNull(), 1)).alias("ok"),
            F.max(F.xxhash64("payload_json", "text", "error")).alias("chk"),
        ).first()
        reps.append(round(time.time() - t0, 3))
    _dump_plan(with_extraction(pages), "crawl_extract")
    pages.unpersist()
    print(json.dumps({
        "mode": "extract", "warm_s": warm_s, "cache_s": cache_s,
        "n_pages": n_pages, "reps": reps,
    }))


def mode_crawl() -> None:
    import shutil

    from xtracted_crawlers_spark import fixtures
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, bootstrap, run_round

    spark = _spark()
    import bench as benchmod

    sf = benchmod._sf_from_dir(SF_DIR)
    pages_path = benchmod._ensure_pages(spark, sf)
    pages = spark.read.parquet(pages_path).repartition(CPUS).cache()
    n_pages = pages.count()
    n_seeds = max(500, n_pages // 4)
    seeds = fixtures.gen_seeds(spark, n_pages, n_seeds, n_hosts=200).cache()
    seeds.count()
    warm = spark.read.parquet(pages_path).limit(4 * CPUS).repartition(2 * CPUS)
    from xtracted_crawlers_spark.extract import with_extraction

    _ = with_extraction(warm).count()

    phases: list[dict] = []
    for rep in range(2):
        wh = f"/tmp/xcs_bench_cache/extra_wh_{rep}"
        shutil.rmtree(wh, ignore_errors=True)
        catalog = ParquetSnapshotCatalog(wh)
        cfg = CrawlConfig(max_rounds=2, global_budget=n_seeds)
        t0 = time.time()
        spark.sparkContext.setJobDescription("r06:crawl:bootstrap")
        bootstrap(spark, catalog, seeds, cfg=cfg)
        tb = time.time()
        ph = {"bootstrap": round(tb - t0, 3)}
        for rnd in range(1, cfg.max_rounds + 1):
            spark.sparkContext.setJobDescription(f"r06:crawl:round{rnd}")
            tr = time.time()
            m = run_round(spark, catalog, pages, rnd, cfg)
            ph[f"round{rnd}"] = round(time.time() - tr, 3)
            ph[f"round{rnd}_selected"] = m.get("selected", 0)
            if m.get("selected", 0) == 0:
                break
        ph["total"] = round(time.time() - t0, 3)
        phases.append(ph)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"mode": "crawl", "n_pages": n_pages, "n_seeds": n_seeds,
                      "phases": phases}))


def mode_crawlfull() -> None:
    """bench.py's crawl_rounds entry, verbatim timing shape (run_crawl,
    fresh warehouse per rep) — the async-bookkeeping path."""
    import shutil

    from xtracted_crawlers_spark import fixtures
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, run_crawl
    from xtracted_crawlers_spark.extract import with_extraction

    spark = _spark()
    import bench as benchmod

    sf = benchmod._sf_from_dir(SF_DIR)
    pages_path = benchmod._ensure_pages(spark, sf)
    warm = spark.read.parquet(pages_path).limit(4 * CPUS).repartition(2 * CPUS)
    _ = with_extraction(warm).count()
    pages = spark.read.parquet(pages_path).repartition(CPUS).cache()
    n_pages = pages.count()
    n_seeds = max(500, n_pages // 4)
    seeds = fixtures.gen_seeds(spark, n_pages, n_seeds, n_hosts=200).cache()
    seeds.count()
    reps = []
    for rep in range(max(REPS, 2)):
        wh = f"/tmp/xcs_bench_cache/full_wh_{rep}"
        shutil.rmtree(wh, ignore_errors=True)
        catalog = ParquetSnapshotCatalog(wh)
        t0 = time.time()
        ms = run_crawl(spark, catalog, pages, seeds,
                       cfg=CrawlConfig(max_rounds=2, global_budget=n_seeds))
        reps.append(round(time.time() - t0, 3))
    crawled = sum(m.get("completed", 0) + m.get("extract_failed", 0)
                  + m.get("fetch_missed", 0) for m in ms)
    print(json.dumps({"mode": "crawlfull", "reps": reps,
                      "median2": round(median(reps[:2]), 3),
                      "crawled": crawled}))


def mode_crawlphases() -> None:
    """mode_crawl with catalog.commit + selection count timed via
    monkeypatch (no change to the frozen crawl code)."""
    import shutil

    from xtracted_crawlers_spark import fixtures, scheduler
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, bootstrap, run_round

    spark = _spark()
    import bench as benchmod

    sf = benchmod._sf_from_dir(SF_DIR)
    pages_path = benchmod._ensure_pages(spark, sf)
    pages = spark.read.parquet(pages_path).repartition(CPUS).cache()
    n_pages = pages.count()
    n_seeds = max(500, n_pages // 4)
    seeds = fixtures.gen_seeds(spark, n_pages, n_seeds, n_hosts=200).cache()
    seeds.count()

    timings: list[tuple[str, float]] = []
    orig_commit = ParquetSnapshotCatalog.commit

    def timed_commit(self, df, table, **kw):
        t0 = time.time()
        out = orig_commit(self, df, table, **kw)
        timings.append((f"commit:{table}", round(time.time() - t0, 3)))
        return out

    ParquetSnapshotCatalog.commit = timed_commit
    from pyspark.sql import DataFrame as _DF

    orig_count = _DF.count

    def timed_count(self):
        t0 = time.time()
        n = orig_count(self)
        timings.append(("count", round(time.time() - t0, 3)))
        return n

    _DF.count = timed_count
    try:
        for rep in range(2):
            wh = f"/tmp/xcs_bench_cache/phase_wh_{rep}"
            shutil.rmtree(wh, ignore_errors=True)
            catalog = ParquetSnapshotCatalog(wh)
            cfg = CrawlConfig(max_rounds=2, global_budget=n_seeds)
            t0 = time.time()
            timings.append((f"REP{rep}:bootstrap...", 0.0))
            bootstrap(spark, catalog, seeds, cfg=cfg)
            timings.append((f"REP{rep}:bootstrap_total", round(time.time() - t0, 3)))
            for rnd in (1, 2):
                tr = time.time()
                timings.append((f"REP{rep}:round{rnd}...", 0.0))
                run_round(spark, catalog, pages, rnd, cfg)
                timings.append((f"REP{rep}:round{rnd}_total", round(time.time() - tr, 3)))
            timings.append((f"REP{rep}:TOTAL", round(time.time() - t0, 3)))
    finally:
        ParquetSnapshotCatalog.commit = orig_commit
        _DF.count = orig_count
    for k, v in timings:
        print(f"{k:34s} {v:7.3f}")


def mode_amortize() -> None:
    """Second amortization datum for the crawl loop's fixed-vs-marginal
    claim (r5 verdict round-6 task #3): wall time of a 2-round crawl vs
    seed-count at FIXED cores, interleaved passes (size order reversed
    on the second pass so window drift can't masquerade as a trend).
    Fixed cost/round and marginal cost/url come from a least-squares
    line over the best-of-passes points — same method as BENCH.md's
    round-3/4 tables."""
    import shutil

    from xtracted_crawlers_spark import fixtures
    from xtracted_crawlers_spark.catalog import ParquetSnapshotCatalog
    from xtracted_crawlers_spark.crawl import CrawlConfig, run_crawl
    from xtracted_crawlers_spark.extract import with_extraction

    spark = _spark()
    import bench as benchmod

    sf = benchmod._sf_from_dir(SF_DIR)
    pages_path = benchmod._ensure_pages(spark, sf)
    warm = spark.read.parquet(pages_path).limit(4 * CPUS).repartition(2 * CPUS)
    _ = with_extraction(warm).count()
    pages = spark.read.parquet(pages_path).repartition(CPUS).cache()
    n_pages = pages.count()
    sizes = [12_500, 25_000, 50_000, 100_000]
    seed_dfs = {}
    for n in sizes:
        seed_dfs[n] = fixtures.gen_seeds(spark, n_pages, n, n_hosts=200).cache()
        seed_dfs[n].count()
    results: dict[int, list[dict]] = {n: [] for n in sizes}
    for p in range(2):
        order = sizes if p == 0 else list(reversed(sizes))
        for n in order:
            wh = f"/tmp/xcs_bench_cache/amort_wh_{p}_{n}"
            shutil.rmtree(wh, ignore_errors=True)
            catalog = ParquetSnapshotCatalog(wh)
            spark.sparkContext.setJobDescription(f"r06:amortize:{n}")
            t0 = time.time()
            ms = run_crawl(spark, catalog, pages, seed_dfs[n],
                           cfg=CrawlConfig(max_rounds=2, global_budget=n))
            wall = round(time.time() - t0, 3)
            touched = sum(m.get("completed", 0) + m.get("extract_failed", 0)
                          + m.get("fetch_missed", 0) for m in ms)
            results[n].append({"wall": wall, "touched": touched})
            shutil.rmtree(wh, ignore_errors=True)
    spark.sparkContext.setJobDescription(None)
    pts = []
    for n in sizes:
        best = min(r["wall"] for r in results[n])
        touched = results[n][0]["touched"]
        pts.append((touched, best))
    # least-squares wall = fixed + marginal * touched (2 rounds/run)
    k = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts); sxy = sum(x * y for x, y in pts)
    marg = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    fixed = (sy - marg * sx) / k
    print(json.dumps({
        "mode": "amortize", "cpus": CPUS, "n_pages": n_pages, "rounds": 2,
        "results": {str(n): results[n] for n in sizes},
        "best_points": [{"touched": x, "wall": y, "urls_per_sec": round(x / y, 1)}
                        for x, y in pts],
        "marginal_ms_per_url": round(marg * 1000, 4),
        "fixed_s_per_round": round(fixed / 2, 2),
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        mode_queries(sys.argv[2:])
    elif mode == "extract":
        mode_extract()
    elif mode == "crawl":
        mode_crawl()
    elif mode == "crawlfull":
        mode_crawlfull()
    elif mode == "crawlphases":
        mode_crawlphases()
    elif mode == "amortize":
        mode_amortize()
    else:
        raise SystemExit(f"unknown mode {mode!r}")
