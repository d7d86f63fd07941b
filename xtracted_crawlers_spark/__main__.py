"""CLI entry point — the spark-submit surface (north_rule: "runs via
spark-submit --py-files on multi-executor clusters").

Local mode:
    python3 -m xtracted_crawlers_spark gen-corpus --out /tmp/corpus --pages 10000
    python3 -m xtracted_crawlers_spark crawl --pages /tmp/corpus/pages.parquet \
        --seeds /tmp/corpus/seeds.parquet --robots /tmp/corpus/robots.parquet \
        --warehouse /tmp/wh --rounds 10 --global-budget 5000

Cluster mode (the same module, zipped):
    cd /path/to/repo && zip -r /tmp/xcs.zip xtracted_crawlers_spark
    spark-submit --py-files /tmp/xcs.zip \
        --conf spark.sql.adaptive.enabled=true \
        run_crawl_job.py ...   # or python -m via client mode

Re-running `crawl` with the same --warehouse resumes from the last
committed snapshot (crash-safe by the catalog's atomic manifest publish).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="xtracted_crawlers_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-corpus", help="write deterministic pages/seeds/robots parquet")
    g.add_argument("--out", required=True)
    g.add_argument("--pages", type=int, default=10_000)
    g.add_argument("--seeds", type=int, default=2_000)
    g.add_argument("--hosts", type=int, default=100)
    g.add_argument("--zipf", type=float, default=2.0)
    g.add_argument("--seed", type=int, default=42)

    c = sub.add_parser("crawl", help="run (or resume) a crawl")
    c.add_argument("--pages", required=True, help="pages parquet path (or WARC dir)")
    c.add_argument(
        "--pages-format",
        choices=["parquet", "warc"],
        default="parquet",
        help="read --pages as the parquet pages table or as a directory "
        "of WARC segments (Common-Crawl-style; file-granular parallelism)",
    )
    c.add_argument("--seeds", help="seeds parquet path (omit when resuming)")
    c.add_argument("--robots", help="robots parquet path")
    c.add_argument("--warehouse", required=True, help="snapshot catalog root")
    c.add_argument("--rounds", type=int, default=100)
    c.add_argument("--global-budget", type=int, default=None)
    c.add_argument("--default-budget", type=int, default=None)
    c.add_argument(
        "--domain-budget",
        type=int,
        default=None,
        help="rows per registrable domain (eTLD+1) per round — politeness"
        " backstop for multi-subdomain sites",
    )
    c.add_argument("--round-seconds", type=float, default=60.0)
    c.add_argument("--expand-variants", action="store_true")
    c.add_argument("--use-bloom", action="store_true")
    c.add_argument(
        "--seen-filter",
        choices=["none", "bloom", "cuckoo"],
        default="none",
        help="seen-set pre-filter for variant expansion: bloom (grow-only)"
        " or cuckoo (supports expiry deletes for sliding-window re-crawl);"
        " --use-bloom is the legacy alias for bloom",
    )
    c.add_argument(
        "--trap-quarantine",
        action="store_true",
        help="drop crawl-trap hosts (calendar loops, session-id explosions)"
        " from each round's selection — for expanding frontiers",
    )
    c.add_argument("--storage", choices=["delta", "full"], default="delta")
    c.add_argument("--master", default=None)
    c.add_argument(
        "--quota", help="api_requests parquet path (user_id, requests) — per-user budgets"
    )
    c.add_argument(
        "--sitemap-seeds",
        help="comma-separated sitemap/sitemap-index URLs to harvest from "
        "the pages table as an extra seed channel (new surface; the "
        "index is walked --sitemap-depth levels)",
    )
    c.add_argument("--sitemap-depth", type=int, default=2)
    c.add_argument(
        "--sitemap-from-robots",
        action="store_true",
        help="autodiscover sitemaps from the robots table's 'Sitemap:' "
        "directives (RFC 9309) and harvest them too",
    )
    c.add_argument(
        "--token-carryover",
        action="store_true",
        help="carry-over per-domain token buckets: a robots-ruled host "
        "banks its unspent per-round grant (up to --burst-rounds x the "
        "refill, still clamped by max_tokens) in the host_tokens table "
        "and may burst when URLs arrive mid-crawl; with a dense "
        "frontier the schedule is identical to the memoryless default",
    )
    c.add_argument("--burst-rounds", type=int, default=4)
    c.add_argument(
        "--fair-users",
        action="store_true",
        help="round-robin the global cut across users by per-user queue "
        "position (multi-tenant fairness) instead of the default global "
        "FIFO; pair with --global-budget, where FIFO starves late tenants",
    )
    c.add_argument(
        "--priority-from-links",
        action="store_true",
        help="derive host authority (link in-degree over the pages table) "
        "and stamp it as scheduling priority at bootstrap — "
        "high-authority hosts crawl first. Priority orders the GLOBAL "
        "cut (and the quota cut), so pair it with --global-budget (or "
        "--quota); without either, every selectable row is taken and "
        "priority cannot change the schedule",
    )

    j = sub.add_parser(
        "jobs", help="job-level status from a crawl warehouse (the reference's "
        "'is job N running/complete' query over the jobs table)"
    )
    j.add_argument("--warehouse", required=True)
    j.add_argument("--user", help="filter to one user_id")
    j.add_argument("--job", type=int, help="filter to one job_id")
    j.add_argument("--master", default=None)

    au = sub.add_parser(
        "audit", help="politeness compliance audit from committed state: "
        "per-(round, host) fetch counts vs the configured bound; prints "
        "violations (empty output + exit 0 = compliant)"
    )
    au.add_argument("--warehouse", required=True)
    au.add_argument("--robots", required=True, help="robots parquet path")
    au.add_argument("--round-seconds", type=float, default=60.0)
    au.add_argument("--token-carryover", action="store_true")
    au.add_argument("--burst-rounds", type=int, default=4)
    au.add_argument("--master", default=None)

    rf = sub.add_parser(
        "refresh", help="reset completed URLs that are due for re-crawl: "
        "adaptive change-rate policy by default (the crawler's own "
        "fingerprint history), or sitemap <lastmod> staleness with "
        "--sitemaps; follow with a plain `crawl` run (no --seeds) to "
        "re-fetch exactly the reset rows"
    )
    rf.add_argument("--warehouse", required=True)
    rf.add_argument("--max-interval", type=int, default=16,
                    help="change-rate mode: never back off beyond this many rounds")
    rf.add_argument("--sitemaps", help="comma-separated sitemap URLs: use "
                    "publisher lastmod instead of observed change rates")
    rf.add_argument("--pages", help="pages source (required with --sitemaps)")
    rf.add_argument("--master", default=None)

    tk = sub.add_parser(
        "tokens", help="per-host token-bucket state (the host_tokens table a "
        "--token-carryover crawl maintains) — banked grant per ruled host"
    )
    tk.add_argument("--warehouse", required=True)
    tk.add_argument("--host", help="filter to one host")
    tk.add_argument("--master", default=None)

    h = sub.add_parser(
        "history", help="per-round snapshot lineage + metrics from the manifests "
        "(resume/time-travel evidence; no Spark session needed)"
    )
    h.add_argument("--warehouse", required=True)
    h.add_argument("--table", default="frontier")

    e = sub.add_parser(
        "expire", help="storage GC: delete snapshots older than the newest "
        "retained base (Iceberg expire_snapshots semantics; manifest-only, "
        "no Spark session needed)"
    )
    e.add_argument("--warehouse", required=True)
    e.add_argument("--table", default="frontier")
    e.add_argument("--keep-bases", type=int, default=1)

    x = sub.add_parser(
        "export", help="write the crawled corpus (completed rows' extracted text) "
        "as parquet partitioned by predicted language — the training-data product"
    )
    x.add_argument("--warehouse", required=True)
    x.add_argument("--out", required=True)
    x.add_argument("--min-quality", type=float, default=None)
    x.add_argument("--langs", help="comma-separated language allow-list (e.g. en,de)")
    x.add_argument(
        "--split",
        help="stamp a deterministic train/val/test column, e.g. '0.9,0.05' "
        "(train frac, val frac; the rest is test) — keyed on url_id, so "
        "membership never moves as the crawl grows",
    )
    x.add_argument("--master", default=None)

    cr = sub.add_parser(
        "corpus-report", help="corpus quality report: Heaps vocabulary curve, "
        "top PMI collocations, winnowing fingerprint census (near-dup pressure) "
        "— over an exported/external corpus parquet or the crawl warehouse"
    )
    cr.add_argument("--corpus", help="parquet with (doc_id, text) columns")
    cr.add_argument("--warehouse", help="or: crawl warehouse (completed rows' text; "
                    "doc_id = job_urls_seq, i.e. crawl order)")
    cr.add_argument("--id-col", default="doc_id")
    cr.add_argument("--text-col", default="text")
    cr.add_argument("--buckets", type=int, default=10)
    cr.add_argument("--master", default=None)

    u = sub.add_parser(
        "urls", help="URL-level frontier state (the reference's list_crawler_urls/"
        "get_crawler_url service queries, E1/E2) — key filters push down to the scan"
    )
    u.add_argument("--warehouse", required=True)
    u.add_argument("--user", help="filter to one user_id")
    u.add_argument("--job", type=int, help="filter to one job_id")
    u.add_argument("--url-id", help="point lookup of one url_id")
    u.add_argument("--limit", type=int, default=100)
    u.add_argument("--master", default=None)

    args = ap.parse_args(argv)

    if args.cmd == "expire":  # manifest-only: no Spark session needed
        from .catalog import ParquetSnapshotCatalog

        catalog = ParquetSnapshotCatalog(args.warehouse)
        expired = catalog.expire_snapshots(args.table, keep_bases=args.keep_bases)
        print(json.dumps({"table": args.table, "expired": expired}))
        return 0

    if args.cmd == "history":  # manifest-only: no Spark session needed
        from .catalog import ParquetSnapshotCatalog

        catalog = ParquetSnapshotCatalog(args.warehouse)
        for m in catalog.history(args.table):
            print(
                json.dumps(
                    {
                        "snapshot_id": m.snapshot_id,
                        "round_id": m.round_id,
                        "parent": m.parent_snapshot_id,
                        "n_files": len(m.files),
                        "bytes": sum(f.get("bytes", 0) for f in m.files),
                        **m.metrics,
                    }
                )
            )
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"xcs-{args.cmd}", master=getattr(args, "master", None))
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "gen-corpus":
        from .fixtures import write_corpus

        paths = write_corpus(
            spark, args.out, args.pages, args.seeds,
            n_hosts=args.hosts, zipf=args.zipf, corpus_seed=args.seed,
        )
        print(json.dumps(paths))
        return 0

    from .catalog import ParquetSnapshotCatalog

    if args.cmd == "jobs":
        from pyspark.sql import functions as F

        from .quota import JOBS_TABLE

        catalog = ParquetSnapshotCatalog(args.warehouse)
        df = catalog.load(spark, JOBS_TABLE)
        if args.user:
            df = df.filter(F.col("user_id") == args.user)
        if args.job is not None:
            df = df.filter(F.col("job_id") == args.job)
        for r in df.orderBy("user_id", "job_id").collect():
            print(json.dumps(r.asDict(), default=str))
        return 0

    if args.cmd == "audit":
        from .crawl import CrawlConfig, audit_politeness

        catalog = ParquetSnapshotCatalog(args.warehouse)
        robots = spark.read.parquet(args.robots)
        cfg = CrawlConfig(
            round_seconds=args.round_seconds,
            token_carryover=args.token_carryover,
            burst_rounds=args.burst_rounds,
        )
        bad = audit_politeness(spark, catalog, robots, cfg).collect()
        for r in bad:
            print(json.dumps(r.asDict(), default=str))
        return 1 if bad else 0

    if args.cmd == "refresh":
        from .crawl import refresh_by_change_rate, refresh_stale
        from .sources import read_pages

        catalog = ParquetSnapshotCatalog(args.warehouse)
        if args.sitemaps:
            if not args.pages:
                raise SystemExit("--sitemaps needs --pages (the table the harvest walks)")
            pages = read_pages(spark, args.pages)
            m = refresh_stale(
                spark, catalog, pages,
                [s for s in args.sitemaps.split(",") if s],
            )
        else:
            m = refresh_by_change_rate(spark, catalog, max_interval=args.max_interval)
        print(json.dumps(m))
        return 0

    if args.cmd == "tokens":
        from pyspark.sql import functions as F

        from .crawl import HOST_TOKENS_TABLE

        catalog = ParquetSnapshotCatalog(args.warehouse)
        if not catalog.exists(HOST_TOKENS_TABLE):
            print(json.dumps({"error": "no host_tokens table (crawl ran without --token-carryover?)"}))
            return 1
        df = catalog.load(spark, HOST_TOKENS_TABLE)
        if args.host:
            df = df.filter(F.col("host") == args.host)
        for r in df.orderBy("host").collect():
            print(json.dumps(r.asDict(), default=str))
        return 0

    if args.cmd == "export":
        from .crawl import export_corpus

        catalog = ParquetSnapshotCatalog(args.warehouse)
        split_fracs = None
        if args.split:
            parts = [float(s) for s in args.split.split(",")]
            if len(parts) != 2 or sum(parts) > 1.0 or min(parts) < 0:
                raise SystemExit("--split wants 'train_frac,val_frac' summing <= 1")
            split_fracs = (parts[0], parts[1])
        n = export_corpus(
            spark, catalog, args.out,
            min_quality=args.min_quality,
            langs=[s for s in (args.langs or "").split(",") if s] or None,
            split_fracs=split_fracs,
        )
        print(json.dumps({"out": args.out, "rows": n}))
        return 0

    if args.cmd == "corpus-report":
        from pyspark.sql import functions as F

        from .operators.corpusstats import corpus_report

        if bool(args.corpus) == bool(args.warehouse):
            raise SystemExit("corpus-report wants exactly one of --corpus / --warehouse")
        if args.corpus:
            docs = spark.read.parquet(args.corpus).select(
                F.col(args.id_col).alias("doc_id"), F.col(args.text_col).alias("text")
            )
        else:
            from .crawl import COMPLETE, load_frontier

            fr = load_frontier(spark, ParquetSnapshotCatalog(args.warehouse))
            docs = fr.filter(
                (F.col("status") == COMPLETE) & F.col("text").isNotNull()
            ).select(F.col("job_urls_seq").alias("doc_id"), "text")
        print(json.dumps(corpus_report(docs, n_buckets=args.buckets)))
        return 0

    if args.cmd == "urls":
        from pyspark.sql import functions as F

        from .crawl import load_frontier

        catalog = ParquetSnapshotCatalog(args.warehouse)
        df = load_frontier(spark, catalog).select(
            "user_id", "job_id", "url_id", "url", "status", "retries",
            "errors", "priority", "job_urls_seq", "round",
        )
        if args.user:
            df = df.filter(F.col("user_id") == args.user)
        if args.job is not None:
            df = df.filter(F.col("job_id") == args.job)
        if args.url_id:
            df = df.filter(F.col("url_id") == args.url_id)
        for r in df.orderBy("user_id", "job_id", "job_urls_seq").limit(args.limit).collect():
            print(json.dumps(r.asDict(), default=str))
        return 0

    from .crawl import CrawlConfig, run_crawl
    from .sources import read_pages, read_warc

    catalog = ParquetSnapshotCatalog(args.warehouse)
    if args.pages_format == "warc":
        pages = read_warc(spark, args.pages)
    else:
        pages = read_pages(spark, args.pages)
    seeds = spark.read.parquet(args.seeds) if args.seeds else None
    robots = spark.read.parquet(args.robots) if args.robots else None
    cfg = CrawlConfig(
        round_seconds=args.round_seconds,
        default_budget=args.default_budget,
        domain_budget=args.domain_budget,
        global_budget=args.global_budget,
        max_rounds=args.rounds,
        expand_variants=args.expand_variants,
        use_bloom=args.use_bloom,
        seen_filter=args.seen_filter,
        trap_quarantine=args.trap_quarantine,
        frontier_storage=args.storage,
        sitemap_seeds=(
            [u for u in args.sitemap_seeds.split(",") if u] if args.sitemap_seeds else None
        ),
        sitemap_depth=args.sitemap_depth,
        sitemap_from_robots=args.sitemap_from_robots,
        token_carryover=args.token_carryover,
        burst_rounds=args.burst_rounds,
        fair_users=args.fair_users,
    )
    quota = spark.read.parquet(args.quota) if getattr(args, "quota", None) else None
    host_scores = None
    if args.priority_from_links:
        from pyspark.sql import functions as F

        from .operators import linkgraph

        host_scores = linkgraph.host_degrees(
            linkgraph.host_edges(linkgraph.extract_links(pages))
        ).select("host", F.col("in_weight").alias("score"))
    metrics = run_crawl(
        spark, catalog, pages, seeds, robots=robots, cfg=cfg, quota=quota,
        host_scores=host_scores,
    )
    for m in metrics:
        print(json.dumps(m))
    return 0


if __name__ == "__main__":
    sys.exit(main())
