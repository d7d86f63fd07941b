"""The crawl round loop — SURVEY.md §3.2 re-expressed as checkpointed
batch rounds over snapshot tables.

Reference lifecycle per URL (pg_crawl_job_worker.py + context.py):
poll queue → set_running → browser fetch → extract → complete
(status+data+ack in one transaction) | fail (errors‖, retries+1, redeliver
until 3 strikes). Here the queue IS the frontier predicate, the browser IS
a join against the pages table, the per-URL transaction IS the round's
atomic snapshot commit, and redelivery IS the row staying selectable with
retries+1 (idempotent re-execution from the last committed snapshot
replaces at-least-once message delivery).

Physical shape per round (local[N] now, 1000 executors later):
- selection: frontier scan with status/retries predicate (partition-
  prunable), per-host window rank bounded by the politeness budget;
- fetch join: inner hash join pages ⋈ broadcast(selected) — the selected
  set is budget-bounded and ~always broadcastable; fetch misses are
  recovered with an anti-join against the (small) hit set, so the huge
  pages table is never shuffled; with an Iceberg pages table bucketed by
  url the same join is storage-pruned;
- extraction: ONE Arrow UDF pass, input repartitioned by salted host so a
  hot host can't pin a partition;
- merge: untouched ∪ updated ∪ discovered, committed as the next frontier
  snapshot with round metrics + per-file lineage in the manifest.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import frontier as FR
from . import scheduler, seen
from .catalog import ParquetSnapshotCatalog
from .extract import PAYLOAD_SCHEMA, with_extraction
from .frontier import COMPLETE, KEY, MAX_RETRIES, PENDING, RUNNING


@dataclass
class CrawlConfig:
    round_seconds: float = 60.0
    default_budget: Optional[int] = None  # per-host rows/round when no robots row
    global_budget: Optional[int] = None  # total rows/round
    max_rounds: int = 100
    expand_variants: bool = False  # reference plumbing exists but is unused; flag-gated
    use_bloom: bool = False
    bloom_buckets: int = 64
    salt_n: int = 16
    extract_partitions: Optional[int] = None
    # frontier storage: 'delta' commits only the rows a round touched
    # (merge-on-read, Iceberg MoR semantics on the parquet fallback) with a
    # full compaction every compact_every rounds; 'full' rewrites the whole
    # frontier per round (simple, but O(frontier) write amplification — at
    # a 10^10-row frontier only 'delta' survives).
    frontier_storage: str = "delta"
    compact_every: int = 8


FRONTIER_TABLE = "frontier"


def load_frontier(spark: SparkSession, catalog: ParquetSnapshotCatalog) -> DataFrame:
    """Current frontier state: latest base snapshot + every later delta,
    resolved to the newest row per key (merge-on-read). Read amplification
    is bounded by compact_every."""
    hist = catalog.history(FRONTIER_TABLE)
    if not hist:
        raise FileNotFoundError("frontier has no committed snapshot")
    base_idx = max(
        (i for i, m in enumerate(hist) if m.metrics.get("kind", "base") == "base"),
        default=0,
    )
    parts = []
    for m in hist[base_idx:]:
        parts.append(
            catalog.load(spark, FRONTIER_TABLE, m.snapshot_id).withColumn(
                "_snap", F.lit(m.snapshot_id)
            )
        )
    if len(parts) == 1:
        return parts[0].drop("_snap")
    from pyspark.sql import Window

    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    w = Window.partitionBy(*KEY).orderBy(F.desc("_snap"))
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_snap")
    )


def bootstrap(
    spark: SparkSession,
    catalog: ParquetSnapshotCatalog,
    seeds: DataFrame,
    priority: int = 0,
) -> int:
    """Seed ingest → frontier snapshot 0 (A1). Idempotent against an
    existing frontier (anti-join dedup)."""
    existing = load_frontier(spark, catalog) if catalog.exists(FRONTIER_TABLE) else None
    new_rows = FR.ingest_seeds(seeds, existing, priority=priority, round_id=0)
    full = existing.unionByName(new_rows) if existing is not None else new_rows
    n_new = new_rows.count()
    return catalog.commit(
        full,
        FRONTIER_TABLE,
        round_id=0,
        metrics={"event": "bootstrap", "new_urls": n_new, "kind": "base"},
    )


def _merge_updates(frontier_df: DataFrame, updated: DataFrame) -> DataFrame:
    """MERGE semantics: replace rows whose key is in `updated`, keep the
    rest (Iceberg MERGE INTO equivalent for the parquet fallback)."""
    untouched = frontier_df.join(F.broadcast(updated.select(*KEY)), KEY, "left_anti")
    return untouched.unionByName(updated.select(*frontier_df.columns))


def run_round(
    spark: SparkSession,
    catalog: ParquetSnapshotCatalog,
    pages: DataFrame,
    round_id: int,
    cfg: CrawlConfig,
    rules: Optional[DataFrame] = None,
) -> dict[str, Any]:
    """One crawl round. Returns the metrics dict (also persisted in the
    snapshot manifest). metrics['selected']==0 means the crawl is done."""
    fr = load_frontier(spark, catalog)

    sel = scheduler.select_round(
        FR.selectable(fr),
        rules=rules,
        round_seconds=cfg.round_seconds,
        default_budget=cfg.default_budget,
        global_budget=cfg.global_budget,
    )
    sel = sel.cache()
    n_selected = sel.count()
    if n_selected == 0:
        sel.unpersist()
        return {"round": round_id, "selected": 0}

    # --- fetch: pages ⋈ broadcast(selected); misses via anti vs hit keys ---
    page_side = pages.select(
        "url", F.col("html").alias("_html"), F.col("text").alias("_golden_text")
    )
    hits = page_side.join(F.broadcast(sel), "url", "inner")
    extract_in = scheduler.salted_repartition(hits, cfg.salt_n, cfg.extract_partitions)
    extracted = with_extraction(extract_in, url_col="url", html_col="_html").cache()

    ok = extracted.filter(F.col("error").isNull())
    bad = extracted.filter(F.col("error").isNotNull())

    done_rows = (
        ok.withColumn("status", F.lit(COMPLETE))
        .withColumn("round", F.lit(round_id))
        .drop("_html", "_golden_text")
    )
    fail_rows = (
        bad.withColumn("status", F.lit(RUNNING))
        .withColumn("retries", F.col("retries") + 1)
        .withColumn("errors", F.concat("errors", F.array("error")))
        .withColumn("round", F.lit(round_id))
        .withColumn("data", F.lit(None).cast(PAYLOAD_SCHEMA))
        .withColumn("payload_json", F.lit(None).cast("string"))
        .withColumn("text", F.lit(None).cast("string"))
        .drop("_html", "_golden_text")
    )

    hit_keys = extracted.select(*KEY)
    missed = sel.join(F.broadcast(hit_keys), KEY, "left_anti")
    miss_rows = (
        missed.withColumn("status", F.lit(RUNNING))
        .withColumn("retries", F.col("retries") + 1)
        .withColumn(
            "errors",
            F.concat("errors", F.array(F.lit("ExtractionError('fetch miss: url absent from pages')"))),
        )
        .withColumn("round", F.lit(round_id))
    )

    updated = (
        done_rows.select(*fr.columns)
        .unionByName(fail_rows.select(*fr.columns))
        .unionByName(miss_rows.select(*fr.columns))
    )

    # --- metrics (single aggregate pass over the extracted slice) ---------
    agg = extracted.agg(
        F.count("*").alias("fetched"),
        F.count(F.when(F.col("error").isNull(), 1)).alias("completed"),
        F.count(F.when(F.col("error").isNotNull(), 1)).alias("extract_failed"),
        F.count(
            F.when(F.col("error").isNull() & (F.col("text") != F.col("_golden_text")), 1)
        ).alias("text_mismatch"),
    ).first()
    metrics: dict[str, Any] = {
        "round": round_id,
        "selected": n_selected,
        "fetched": int(agg["fetched"]),
        "completed": int(agg["completed"]),
        "extract_failed": int(agg["extract_failed"]),
        "fetch_missed": int(n_selected - agg["fetched"]),
        "text_mismatch": int(agg["text_mismatch"]),
    }

    # --- discovery: variant URL expansion (flag-gated; C3) ----------------
    new_frontier = _merge_updates(fr, updated)
    delta = updated.select(*fr.columns)
    if cfg.expand_variants:
        cands = (
            ok.select(
                "user_id",
                "job_id",
                F.col("job_urls_seq").alias("_parent_seq"),
                F.posexplode_outer("data.variants.variants").alias("_pos", "_v"),
            )
            .filter(F.col("_v").isNotNull())
            .select("user_id", "job_id", "_parent_seq", "_pos", F.col("_v.url").alias("url"))
        )
        cands = FR.canonicalize_candidates(cands)
        cands = FR.dedupe_batch(cands, ["_parent_seq", "_pos"])
        bloom = None
        if cfg.use_bloom and catalog.exists("seen_bloom"):
            bloom = catalog.load(spark, "seen_bloom")
        fresh = seen.dedup_new_urls(cands, new_frontier.select(*KEY), bloom, cfg.bloom_buckets)
        discovered = FR.assign_seq(
            fresh, FR.user_offsets(new_frontier), ["_parent_seq", "_pos"]
        ).drop("_parent_seq", "_pos")
        discovered = (
            discovered.withColumn("status", F.lit(PENDING))
            .withColumn("retries", F.lit(0))
            .withColumn("errors", F.array().cast("array<string>"))
            .withColumn("priority", F.lit(0))
            .withColumn("created_at", F.current_timestamp())
            .withColumn("data", F.lit(None).cast(PAYLOAD_SCHEMA))
            .withColumn("payload_json", F.lit(None).cast("string"))
            .withColumn("text", F.lit(None).cast("string"))
            .withColumn("round", F.lit(round_id + 1))
        )
        n_discovered = discovered.count()
        metrics["discovered"] = n_discovered
        new_frontier = new_frontier.unionByName(discovered.select(*fr.columns))
        delta = delta.unionByName(discovered.select(*fr.columns))
        if cfg.use_bloom:
            if catalog.exists("seen_bloom"):
                merged = seen.merge_bloom(
                    catalog.load(spark, "seen_bloom"), discovered.select(*KEY), cfg.bloom_buckets
                )
            else:
                merged = seen.build_bloom(new_frontier.select(*KEY), cfg.bloom_buckets)
            catalog.commit(merged, "seen_bloom", round_id=round_id)

    # delta commit = only the rows this round touched (bounded write
    # amplification); periodic base commit bounds read amplification
    if cfg.frontier_storage == "delta" and round_id % cfg.compact_every != 0:
        metrics["kind"] = "delta"
        catalog.commit(delta, FRONTIER_TABLE, round_id=round_id, metrics=metrics)
    else:
        metrics["kind"] = "base"
        catalog.commit(new_frontier, FRONTIER_TABLE, round_id=round_id, metrics=metrics)
    sel.unpersist()
    extracted.unpersist()
    return metrics


def rerun_job(
    spark: SparkSession,
    catalog: ParquetSnapshotCatalog,
    user_id: str,
    job_id: int,
) -> int:
    """The reference's run_job-on-existing-job flow (SURVEY.md §3.1 /
    B1): reset the job's rows (data=NULL, retries=0, status=pending,
    created_at=now) and commit — the fan-out IS the next round's
    selection, so the caller just continues with run_crawl/run_round."""
    fr = load_frontier(spark, catalog)
    reset = FR.reset_job(fr, user_id, job_id)
    return catalog.commit(
        reset,
        FRONTIER_TABLE,
        metrics={"event": "rerun_job", "user_id": user_id, "job_id": job_id, "kind": "base"},
    )


def metrics_history(catalog: ParquetSnapshotCatalog) -> list[dict[str, Any]]:
    """Per-round metrics across all committed snapshots — the per-round
    fetch/parse metrics + lineage record the north_rule requires, straight
    from the manifests."""
    return [
        {"snapshot_id": m.snapshot_id, "round_id": m.round_id, "n_files": len(m.files), **m.metrics}
        for m in catalog.history(FRONTIER_TABLE)
    ]


def run_crawl(
    spark: SparkSession,
    catalog: ParquetSnapshotCatalog,
    pages: DataFrame,
    seeds: Optional[DataFrame] = None,
    robots: Optional[DataFrame] = None,
    cfg: Optional[CrawlConfig] = None,
) -> list[dict[str, Any]]:
    """Full crawl: bootstrap (unless resuming an existing frontier) then
    rounds until nothing is selectable. Resume = call again with the same
    catalog; it continues from the latest committed snapshot."""
    cfg = cfg or CrawlConfig()
    rules = scheduler.robots_rules(robots) if robots is not None else None
    if rules is not None:
        rules = rules.cache()
    if seeds is not None and not catalog.exists(FRONTIER_TABLE):
        bootstrap(spark, catalog, seeds)
    start_round = 1
    last = catalog.latest_snapshot(FRONTIER_TABLE)
    if last is not None:
        last_round = catalog.manifest(FRONTIER_TABLE, last).round_id or 0
        start_round = max(1, int(last_round) + (0 if last_round == 0 else 1))
    all_metrics = []
    for r in range(start_round, start_round + cfg.max_rounds):
        m = run_round(spark, catalog, pages, r, cfg, rules)
        all_metrics.append(m)
        if m.get("selected", 0) == 0:
            break
    return all_metrics
