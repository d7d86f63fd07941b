"""Frontier table: schema, seed ingest (A1), job reset (B1), crawl-order
sequence assignment (F1).

Reference semantics preserved (SURVEY.md §1.1/§2):
- one row per (user_id, job_id, url_id); the url keeps its query string,
  the identity ignores it (crawlers_services.py:86-95 + dedup test);
- ``job_urls_seq`` is a per-user monotonic discovery sequence — the crawl
  order invariant. The reference assigns it from a per-user Postgres
  sequence at insertion; here it's a ``row_number`` over the canonical
  insertion order (job_id, seed_idx) plus the per-user running offset of
  prior inserts — deterministic and idempotent per batch (SURVEY.md §7);
- status lifecycle pending → running → complete; failures leave status
  'running' with errors/retries accumulated, give-up at 3 (context.py:
  92-114) — there is no terminal 'failed' status write;
- job rerun resets data/retries/status/created_at (pg_crawl_job_worker.py:
  96-101).

Scale notes: ingest is one shuffle (the window for seq assignment) plus an
anti-join against the existing frontier keyed on (user_id, job_id,
url_id). The per-user window is safe because seq assignment is inherently
per-user sequential; user count is large in production so the window
parallelizes across users. The frontier itself is stored bucketed by
hashed host so a round's per-host scheduling doesn't reshuffle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import urlnorm
from .extract import PAYLOAD_SCHEMA

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("job_id", T.LongType()),
        T.StructField("url_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_type", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("retries", T.IntegerType()),
        T.StructField("errors", T.ArrayType(T.StringType())),
        T.StructField("priority", T.IntegerType()),
        T.StructField("job_urls_seq", T.LongType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("data", PAYLOAD_SCHEMA),
        T.StructField("payload_json", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("round", T.IntegerType()),
    ]
)

PENDING, RUNNING, COMPLETE = "pending", "running", "complete"
MAX_RETRIES = 3
KEY = ["user_id", "job_id", "url_id"]


def _conform(df: DataFrame) -> DataFrame:
    """Project to the canonical frontier column order/types."""
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in FRONTIER_SCHEMA.fields]
    )


def canonicalize_candidates(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Add url_id/url_type/host; drop rows no extractor routes
    (extractor_factory.py returns None ⇒ silently ignored)."""
    return (
        urls.withColumn("url_id", urlnorm.url_id(url_col))
        .withColumn("url_type", urlnorm.url_type(url_col))
        .withColumn("host", urlnorm.host(url_col))
        .filter(F.col("url_type").isNotNull())
    )


def dedupe_batch(candidates: DataFrame, order_cols: list[str]) -> DataFrame:
    """Within one ingest batch keep the first occurrence per identity —
    the reference inserts seeds sequentially, so the earliest submission
    wins (check-then-insert in crawlers_services.py:76-95)."""
    w = Window.partitionBy(*KEY).orderBy(*[F.col(c) for c in order_cols])
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def assign_seq(
    new_rows: DataFrame,
    existing_offsets: Optional[DataFrame],
    order_cols: list[str],
) -> DataFrame:
    """Per-user monotonic job_urls_seq: row_number over the canonical
    insertion order + the user's prior max (the running offset carried
    across batches/rounds).

    existing_offsets: DataFrame(user_id, max_seq) or None for a fresh
    frontier. Seqs start at 1 (Postgres sequences are 1-based).
    """
    w = Window.partitionBy("user_id").orderBy(*[F.col(c) for c in order_cols])
    out = new_rows.withColumn("_rn", F.row_number().over(w).cast("long"))
    if existing_offsets is not None:
        out = out.join(F.broadcast(existing_offsets), "user_id", "left").withColumn(
            "_off", F.coalesce(F.col("max_seq"), F.lit(0)).cast("long")
        )
    else:
        out = out.withColumn("_off", F.lit(0).cast("long"))
    return (
        out.withColumn("job_urls_seq", F.col("_rn") + F.col("_off"))
        .drop("_rn", "_off", "max_seq")
    )


def user_offsets(frontier: DataFrame) -> DataFrame:
    """Per-user running max seq — small (one row per user), broadcastable."""
    return frontier.groupBy("user_id").agg(F.max("job_urls_seq").alias("max_seq"))


def ingest_seeds(
    seeds: DataFrame,
    frontier: Optional[DataFrame] = None,
    priority: int = 0,
    round_id: int = 0,
) -> DataFrame:
    """A1+C2+F1: seed batch → new frontier rows.

    canonicalize → drop unroutable → in-batch first-wins dedup →
    anti-join existing frontier (exact authority) → assign per-user seq →
    pending rows.
    Returns ONLY the new rows (caller unions with the existing frontier
    and commits the snapshot).
    """
    cands = canonicalize_candidates(
        seeds.select("user_id", F.col("job_id").cast("long"), "seed_idx", "url")
    )
    if frontier is not None:
        # dedupe's KEY exchange is reused by the anti-join (same keys) —
        # re-clustering by user_id here would only ADD an exchange
        cands = dedupe_batch(cands, ["job_id", "seed_idx"])
        cands = cands.join(frontier.select(*KEY), KEY, "left_anti")
        offsets = user_offsets(frontier)
    else:
        # fresh ingest: ONE exchange for both windows (guide §2.4) —
        # hash-partitioning by user_id clusters every (user_id, job_id,
        # url_id) group AND every user_id group, so the dedupe window
        # (partitionBy KEY) and the seq window (partitionBy user_id)
        # both run on this single shuffle (EnsureRequirements accepts
        # hash(user_id) for ClusteredDistribution of any superset key
        # list). Parallelism is per-user either way: the seq window is
        # inherently per-user sequential (Postgres-sequence semantics),
        # so this costs nothing the schedule didn't already pay.
        cands = cands.repartition("user_id")
        cands = dedupe_batch(cands, ["job_id", "seed_idx"])
        offsets = None
    new_rows = assign_seq(cands, offsets, ["job_id", "seed_idx"])
    return _conform(
        new_rows.withColumn("status", F.lit(PENDING))
        .withColumn("retries", F.lit(0))
        .withColumn("errors", F.array().cast("array<string>"))
        .withColumn("priority", F.lit(priority))
        .withColumn("created_at", F.current_timestamp())
        .withColumn("data", F.lit(None).cast(PAYLOAD_SCHEMA))
        .withColumn("payload_json", F.lit(None).cast("string"))
        .withColumn("text", F.lit(None).cast("string"))
        .withColumn("round", F.lit(round_id))
    )


def reset_job(frontier: DataFrame, user_id: str, job_id: int) -> DataFrame:
    """B1 run_job reset: data=NULL, retries=0, status=pending,
    created_at=now for the job's rows (pg_crawl_job_worker.py:96-101 —
    the reference updates ONLY those columns; accumulated ``errors`` are
    preserved across reruns). Everything else untouched. One column-level
    MERGE, no per-row events — the fan-out IS the next round's
    selection."""
    hit = (F.col("user_id") == user_id) & (F.col("job_id") == job_id)
    return _conform(
        frontier.withColumn("status", F.when(hit, F.lit(PENDING)).otherwise(F.col("status")))
        .withColumn("retries", F.when(hit, F.lit(0)).otherwise(F.col("retries")))
        .withColumn("data", F.when(hit, F.lit(None).cast(PAYLOAD_SCHEMA)).otherwise(F.col("data")))
        .withColumn(
            "payload_json", F.when(hit, F.lit(None).cast("string")).otherwise(F.col("payload_json"))
        )
        .withColumn("text", F.when(hit, F.lit(None).cast("string")).otherwise(F.col("text")))
        .withColumn(
            "created_at", F.when(hit, F.current_timestamp()).otherwise(F.col("created_at"))
        )
    )


def selectable(frontier: DataFrame) -> DataFrame:
    """Rows eligible for the next round: never-attempted (pending) or
    previously-failed (running, the reference's redelivery) with retries
    budget left. Completed rows and 3-strike rows are out
    (context.py:106-107 archives at retries>=3)."""
    return frontier.filter(
        F.col("status").isin(PENDING, RUNNING) & (F.col("retries") < MAX_RETRIES)
    )
