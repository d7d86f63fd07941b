"""Streaming crawl: seeds arrive continuously, rounds run per micro-batch.

The reference's always-on worker loop (pg_crawl_job_worker.py: long-poll
pgmq, dispatch events) maps to Structured Streaming: a file-source stream
of seed batches feeds ``foreachBatch``, and each micro-batch performs the
same transactional unit the batch loop does — ingest new seeds into the
frontier snapshot, then run one crawl round. Exactly-once state comes
from the snapshot catalog's atomic commits (the streaming checkpoint
handles source offsets; frontier state is ours and idempotent).

Batch and streaming share ALL the logic — frontier.ingest_seeds and
crawl.run_round are called unchanged — so semantics can't fork.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .. import frontier as FR
from ..catalog import ParquetSnapshotCatalog
from ..crawl import FRONTIER_TABLE, CrawlConfig, load_frontier, run_round

SEEDS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("job_id", T.LongType()),
        T.StructField("seed_idx", T.IntegerType()),
        T.StructField("url", T.StringType()),
    ]
)


def stream_seed_ingest(
    spark: SparkSession,
    seeds_dir: str,
    catalog: ParquetSnapshotCatalog,
    pages: DataFrame,
    checkpoint_dir: str,
    cfg: Optional[CrawlConfig] = None,
    rules: Optional[DataFrame] = None,
    available_now: bool = True,
):
    """Start the streaming crawl over a seed-file directory source.

    With ``available_now`` the query drains existing files and stops —
    the test/bench mode; a production deployment drops that trigger and
    runs continuously.
    """
    cfg = cfg or CrawlConfig()
    state: dict[str, Any] = {"round": 0}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        existing = (
            load_frontier(spark, catalog) if catalog.exists(FRONTIER_TABLE) else None
        )
        new_rows = FR.ingest_seeds(batch_df, existing, round_id=state["round"]).cache()
        n_new = new_rows.count()
        # keep the seen pre-filter complete over the frontier, same as
        # crawl.bootstrap and in the same CRASH-SAFE ORDER (filter merge
        # BEFORE the frontier commit — a filter key without its frontier
        # row is a harmless false positive; the reverse order leaves a
        # frontier key the filter never learns, a false negative the
        # at-least-once re-delivery cannot repair because the re-ingest
        # anti-join reports n_new=0). Guarded on n_new: a re-delivered
        # duplicate batch must not rewrite every filter bucket for a
        # no-op (round-5 review #6).
        from ..crawl import TRAP_STATE_TABLE, _SEEN_TABLES, seen_filter_kind

        filt_table = _SEEN_TABLES.get(seen_filter_kind(cfg))
        if n_new > 0 and filt_table and catalog.exists(filt_table):
            from .. import cuckoo, seen

            merge = (
                seen.merge_bloom
                if filt_table == "seen_bloom"
                else cuckoo.merge_cuckoo
            )
            catalog.commit(
                merge(
                    catalog.load(spark, filt_table),
                    new_rows.select("user_id", "job_id", "url_id"),
                    cfg.bloom_buckets,
                ),
                filt_table,
                round_id=state["round"],
                metrics={"event": "stream_ingest_filter", "batch_id": batch_id},
            )
        # ingested rows are NEW keys — in delta mode commit only them
        # (merge-on-read unions them in), never a full-frontier rewrite
        # per seed batch; periodic compaction bounds read amplification
        # exactly like the batch loop
        if (
            existing is None
            or cfg.frontier_storage != "delta"
            or state["round"] % cfg.compact_every == 0
        ):
            full = existing.unionByName(new_rows) if existing is not None else new_rows
            catalog.commit(
                full,
                FRONTIER_TABLE,
                round_id=state["round"],
                metrics={"event": "stream_ingest", "batch_id": batch_id, "kind": "base"},
            )
        else:
            catalog.commit(
                new_rows,
                FRONTIER_TABLE,
                round_id=state["round"],
                metrics={"event": "stream_ingest", "batch_id": batch_id, "kind": "delta"},
            )
        # keep the jobs table's n_total in sync with the ingest — without
        # this the incremental job_status_delta path never learns about
        # rows added to an EXISTING job and its counters go stale
        # (round-2 advice, medium)
        from .. import quota as QT

        if n_new > 0 and catalog.exists(QT.JOBS_TABLE):
            catalog.commit(
                QT.jobs_apply_ingest(catalog.load(spark, QT.JOBS_TABLE), new_rows),
                QT.JOBS_TABLE,
                round_id=state["round"],
                metrics={"event": "stream_ingest_jobs", "batch_id": batch_id},
            )
        # trap state learns the ingested rows too (round-5 review #1 —
        # this was the one ingest channel that skipped it), AFTER the
        # frontier commit like bootstrap: a crash under-counts, never
        # double-counts into a permanent quarantine
        if n_new > 0 and cfg.trap_quarantine and catalog.exists(TRAP_STATE_TABLE):
            from ..operators import traps as traps_mod

            catalog.commit(
                traps_mod.merge_trap_state(
                    catalog.load(spark, TRAP_STATE_TABLE),
                    traps_mod.host_trap_state(new_rows),
                ),
                TRAP_STATE_TABLE,
                round_id=state["round"],
                metrics={"event": "stream_ingest_traps", "batch_id": batch_id},
            )
        new_rows.unpersist()
        state["round"] += 1
        run_round(spark, catalog, pages, state["round"], cfg, rules)

    stream = (
        spark.readStream.schema(SEEDS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(seeds_dir)
    )
    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
