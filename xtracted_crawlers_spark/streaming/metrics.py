"""Streaming crawl telemetry: watermarked, windowed per-host fetch rates.

The batch loop already writes per-round metrics into the snapshot
manifest (crawl.run_round); an always-on deployment additionally wants a
LIVE view — "requests per host per minute, tolerate stragglers, finalize
windows once they can't change" — which is exactly Structured
Streaming's watermark + window aggregation. The reference emits per-URL
log lines (xtracted_logging.py) and nothing aggregated; this is the
scaled-up twin: one stateful aggregation, state bounded by the
watermark horizon × active hosts.

Semantics (pinned by tests/test_streaming_metrics.py):
- event time = the fetch timestamp, NOT arrival time; out-of-order
  events within the watermark horizon land in their true window;
- events later than the watermark are DROPPED (the politeness audit
  reads committed snapshots, not this stream — a late fetch is never
  lost from the system of record, only from the live view);
- append output mode: a window row is emitted exactly once, when the
  watermark passes its end — downstream sinks see finalized rates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_EVENT_SCHEMA = "ts timestamp, host string, status string"


def host_fetch_rates(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """(window_start, window_end, host, n_fetched, n_completed) per
    event-time window. Works on a streaming OR batch DataFrame of fetch
    events (ts, host, status) — the batch form is the oracle twin of
    the streaming form (same expression tree, no watermark needed)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    w = F.window("ts", window)
    return (
        src.groupBy(w.alias("w"), "host")
        .agg(
            F.count(F.lit(1)).alias("n_fetched"),
            F.sum((F.col("status") == "complete").cast("long")).alias("n_completed"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_fetched",
            "n_completed",
        )
    )


def stream_host_rates(
    spark,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    max_files_per_trigger: int = 1,
):
    """File-source deployment shape: JSON fetch-event files → finalized
    per-host window rates as parquet. max_files_per_trigger=1 makes each
    file its own micro-batch so watermark progression (and late-drop) is
    deterministic — tests rely on that; production would raise it."""
    events = (
        spark.readStream.schema(FETCH_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(events_dir)
    )
    rates = host_fetch_rates(events, window, watermark)
    return (
        rates.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
