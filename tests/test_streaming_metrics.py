"""Watermarked windowed fetch-rate stream (streaming/metrics.py):
event-time windows, out-of-order tolerance inside the horizon, late-drop
beyond it, and batch/streaming twin equivalence."""

import json
import os
import time

from pyspark.sql import functions as F

from xtracted_crawlers_spark.streaming import metrics


def _write_events(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for ts, host, status in rows:
            f.write(json.dumps({"ts": ts, "host": host, "status": status}) + "\n")


def test_host_fetch_rates_batch_semantics(spark):
    rows = [
        ("2026-01-01 00:00:10", "a.test", "complete"),
        ("2026-01-01 00:00:50", "a.test", "missed"),
        ("2026-01-01 00:01:10", "a.test", "complete"),
        ("2026-01-01 00:00:30", "b.test", "complete"),
    ]
    df = spark.createDataFrame(rows, "ts string, host string, status string").select(
        F.col("ts").cast("timestamp").alias("ts"), "host", "status"
    )
    out = {
        (str(r["window_start"]), r["host"]): (r["n_fetched"], r["n_completed"])
        for r in metrics.host_fetch_rates(df).collect()
    }
    assert out[("2026-01-01 00:00:00", "a.test")] == (2, 1)
    assert out[("2026-01-01 00:01:00", "a.test")] == (1, 1)
    assert out[("2026-01-01 00:00:00", "b.test")] == (1, 1)


def test_stream_finalizes_windows_and_drops_late(spark, tmp_path):
    """Four micro-batches (one file each; the late-input filter uses the
    PREVIOUS batch's watermark, so the closed window must be one batch
    old before the late row arrives): b1 fills window [00:00,00:01),
    b2 advances event time to 00:03:30 (watermark 00:01:30 closes and
    emits the window at that batch's end), b3 advances again, b4 carries
    (i) an out-of-order event INSIDE the horizon, counted into its open
    window's state, and (ii) a too-late event for the closed window,
    DROPPED. Finalized output must equal the batch twin over the
    non-late rows."""
    ev = tmp_path / "events"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    _write_events(str(ev / "b1.json"), [
        ("2026-01-01 00:00:10", "a.test", "complete"),
        ("2026-01-01 00:00:20", "b.test", "missed"),
    ])
    time.sleep(1.1)  # distinct mtimes: the file source orders batches by mtime
    _write_events(str(ev / "b2.json"), [
        ("2026-01-01 00:03:30", "a.test", "complete"),
    ])
    time.sleep(1.1)
    _write_events(str(ev / "b3.json"), [
        ("2026-01-01 00:03:40", "a.test", "complete"),
    ])
    time.sleep(1.1)
    _write_events(str(ev / "b4.json"), [
        ("2026-01-01 00:02:30", "a.test", "complete"),   # in-horizon, out of order
        ("2026-01-01 00:00:40", "a.test", "complete"),   # too late: DROPPED
    ])
    q = metrics.stream_host_rates(spark, str(ev), str(ck), str(out))
    q.awaitTermination(120)
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped >= 1, "late event was not dropped by the watermark"
    got = spark.read.parquet(str(out))
    rows = {
        (str(r["window_start"]), r["host"]): (r["n_fetched"], r["n_completed"])
        for r in got.collect()
    }
    # finalized-only, late-free: the closed window holds ONLY the b1 rows
    assert rows[("2026-01-01 00:00:00", "a.test")] == (1, 1)
    assert rows[("2026-01-01 00:00:00", "b.test")] == (1, 0)
    # batch twin over the non-late rows agrees on every emitted window
    nonlate = spark.createDataFrame(
        [
            ("2026-01-01 00:00:10", "a.test", "complete"),
            ("2026-01-01 00:00:20", "b.test", "missed"),
            ("2026-01-01 00:03:30", "a.test", "complete"),
            ("2026-01-01 00:03:40", "a.test", "complete"),
            ("2026-01-01 00:02:30", "a.test", "complete"),
        ],
        "ts string, host string, status string",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "host", "status")
    twin = {
        (str(r["window_start"]), r["host"]): (r["n_fetched"], r["n_completed"])
        for r in metrics.host_fetch_rates(nonlate).collect()
    }
    for k, v in rows.items():
        assert twin[k] == v, k
