"""Gap sessionization: batch window plan + stateful streaming variant."""

import pytest
from pyspark.sql import functions as F

from xtracted_crawlers_spark.operators import sessions


def test_batch_sessionize_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1),
        (1, "2024-01-01 00:10:00", 2),   # same session (gap 600 < 1800)
        (1, "2024-01-01 01:00:00", 3),   # new session (gap 3000)
        (2, "2024-01-01 00:00:00", 4),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string, event_id long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in sessions.sessionize(ev, gap_s=1800).collect()
    }
    assert out == {(1, 0): 2, (1, 1): 1, (2, 0): 1}


def test_streaming_sessionize_matches_batch_closed_sessions(spark, tmp_path):
    """One availableNow pass: every session the stream CLOSES (gap inside
    the data) must match the batch result; each user's final session stays
    open in state."""
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("user_id") < 10)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id")
    )
    src = str(tmp_path / "ev_stream")
    ev.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp, event_id long").parquet(src)
    q = (
        sessions.sessionize_stream(stream, gap_s=1800)
        .writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_start"], r["session_end"])
        for r in spark.sql("select * from closed_sessions").collect()
    }
    batch = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_start"], r["session_end"])
        for r in sessions.sessionize(ev, gap_s=1800).collect()
    }
    # the stream emits exactly the batch sessions minus each user's last
    last_per_user = {}
    for (u, sid) in batch:
        last_per_user[u] = max(last_per_user.get(u, -1), sid)
    expected = {k: v for k, v in batch.items() if k[1] != last_per_user[k[0]]}
    assert streamed == expected
    assert len(streamed) > 0
