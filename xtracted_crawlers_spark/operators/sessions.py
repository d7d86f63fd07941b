"""Sessionization: gap-based event sessions.

Batch form: pure window functions (lag → new-session flag → running sum),
fully SQL-expressible so the DuckDB oracle checks it exactly. One shuffle
(partition by user), everything else runs inside the sort — the classic
scalable sessionization plan.

Streaming form: applyInPandasWithState keeps an open-session state per
user with a processing-time timeout — the custom-stateful-operator path
for when sessions must close incrementally instead of per batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_S = 1800


def sessionize(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """(user_id, session_id, n_events, session_start, session_end) from an
    events table with (user_id, ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # TIMESTAMP_NTZ can't cast straight to double; go via TIMESTAMP (the
    # session tz is pinned to UTC so this equals DuckDB's epoch(ts))
    epoch = F.col("ts").cast("timestamp").cast("double")
    flagged = events.withColumn(
        "_new",
        F.when(
            epoch - F.lag(epoch).over(w) > F.lit(float(gap_s)),
            1,
        )
        .otherwise(0)
        .cast("long"),
    ).withColumn(
        "session_id",
        F.sum("_new").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


SQL_SESSIONIZE_TEMPLATE = """
with flagged as (
  select user_id, ts, event_id,
         case when epoch(ts) - epoch(lag(ts) over (partition by user_id order by ts, event_id)) > {gap}
              then 1 else 0 end as _new
  from events
), numbered as (
  select user_id, ts,
         -- cast: DuckDB types sum(int) as HUGEINT (→ float64 via pandas);
         -- Spark emits bigint — the driver's value-hash is dtype-exact
         cast(sum(_new) over (partition by user_id order by ts, event_id
                              rows between unbounded preceding and current row) as bigint) as session_id
  from flagged
)
select user_id, session_id, count(*) as n_events,
       min(ts) as session_start, max(ts) as session_end
from numbered group by 1, 2
"""


def sessionize_stream(events, gap_s: int = DEFAULT_GAP_S, timeout_s: int = 3600):
    """Stateful streaming sessionization via applyInPandasWithState: one
    open session per user held in state, closed on gap or timeout.
    Emits closed sessions. Input must be a streaming DataFrame with
    (user_id long, ts timestamp, event_id long)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, session_id long, n_events long, "
        "session_start timestamp, session_end timestamp"
    )
    state_schema = "session_id long, n_events long, start double, last double"

    def _ts(epoch_s: float) -> pd.Timestamp:
        # round to whole microseconds: Arrow's timestamp[us] rejects the
        # sub-us remainder a float-seconds epoch carries at ns precision
        return pd.Timestamp(int(round(epoch_s * 1e6)), unit="us", tz="UTC")

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            sid, n, start, last = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    (
                        user_id,
                        sid,
                        n,
                        _ts(start),
                        _ts(last),
                    )
                ],
                columns=["user_id", "session_id", "n_events", "session_start", "session_end"],
            )
            return
        rows = []
        if state.exists:
            sid, n, start, last = state.get
        else:
            sid, n, start, last = 0, 0, None, None
        for pdf in pdf_iter:
            for ts in sorted(pdf["ts"]):
                t = ts.timestamp()
                if last is not None and t - last > gap_s:
                    rows.append((user_id, sid, n, _ts(start), _ts(last)))
                    sid, n, start = sid + 1, 0, t
                if start is None:
                    start = t
                n += 1
                last = t
        state.update((sid, n, start, last))
        state.setTimeoutDuration(timeout_s * 1000)
        yield pd.DataFrame(
            rows,
            columns=["user_id", "session_id", "n_events", "session_start", "session_end"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.ProcessingTimeTimeout
    )
