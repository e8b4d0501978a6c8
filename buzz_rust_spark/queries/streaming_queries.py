"""Event-stream queries (batch form of the Structured-Streaming operators —
the streaming execution path itself is covered in tests/test_streaming.py,
where the batch result is the oracle for the incremental run)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.windows import sessionize, windowed_event_counts
from .registry import load, register


@register(
    "e01_event_hourly_windows",
    headline=True,
    tags=("events", "window"),
    oracle="""
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS value_sum
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def e01_event_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (same function runs streaming
    with a watermark)."""
    return windowed_event_counts(
        load(spark, sf_dir, "events"), window_duration="1 hour"
    ).orderBy("window_start", "event_type")


@register(
    "e02_sessionize",
    tags=("events", "window"),
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
         -- strict > matches session_window's boundary semantics: a gap
         -- EXACTLY equal to the gap duration MERGES (verified empirically —
         -- Spark closes a session only when the next event is strictly
         -- beyond lastEvent + gap)
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id < 50
), islands AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT user_id,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
       COUNT(*) AS n_events
FROM islands GROUP BY user_id, session_no
""",
)
def e02_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (native session_window; state-store backed
    when run on a stream)."""
    return sessionize(
        load(spark, sf_dir, "events").where(F.col("user_id") < 50), gap="30 minutes"
    )


@register(
    "e03_latest_event_per_user",
    tags=("events", "agg"),
    oracle="""
SELECT user_id, CAST(ts AS TIMESTAMP) AS last_ts, event_type AS last_event_type,
       ROUND(value, 6) AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1 ORDER BY user_id
""",
)
def e03_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key compaction (CDC/upsert materialized view shape).

    Implemented as ``max_by`` over the (ts, event_id) order key instead of a
    row_number window: the aggregate partial-combines map-side, so at 100 TB
    each executor ships one row per key instead of shuffling the full event
    log to sort it.  (ts, event_id) is unique per user, so this is exactly
    the ROW_NUMBER()=1 result the oracle computes."""
    e = load(spark, sf_dir, "events")
    latest = e.groupBy("user_id").agg(
        F.max_by(
            F.struct("ts", "event_type", "value"), F.struct("ts", "event_id")
        ).alias("last")
    )
    return latest.select(
        "user_id",
        F.col("last.ts").alias("last_ts"),
        F.col("last.event_type").alias("last_event_type"),
        F.round(F.col("last.value"), 6).alias("last_value"),
    ).orderBy("user_id")
