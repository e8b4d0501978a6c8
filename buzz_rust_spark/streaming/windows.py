"""Structured Streaming surface: windowed event aggregation with watermarks.

The reference engine is batch-only (SURVEY.md §1.1: its "stream" is an
execution-internal pipe); streaming here is a rebuild extension.  The same
transformation function serves batch DataFrames and streaming readers so batch
runs are the correctness oracle for the streaming path (tested in
tests/test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP event time; parquet TIMESTAMP(NANOS)
    reads as TIMESTAMP_NTZ in Spark 4 (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    otherwise).  Applied only on the watermarked/streaming path so batch
    results keep their driver-checked NTZ types."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str | None = None,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts + value sum per event type.

    On a streaming DataFrame pass ``watermark`` (e.g. ``"2 hours"``) to bound
    state; late rows beyond the watermark are dropped — standard
    Structured-Streaming semantics.  Output: window_start, key, n_events,
    value_sum."""
    df = events
    if watermark is not None:
        df = _as_event_time(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window_duration).alias("_w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "value_sum",
        )
    )


def stream_events_from_parquet(
    spark, path: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source streaming read of a parquet directory (one file per
    micro-batch) — the test harness for streaming parity.  ``path`` is the
    TABLE directory (e.g. ``f"{sf_dir}/events.parquet"``), not the
    scale-factor root — the root holds every table and would mix schemas."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows per user (gap-based), batch or streaming.

    Uses Spark's native ``session_window`` — state-store backed in streaming,
    plain aggregation in batch.  Output: user, session_start, session_end,
    n_events.  STREAMING callers must pass ``watermark`` (how much event-time
    lateness to absorb before a session can close): Spark rejects streaming
    session-window aggregation without one."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("_w"), F.col(user_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_events(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once event deduplication by key, batch or streaming.

    Streaming uses ``dropDuplicatesWithinWatermark``: per-key state is kept
    only inside the watermark horizon, so state is bounded — the standard
    recipe for at-least-once sources (Kafka redeliveries, retried file
    uploads).  Batch runs plain ``dropDuplicates`` on the same keys, which is
    the oracle the streaming test compares against."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return (
            _as_event_time(events, ts_col)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys)
        )
    return events.dropDuplicates(keys)


def click_purchase_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: each click matched to later purchases by the
    same user within ``within``.

    Both sides carry watermarks and the join predicate time-bounds the match,
    so the state store can evict rows once the watermark passes — the standard
    bounded-state stream-stream join recipe.  Works identically on batch
    DataFrames (watermark is a no-op there), which the tests use as oracle."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if clicks.isStreaming:
        c = _as_event_time(c, "click_ts").withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = _as_event_time(p, "purchase_ts").withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
    ).select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts")
