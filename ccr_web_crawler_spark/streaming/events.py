"""Event-stream operators — sessionization and windowed aggregation.

The reference is batch-iterative (SURVEY §2.9: no event-time semantics
exist in it); these are the scale-up stream operators over the `events`
table shape ``(event_id, ts, user_id, event_type, value, props)``.
Each is written as a pure DataFrame transform so the SAME function runs
in a batch job or a Structured Streaming query (`readStream` input +
``with_watermark=True``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Gap-based sessions per user (batch form): a new session starts
    when the pause since the previous event exceeds the gap. Classic
    lag + running-sum; one shuffle on user_id."""
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = int(gap_minutes * 60 * 1_000_000)
    # exact integer-microsecond gap test (also TIMESTAMP_NTZ-safe)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    is_new = (
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(us - F.lag(us).over(w) > gap_us, 1)
        .otherwise(0)
    )
    return df.withColumn("session_no", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)))


def session_stats(df: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Per-user session summary: sessions, events, mean session length."""
    s = sessionize(df, gap_minutes)
    per_session = s.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        (
            (F.max(F.unix_micros(F.col("ts").cast("timestamp")))
             - F.min(F.unix_micros(F.col("ts").cast("timestamp")))) / F.lit(1e6)
        ).alias("span_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.round(F.avg("span_s"), 2).alias("avg_span_s"),
    )


def tumbling_counts(
    df: DataFrame, minutes: int = 60, with_watermark: bool = False
) -> DataFrame:
    """Tumbling event-time window counts per event_type. With
    ``with_watermark`` this exact plan runs under Structured Streaming
    (late data dropped past 10 minutes)."""
    src = df.withWatermark("ts", "10 minutes") if with_watermark else df
    return (
        src.groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
