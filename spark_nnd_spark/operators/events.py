"""Event-stream operators (batch form) over the ``events`` table.

The reference has no streaming/temporal surface (SURVEY.md §2.3);
these are extensions exercising the window-function and time-bucketing
primitives a pipeline needs. Each has an exact SQL rendering, so all
are DuckDB-oracle-checkable. The Structured Streaming versions of the
same computations live in spark_nnd_spark/streaming/.

Scale: sessionize and running aggregates shuffle once on user_id;
tumbling windows aggregate on (bucket, type) with partial aggregation
map-side. No driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign session ids per user: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``. Returns per-session
    rows (user_id, session_id, n_events, t_start, t_end).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_breaks = df.withColumn(
        "is_break", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    with_sess = with_breaks.withColumn(
        "session_id",
        F.sum("is_break").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
        )
        .orderBy("user_id", "session_id")
    )


def tumbling_counts(df: DataFrame, hours: int = 1) -> DataFrame:
    """Tumbling event-time windows: count + value sum per (window start,
    event_type)."""
    bucket = F.date_trunc("hour", F.col("ts"))
    return (
        df.groupBy(bucket.alias("w_start"), F.col("event_type"))
        .agg(F.count("*").alias("c"), F.sum("value").alias("v"))
        .orderBy("w_start", "event_type")
    )


def running_user_value(df: DataFrame) -> DataFrame:
    """Running per-user cumulative value ordered by event time."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.select(
        "user_id",
        "event_id",
        F.sum("value").over(w).alias("running_value"),
    ).orderBy("user_id", "event_id")


def latest_event_per_user(df: DataFrame) -> DataFrame:
    """Dedup-with-preference on the events table: latest event per user
    (ties by event_id desc)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("user_id")
    )
