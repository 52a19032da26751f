"""Persisted CONTINUOUS-AGGREGATE event rollups (the 12th index
family, third algebraic one): per-(user, time-bucket) mergeable
partials maintained incrementally, so hypertable dashboards (OHLC
bars, volumes, bucket averages) never re-scan raw events.

This is TimescaleDB's continuous-aggregate shape (materialized
time_bucket rollups refreshed as data arrives) re-expressed on the
engine's algebraic-family machinery (operators/state_commit): the
reference leaves all serving to the caller — NND.scala's output
contract (NND.scala:63,66) stops at the artifact — and this family
does for the events table what token/cov stats do for text and
embeddings.

Partial row per (user_id, slot_epoch): ``n`` (count), ``c_sum``
(exact integer cents), ``c_min``/``c_max``, and the ingest-order
endpoints ``(first_eid, first_c)`` / ``(last_eid, last_c)`` picked by
event_id. Every field is MERGEABLE (count/sum add; min/max lattice;
endpoints compare event_ids), so:

- ``extend`` == fresh rebuild over the union EXACTLY (asserted in
  tests) — merge is one groupBy over stored ∪ batch partials;
- merges re-bucket EXACTLY to any coarser grain (hour → day) because
  the partials are closed under merging — the cross-grain property
  the daily-bars probe exercises;
- replay safety is the token-stats contract: each merge publishes the
  rollup AND its applied-batch marker in ONE atomic versioned rename
  (commit_state), so an at-least-once redelivery is a no-op.

Deletions/updates in the source: count/sum are subtractable but
min/max and the event-id endpoints are not invertible — removing the
event that WAS the extreme cannot be repaired from the aggregate
alone. The family therefore carries TimescaleDB's exact answer,
:func:`refresh_event_rollup`: re-aggregate the invalidated
grain-aligned window from the current hypertable and replace just
those buckets (tested delete → refresh == fresh build); a blind
``retract(events)`` API is deliberately absent.

Scale (100 TB of events): build/extend aggregate map-side to
O(users·buckets) partial rows (min_by/max_by partials carry one
(value, key) pair per group — the q207 exchange argument); the stored
rollup is corpus-size-independent per retention window; probes read
ONLY the rollup. The commit is O(rollup) per batch — at true scale
the same contract holds per time-partition so a merge rewrites only
the buckets the batch touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_nnd_spark.operators.state_commit import (
    commit_state,
    next_version,
    state_dir,
)

_PARTIAL_COLS = (
    "user_id", "slot_epoch", "n", "c_sum", "c_min", "c_max",
    "first_eid", "first_c", "last_eid", "last_c",
)


def _partial(events: DataFrame, grain_seconds: int) -> DataFrame:
    """One map-side-combined aggregate from raw events to partial rows
    — the only pass that ever touches the events table."""
    ts_sec = F.col("ts").cast("long")
    slot = (
        F.date_trunc("hour", F.col("ts")).cast("long")
        if grain_seconds == 3600
        else ts_sec - ts_sec % grain_seconds
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        events.select(
            "user_id", slot.alias("slot_epoch"), cents.alias("c"), "event_id"
        )
        .groupBy("user_id", "slot_epoch")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("c_sum"),
            F.min("c").alias("c_min"),
            F.max("c").alias("c_max"),
            F.min("event_id").alias("first_eid"),
            F.min_by("c", "event_id").alias("first_c"),
            F.max("event_id").alias("last_eid"),
            F.max_by("c", "event_id").alias("last_c"),
        )
    )


def _merge(parts: DataFrame, bucket_expr=None) -> DataFrame:
    """Merge partial rows groupwise — closed over the partial schema,
    so merging is associative and re-bucketing to a coarser grain is
    just a different grouping key. ``bucket_expr`` optionally maps
    slot_epoch to the coarser bucket (default: same grain)."""
    key = (bucket_expr if bucket_expr is not None else F.col("slot_epoch")).alias(
        "slot_epoch"
    )
    return (
        parts.groupBy("user_id", key)
        .agg(
            F.sum("n").alias("n"),
            F.sum("c_sum").alias("c_sum"),
            F.min("c_min").alias("c_min"),
            F.max("c_max").alias("c_max"),
            F.min("first_eid").alias("first_eid"),
            F.min_by("first_c", "first_eid").alias("first_c"),
            F.max("last_eid").alias("last_eid"),
            F.max_by("last_c", "last_eid").alias("last_c"),
        )
    )


def build_event_rollup(
    events: DataFrame, path: str, grain_seconds: int = 3600
) -> None:
    """Aggregate the corpus once and commit version 0: rollup +
    empty applied-markers + pinned grain (probes and extends must
    bucket exactly like the build)."""
    spark = events.sparkSession
    commit_state(
        spark, path, next_version(spark, path),
        {
            "rollup": _partial(events, grain_seconds).select(*_PARTIAL_COLS),
            "applied": spark.createDataFrame([], "batch_id long"),
            "meta": spark.createDataFrame(
                [(int(grain_seconds),)], "grain_seconds long"
            ),
        },
    )


def _state(spark: SparkSession, path: str) -> tuple[str, int]:
    state = state_dir(spark, path)
    grain = int(
        spark.read.parquet(f"{state}/meta").first()["grain_seconds"]
    )
    return state, grain


def extend_event_rollup(
    spark: SparkSession,
    path: str,
    new_events: DataFrame,
    batch_id: int | None = None,
) -> None:
    """Fold a batch of events in: aggregate the batch map-side, merge
    with the stored rollup (one groupBy over stored ∪ batch partials —
    exactly equals a fresh build over the union, tested), publish
    rollup + applied markers atomically. A replayed ``batch_id`` is a
    no-op BEFORE any work (the token-stats at-most-once contract)."""
    state, grain = _state(spark, path)
    applied = spark.read.parquet(f"{state}/applied")
    if batch_id is not None and applied.filter(
        F.col("batch_id") == int(batch_id)
    ).take(1):
        return
    stored = spark.read.parquet(f"{state}/rollup")
    merged = _merge(
        stored.unionByName(_partial(new_events, grain).select(*_PARTIAL_COLS))
    ).select(*_PARTIAL_COLS).localCheckpoint(eager=True)
    if batch_id is not None:
        applied = applied.unionByName(
            spark.createDataFrame([(int(batch_id),)], "batch_id long")
        )
    applied = applied.localCheckpoint(eager=True)
    meta = spark.read.parquet(f"{state}/meta").localCheckpoint(eager=True)
    commit_state(
        spark, path, next_version(spark, path),
        {"rollup": merged, "applied": applied, "meta": meta},
    )


def refresh_event_rollup(
    spark: SparkSession,
    path: str,
    events: DataFrame,
    since_epoch: int,
    until_epoch: int,
) -> None:
    """TimescaleDB's invalidation-REFRESH: re-aggregate the buckets in
    ``[since_epoch, until_epoch)`` from the CURRENT hypertable slice
    and replace exactly those stored rows — how deletions/updates in
    the source reach the rollup, since min/max and the event-id
    endpoints cannot be subtracted out of an aggregate. Buckets
    outside the window are untouched; an empty window slice simply
    clears its buckets. Published atomically like every other commit;
    callers pass the events table (or the affected slice — only rows
    whose bucket lands in the window contribute).

    Scale: one map-side aggregate over the window's events + an
    O(rollup) filtered rewrite — refresh cost tracks the invalidated
    window, the hypertable pays one pruned scan (ts-partitioned
    layouts prune to the window's files)."""
    state, grain = _state(spark, path)
    if int(since_epoch) % grain or int(until_epoch) % grain:
        msg = (
            f"refresh window [{since_epoch}, {until_epoch}) must align to "
            f"the rollup grain ({grain}s) — a misaligned boundary would "
            "recompute a bucket from a partial event slice"
        )
        raise ValueError(msg)
    stored = spark.read.parquet(f"{state}/rollup")
    kept = stored.filter(
        (F.col("slot_epoch") < int(since_epoch))
        | (F.col("slot_epoch") >= int(until_epoch))
    )
    ts_sec = F.col("ts").cast("long")
    window = events.filter(
        (ts_sec >= int(since_epoch)) & (ts_sec < int(until_epoch))
    )
    merged = (
        kept.unionByName(_partial(window, grain).select(*_PARTIAL_COLS))
        .select(*_PARTIAL_COLS)
        .localCheckpoint(eager=True)
    )
    applied = spark.read.parquet(f"{state}/applied").localCheckpoint(
        eager=True
    )
    meta = spark.read.parquet(f"{state}/meta").localCheckpoint(eager=True)
    commit_state(
        spark, path, next_version(spark, path),
        {"rollup": merged, "applied": applied, "meta": meta},
    )


def rollup_table(spark: SparkSession, path: str) -> DataFrame:
    """The stored partial rows — zero events I/O."""
    state, _ = _state(spark, path)
    return spark.read.parquet(f"{state}/rollup")


def ohlc_from_rollup(spark: SparkSession, path: str) -> DataFrame:
    """q207's exact OHLC bars served from the stored rollup: open and
    close are the stored ingest-order endpoints, high/low the stored
    extremes — no events scan, served == inline is the assertion."""
    return rollup_table(spark, path).select(
        "user_id",
        "slot_epoch",
        (F.col("first_c") / 100.0).alias("open"),
        (F.col("c_max") / 100.0).alias("high"),
        (F.col("c_min") / 100.0).alias("low"),
        (F.col("last_c") / 100.0).alias("close"),
        F.col("n").alias("n_events"),
    )


def daily_bars_from_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Daily OHLC + volume RE-BUCKETED from the stored hourly partials
    (the cross-grain merge the partial schema exists for): one
    O(rollup) groupBy — the raw events are never touched. ``volume``
    is the exact summed cents presented in units."""
    day = F.col("slot_epoch") - F.col("slot_epoch") % F.lit(86400)
    return _merge(rollup_table(spark, path), bucket_expr=day).select(
        "user_id",
        F.col("slot_epoch").alias("day_epoch"),
        (F.col("first_c") / 100.0).alias("open"),
        (F.col("c_max") / 100.0).alias("high"),
        (F.col("c_min") / 100.0).alias("low"),
        (F.col("last_c") / 100.0).alias("close"),
        F.col("n").alias("n_events"),
        (F.col("c_sum") / 100.0).alias("volume"),
    )
