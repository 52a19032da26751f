"""Persisted CONTINUOUS-AGGREGATE event rollups (the 12th index
family, third algebraic one): per-(user, time-bucket) mergeable
partials maintained incrementally, so hypertable dashboards (OHLC
bars, volumes, bucket averages) never re-scan raw events.

This is TimescaleDB's continuous-aggregate shape (materialized
time_bucket rollups refreshed as data arrives) re-expressed on the
engine's algebraic-family machinery: the reference leaves all serving
to the caller — NND.scala's output contract (NND.scala:63,66) stops
at the artifact — and this family does for the events table what
token/cov stats do for text and embeddings.

Partial row per (user_id, slot_epoch): ``n`` (count), ``c_sum``
(exact integer cents), ``c_min``/``c_max``, and the ingest-order
endpoints ``(first_eid, first_c)`` / ``(last_eid, last_c)`` picked by
event_id. Every field is MERGEABLE (count/sum add; min/max lattice;
endpoints compare event_ids), so:

- ``extend`` == fresh rebuild over the union EXACTLY (asserted in
  tests) — merge touches only the (user, slot) groups the batch
  carries;
- merges re-bucket EXACTLY to any coarser grain (hour → day) because
  the partials are closed under merging — the cross-grain property
  the daily-bars probe exercises;
- replay safety: applied-batch markers publish in the same atomic
  per-window rename as the window's rollup, so an at-least-once
  redelivery skips every window it already reached.

Deletions/updates in the source: count/sum are subtractable but
min/max and the event-id endpoints are not invertible — removing the
event that WAS the extreme cannot be repaired from the aggregate
alone. The family therefore carries TimescaleDB's exact answer,
:func:`refresh_event_rollup`: re-aggregate the invalidated
grain-aligned window from the current hypertable and replace just
those buckets (tested delete → refresh == fresh build); a blind
``retract(events)`` API is deliberately absent.

Scale (100 TB of events) — the r14 finding (extend committed
O(rollup) per batch: 9.2→27.8 MB shuffle at fixed 10k batch over 4×
events) is closed by TWO independent bounds:

- **merge shuffle is O(batch keys)**: the batch's partial keys
  broadcast into the stored scan; stored rows NOT keyed by the batch
  pass through map-side (broadcast anti-join — no exchange), and only
  the O(batch-keys) matched rows + batch partials enter the merge
  groupBy. Nothing O(rollup) ever shuffles on ingest.
- **the commit is per-TIME-WINDOW (TimescaleDB's chunks)**: the
  rollup is hive-partitioned by a coarse ``win`` of ``slot_epoch``
  (pinned at build, default 7 days) and each window carries its OWN
  versioned state (``{path}/win={w}/state/v={k}/``, the
  state_commit staging+rename discipline per window) — an extend
  rewrites only the windows the batch touches, so a time-local
  ingest batch pays O(its windows' rollup) write, not O(retention).

Atomicity contract under partitioning: rollup content + applied
marker publish in ONE rename PER WINDOW; a crash mid-extend leaves
some windows applied and others not, and the retry converges —
applied windows are skipped by their own marker, so no field is ever
double-counted (the cross-window analogue of TimescaleDB refreshing
chunk by chunk). Probes union the windows' latest committed states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_nnd_spark.operators.state_commit import (
    _fs,
    committed_versions,
)

_PARTIAL_COLS = (
    "user_id", "slot_epoch", "n", "c_sum", "c_min", "c_max",
    "first_eid", "first_c", "last_eid", "last_c",
)

_PARTIAL_DDL = (
    "user_id long, slot_epoch long, n long, c_sum long, c_min long, "
    "c_max long, first_eid long, first_c long, last_eid long, last_c long"
)

_WINDOW_SECONDS_DEFAULT = 7 * 86400


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


def _win_col(window_seconds: int):
    return F.floor(F.col("slot_epoch") / F.lit(int(window_seconds))).cast(
        "long"
    )


def _meta(spark: SparkSession, path: str) -> tuple[int, int]:
    row = spark.read.parquet(f"{path}/meta").first()
    return int(row["grain_seconds"]), int(row["window_seconds"])


def _list_wins(spark: SparkSession, path: str) -> list[int]:
    jvm, fs = _fs(spark, path)
    root = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("win="):
            try:
                out.append(int(name[4:]))
            except ValueError:
                continue
    return sorted(out)


def _win_state(spark: SparkSession, path: str, w: int) -> str | None:
    vs = committed_versions(spark, f"{path}/win={w}")
    return f"{path}/win={w}/state/v={vs[-1]}" if vs else None


def _applied_in(spark: SparkSession, state: str, batch_id: int) -> bool:
    jvm, fs = _fs(spark, state)
    return fs.exists(
        jvm.org.apache.hadoop.fs.Path(f"{state}/applied_b={int(batch_id)}")
    )


def _commit_window(
    spark: SparkSession,
    path: str,
    w: int,
    rollup_src: str | None,
    add_batch: int | None,
) -> None:
    """Publish one window's next version with a single RENAME: the
    merged rollup dir (pre-written by the caller's one partitioned
    job, or None for an emptied window), the previous version's
    applied markers carried forward as empty files, plus the new
    batch's marker — content and marker become visible in one
    indivisible event, per window. GC keeps the predecessor so lazy
    readers stay valid (the state_commit discipline)."""
    jvm, fs = _fs(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    wroot = f"{path}/win={w}"
    vs = committed_versions(spark, wroot)
    version = (vs[-1] + 1) if vs else 0
    staging = f"{wroot}/state/_staging_v={version}"
    fs.delete(P(staging), True)
    fs.mkdirs(P(staging))
    if rollup_src is not None:
        if not fs.rename(P(rollup_src), P(f"{staging}/rollup")):
            msg = f"window commit rename failed: {rollup_src}"
            raise OSError(msg)
    else:
        # emptied window (refresh cleared it): a schema-bearing empty
        # table so the union read path needs no special case
        spark.createDataFrame([], _PARTIAL_DDL).coalesce(1).write.parquet(
            f"{staging}/rollup"
        )
    if vs:
        prev = f"{wroot}/state/v={vs[-1]}"
        for st in fs.listStatus(P(prev)):
            name = st.getPath().getName()
            if name.startswith("applied_b="):
                fs.create(P(f"{staging}/{name}")).close()
    if add_batch is not None:
        fs.create(P(f"{staging}/applied_b={int(add_batch)}")).close()
    fs.create(P(f"{staging}/_COMMITTED")).close()
    if not fs.rename(P(staging), P(f"{wroot}/state/v={version}")):
        msg = f"window commit rename failed: {staging} -> v={version}"
        raise OSError(msg)
    for v in committed_versions(spark, wroot):
        if v < version - 1:
            fs.delete(P(f"{wroot}/state/v={v}"), True)


def _staged_wins(spark: SparkSession, staging: str) -> list[int]:
    jvm, fs = _fs(spark, staging)
    root = jvm.org.apache.hadoop.fs.Path(staging)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("win="):
            out.append(int(name[4:]))
    return sorted(out)


def build_event_rollup(
    events: DataFrame,
    path: str,
    grain_seconds: int = 3600,
    window_seconds: int = _WINDOW_SECONDS_DEFAULT,
) -> None:
    """Aggregate the corpus once (one map-side-combined job, written
    hive-partitioned by the coarse window) and commit every window's
    version 0 by rename; pin grain + window size so probes and
    extends bucket exactly like the build. Build targets a fresh
    path — windows are independently versioned thereafter."""
    spark = events.sparkSession
    staging = f"{path}/_build_staging"
    jvm, fs = _fs(spark, path)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
    (
        _partial(events, grain_seconds)
        .select(*_PARTIAL_COLS)
        .withColumn("win", _win_col(window_seconds))
        # one exchange keyed by window -> ONE file per window dir, so
        # every later probe scans O(windows) files, not O(write tasks)
        .repartition("win")
        .write.partitionBy("win")
        .parquet(staging)
    )
    for w in _staged_wins(spark, staging):
        _commit_window(spark, path, w, f"{staging}/win={w}", add_batch=None)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
    spark.createDataFrame(
        [(int(grain_seconds), int(window_seconds))],
        "grain_seconds long, window_seconds long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def _stored_for(
    spark: SparkSession, path: str, wins: list[int]
) -> DataFrame:
    """Latest committed rollup rows of the given windows (empty-schema
    frame if none exist yet)."""
    parts = []
    for w in wins:
        state = _win_state(spark, path, w)
        if state is not None:
            parts.append(spark.read.parquet(f"{state}/rollup"))
    if not parts:
        return spark.createDataFrame([], _PARTIAL_DDL)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def extend_event_rollup(
    spark: SparkSession,
    path: str,
    new_events: DataFrame,
    batch_id: int | None = None,
) -> None:
    """Fold a batch of events in with BOTH scale bounds live:

    - shuffle O(batch): the batch aggregates map-side to its partial
      keys; stored rows keyed by the batch are semi-joined out
      (broadcast), merged with the batch partials, and everything
      else passes through with a broadcast anti-join — the stored
      rollup never enters an exchange;
    - write O(touched windows): the merged result lands
      hive-partitioned by window, and only the touched windows commit
      a new version (single rename each, applied marker inside).

    A replayed ``batch_id`` skips every window that already carries
    its marker — a full replay is a no-op before any state work, a
    crashed half-applied extend converges on retry without
    double-counting (per-window atomicity, documented module-level).
    """
    grain, win_s = _meta(spark, path)
    bparts = (
        _partial(new_events, grain)
        .select(*_PARTIAL_COLS)
        .withColumn("win", _win_col(win_s))
        .localCheckpoint(eager=True)
    )
    touched = sorted(
        r["win"] for r in bparts.select("win").distinct().collect()
    )
    if batch_id is not None:
        todo = []
        for w in touched:
            state = _win_state(spark, path, w)
            if state is None or not _applied_in(spark, state, batch_id):
                todo.append(w)
    else:
        todo = touched
    if not todo:
        return
    bparts = bparts.filter(F.col("win").isin([int(w) for w in todo]))
    keys = F.broadcast(bparts.select("user_id", "slot_epoch").distinct())
    stored = _stored_for(spark, path, todo)
    kept = stored.join(keys, ["user_id", "slot_epoch"], "left_anti")
    hot = _merge(
        stored.join(keys, ["user_id", "slot_epoch"], "left_semi").unionByName(
            bparts.select(*_PARTIAL_COLS)
        )
    )
    out = (
        kept.select(*_PARTIAL_COLS)
        .unionByName(hot.select(*_PARTIAL_COLS))
        .withColumn("win", _win_col(win_s))
    )
    staging = f"{path}/_extend_staging"
    jvm, fs = _fs(spark, path)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
    # coalesce(1) is a NARROW dependency: no exchange enters the plan
    # (the flat extend-shuffle record), and each touched window dir
    # stays one file so probe scans don't degrade batch over batch;
    # the single write task moves only the touched windows' rows
    out.coalesce(1).write.partitionBy("win").parquet(staging)
    for w in todo:
        src = f"{staging}/win={w}"
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(src)):
            src = None  # window emptied (cannot happen on extend; safe)
        _commit_window(spark, path, w, src, add_batch=batch_id)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)


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
    clears its buckets. Commits per overlapped TIME-WINDOW (the same
    chunk discipline as extend), applied markers carried forward.

    Scale: one map-side aggregate over the window's events + a
    filtered rewrite of ONLY the overlapped windows — refresh cost
    tracks the invalidated window, the hypertable pays one pruned
    scan (ts-partitioned layouts prune to the window's files)."""
    grain, win_s = _meta(spark, path)
    if int(since_epoch) % grain or int(until_epoch) % grain:
        msg = (
            f"refresh window [{since_epoch}, {until_epoch}) must align to "
            f"the rollup grain ({grain}s) — a misaligned boundary would "
            "recompute a bucket from a partial event slice"
        )
        raise ValueError(msg)
    lo_w = int(since_epoch) // win_s
    hi_w = (int(until_epoch) - 1) // win_s
    touched = sorted(
        set(w for w in _list_wins(spark, path) if lo_w <= w <= hi_w)
    )
    ts_sec = F.col("ts").cast("long")
    window = events.filter(
        (ts_sec >= int(since_epoch)) & (ts_sec < int(until_epoch))
    )
    parts = (
        _partial(window, grain)
        .select(*_PARTIAL_COLS)
        .withColumn("win", _win_col(win_s))
        .localCheckpoint(eager=True)
    )
    touched = sorted(
        set(touched)
        | {r["win"] for r in parts.select("win").distinct().collect()}
    )
    if not touched:
        return
    kept = _stored_for(spark, path, touched).filter(
        (F.col("slot_epoch") < int(since_epoch))
        | (F.col("slot_epoch") >= int(until_epoch))
    )
    out = (
        kept.select(*_PARTIAL_COLS)
        .unionByName(parts.select(*_PARTIAL_COLS))
        .withColumn("win", _win_col(win_s))
    )
    staging = f"{path}/_refresh_staging"
    jvm, fs = _fs(spark, path)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
    # narrow single-task write: same rationale as extend
    out.coalesce(1).write.partitionBy("win").parquet(staging)
    for w in touched:
        src = f"{staging}/win={w}"
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(src)):
            src = None  # refresh emptied this window
        _commit_window(spark, path, w, src, add_batch=None)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)


def rollup_table(spark: SparkSession, path: str) -> DataFrame:
    """The stored partial rows — the union of every window's latest
    committed state; zero events I/O."""
    return _stored_for(spark, path, _list_wins(spark, path))


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
