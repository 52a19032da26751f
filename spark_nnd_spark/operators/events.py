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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    tiebreak: str = "event_id",
) -> DataFrame:
    """As-of join: attach to each left row the latest right row with
    ``right.ts <= left.ts`` for the same ``key`` (the temporal lookup
    Spark lacks as a built-in; DuckDB's native ASOF JOIN is the oracle).

    When timestamps collide the highest-``tiebreak`` right row wins
    (well-defined match under duplicate right timestamps).

    Plan shape — union + ONE window, NOT a range join: both sides union
    into one stream tagged by origin, shuffle ONCE on ``key``, sort by
    (ts, origin, tiebreak) inside each partition, and a running
    ``last(non-null right-struct)`` carries the newest right row
    forward past each left row. The tiebreak rides the window ORDER
    instead of a separate dedup window, so the whole operator is a
    single hash exchange (asserted in tests/test_plans.py). O(|L|+|R|)
    rows exchanged, no per-key quadratic pairing, skew bounded by the
    biggest single key — the right scale shape for a 100 TB event log.
    (A join-then-rank formulation pairs every left row with every
    earlier right row first: O(|L|·|R|) per key.)

    Returns all left columns plus ``{c}_asof`` per value column and
    ``{ts_col}_asof`` (null when no right row precedes the left row).
    """
    lcols = left.columns
    payload = F.struct(
        F.col(ts_col).alias("__ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        *[
            F.col(c) if c in (key, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__is_left"),
        F.col(tiebreak).cast("long").alias("__tb"),
        payload.alias("__r"),
    )
    l = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    # Order: right rows precede left at equal ts (<= matches); among
    # right rows with equal ts, ascending tiebreak puts the winner LAST,
    # which is exactly the row the running last() retains.
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, "__is_left", F.asc_nulls_last("__tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last("__r", ignorenulls=True).over(w)
    return (
        l.unionByName(r)
        .withColumn("__m", matched)
        .filter(F.col("__is_left") == 1)
        .select(
            *lcols,
            *[F.col("__m")[c].alias(f"{c}_asof") for c in value_cols],
            F.col("__m")["__ts"].alias(f"{ts_col}_asof"),
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_sec: int = -300,
    upper_sec: int = 300,
    suffix: str = "_r",
) -> DataFrame:
    """Interval join: pair each left row with every right row sharing
    ``keys`` whose timestamp falls in [left_ts+lower, left_ts+upper]
    (seconds). Right's non-key columns come back with ``suffix``.

    Plan shape — bucketized equi-join, NOT a Catalyst theta-join: a
    naive ``l.key = r.key AND r.ts BETWEEN …`` plans as a (broadcast)
    nested-loop join, quadratic per key. Instead both sides bucket
    time into windows of width w = (upper−lower): each right row lands
    in exactly one bucket, each left row probes the ≤2 buckets its
    interval can overlap (exploded, so left fans out ≤2×), and the join
    becomes a hash equi-join on (keys, bucket) with the exact BETWEEN
    as a cheap post-filter. Each qualifying pair meets exactly once
    (the right row's single bucket), so no distinct is needed.
    Shuffle is O(2|L|+|R|) rows on (keys, bucket) — time-bucketing also
    shards hot keys, so a key's worst case is its densest 2w of
    activity, not its whole history. This is the standard streaming
    interval-join layout (Flink-style), here in batch form.
    """
    w = max(upper_sec - lower_sec, 1)
    lsec = F.col(left_ts).cast("long")
    keep = [c for c in right.columns if c not in keys]
    r = right.select(
        *keys, *[F.col(c).alias(f"{c}{suffix}") for c in keep]
    ).withColumn("__bucket", F.floor(F.col(f"{right_ts}{suffix}").cast("long") / w))
    l = left.withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((lsec + lower_sec) / w), F.floor((lsec + upper_sec) / w)
                )
            )
        ),
    )
    rsec = F.col(f"{right_ts}{suffix}").cast("long")
    return (
        l.join(r, [*keys, "__bucket"])
        .filter(rsec.between(lsec + lower_sec, lsec + upper_sec))
        .drop("__bucket")
    )


def funnel_stages(df: DataFrame, steps: list[str]) -> DataFrame:
    """Ordered-funnel analysis: per user, how far through ``steps``
    (e.g. view → click → purchase) did they get, requiring each step
    to happen STRICTLY AFTER the first qualifying occurrence of the
    previous one.

    Single-exchange design: everything is window functions over one
    (user_id) partitioning with one (ts, event_id) sort — the
    cumulative "first step-i so far" feeds the candidate test for
    step i+1, and the per-user result is a final aggregate that reuses
    the window's hash partitioning, so the whole funnel costs exactly
    one shuffle of (user_id, ts, type) triples regardless of depth.
    Returns (user_id, stage, t_step1 .. t_stepN as epoch seconds,
    nullable past the reached stage).
    """
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.select("user_id", "event_id", "ts", "event_type")
    prev_cum = None
    step_cols = []
    for i, step in enumerate(steps):
        if prev_cum is None:
            cand = F.when(F.col("event_type") == step, F.col("ts"))
        else:
            # strictly after the earliest qualifying previous step seen
            # so far (the cumulative min makes this order-correct
            # without a second pass over the data)
            cand = F.when(
                (F.col("event_type") == step) & (F.col("ts") > prev_cum),
                F.col("ts"),
            )
        cum_col = f"_cum_{i}"
        out = out.withColumn(cum_col, F.min(cand).over(w_cum))
        prev_cum = F.col(cum_col)
        step_cols.append(cum_col)
    # per-user: the cumulative min at the last row is the global first
    # qualifying time for each step; aggregate min(...) reads it off
    # without re-sorting (same hash partitioning — no new exchange)
    aggs = [
        F.min(c).cast("long").alias(f"t_{step}")
        for c, step in zip(step_cols, steps)
    ]
    stage = F.lit(0)
    for i, step in enumerate(steps):
        stage = F.when(F.col(f"t_{step}").isNotNull(), i + 1).otherwise(stage)
    return out.groupBy("user_id").agg(*aggs).withColumn("stage", stage.cast("long"))


def retention_cohorts(df: DataFrame, bucket_seconds: int = 86400) -> DataFrame:
    """Cohort retention matrix: bucket event time into days (or any
    ``bucket_seconds`` grid), define each user's cohort as their first
    active bucket, and count distinct users active at each
    (cohort, offset) cell — the classic triangle retention table.

    Scale: one shuffle keyed on user_id covers both the first-bucket
    aggregate and the join back (same hash partitioning, the exchange
    is reused), then a map-side-combining aggregate on the
    O(buckets²/2) cell grid. No per-user state on the driver.
    """
    bucket = F.floor(F.col("ts").cast("long") / F.lit(bucket_seconds)).cast("long")
    ev = df.select("user_id", bucket.alias("bucket"))
    first = ev.groupBy("user_id").agg(F.min("bucket").alias("cohort"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.col("cohort"),
            (F.col("bucket") - F.col("cohort")).alias("offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def value_zscores(df: DataFrame, z_threshold: float = 3.0) -> DataFrame:
    """Per-type z-score anomaly flags: events whose ``value`` deviates
    from their event_type's mean by more than ``z_threshold`` sample
    standard deviations.

    Scale: the per-type stats aggregate is map-side partial and
    produces O(types) rows, broadcast back onto the stream — the
    event side never shuffles. Returns (event_id, event_type, value,
    z) unrounded; presentation rounding is the caller's concern.
    """
    stats = df.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        df.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > F.lit(z_threshold))
    )


def type_transitions(df: DataFrame) -> DataFrame:
    """First-order Markov transition counts over each user's
    time-ordered event stream: (prev_type, next_type, n, prob) where
    prob is the row-normalized transition probability. The behavioral
    fingerprint behind session-flow dashboards and synthetic-stream
    generators.

    Scale: one exchange on user_id for the LEAD window (the same
    partitioning sessionize uses — co-schedulable), then a map-side
    partial aggregate down to O(types²) rows; the normalizing window
    runs on that tiny aggregate, never on the stream. Returns prob
    unrounded; presentation rounding is the caller's concern.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = df.select(
        "user_id", "ts", "event_id", "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("prev_type"), "next_type"
    ).agg(F.count("*").alias("n"))
    tot = Window.partitionBy("prev_type")
    return counts.withColumn("prob", F.col("n") / F.sum("n").over(tot))


def decayed_engagement(df: DataFrame, halflife_days: int = 7) -> DataFrame:
    """Per-user recency-weighted engagement: sum(value · 0.5^age) with
    age = whole halflife periods between the event and the newest event
    in the stream — the 'is this user still active, weighted by how
    recently' score feeding retention models.

    The weight base is 0.5 raised to an INTEGER period count, which is
    exact in binary floating point — so the score replays bit-for-bit
    on any engine (fractional exponents would tie the result to libm).
    Scale: the reference timestamp is a one-row aggregate broadcast
    onto the stream (no shuffle of events), then one map-side-combined
    aggregate per user. Returns score unrounded.
    """
    ref = df.agg(F.max(F.col("ts").cast("long")).alias("_ref_s"))
    periods = F.floor(
        (F.col("_ref_s") - F.col("ts").cast("long"))
        / F.lit(86400 * halflife_days)
    )
    wt = F.pow(F.lit(0.5), periods.cast("double"))
    return (
        df.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value") * wt).alias("score"),
        )
    )


def lifecycle_stages(
    df: DataFrame,
    core_days: int = 28,
    regular_days: int = 25,
) -> DataFrame:
    """Classify each user into a lifecycle stage from activity shape:
    'one_shot' (single event), 'core' (active ≥ core_days distinct
    days), 'regular' (≥ regular_days), else 'casual'. Returns one row
    per user: (user_id, n_events, active_days, stage).

    Scale: a single map-side-combined aggregate on user_id (count +
    distinct-day count via a two-level aggregate) — no window, no
    second scan.
    """
    day = F.floor(F.col("ts").cast("long") / F.lit(86400))
    per_user = df.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct(day).alias("active_days"),
    )
    stage = (
        F.when(F.col("n_events") == 1, F.lit("one_shot"))
        .when(F.col("active_days") >= core_days, F.lit("core"))
        .when(F.col("active_days") >= regular_days, F.lit("regular"))
        .otherwise(F.lit("casual"))
    )
    return per_user.withColumn("stage", stage)


def scd2_intervals(df: DataFrame) -> DataFrame:
    """Slowly-changing-dimension (type 2) history: collapse each
    user's event stream into versioned status intervals — one row per
    run of consecutive equal ``event_type`` with ``valid_from`` /
    ``valid_to`` bounds and ``is_current`` on the open interval. The
    gaps-and-islands + interval-close shape every warehouse uses to
    keep entity history (a dimension's address/status changes) while
    queries join on "the version valid at time t".

    Scale: both windows and the run-collapse aggregate partition on
    user_id, so the whole operator is ONE hash exchange; per-user
    history is bounded by that user's event count, never the table.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    change = (
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w))
    ).cast("int")
    runs = df.withColumn(
        "version",
        F.sum(change).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    intervals = runs.groupBy("user_id", "version").agg(
        F.min("event_type").alias("status"),  # constant within a run
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return intervals.select(
        "user_id",
        "version",
        "status",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


def scd2_intervals_sql(table: str = "events") -> str:
    """DuckDB CTE prefix: relation ``scd2`` mirroring scd2_intervals."""
    return f"""
        lagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN LAG(event_type) OVER w IS NULL
                         OR event_type <> LAG(event_type) OVER w
                        THEN 1 ELSE 0 END AS is_change
            FROM {table}
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        runs AS (
            SELECT user_id, ts, event_id, event_type,
                   SUM(is_change)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS version
            FROM lagged
        ),
        intervals AS (
            SELECT user_id, version,
                   MIN(event_type) AS status,
                   MIN(ts) AS valid_from,
                   COUNT(*)::BIGINT AS n_events
            FROM runs GROUP BY user_id, version
        ),
        scd2 AS (
            SELECT user_id, version, status, valid_from,
                   LEAD(valid_from) OVER wv AS valid_to,
                   n_events,
                   LEAD(valid_from) OVER wv IS NULL AS is_current
            FROM intervals
            WINDOW wv AS (PARTITION BY user_id ORDER BY version)
        )
    """


def hopping_counts(df: DataFrame, size_hours: int = 2, slide_hours: int = 1) -> DataFrame:
    """Hopping (sliding-tumbling) event-time windows via the native
    ``F.window(size, slide)``: each event lands in size/slide
    overlapping windows, counted per (window start, event_type).
    Contrast tumbling_counts (slide == size). The expansion factor is
    the fixed size/slide ratio, applied map-side before the partial
    aggregate, so the shuffle still carries O(windows·types) partial
    rows — never the event stream times the overlap."""
    w = F.window(F.col("ts"), f"{size_hours} hours", f"{slide_hours} hours")
    return (
        df.groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("c"),
            # DECIMAL sum: exact and order-independent, so the result
            # hash-matches the oracle regardless of aggregation order
            F.sum(F.col("value").cast("decimal(18,2)")).cast("string").alias("v"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "c", "v")
        .orderBy("w_start", "event_type")
    )


def gap_fill_locf(
    df: DataFrame, grain_seconds: int = 3600, max_slots_per_series: int = 2_000_000
) -> DataFrame:
    """Dense per-user time grid with last-observation-carried-forward
    fill — the hypertable gap-fill shape (TimescaleDB's
    time_bucket_gapfill + locf): bucket events to the grain, generate
    every slot between each user's first and last bucket, and carry
    the last observed bucket average across empty slots. Returns
    (user_id, slot_epoch, n_events, v_hour, v_locf); v_hour is NULL on
    gap slots, v_locf never after the first observation.

    Values go through exact integer cents (floor(v*100+0.5)) before
    summing so the bucket average is order-free, then one half-up
    presentation rounding — the engine-replayable convention of
    decayed_engagement/q203. ``v_lerp`` linearly interpolates interior
    gaps between the surrounding observed bucket averages (the
    TimescaleDB ``interpolate`` shape); every slot between a user's
    first and last observation has both neighbors, so it is never
    NULL. The interpolation runs on the ROUNDED bucket averages with
    exact small-integer slot fractions, so it replays bit-identically
    cross-engine.

    Scale (100 TB of events): one map-side-combined aggregate to
    O(users x buckets) rows, an O(users) bounds aggregate, and a
    NARROW sequence-explode that fans each user row out to its own
    slots — the grid never shuffles after generation because the LOCF
    window reuses the (user_id) partitioning of the bounds join. Slots
    per series are bounded by retention_window / grain, a config
    knob, not data volume; no global sort, no driver state.

    ``max_slots_per_series`` guards the sequence-explode: one user
    whose (span / grain) is pathological (a 10-year-old event plus a
    1-second grain) would otherwise materialize a multi-gigabyte slot
    array inside a single task and die as an opaque executor OOM at
    100 TB. The guard is an O(users)-aggregate check that fails fast
    with the offending bound instead (the chunk-id-overflow-guard
    convention).
    """
    slot = (F.date_trunc("hour", F.col("ts")).cast("long") if grain_seconds == 3600
            else (F.col("ts").cast("long") - F.col("ts").cast("long") % grain_seconds))
    hourly = df.groupBy(
        "user_id", slot.alias("slot_epoch")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("_cents"),
    )
    return gap_fill_locf_from_buckets(hourly, grain_seconds, max_slots_per_series)


def gap_fill_locf_from_buckets(
    hourly: DataFrame,
    grain_seconds: int = 3600,
    max_slots_per_series: int = 2_000_000,
) -> DataFrame:
    """:func:`gap_fill_locf`'s grid/LOCF/interpolation stage over
    ALREADY-BUCKETED rows (user_id, slot_epoch, n_events, _cents) —
    the entry point for callers whose bucket aggregate is served from
    a maintained sidecar (the continuous-aggregate rollup's c_sum/n
    are exactly these integers), so the dashboard never re-scans raw
    events. ``gap_fill_locf(df, g) == gap_fill_locf_from_buckets(
    bucket_agg(df, g), g)`` by construction."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr

    hourly = hourly.localCheckpoint(
        eager=True
    )  # guard + bounds + grid join share one pass
    bounds = hourly.groupBy("user_id").agg(
        F.min("slot_epoch").alias("_mn"), F.max("slot_epoch").alias("_mx")
    )
    worst = bounds.agg(
        F.max(
            (F.col("_mx") - F.col("_mn")) / F.lit(grain_seconds)
        ).alias("slots")
    ).first()
    if worst["slots"] is not None and worst["slots"] + 1 > max_slots_per_series:
        raise ValueError(
            f"gap_fill_locf: a series spans {int(worst['slots']) + 1} slots at "
            f"grain={grain_seconds}s, over max_slots_per_series="
            f"{max_slots_per_series}; coarsen the grain or window the input"
        )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.lit(grain_seconds))
        ).alias("slot_epoch"),
    )
    v_hour = round_half_up_expr(F.col("_cents") / (100.0 * F.col("n_events")))
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("slot_epoch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("slot_epoch")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    slot_obs = F.when(F.col("v_hour").isNotNull(), F.col("slot_epoch"))
    prev_v = F.last("v_hour", ignorenulls=True).over(w_back)
    prev_t = F.last(slot_obs, ignorenulls=True).over(w_back)
    next_v = F.first("v_hour", ignorenulls=True).over(w_fwd)
    next_t = F.first(slot_obs, ignorenulls=True).over(w_fwd)
    frac = (F.col("slot_epoch") - prev_t) / (next_t - prev_t)
    lerp = F.when(
        next_t == prev_t, prev_v
    ).otherwise(round_half_up_expr(prev_v + (next_v - prev_v) * frac))
    return (
        grid.join(hourly, ["user_id", "slot_epoch"], "left")
        .select(
            "user_id",
            "slot_epoch",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            v_hour.alias("v_hour"),
        )
        .withColumn("v_locf", prev_v)
        .withColumn("v_lerp", lerp)
    )
