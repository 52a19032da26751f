"""Continuous-aggregate event-rollup family (the 12th —
operators/event_rollup): extend == fresh build exactly, replay no-op,
served OHLC == inline aggregation, cross-grain daily re-bucket ==
direct daily aggregation, endpoint semantics under crafted orderings,
and the streaming maintenance twin."""

from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import functions as F

from spark_nnd_spark.operators.event_rollup import (
    build_event_rollup,
    daily_bars_from_rollup,
    extend_event_rollup,
    ohlc_from_rollup,
    rollup_table,
)


pytestmark = pytest.mark.slow  # heavy tier: deselected from the default fast run

DDL = "event_id long, ts timestamp, user_id long, value double"


def _ev(eid, hour, minute, user, value, day=1):
    return (eid, dt.datetime(2024, 1, day, hour, minute, 0), user, value)


def _events(spark):
    rows = [
        # user 1, hour 0: out-of-event_id-order arrival inside the
        # bucket — open/close must follow event_id, not row order
        _ev(5, 0, 40, 1, 3.00),
        _ev(2, 0, 10, 1, 1.25),
        _ev(9, 0, 55, 1, 2.00),
        # user 1, hour 2 (gap at hour 1)
        _ev(12, 2, 5, 1, 7.77),
        # user 2, day 2
        _ev(20, 3, 0, 2, -1.50, day=2),
        _ev(21, 3, 30, 2, 4.00, day=2),
    ]
    return spark.createDataFrame(rows, DDL)


def _batch(spark):
    rows = [
        _ev(1, 0, 1, 1, 9.99),    # new open for user1/hour0 (eid 1 < 2)
        _ev(30, 2, 50, 1, 0.25),  # new close for user1/hour2
        _ev(25, 6, 0, 3, 5.00, day=2),  # new user
    ]
    return spark.createDataFrame(rows, DDL)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_build_serves_exact_ohlc_with_eid_endpoints(spark, tmp_path):
    d = str(tmp_path / "r")
    build_event_rollup(_events(spark), d)
    bars = {
        (r.user_id, r.slot_epoch): (r.open, r.high, r.low, r.close, r.n_events)
        for r in ohlc_from_rollup(spark, d).collect()
    }
    h0 = dt.datetime(2024, 1, 1, 0).timestamp()
    # open = eid 2 (1.25), close = eid 9 (2.00), high = 3.00, low = 1.25
    assert bars[(1, int(h0))] == (1.25, 3.0, 1.25, 2.0, 3)


def test_extend_equals_fresh_build_and_replay_noop(spark, tmp_path):
    grown, fresh = str(tmp_path / "g"), str(tmp_path / "f")
    build_event_rollup(_events(spark), grown)
    extend_event_rollup(spark, grown, _batch(spark), batch_id=0)
    build_event_rollup(
        _events(spark).unionByName(_batch(spark)), fresh
    )
    assert _rows(rollup_table(spark, grown)) == _rows(rollup_table(spark, fresh))
    # replayed batch: no-op before any work — state identical
    before = _rows(rollup_table(spark, grown))
    extend_event_rollup(spark, grown, _batch(spark), batch_id=0)
    assert _rows(rollup_table(spark, grown)) == before
    # the batch actually changed endpoints: eid 1 is the new open
    h0 = dt.datetime(2024, 1, 1, 0).timestamp()
    bars = {
        (r.user_id, r.slot_epoch): (r.open, r.close)
        for r in ohlc_from_rollup(spark, grown).collect()
    }
    assert bars[(1, int(h0))] == (9.99, 2.0)


def test_daily_rebucket_equals_direct_daily_agg(spark, tmp_path):
    d = str(tmp_path / "r")
    ev = _events(spark).unionByName(_batch(spark))
    build_event_rollup(ev, d)
    got = _rows(daily_bars_from_rollup(spark, d))
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    day = (
        F.col("ts").cast("long") - F.col("ts").cast("long") % F.lit(86400)
    )
    want = _rows(
        ev.select("user_id", day.alias("day_epoch"), cents.alias("c"), "event_id")
        .groupBy("user_id", "day_epoch")
        .agg(
            (F.min_by("c", "event_id") / 100.0).alias("open"),
            (F.max("c") / 100.0).alias("high"),
            (F.min("c") / 100.0).alias("low"),
            (F.max_by("c", "event_id") / 100.0).alias("close"),
            F.count("*").alias("n_events"),
            (F.sum("c") / 100.0).alias("volume"),
        )
    )
    assert got == want


def test_rollup_stream_maintains_state_and_replays_idempotent(spark, tmp_path):
    import os

    import pandas as pd

    from spark_nnd_spark.streaming.streams import event_rollup_stream

    d = str(tmp_path / "r")
    build_event_rollup(_events(spark), d)
    src = tmp_path / "in"
    src.mkdir()
    batch = _batch(spark).toPandas()
    # two micro-batches covering the 3 events (overlap-free split)
    for b, sl in enumerate((batch.iloc[:2], batch.iloc[2:])):
        p = src / f"chunk{b}.parquet"
        # pyarrow defaults to nanosecond timestamps Spark cannot read
        pd.DataFrame(sl).to_parquet(
            p, index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))

    stream = (
        spark.readStream.schema(DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    event_rollup_stream(stream, d)
    fresh = str(tmp_path / "f")
    build_event_rollup(_events(spark).unionByName(_batch(spark)), fresh)
    assert _rows(rollup_table(spark, d)) == _rows(rollup_table(spark, fresh))
    # direct replay of an applied batch id: no-op before any work
    before = _rows(rollup_table(spark, d))
    extend_event_rollup(spark, d, _batch(spark), batch_id=0)
    assert _rows(rollup_table(spark, d)) == before


def test_gapfill_from_rollup_equals_inline(spark, tmp_path):
    """The rollup's (n, c_sum) partials feed gap_fill_locf's grid
    stage exactly: served dense grid == inline gap_fill_locf over the
    raw events, row for row (the q214 assertion)."""
    from spark_nnd_spark.operators.events import (
        gap_fill_locf,
        gap_fill_locf_from_buckets,
    )

    d = str(tmp_path / "r")
    ev = _events(spark).unionByName(_batch(spark))
    build_event_rollup(ev, d)
    hourly = rollup_table(spark, d).select(
        "user_id",
        "slot_epoch",
        F.col("n").alias("n_events"),
        F.col("c_sum").alias("_cents"),
    )
    served = _rows(gap_fill_locf_from_buckets(hourly))
    inline = _rows(gap_fill_locf(ev.select("user_id", "ts", "value")))
    assert served == inline


def test_refresh_window_applies_source_deletion(spark, tmp_path):
    """TimescaleDB-style invalidation refresh: delete the event that
    WAS hour 0's high, refresh the grain-aligned window, and the
    rollup equals a fresh build over the modified hypertable; buckets
    outside the window are untouched; a misaligned window fails fast."""
    import pytest

    from spark_nnd_spark.operators.event_rollup import refresh_event_rollup

    d = str(tmp_path / "r")
    ev = _events(spark)
    build_event_rollup(ev, d)
    # delete eid 5 (hour 0's high=3.00) from the hypertable
    ev2 = ev.filter(F.col("event_id") != 5)
    h0 = int(dt.datetime(2024, 1, 1, 0).timestamp())
    refresh_event_rollup(spark, d, ev2, h0, h0 + 3600)
    fresh = str(tmp_path / "f")
    build_event_rollup(ev2, fresh)
    assert _rows(rollup_table(spark, d)) == _rows(rollup_table(spark, fresh))
    bars = {
        (r.user_id, r.slot_epoch): (r.high, r.n_events)
        for r in ohlc_from_rollup(spark, d).collect()
    }
    assert bars[(1, h0)] == (2.0, 2)  # new high, new count
    with pytest.raises(ValueError, match="align"):
        refresh_event_rollup(spark, d, ev2, h0 + 1, h0 + 3600)


def test_extend_rewrites_only_touched_windows(spark, tmp_path):
    """The per-window commit contract: a batch landing in one coarse
    time window bumps ONLY that window's version — untouched windows
    keep serving their existing committed state (the O(touched
    windows) write bound TimescaleDB chunks give)."""
    from spark_nnd_spark.operators.state_commit import committed_versions

    d = str(tmp_path / "r")
    # day 1 lands in win 2817 (7-day windows), day 10 in win 2818
    early = _events(spark)
    late = spark.createDataFrame(
        [_ev(50, 1, 0, 4, 2.00, day=10), _ev(51, 2, 0, 4, 3.00, day=10)], DDL
    )
    build_event_rollup(early.unionByName(late), d)
    wins = sorted(
        int(p[4:]) for p in __import__("os").listdir(d) if p.startswith("win=")
    )
    assert len(wins) == 2
    v_before = {w: committed_versions(spark, f"{d}/win={w}") for w in wins}
    assert all(v == [0] for v in v_before.values())
    # batch only touches day 1 (first window)
    extend_event_rollup(spark, d, _batch(spark), batch_id=7)
    v_after = {w: committed_versions(spark, f"{d}/win={w}") for w in wins}
    assert v_after[wins[0]][-1] == 1  # touched window advanced
    assert v_after[wins[1]] == [0]   # untouched window NOT rewritten
    # and the logical content still equals a fresh build
    fresh = str(tmp_path / "f")
    build_event_rollup(
        early.unionByName(late).unionByName(_batch(spark)), fresh
    )
    assert _rows(rollup_table(spark, d)) == _rows(rollup_table(spark, fresh))


def test_refresh_emptying_a_window_serves_empty_not_missing(spark, tmp_path):
    """A refresh that deletes every event of a window's only buckets
    commits a schema-bearing EMPTY state for that window — the union
    read path keeps working and equals a fresh build over the
    modified hypertable."""
    from spark_nnd_spark.operators.event_rollup import refresh_event_rollup

    d = str(tmp_path / "r")
    late = spark.createDataFrame(
        [_ev(50, 1, 0, 4, 2.00, day=10), _ev(51, 2, 0, 4, 3.00, day=10)], DDL
    )
    ev = _events(spark).unionByName(late)
    build_event_rollup(ev, d)
    # drop ALL day-10 events, refresh exactly their grain-aligned span
    ev2 = _events(spark)
    h = int(dt.datetime(2024, 1, 10, 0).timestamp())
    refresh_event_rollup(spark, d, ev2, h, h + 4 * 3600)
    fresh = str(tmp_path / "f")
    build_event_rollup(ev2, fresh)
    assert _rows(rollup_table(spark, d)) == _rows(rollup_table(spark, fresh))
    assert rollup_table(spark, d).filter(F.col("slot_epoch") >= h).count() == 0
