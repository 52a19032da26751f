"""Source-layer regression tests.

The driver regenerates /root/testdata between rounds and has already
changed the events.ts physical type once (TIMESTAMP(NANOS) → plain
timestamp[us]), which broke every events query for a round. These tests
pin the loader's contract directly: every known physical variant of ts
normalizes to the same TimestampType values, and any OTHER schema drift
fails loudly at the loader instead of as scattered AnalysisExceptions.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_nnd_spark.sources import load_table
from tests.conftest import SF_SMOKE

_TS_US = [1_700_000_000_000_000, 1_700_000_123_456_789]


def test_events_ts_variants_normalize_identically(spark, tmp_path):
    """bigint-nanos, timestamp[us] (NTZ), and tz-aware timestamp[us]
    all load to the same TimestampType epoch-micros values."""
    variants = {
        "nanos_as_long": pa.array([v * 1000 for v in _TS_US], pa.int64()),
        "timestamp_ntz": pa.array(_TS_US, pa.timestamp("us")),
        "timestamp_utc": pa.array(_TS_US, pa.timestamp("us", tz="UTC")),
    }
    got = {}
    for name, arr in variants.items():
        d = (tmp_path / name)
        d.mkdir()
        t = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": arr,
                "user_id": pa.array([10, 20], pa.int64()),
                "event_type": pa.array(["view", "click"], pa.string()),
                "value": pa.array([1.5, 2.5], pa.float64()),
                "props": pa.array(["{}", "{}"], pa.string()),
            }
        )
        pq.write_table(t, d / "events.parquet")
        df = load_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        got[name] = [
            r["us"]
            for r in df.selectExpr("unix_micros(ts) AS us").orderBy("us").collect()
        ]
    assert got["nanos_as_long"] == got["timestamp_ntz"] == got["timestamp_utc"]
    assert got["nanos_as_long"] == _TS_US


def test_schema_drift_fails_loudly(spark, tmp_path):
    """A regenerated events table with a renamed column must raise the
    loader's single clear error, not a downstream AnalysisException."""
    t = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([_TS_US[0]], pa.timestamp("us")),
            "uid": pa.array([10], pa.int64()),  # renamed user_id
            "event_type": pa.array(["view"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    d = tmp_path / "drifted"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    with pytest.raises(ValueError, match="unexpected physical schema for table 'events'"):
        load_table(spark, str(d), "events")


def test_unknown_ts_dtype_rejected(spark, tmp_path):
    """A ts column in a type the normalizer doesn't know (string) must
    be rejected with the normalizer's message."""
    t = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(["2026-01-01"], pa.string()),
            "user_id": pa.array([10], pa.int64()),
            "event_type": pa.array(["view"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    d = tmp_path / "badts"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    with pytest.raises(ValueError, match="unexpected physical dtype for events.ts"):
        load_table(spark, str(d), "events")


def test_real_corpus_loads_with_pinned_schema(spark):
    """Every contract table at the smoke SF passes the schema pin."""
    from spark_nnd_spark.sources.tables import TABLES

    for name in TABLES:
        df = load_table(spark, SF_SMOKE, name)
        assert df.columns  # loaded and validated


def test_backfill_rewrites_only_its_partitions(spark, tmp_path):
    """backfill_partitions contract: re-emitting one partition replaces
    that partition's rows exactly and leaves every other partition
    byte-identical; the session-global overwrite mode is restored."""
    from pyspark.sql import functions as F

    from spark_nnd_spark.sources.sinks import backfill_partitions, write_table

    path = str(tmp_path / "days")
    base = spark.createDataFrame(
        [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c"), ("d3", 4, "d")],
        "day string, id long, payload string",
    )
    write_table(base, path, mode="overwrite", partition_by=["day"])

    fixed_d2 = spark.createDataFrame(
        [("d2", 30, "c-fixed"), ("d2", 31, "c-new")],
        "day string, id long, payload string",
    )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    backfill_partitions(fixed_d2, path, ["day"])
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        == prev_mode
    )

    got = {
        (r["day"], r["id"], r["payload"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("d1", 1, "a"),
        ("d1", 2, "b"),
        ("d2", 30, "c-fixed"),
        ("d2", 31, "c-new"),
        ("d3", 4, "d"),
    }


def test_write_sorted_produces_prunable_row_groups(spark, tmp_path):
    """write_sorted contract, checked on the physical parquet footers:
    with rows clustered by ts inside each file, row-group [min, max] ts
    ranges must be (near-)disjoint — the property row-group pruning
    needs — whereas an unsorted write of the same data has every group
    spanning (almost) the full time range."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from spark_nnd_spark.sources import load_table
    from spark_nnd_spark.sources.sinks import write_sorted
    from tests.conftest import SF_SMOKE

    # replicate the smoke events 20x so one file holds several 64 KiB
    # row groups (runtime spark.conf can't reach the writer's hadoop
    # conf — set it on the context's hadoopConfiguration directly)
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .crossJoin(spark.range(20).select(F.col("id").alias("rep")))
        .select(
            (F.col("ts").cast("long") + F.col("rep")).alias("ts_s"),
            "event_id",
            "event_type",
        )
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(64 * 1024))
    try:
        sorted_path = str(tmp_path / "sorted")
        write_sorted(ev.coalesce(1), sorted_path, ["ts_s"])
        shuffled_path = str(tmp_path / "shuffled")
        ev.orderBy(F.md5(F.col("event_id").cast("string"))).coalesce(1).write.parquet(
            shuffled_path
        )
    finally:
        if prev is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev)

    def ranges(path):
        import glob as g

        f = g.glob(f"{path}/*.parquet")[0]
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "ts_s"
        )
        out = []
        for r in range(md.num_row_groups):
            st = md.row_group(r).column(idx).statistics
            out.append((st.min, st.max))
        return out

    sr = ranges(sorted_path)
    assert len(sr) >= 3, "need several row groups for the test to mean anything"
    # sorted: consecutive groups tile the range without overlap
    for (a_min, a_max), (b_min, b_max) in zip(sr, sr[1:]):
        assert a_max <= b_min

    ur = ranges(shuffled_path)
    full_span = max(m for _, m in ur) - min(m for m, _ in ur)
    # unsorted: every group spans (almost) the whole range — useless stats
    assert all((mx - mn) > 0.5 * full_span for mn, mx in ur)
