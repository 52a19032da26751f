"""Parquet sinks.

The reference has no sinks (output is a caller-held RDD, NND.scala:66);
this is the engine's write path for pipeline outputs. Thin by design —
``DataFrameWriter`` already does the right thing at scale — but it pins
the two decisions that matter at 100 TB:

- partitioned layout (`partition_by`) so downstream scans prune;
- explicit file sizing via ``target_file_rows`` repartitioning, because
  the default task layout of a heavily-shuffled result otherwise writes
  thousands of tiny files per partition (the classic small-files
  problem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
    target_file_rows: int | None = None,
) -> None:
    """Write a DataFrame as parquet, optionally hive-partitioned.

    ``target_file_rows`` repartitions so each output file holds roughly
    that many rows (by partition columns when given, so rows of one
    hive partition land in few files)."""
    if target_file_rows:
        n = max(1, df.count() // target_file_rows)
        df = (
            df.repartition(n, *partition_by) if partition_by else df.repartition(n)
        )
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "error",
    path: str | None = None,
) -> None:
    """Write a bucketed (and optionally sorted) parquet TABLE — the
    co-located-join primitive: two tables bucketed the same way join
    with ZERO exchange on either side (asserted in
    tests/test_operators.py), which at 100 TB turns every recurring
    fact-fact join on the bucket key from a full shuffle of both inputs
    into a local zip of pre-sorted buckets.

    Bucketing requires the table catalog (``saveAsTable``) — plain
    ``.parquet(path)`` cannot record bucket metadata; pass ``path`` to
    control the storage location of the managed table.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str,
    sort_within: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Training-data export: deterministic sharding for a dataloader.

    Rows land in shard ``xxhash64(id) % n_shards`` — stable across
    reruns and engines (no round-robin, no task-id dependence), so a
    resumed or backfilled export reproduces the same shard membership.
    One file per shard (``repartition(n_shards, shard)`` then
    partitionBy) with rows optionally sorted within each shard so
    sequential reads are deterministic too.

    Scale shape: one hash exchange on the shard key; shard count is
    chosen by the caller to hit the dataloader's target file size
    (e.g. ~1 GB each at 100 TB ⇒ ~100k shards).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    ).repartition(n_shards, "shard")
    if sort_within:
        sharded = sharded.sortWithinPartitions(*sort_within)
    sharded.write.mode(mode).partitionBy("shard").parquet(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "error",
) -> int:
    """Small-files maintenance: rewrite a landing directory's many tiny
    parquet files into ~``target_file_bytes`` files. The other half of
    the small-files problem `write_table(target_file_rows=...)` solves
    at write time — streaming sinks and incremental backfills
    accumulate per-micro-batch files regardless of how carefully the
    batch layer writes, and at 100 TB an uncompacted landing zone turns
    every scan's task scheduling into the bottleneck (one task per tiny
    file).

    The output file count is sized from FILE METADATA (os.stat over the
    directory tree — no data scan, no Spark job), and the rewrite uses
    ``coalesce`` (narrow, no shuffle: tasks concatenate input splits).
    Returns the number of output files requested. Writes to ``dest`` —
    never in place (Spark cannot atomically overwrite a directory it is
    reading; callers swap directories after the rewrite commits)."""
    import math  # noqa: PLC0415
    import os  # noqa: PLC0415

    total = 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                total += os.stat(os.path.join(root, f)).st_size
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src).coalesce(n_files).write.mode(mode).parquet(dest)
    return n_files


def backfill_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
) -> None:
    """Idempotent partition backfill: rewrite ONLY the hive partitions
    present in ``df``, leaving every other partition untouched — the
    re-run-one-day shape of a production pipeline (a failed or revised
    daily job re-emits its own partitions without clobbering the rest
    of the dataset, which a plain ``mode=overwrite`` would truncate).

    Implemented with Spark's dynamic partition overwrite
    (``spark.sql.sources.partitionOverwriteMode=dynamic``), scoped to
    this write and restored afterwards — the setting is session-global
    and silently changes overwrite semantics for unrelated writers.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set(key, prev)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    mode: str = "error",
    partition_by: list[str] | None = None,
) -> None:
    """Write parquet clustered by ``sort_cols`` WITHIN each task
    (``sortWithinPartitions`` — no global sort, no extra exchange):
    each row group's min/max statistics then cover a narrow key range,
    so a filtered read skips whole row groups at the footer level (zone
    maps). This is the layout decision that turns a 100 TB time-range
    scan into a footer walk plus the few matching groups — asserted on
    the actual parquet metadata in tests/test_sources.py, not just the
    plan. Combine with ``partition_by`` for coarse pruning (partitions)
    plus fine pruning (row groups) in one write."""
    clustered = df.sortWithinPartitions(*sort_cols)
    w = clustered.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
