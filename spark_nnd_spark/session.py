"""SparkSession factory with scale-aware defaults.

Configs are chosen for correctness on local[N] while remaining the right
defaults for a large cluster:

- AQE on: runtime partition coalescing + skew-join splitting replace
  hand-tuned shuffle partition counts at 100 TB scale.
- Arrow on: every pandas UDF crosses the JVM/Python boundary in columnar
  batches, not rows.
- shuffle.partitions sized to local cores here; on a real cluster AQE's
  coalescing makes the initial number mostly irrelevant (set high, let
  AQE shrink).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def session_scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` with registered end-of-process cleanup.

    The session-cached index builders (pipeline/knn ``*_index_for``)
    persist a full index copy per (applicationId, sf_dir) under a temp
    directory; before this helper each session LEAKED those directories
    on disk. atexit reaps them when the Python driver exits — the same
    lifetime as the applicationId cache key, so a live session never
    loses an index it may still probe."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def get_spark(
    app_name: str = "spark_nnd_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's pinned configs."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # Shuffle codec stays lz4 (Spark default). Measured on this
        # engine: zstd shrinks the NND featured shuffle 14% AND runs
        # ~20% faster (clustered 784-dim data compresses), but is ~1.7x
        # slower on the exact-KNN block shuffle (incompressible 64-dim
        # vectors; zstd CPU dominates). Compression wins are data-
        # dependent — pass extra_conf={"spark.io.compression.codec":
        # "zstd"} for compressible feature corpora; scripts/bench_nnd.py
        # does exactly that.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Runtime Bloom-filter injection (SPARK-32268) assumes shuffle
        # joins it can pre-filter. This engine's corpus-side joins are
        # explicit BROADCAST probes (semi/anti against checkpointed id
        # sets), where the injected guard prunes nothing — the scan is
        # read regardless — while each injection pays a scalar-subquery
        # re-scan of the creation side plus a ~230 KB Bloom bitmap PER
        # MAP TASK through the exchange (measured r15: the bitmaps were
        # the single largest shuffle contributor of a 16-point K-NNG
        # extend, growing with corpus scan tasks; tiny-extend shuffle
        # 2.77->2.30 MB @20k and 5.48->3.46 MB @80k with injection
        # off, identical results). At 100 TB scan-task counts the
        # bitmap traffic alone is GBs per guarded join.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        # Historical events.parquet generations carried TIMESTAMP(NANOS);
        # with this set they read as long nanos and the source layer
        # normalizes whatever dtype actually arrives (sources/tables.py
        # _normalize_events_ts). Harmless for non-NANOS generations.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
