"""Parquet sources for the test corpus (TESTDATA.md).

The reference has no sources/sinks — input/output are caller-supplied
RDDs (NND.scala:66, SURVEY.md §2.3). The engine standardizes on parquet
scans through ``spark.read`` so Catalyst gets predicate pushdown, column
pruning, and partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # runtime-settable; needed even when the caller's session didn't
        # come from our get_spark() factory (e.g. the verify driver's)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the parquet; Spark reads it as long
        # nanos (spark.sql.legacy.parquet.nanosAsLong) — convert to a
        # proper micros timestamp with exact integer arithmetic.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
