"""Parquet sources for the test corpus (TESTDATA.md).

The reference has no sources/sinks — input/output are caller-supplied
RDDs (NND.scala:66, SURVEY.md §2.3). The engine standardizes on parquet
scans through ``spark.read`` so Catalyst gets predicate pushdown, column
pruning, and partition pruning for free.

Schema drift guard: the driver regenerates the testdata between rounds
and has already changed physical types once (events.ts went from
TIMESTAMP(NANOS) to plain timestamp[us]).  ``load_table`` therefore
(a) normalizes the known physical variants of ``events.ts`` to a proper
TimestampType column and (b) asserts the loaded logical schema against a
pinned expectation so any future drift fails loudly with one message at
the loader instead of as scattered AnalysisExceptions downstream.
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

# Expected logical schema per table AFTER normalization: column name ->
# set of acceptable Spark simpleString dtypes.  Timestamp-bearing columns
# accept both tz-aware and NTZ readings (both are value-identical under
# the UTC-pinned session and compare clean against the DuckDB oracle);
# events.ts is normalized to exactly "timestamp" below.
_EXPECTED: dict[str, list[tuple[str, frozenset[str]]]] = {
    "region": [("r_regionkey", frozenset({"int"})), ("r_name", frozenset({"string"}))],
    "nation": [
        ("n_nationkey", frozenset({"int"})),
        ("n_name", frozenset({"string"})),
        ("n_regionkey", frozenset({"int"})),
    ],
    "customer": [
        ("c_custkey", frozenset({"bigint"})),
        ("c_name", frozenset({"string"})),
        ("c_nationkey", frozenset({"int"})),
        ("c_acctbal", frozenset({"double"})),
        ("c_mktsegment", frozenset({"string"})),
    ],
    "supplier": [
        ("s_suppkey", frozenset({"bigint"})),
        ("s_name", frozenset({"string"})),
        ("s_nationkey", frozenset({"int"})),
        ("s_acctbal", frozenset({"double"})),
    ],
    "part": [
        ("p_partkey", frozenset({"bigint"})),
        ("p_name", frozenset({"string"})),
        ("p_brand", frozenset({"string"})),
        ("p_type", frozenset({"string"})),
        ("p_size", frozenset({"int"})),
        ("p_retailprice", frozenset({"double"})),
    ],
    "orders": [
        ("o_orderkey", frozenset({"bigint"})),
        ("o_custkey", frozenset({"bigint"})),
        ("o_orderstatus", frozenset({"string"})),
        ("o_totalprice", frozenset({"double"})),
        ("o_orderdate", frozenset({"timestamp", "timestamp_ntz", "date"})),
        ("o_orderpriority", frozenset({"string"})),
    ],
    "lineitem": [
        ("l_orderkey", frozenset({"bigint"})),
        ("l_partkey", frozenset({"bigint"})),
        ("l_suppkey", frozenset({"bigint"})),
        ("l_linenumber", frozenset({"int"})),
        ("l_quantity", frozenset({"double"})),
        ("l_extendedprice", frozenset({"double"})),
        ("l_discount", frozenset({"double"})),
        ("l_tax", frozenset({"double"})),
        ("l_returnflag", frozenset({"string"})),
        ("l_linestatus", frozenset({"string"})),
        ("l_shipdate", frozenset({"timestamp", "timestamp_ntz", "date"})),
    ],
    "events": [
        ("event_id", frozenset({"bigint"})),
        ("ts", frozenset({"timestamp"})),
        ("user_id", frozenset({"bigint"})),
        ("event_type", frozenset({"string"})),
        ("value", frozenset({"double"})),
        ("props", frozenset({"string"})),
    ],
    "documents": [
        ("doc_id", frozenset({"bigint"})),
        ("text", frozenset({"string"})),
        ("lang", frozenset({"string"})),
        ("source", frozenset({"string"})),
        ("n_chars", frozenset({"bigint"})),
    ],
    "embeddings": [
        ("vec_id", frozenset({"bigint"})),
        ("embedding", frozenset({"array<float>", "array<double>"})),
        ("label", frozenset({"int"})),
    ],
}


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the physical ``ts`` column to TimestampType.

    Known physical variants of the driver-generated events parquet:
      * ``bigint`` — TIMESTAMP(NANOS) read as long nanos under
        spark.sql.legacy.parquet.nanosAsLong → exact integer div to micros.
      * ``timestamp_ntz`` — plain timestamp[us]; the session tz is pinned
        to UTC (session.py), so ``cast("timestamp")`` is value-preserving.
        The cast (not a pass-through) matters: downstream code and the
        oracle exports ``.cast("long")`` on ts, which TIMESTAMP_NTZ rejects.
      * ``timestamp`` — already what we want.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes)["ts"]
    if dtype == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if dtype == "timestamp":
        return df
    raise ValueError(
        f"unexpected physical dtype for events.ts: {dtype!r} "
        "(expected bigint, timestamp_ntz, or timestamp) — the testdata "
        "generator likely changed; update sources/tables.py"
    )


def _check_schema(name: str, df: DataFrame) -> None:
    expected = _EXPECTED[name]
    actual = df.dtypes
    problems = []
    if [c for c, _ in actual] != [c for c, _ in expected]:
        problems.append(
            f"columns {[c for c, _ in actual]} != expected {[c for c, _ in expected]}"
        )
    else:
        for (col, dtype), (_, allowed) in zip(actual, expected):
            if dtype not in allowed:
                problems.append(f"{col}: {dtype} not in {sorted(allowed)}")
    if problems:
        raise ValueError(
            f"unexpected physical schema for table {name!r}: "
            + "; ".join(problems)
            + " — testdata regenerated with a new schema? update sources/tables.py"
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # runtime-settable; harmless when ts is no longer NANOS.  Needed
        # even when the caller's session didn't come from our get_spark()
        # factory (e.g. the verify driver's).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_events_ts(df)
    _check_schema(name, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
