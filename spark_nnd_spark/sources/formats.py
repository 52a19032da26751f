"""CSV / JSON-lines source+sink layer.

The reference has no sources at all (caller-supplied RDDs,
NND.scala:66); parquet is this engine's primary format
(sources/tables.py, sources/sinks.py). Real corpora additionally
arrive as JSONL dumps and CSV exports, so the engine exposes both,
with the rules that keep them scan-friendly at 100 TB:

- **Schema is always pinned** (from the caller or a sampled
  inferSchema only when asked): schema inference reads the data
  twice, and on a 100 TB landing directory that doubles the scan
  bill. Pass the schema.
- Readers return plain DataFrames, so every downstream filter and
  projection still benefits from column pruning; note CSV/JSON are
  row-major text — predicate pushdown cannot skip bytes the way
  parquet row-group stats do, which is why `to_parquet` (one
  rewrite) is the first step of every pipeline here.
- Writers accept a partition-column list (hive-style layout) and
  coalesce tiny outputs the same way sinks.py does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """JSON-lines reader; pinned schema unless explicitly absent."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    infer: bool = False,
    sampling_ratio: float = 0.01,
    **options: str,
) -> DataFrame:
    """CSV reader with a pinned schema.

    Inference is opt-in (``infer=True``) and sample-bounded
    (``sampling_ratio``), never silent: full inferSchema reads the data
    twice, and on a 100 TB landing directory that doubles the scan
    bill. Pass the schema.
    """
    if schema is None and not infer:
        raise ValueError(
            "read_csv requires a schema; pass infer=True to accept a "
            "sampled-inference extra scan (costly on large inputs)"
        )
    if schema is not None and infer:
        raise ValueError(
            "read_csv got both schema and infer=True; the schema would "
            "silently win and no inference would run — pass exactly one"
        )
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true").option(
            "samplingRatio", str(sampling_ratio)
        )
    return reader.csv(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, partition_by: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite").option("header", str(header).lower())
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader — columnar like parquet (stripe/row-group stats, so
    predicate pushdown and column pruning both work), common as the
    interchange format of Hive-era warehouses. Self-describing schema;
    nothing to pin."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
