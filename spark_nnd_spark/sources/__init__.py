from spark_nnd_spark.sources.formats import (
    read_csv,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
)
from spark_nnd_spark.sources.sinks import (
    compact_parquet,
    read_back,
    write_bucketed,
    write_table,
    write_training_shards,
)
from spark_nnd_spark.sources.tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "compact_parquet",
    "read_back",
    "write_bucketed",
    "write_table",
    "write_training_shards",
    "load_table",
    "load_tables",
    "register_views",
    "read_csv",
    "read_orc",
    "read_jsonl",
    "write_csv",
    "write_jsonl",
    "write_orc",
]
