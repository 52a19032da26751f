from spark_nnd_spark.streaming.streams import (
    anomaly_stream,
    attribution_stream,
    dedup_stream,
    quality_filter_stream,
    read_documents_stream,
    read_events_kafka,
    read_events_stream,
    run_to_memory_sink,
    run_to_parquet_sink,
    sessionize_stream,
    user_running_totals_stream,
    windowed_counts_stream,
)

__all__ = [
    "anomaly_stream",
    "attribution_stream",
    "dedup_stream",
    "quality_filter_stream",
    "read_documents_stream",
    "read_events_kafka",
    "read_events_stream",
    "run_to_memory_sink",
    "run_to_parquet_sink",
    "sessionize_stream",
    "user_running_totals_stream",
    "windowed_counts_stream",
]
