from spark_nnd_spark.streaming.streams import (
    read_events_stream,
    run_to_memory_sink,
    sessionize_stream,
    user_running_totals_stream,
    windowed_counts_stream,
)

__all__ = [
    "read_events_stream",
    "run_to_memory_sink",
    "sessionize_stream",
    "user_running_totals_stream",
    "windowed_counts_stream",
]
