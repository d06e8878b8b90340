from rabitq_spark.streaming.pipeline import (
    dedup_stream,
    read_events_stream,
    run_complete_to_memory,
    session_window_stream,
    windowed_counts_stream,
)

__all__ = [
    "dedup_stream",
    "read_events_stream",
    "run_complete_to_memory",
    "session_window_stream",
    "windowed_counts_stream",
]
