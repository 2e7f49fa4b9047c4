from xcube_spark.streaming.events import (
    read_events_stream,
    run_stream_to_table,
    session_window_stats,
    sliding_window_stats,
    streaming_dedup,
    windowed_stats,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_table",
    "session_window_stats",
    "sliding_window_stats",
    "streaming_dedup",
    "windowed_stats",
]
