from chroma_rs_spark.streaming.events import (
    read_events_stream,
    session_window_agg,
    sliding_window_counts,
    tumbling_window_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_agg",
]
