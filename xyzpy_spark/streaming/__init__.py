from .ops import (
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    streaming_running_stats,
    windowed_agg,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_memory",
    "sessionize_stream",
    "streaming_running_stats",
    "windowed_agg",
]
