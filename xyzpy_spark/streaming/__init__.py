from .ops import (
    dedup_stream,
    ann_stream_topk,
    bm25_stream_search,
    dedup_stream_against_index,
    read_embeddings_stream,
    winnow_stream_against_index,
    interval_join_stream,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    streaming_running_stats,
    windowed_agg,
)

__all__ = [
    "dedup_stream",
    "ann_stream_topk",
    "bm25_stream_search",
    "dedup_stream_against_index",
    "read_embeddings_stream",
    "winnow_stream_against_index",
    "interval_join_stream",
    "read_events_stream",
    "run_stream_to_memory",
    "sessionize_stream",
    "streaming_running_stats",
    "windowed_agg",
]
