"""Structured Streaming operators (event-time windows, sessionization,
custom stateful aggregation)."""

from dbscan_spark.streaming.events import (
    events_stream_dir,
    read_events_stream,
    run_foreach_batch_parquet,
    run_to_memory,
    streaming_range_join_clicks_purchases,
    streaming_session_counts,
    streaming_sliding_counts,
    streaming_tumbling_counts,
    streaming_user_totals,
)

__all__ = [
    "events_stream_dir",
    "read_events_stream",
    "run_foreach_batch_parquet",
    "run_to_memory",
    "streaming_range_join_clicks_purchases",
    "streaming_session_counts",
    "streaming_sliding_counts",
    "streaming_tumbling_counts",
    "streaming_user_totals",
]
