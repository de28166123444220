from gasket_spark.streaming.core import (
    BackgroundQuery,
    read_events_stream,
    run_pipeline_streaming,
    sessionized_counts,
    stateful_user_totals,
    streaming_dedup,
    windowed_counts,
)

__all__ = [
    "BackgroundQuery", "read_events_stream", "run_pipeline_streaming",
    "sessionized_counts", "stateful_user_totals", "streaming_dedup",
    "windowed_counts",
]
