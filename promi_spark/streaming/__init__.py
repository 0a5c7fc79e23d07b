from promi_spark.streaming.engine import (
    default_checks,
    quarantine,
    read_event_stream,
    run_to_memory,
    sessionize,
    stateful_dfg,
    stateful_funnel,
    stream_interval_join,
    streaming_dfg,
    streaming_neardup_ingest,
    streaming_stats,
    write_with_dlq,
)

__all__ = [
    "default_checks",
    "quarantine",
    "read_event_stream",
    "run_to_memory",
    "sessionize",
    "stateful_dfg",
    "stateful_funnel",
    "stream_interval_join",
    "streaming_dfg",
    "streaming_neardup_ingest",
    "streaming_stats",
    "write_with_dlq",
]
