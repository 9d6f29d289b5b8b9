from odibi_spark.streaming.core import (
    foreach_batch_merge,
    start_stream_write,
    stateful_running_stats,
    streaming_dedup_within_watermark,
    streaming_interval_join,
    streaming_sessionize,
    windowed_aggregate,
)

__all__ = [
    "start_stream_write",
    "foreach_batch_merge",
    "windowed_aggregate",
    "streaming_sessionize",
    "streaming_dedup_within_watermark",
    "streaming_interval_join",
    "stateful_running_stats",
]
