from odibi_spark.streaming.core import (
    foreach_batch_merge,
    start_stream_write,
    streaming_sessionize,
    windowed_aggregate,
)

__all__ = [
    "start_stream_write",
    "foreach_batch_merge",
    "windowed_aggregate",
    "streaming_sessionize",
]
