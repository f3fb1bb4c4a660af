from mysteryann_spark.streaming.windows import (
    read_events_stream,
    stream_tumbling_counts,
    stream_sessionize,
    run_stream_to_memory,
)

__all__ = [
    "read_events_stream",
    "stream_tumbling_counts",
    "stream_sessionize",
    "run_stream_to_memory",
]
