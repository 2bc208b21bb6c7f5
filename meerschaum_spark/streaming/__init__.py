from meerschaum_spark.streaming.runner import (
    stream_sync_pipe,
    sync_loop,
    windowed_rollup,
)
from meerschaum_spark.streaming.stateful import (
    stateful_sessionize,
    streaming_dedup,
)

__all__ = ["stream_sync_pipe", "sync_loop", "windowed_rollup",
           "stateful_sessionize", "streaming_dedup"]
