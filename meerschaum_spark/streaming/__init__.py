from meerschaum_spark.streaming.runner import (
    stream_sync_pipe,
    sync_loop,
    windowed_rollup,
)

__all__ = ["stream_sync_pipe", "sync_loop", "windowed_rollup"]
