"""Continuous pipes on Structured Streaming.

The reference's "streaming" is schedule-driven micro-batch re-execution
(meerschaum/actions/sync.py:264-416 ``--loop``, utils/schedule.py cron
scheduling) with a backtrack window for late data
(core/Pipe/_fetch.py:100-181). Spark-first, that maps to:

  * ``stream_sync_pipe`` — a ``readStream`` source driven into the SAME
    batch sync core via ``foreachBatch``; the diff/upsert semantics make
    redelivered micro-batches idempotent (the exactly-once recipe for
    non-transactional sinks).
  * watermarks replace the backtrack interval for windowed aggregates:
    ``withWatermark(dt, backtrack)`` bounds state exactly like
    begin = sync_time − backtrack bounds refetch.
  * ``sync_loop`` — the driver-loop equivalent for non-streaming sources.
"""

from __future__ import annotations

import time
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from meerschaum_spark.functions.persist import pin as _pin

from meerschaum_spark.pipe import Pipe, SyncResult


def stream_sync_pipe(
    pipe: Pipe,
    stream_df: DataFrame,
    checkpoint_dir: str,
    trigger: dict[str, Any] | None = None,
    query_name: str | None = None,
) -> StreamingQuery:
    """Drive a streaming DataFrame into ``pipe.sync`` micro-batch by
    micro-batch.

    ``foreachBatch`` + the pipe's diff/upsert gives effective
    exactly-once: a replayed epoch re-syncs rows the pipe already holds,
    and the anti-join drops them. The checkpoint dir carries source
    offsets across restarts (the analogue of the pipe's sync time).

    File sources: files must APPEAR atomically in the watched directory
    (write elsewhere, then rename in — Spark's file-source contract). A
    non-atomic in-place write can surface the same rows under two paths
    (``_temporary`` + final) within one micro-batch; in-batch full-row
    duplicates pass the against-storage anti-join twice, matching the
    reference's pandas merge-indicator semantics
    (utils/dataframe.py filter_unseen_df).
    """
    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # detach from the micro-batch's streaming lineage FIRST: sync's
        # fused count-during-write Observations are unsupported on plans
        # owned by an IncrementalExecution (Observation.get raises on
        # the diff path), and the checkpoint keeps sync's several
        # actions from re-reading the source once per action. Taking it
        # before the emptiness check means the source is read exactly
        # ONCE per micro-batch (isEmpty-then-checkpoint read it twice —
        # measured as numInputRows doubling).
        batch_df = batch_df.transform(_pin)
        if batch_df.isEmpty():
            return
        result = pipe.sync(batch_df)
        if not result.success:
            raise RuntimeError(
                f"pipe sync failed at epoch {epoch_id}: {result.message}")

    writer = (
        stream_df.writeStream
        .foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if query_name:
        writer = writer.queryName(query_name)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def windowed_rollup(
    stream_df: DataFrame,
    dt_col: str,
    window_duration: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "1 day",
    agg_cols: dict[str, str] | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling/sliding-window aggregate — the streaming
    equivalent of the engine's hourly rollup; the watermark plays the
    reference's backtrack-minutes role for late rows."""
    aggs = []
    for col, how in (agg_cols or {"*": "count"}).items():
        if how == "count":
            aggs.append(F.count(F.lit(1)).alias("n_rows"))
        else:
            aggs.append(getattr(F, how)(F.col(col)).alias(f"{how}_{col}"))
    win = (F.window(F.col(dt_col), window_duration, slide)
           if slide else F.window(F.col(dt_col), window_duration))
    return (
        stream_df.withWatermark(dt_col, watermark)
        .groupBy(win.alias("window"), *(group_cols or []))
        .agg(*aggs)
    )


def sync_loop(
    pipe: Pipe,
    fetch: Callable[[], Any] | None = None,
    min_seconds: float = 1.0,
    iterations: int | None = None,
    schedule: "str | float | None" = None,
    _sleep: Callable[[float], None] = time.sleep,
    _now: Callable[[], "Any"] = None,
) -> list[SyncResult]:
    """The reference's ``--loop`` (actions/sync.py:264-416): repeated
    batch syncs with a minimum interval.

    ``schedule`` accepts the reference's human grammar
    (utils/schedule.py:21-154): ``"every 30 seconds"``, ``"hourly"``,
    ``"daily at 06:00"`` — parsed by ``streaming.schedule``; fire times
    are computed from the UTC clock, and the loop sleeps until the next
    one. Without it, ``min_seconds`` keeps the plain minimum-interval
    behavior. ``_sleep``/``_now`` exist for deterministic tests."""
    import datetime as _dt

    from meerschaum_spark.streaming.schedule import parse_schedule

    sched = parse_schedule(schedule) if schedule is not None else None
    now = _now or (lambda: _dt.datetime.now(_dt.timezone.utc)
                   .replace(tzinfo=None))
    results: list[SyncResult] = []
    i = 0
    while iterations is None or i < iterations:
        started = time.monotonic()
        fire_wall = now()
        data = fetch() if fetch is not None else None
        results.append(pipe.sync(data))
        i += 1
        if iterations is not None and i >= iterations:
            break
        if sched is not None:
            wait = (sched.next_fire(fire_wall) - now()).total_seconds()
            if wait > 0:
                _sleep(wait)
        else:
            elapsed = time.monotonic() - started
            if elapsed < min_seconds:
                _sleep(min_seconds - elapsed)
    return results
