"""Structured Streaming wrapper tests: a parquet-source stream drives the
batch sync core via foreachBatch; replays are idempotent."""

import datetime
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from meerschaum_spark.pipe import Pipe
from meerschaum_spark.sources import load_table
from meerschaum_spark.streaming import stream_sync_pipe, sync_loop, windowed_rollup


@pytest.fixture()
def stream_env(spark, instance_dir):
    src_dir = tempfile.mkdtemp(prefix="stream_src_")
    ckpt_dir = tempfile.mkdtemp(prefix="stream_ckpt_")
    yield src_dir, ckpt_dir
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(ckpt_dir, ignore_errors=True)


def test_stream_sync_pipe_idempotent(spark, instance_dir, stream_env):
    src_dir, ckpt_dir = stream_env
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    n_total = events.count()
    # stage the source as two parquet "arrivals" with an overlap
    cut = datetime.datetime(2024, 1, 15)
    events.filter(F.col("ts") < cut).write.parquet(os.path.join(src_dir, "b1"))

    pipe = Pipe("stream", "events", instance=instance_dir, spark=spark,
                columns={"datetime": "ts", "id": "event_id"})
    schema = events.schema

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "4")
              .parquet(src_dir + "/*"))
    q = stream_sync_pipe(pipe, stream, ckpt_dir)
    q.awaitTermination(120)
    first_count = pipe.get_rowcount()
    assert first_count > 0

    # second arrival overlaps the first — diff must keep counts exact
    events.filter(F.col("ts") >= cut - datetime.timedelta(days=5)) \
        .write.parquet(os.path.join(src_dir, "b2"))
    q2 = stream_sync_pipe(pipe, (spark.readStream.schema(schema)
                                 .parquet(src_dir + "/*")), ckpt_dir)
    q2.awaitTermination(120)
    assert pipe.get_rowcount() == n_total


def test_stream_sync_rollup_processing_time_soak(spark, instance_dir,
                                                 stream_env):
    """Live-trigger soak: a ProcessingTime-trigger stream keeps running
    while three overlapping parquet arrivals land in the source dir; the
    per-micro-batch rollup maintenance must converge to the batch oracle
    (availableNow replay is covered by the catalog query — this proves
    the continuously-running trigger path, multiple micro-batches, late
    data included)."""
    import time

    src_dir, ckpt_dir = stream_env
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    n_total = events.count()
    cut1 = datetime.datetime(2024, 1, 10)
    cut2 = datetime.datetime(2024, 1, 20)
    arrivals = [
        events.filter(F.col("ts") < cut1),
        # overlaps arrival 1 (late data) and extends forward
        events.filter((F.col("ts") >= cut1 - datetime.timedelta(days=3))
                      & (F.col("ts") < cut2)),
        events.filter(F.col("ts") >= cut2 - datetime.timedelta(days=2)),
    ]
    pipe = Pipe("stream", "soak", instance=instance_dir, spark=spark,
                columns={"datetime": "ts", "id": "event_id"},
                parameters={"rollups": [{"name": "hourly",
                                         "interval": "hour",
                                         "groupby": ["event_type"],
                                         "values": ["value"]}]})
    stage_dir = tempfile.mkdtemp(prefix="stream_stage_")
    # expected DISTINCT cumulative rowcount after each arrival (arrivals
    # are cumulative time-slices, so the prefix union is just a prefix
    # of the table)
    expected_counts = [
        events.filter(F.col("ts") < cut1).count(),
        events.filter(F.col("ts") < cut2).count(),
        n_total,
    ]
    stream = (spark.readStream.schema(events.schema).parquet(src_dir + "/*"))
    q = stream_sync_pipe(pipe, stream, ckpt_dir,
                         trigger={"processingTime": "1 seconds"},
                         query_name="_soak")
    try:
        for i, arrival in enumerate(arrivals):
            # Spark's file source requires files to APPEAR atomically in
            # the watched dir — writing parquet in place lets the stream
            # list _temporary files mid-commit (observed: the same rows
            # arrive under two paths in one micro-batch and duplicate).
            # Stage outside, then rename the finished directory in.
            staged = os.path.join(stage_dir, f"b{i}")
            arrival.write.parquet(staged)
            os.rename(staged, os.path.join(src_dir, f"b{i}"))
            # wait until THIS arrival is fully absorbed before landing
            # the next, so the run really spans ≥ 3 micro-batches
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                if q.exception() is not None:
                    raise q.exception()
                try:
                    have = pipe.get_rowcount()
                except Exception:
                    have = -1  # reader raced a partition swap; retry
                if have == expected_counts[i]:
                    break
                time.sleep(0.5)
            assert pipe.get_rowcount() == expected_counts[i], \
                f"arrival {i} not absorbed before deadline"
        assert pipe.get_rowcount() == n_total
        # rowcount converges MID-batch (the append lands before rollup
        # maintenance and before the batch's progress event) — wait for
        # the stream to go idle so the last batch's maintenance and
        # progress entry are both in
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            st = q.status
            if not st["isDataAvailable"] and not st["isTriggerActive"]:
                break
            time.sleep(0.3)
        n_batches = len({p["batchId"] for p in q.recentProgress})
        assert n_batches >= 3, f"soak ran only {n_batches} micro-batches"
    finally:
        q.stop()
        shutil.rmtree(stage_dir, ignore_errors=True)
    # rollup converged to the batch rebuild
    expected = (pipe.get_data(order=None)
                .groupBy(F.date_trunc("hour", "ts").alias("ts"),
                         "event_type")
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.sum(F.col("value").cast("decimal(18,6)"))
                     .cast("decimal(28,6)").alias("sum_value"),
                     F.min("value").alias("min_value"),
                     F.max("value").alias("max_value")))
    got = {tuple(r) for r in pipe.get_rollup("hourly").collect()}
    assert got == {tuple(r) for r in expected.collect()}


def test_windowed_rollup_batch_semantics(spark):
    # windowed_rollup is a plain transform; check it on a batch frame
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = windowed_rollup(ev, "ts", "1 hour",
                          agg_cols={"value": "sum"}, group_cols=["event_type"])
    rows = out.collect()
    assert rows and all(r["window"]["start"] is not None for r in rows)
    total = sum(r["sum_value"] for r in rows)
    exact = ev.agg(F.sum("value")).first()[0]
    assert abs(total - exact) < 1e-6


def test_sync_loop(spark, instance_dir):
    pipe = Pipe("loop", "metric", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    batches = iter([
        [{"dt": datetime.datetime(2024, 1, 1), "id": 1, "val": 1}],
        [{"dt": datetime.datetime(2024, 1, 1), "id": 1, "val": 2}],
        [{"dt": datetime.datetime(2024, 1, 2), "id": 1, "val": 3}],
    ])
    results = sync_loop(pipe, fetch=lambda: next(batches),
                        min_seconds=0, iterations=3)
    assert all(r.success for r in results)
    assert pipe.get_rowcount() == 2
    docs = pipe.get_docs(params={"dt": datetime.datetime(2024, 1, 1)})
    assert docs[0]["val"] == 2


def test_parse_schedule_grammar():
    from meerschaum_spark.streaming.schedule import parse_schedule

    assert parse_schedule("every 30 seconds").seconds == 30.0
    assert parse_schedule("every 1 minute").seconds == 60.0
    assert parse_schedule("Every 2 Hours").seconds == 7200.0
    assert parse_schedule("every 1.5 hours").seconds == 5400.0
    assert parse_schedule("hourly").seconds == 3600.0
    assert parse_schedule("daily").seconds == 86400.0
    assert parse_schedule("weekly").seconds == 604800.0
    assert parse_schedule(45).seconds == 45.0
    assert parse_schedule("90").seconds == 90.0

    s = parse_schedule("daily at 06:30")
    assert s.at == datetime.time(6, 30)
    s2 = parse_schedule("every day at 23:59:05")
    assert s2.at == datetime.time(23, 59, 5)

    import pytest as _pytest
    for bad in ["every -1 hours", "every 0 seconds", "fortnightly",
                "daily at 25:00", ""]:
        with _pytest.raises(ValueError):
            parse_schedule(bad)


def test_schedule_next_fire():
    from meerschaum_spark.streaming.schedule import parse_schedule

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    assert (parse_schedule("every 10 minutes").next_fire(t0)
            == datetime.datetime(2024, 3, 1, 12, 10))
    daily = parse_schedule("daily at 06:00")
    # already past 06:00 → tomorrow
    assert daily.next_fire(t0) == datetime.datetime(2024, 3, 2, 6, 0)
    # before 06:00 → today
    assert (daily.next_fire(datetime.datetime(2024, 3, 1, 5, 0))
            == datetime.datetime(2024, 3, 1, 6, 0))
    # exactly at the fire time → strictly after
    assert (daily.next_fire(datetime.datetime(2024, 3, 1, 6, 0))
            == datetime.datetime(2024, 3, 2, 6, 0))


def test_sync_loop_scheduled_cadence(spark, instance_dir):
    """The loop fires on the computed cadence: with a fake clock, each
    sleep is the gap to the schedule's next fire time."""
    pipe = Pipe("loop", "sched", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    clock = {"now": datetime.datetime(2024, 1, 1, 0, 0, 0)}
    sleeps: list[float] = []

    def fake_sleep(s):
        sleeps.append(s)
        clock["now"] += datetime.timedelta(seconds=s)

    batches = iter([
        [{"dt": datetime.datetime(2024, 1, 1), "id": 1, "val": 1}],
        [{"dt": datetime.datetime(2024, 1, 1, 1), "id": 2, "val": 2}],
        [{"dt": datetime.datetime(2024, 1, 1, 2), "id": 3, "val": 3}],
    ])
    results = sync_loop(pipe, fetch=lambda: next(batches), iterations=3,
                        schedule="every 5 minutes",
                        _sleep=fake_sleep, _now=lambda: clock["now"])
    assert all(r.success for r in results)
    assert pipe.get_rowcount() == 3
    # two sleeps (none after the final iteration), each ≈ 300 s minus the
    # (zero, under the fake clock) work time
    assert len(sleeps) == 2
    assert all(s == 300.0 for s in sleeps)
