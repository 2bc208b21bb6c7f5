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
