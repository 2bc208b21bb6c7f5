"""applyInPandasWithState: session state survives across separate
streaming runs sharing a checkpoint (the cross-micro-batch contract)."""

import datetime
import os
import shutil
import tempfile

import pytest

from meerschaum_spark.streaming.stateful import (
    stateful_sessionize,
    streaming_dedup,
)


@pytest.fixture()
def dirs():
    ds = [tempfile.mkdtemp(prefix=f"stf_{i}_") for i in range(3)]
    yield ds
    for d in ds:
        shutil.rmtree(d, ignore_errors=True)


def test_stateful_sessionize_across_runs(spark, dirs):
    src, ckpt, out = dirs
    T0 = datetime.datetime(2024, 1, 1, 10, 0)
    m = lambda mins: T0 + datetime.timedelta(minutes=mins)

    def write_batch(name, rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp") \
            .write.parquet(os.path.join(src, name))

    def run():
        stream = spark.readStream.schema("user_id long, ts timestamp") \
            .parquet(src + "/*")
        q = (stateful_sessionize(stream, gap_seconds=600)
             .writeStream.format("parquet").outputMode("append")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        assert q.exception() is None, q.exception()
        return {(r["user_id"], r["ts"]): (r["session_id"], r["n_in_session"])
                for r in spark.read.parquet(out).collect()}

    write_batch("b1", [(1, m(0)), (1, m(5)), (2, m(0))])
    first = run()
    assert first[(1, m(0))] == (0, 1)
    assert first[(1, m(5))] == (0, 2)

    # second arrival: within-gap row continues session 0 (state restored
    # from the checkpoint); past-gap row opens session 1
    write_batch("b2", [(1, m(12)), (1, m(60))])
    second = run()
    assert second[(1, m(12))] == (0, 3)
    assert second[(1, m(60))] == (1, 1)
    assert second[(2, m(0))] == (0, 1)


def test_streaming_dedup(spark, dirs):
    src, ckpt, out = dirs
    rows = [(1, datetime.datetime(2024, 1, 1), 10.0),
            (1, datetime.datetime(2024, 1, 1), 10.0),   # dup key
            (2, datetime.datetime(2024, 1, 1), 20.0)]
    spark.createDataFrame(rows, "id long, ts timestamp, v double") \
        .write.parquet(os.path.join(src, "b1"))
    stream = spark.readStream.schema("id long, ts timestamp, v double") \
        .parquet(src + "/*")
    q = (streaming_dedup(stream, ["id", "ts"], ts_col="ts")
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()
    got = spark.read.parquet(out).collect()
    assert len(got) == 2


def test_stateful_cdc_preserves_nulls(spark, tmp_path):
    """A key whose newest row carries NULL value/event_type must surface
    SQL NULLs from the stateful CDC fold — not NaN or the string 'nan'
    (the batch twin and the shared oracle emit NULL)."""
    import datetime as dt
    import os

    from meerschaum_spark.streaming.stateful import stateful_cdc_snapshot

    rows = [
        (dt.datetime(2024, 1, 1, 0), 1, 7, "click", 1.5),
        (dt.datetime(2024, 1, 1, 1), 2, 7, None, None),  # newest: NULLs
        (dt.datetime(2024, 1, 1, 0), 3, 8, "view", 2.0),
    ]
    src = spark.createDataFrame(
        rows, "ts timestamp, event_id long, user_id long, "
              "event_type string, value double")
    src_dir = str(tmp_path / "cdc_src")
    src.write.parquet(src_dir)
    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    snap = stateful_cdc_snapshot(stream)
    q = (snap.writeStream.format("memory").queryName("_cdc_nulls")
         .outputMode("update").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    out = {r["user_id"]: r for r in spark.table("_cdc_nulls").collect()}
    assert out[7]["last_event_type"] is None
    assert out[7]["last_value"] is None
    assert out[7]["n_changes"] == 2
    assert out[8]["last_event_type"] == "view"


def test_stateful_ema_across_runs(spark, dirs):
    """The integer EWMA recurrence survives across separate streaming
    runs sharing a checkpoint: a second batch continues from the stored
    (ema, n) state, and the final fold equals the batch recurrence over
    the concatenated ordered input."""
    from meerschaum_spark.streaming.stateful import stateful_ema
    src, ckpt, out = dirs
    T0 = datetime.datetime(2024, 1, 1, 10, 0)
    m = lambda mins: T0 + datetime.timedelta(minutes=mins)
    schema = "user_id long, ts timestamp, event_id long, value double"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema) \
            .write.parquet(os.path.join(src, name))

    def run():
        collected = []

        def sink(batch_df, _epoch):
            collected.extend(batch_df.collect())

        stream = spark.readStream.schema(schema).parquet(src + "/*")
        q = (stateful_ema(stream)
             .writeStream.foreachBatch(sink).outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        assert q.exception() is None, q.exception()
        best = {}
        for r in collected:  # keep max-n emission per key (monotonic)
            if r["user_id"] not in best or r["n_events"] > \
                    best[r["user_id"]]["n_events"]:
                best[r["user_id"]] = r
        return best

    b1 = [(1, m(0), 10, 3.0), (1, m(1), 11, 7.0), (2, m(0), 20, 5.0)]
    write_batch("b1", b1)
    first = run()
    # user 1: S = 3_000_000 -> (3e6+7e6)//2 = 5_000_000
    assert first[1]["n_events"] == 2 and first[1]["ema_scaled"] == 5_000_000
    assert first[2]["n_events"] == 1 and first[2]["ema_scaled"] == 5_000_000

    b2 = [(1, m(2), 12, 2.0), (2, m(1), 21, 1.0)]
    write_batch("b2", b2)
    second = run()
    # user 1 continues from state: (5e6 + 2e6)//2 = 3_500_000
    assert second[1]["n_events"] == 3
    assert second[1]["ema_scaled"] == 3_500_000
    assert second[2]["n_events"] == 2
    assert second[2]["ema_scaled"] == 3_000_000

    # equals the batch recurrence over the full ordered input
    def batch_ema(vals):
        s = None
        for v in vals:
            y = int(v * 1_000_000 + 0.5)
            s = y if s is None else (s + y) // 2
        return s
    assert second[1]["ema_scaled"] == batch_ema([3.0, 7.0, 2.0])
    assert second[2]["ema_scaled"] == batch_ema([5.0, 1.0])


def test_state_rows_bounded_by_distinct_keys(spark, dirs):
    """100 TB state contract: stateful operators hold one state row PER
    KEY, not per event — numRowsTotal from the query progress must track
    distinct keys and stay FLAT when 4x more events arrive for the same
    key set. Also proves the RocksDB provider knob end-to-end: the same
    replay under SPARK_GRAFT_STATE_STORE=rocksdb completes with
    identical state accounting on the off-heap backend."""
    import pyspark.sql.functions as F

    from meerschaum_spark.queries import _stream_replay_confs
    from meerschaum_spark.streaming.stateful import stateful_ema

    src, ckpt_root, out_root = dirs
    n_keys = 37

    schema = "user_id long, ts timestamp, event_id long, value double"

    def write_events(name, n_events):
        df = (spark.range(n_events)
              .select((F.col("id") % n_keys).alias("user_id"),
                      F.timestamp_seconds(1_704_067_200 + F.col("id") * 7)
                      .alias("ts"),
                      F.col("id").alias("event_id"),
                      (F.col("id") % 1000).cast("double").alias("value")))
        # write OUTSIDE the watched dir, then rename in (atomic appear)
        tmp = os.path.join(src, f"_tmp_{name}")
        df.coalesce(1).write.parquet(tmp)
        os.rename(tmp, os.path.join(src, name))

    def run(tag, n_events, state_store=None):
        write_events(f"b_{tag}", n_events)
        with _stream_replay_confs(spark, state_store=state_store):
            stream = (spark.readStream.schema(schema).parquet(src + "/*"))
            q = (stateful_ema(stream)
                 .writeStream.format("noop").outputMode("update")
                 .option("checkpointLocation",
                         os.path.join(ckpt_root, "hdfs" if not state_store
                                      else "rocks"))
                 .trigger(availableNow=True).start())
            q.awaitTermination(180)
            assert q.exception() is None, q.exception()
            prog = q.lastProgress
        ops = prog["stateOperators"]
        assert ops, "no state operator in progress"
        return ops[0]["numRowsTotal"]

    first = run("r1", 2_000)
    assert first == n_keys, first          # rows ∝ keys, not events
    more = run("r2", 8_000)                # 4× events, same key space
    assert more == n_keys, more            # state did NOT grow

    # fresh checkpoint on the RocksDB backend (provider is pinned per
    # checkpoint, so it gets its own)
    rocks = run("r3", 2_000, state_store="rocksdb")
    assert rocks == n_keys, rocks
