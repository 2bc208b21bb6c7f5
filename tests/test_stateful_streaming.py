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
