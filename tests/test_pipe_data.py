"""Read-path details: select/omit, replace_nulls, iterator chunks,
backtrack slice, per-id incremental filter (J6), registry listing."""

import datetime

import pandas as pd
import pytest

from meerschaum_spark.pipe import Pipe

UTC = datetime.timezone.utc


def dtm(*args):
    return datetime.datetime(*args, tzinfo=UTC)


@pytest.fixture()
def filled(spark, instance_dir):
    pipe = Pipe("data", "ev", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    rows = [{"dt": dtm(2024, 1, d, h), "id": i,
             "val": None if (d == 2 and i == 1) else float(d * 100 + h)}
            for d in range(1, 5) for h in (0, 12) for i in (1, 2)]
    pipe.sync(pd.DataFrame(rows))
    return pipe


def test_select_and_omit(filled):
    df = filled.get_data(select_columns=["dt", "val"], order=None)
    assert df.columns == ["dt", "val"]
    df2 = filled.get_data(omit_columns=["val"], order=None)
    assert "val" not in df2.columns


def test_replace_nulls(filled):
    df = filled.get_data(params={"id": 1}, replace_nulls=-1.0, order=None)
    vals = [r["val"] for r in df.collect()]
    assert -1.0 in vals and None not in vals
    # key columns are never coalesced
    assert all(r["id"] == 1 for r in df.collect())


def test_iterator_chunks_cover_everything(filled):
    chunks = list(filled.get_data(as_iterator=True, chunk_minutes=1440))
    assert len(chunks) >= 4  # daily grid over 4 days
    total = sum(c.count() for c in chunks)
    assert total == filled.get_rowcount()


def test_backtrack_data(filled):
    bt = filled.get_backtrack_data(backtrack_minutes=24 * 60, order=None)
    # window = [last_sync - 1d, ∞) → days 3 12:00? last is day4 12:00 → from day3 12:00
    assert bt.count() == 6


def test_filter_new_per_id(spark, instance_dir):
    pipe = Pipe("data", "perid", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    pipe.sync(pd.DataFrame([
        {"dt": dtm(2024, 1, 1), "id": 1, "val": 1.0},
        {"dt": dtm(2024, 1, 3), "id": 2, "val": 2.0},
    ]))
    source = spark.createDataFrame([
        (dtm(2024, 1, 2), 1, 10.0),   # newer than id 1's sync time → keep
        (dtm(2024, 1, 2), 2, 20.0),   # older than id 2's sync time → drop
        (dtm(2024, 1, 1), 3, 30.0),   # unseen id → keep
    ], "dt timestamp, id long, val double")
    out = pipe.filter_new_per_id(source)
    kept = sorted((r["id"], r["val"]) for r in out.collect())
    assert kept == [(1, 10.0), (3, 30.0)]


def test_registry_listing(spark, instance_dir):
    p1 = Pipe("connA", "m1", instance=instance_dir, spark=spark,
              columns={"datetime": "dt"})
    p2 = Pipe("connB", "m2", "loc1", instance=instance_dir, spark=spark,
              columns={"datetime": "dt"})
    p1.register(); p2.register()
    keys = p1.registry.fetch_pipes_keys()
    assert ("connA", "m1", None) in keys and ("connB", "m2", "loc1") in keys
    assert p1.registry.fetch_pipes_keys(connector="connB") == \
        [("connB", "m2", "loc1")]


def test_get_docs_and_distinct(filled):
    docs = filled.get_docs(begin=dtm(2024, 1, 1), end=dtm(2024, 1, 2))
    assert len(docs) == 4 and all(isinstance(d, dict) for d in docs)
    assert filled.get_distinct_count("id") == 2
    assert filled.get_size() > 0


def test_get_data_bounds_without_dt_col_raises(spark, instance_dir):
    """Bounds against a pipe with no registered datetime column must raise,
    not silently return the unbounded table."""
    import pandas as pd
    import pytest as _pytest
    from meerschaum_spark.pipe import Pipe
    pipe = Pipe("test", "nodt", instance=instance_dir, spark=spark,
                columns={"id": "id"})
    pipe.sync(pd.DataFrame([{"id": 1, "val": 2}]))
    with _pytest.raises(ValueError, match="datetime column"):
        pipe.get_data(begin="2024-01-01")
