"""filter_existing edge cases, mirroring reference
tests/test_filter_existing.py:15-199 case-for-case."""

import datetime

import pandas as pd
import pytest

from meerschaum_spark.pipe import Pipe

UTC = datetime.timezone.utc


def dtm(*args):
    return datetime.datetime(*args, tzinfo=UTC)


@pytest.fixture()
def pipe(spark, instance_dir):
    p = Pipe("fe", "cases", instance=instance_dir, spark=spark,
             columns={"datetime": "dt", "id": "id"})
    p.sync(pd.DataFrame([
        {"dt": dtm(2024, 1, 1), "id": 1, "val": 1.0},
        {"dt": dtm(2024, 1, 2), "id": 2, "val": 2.0},
    ]))
    return p


def _split(pipe, rows):
    df, _ = __import__("meerschaum_spark.dataframe", fromlist=["to_spark_df"]) \
        .to_spark_df(pipe.spark, pd.DataFrame(rows), pipe.dtypes or None)
    unseen, update = pipe.filter_existing(df)
    return unseen.collect(), update.collect()


def test_filter_existing_all_new(pipe):
    unseen, update = _split(pipe, [
        {"dt": dtm(2024, 1, 3), "id": 3, "val": 3.0},
        {"dt": dtm(2024, 1, 4), "id": 4, "val": 4.0},
    ])
    assert len(unseen) == 2 and len(update) == 0


def test_filter_existing_all_duplicate(pipe):
    unseen, update = _split(pipe, [
        {"dt": dtm(2024, 1, 1), "id": 1, "val": 1.0},
        {"dt": dtm(2024, 1, 2), "id": 2, "val": 2.0},
    ])
    # exact re-sends are neither unseen nor updates (full-row anti-join)
    assert len(unseen) == 0 and len(update) == 0


def test_filter_existing_partial_update(pipe):
    unseen, update = _split(pipe, [
        {"dt": dtm(2024, 1, 1), "id": 1, "val": 99.0},   # changed value
        {"dt": dtm(2024, 1, 5), "id": 5, "val": 5.0},    # new key
    ])
    assert len(unseen) == 1 and unseen[0]["id"] == 5
    assert len(update) == 1 and update[0]["id"] == 1


def test_filter_existing_no_datetime_column(spark, instance_dir):
    p = Pipe("fe", "nodt", instance=instance_dir, spark=spark,
             columns={"id": "id"})
    p.sync(pd.DataFrame([{"id": 1, "val": 1.0}]))
    res = p.sync(pd.DataFrame([{"id": 1, "val": 2.0},
                               {"id": 2, "val": 3.0}]))
    assert res.inserted == 1 and res.updated == 1
    docs = {d["id"]: d for d in p.get_docs()}
    assert docs[1]["val"] == 2.0


def test_filter_existing_no_pipe_data(spark, instance_dir):
    """Against a table that doesn't exist yet, everything is unseen."""
    p = Pipe("fe", "fresh", instance=instance_dir, spark=spark,
             columns={"datetime": "dt", "id": "id"})
    res = p.sync(pd.DataFrame([{"dt": dtm(2024, 1, 1), "id": 1, "val": 1.0}]))
    assert res.success and res.inserted == 1 and res.updated == 0


def test_filter_existing_empty_batch(pipe):
    res = pipe.sync(pd.DataFrame())
    assert res.success and res.inserted == 0 and res.updated == 0
    assert pipe.get_rowcount() == 2


def test_filter_existing_none_fetch(spark, instance_dir):
    p = Pipe("fe", "nonefetch", instance=instance_dir, spark=spark,
             columns={"datetime": "dt", "id": "id"})
    res = p.sync(None)
    assert not res.success  # no data and no fetch source


def test_filter_existing_null_key_rows(pipe):
    """Null index values compare null-safely: a re-sent null-key row is
    not re-inserted (reference null-indices semantics)."""
    pipe.sync(pd.DataFrame([{"dt": dtm(2024, 1, 6), "id": None, "val": 6.0}]))
    res = pipe.sync(pd.DataFrame([{"dt": dtm(2024, 1, 6), "id": None, "val": 6.0}]))
    assert res.inserted == 0 and res.updated == 0
