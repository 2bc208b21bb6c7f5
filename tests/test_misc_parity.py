"""Parity odds and ends: grid repartition, plugin sync protocol,
definition guard, dict-valued params (canonical-JSON equality)."""

import datetime

import pandas as pd
import pytest

from meerschaum_spark.params import params_to_filter
from meerschaum_spark.pipe import Pipe

UTC = datetime.timezone.utc


def dtm(*args):
    return datetime.datetime(*args, tzinfo=UTC)


def test_repartition_grid(spark, instance_dir):
    pipe = Pipe("misc", "grid", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    pipe.sync(pd.DataFrame([
        {"dt": dtm(2024, 1, 1) + datetime.timedelta(days=10 * k), "id": 1,
         "val": float(k)} for k in range(6)]))
    before = len(pipe.store.partition_values())
    res = pipe.repartition_grid(7 * 24 * 60)   # 30-day → 7-day grid
    assert res.success
    after = len(pipe.store.partition_values())
    assert after > before
    assert pipe.get_rowcount() == 6
    assert pipe.chunk_minutes == 7 * 24 * 60
    # reads and sync still work on the new grid
    assert pipe.get_data(begin=dtm(2024, 1, 15)).count() == 4


def test_plugin_sync_protocol(spark, instance_dir):
    calls = {}

    def plugin_sync(pipe, begin=None, end=None, params=None):
        calls["seen"] = True
        inner = pipe.sync(pd.DataFrame([
            {"dt": dtm(2024, 1, 1), "id": 1, "val": 1.0}]))
        return inner

    pipe = Pipe("misc", "plugin", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"}, sync_fn=plugin_sync)
    res = pipe.sync()
    assert res.success and calls.get("seen")
    assert pipe.get_rowcount() == 1


def test_definition_guard(spark, instance_dir):
    pipe = Pipe("misc", "guard", instance=instance_dir, spark=spark,
                columns={"datetime": "dt"},
                parameters={"fetch": {"definition":
                                      "SELECT 1; DROP TABLE x"}})
    with pytest.raises(ValueError, match="Unsafe token"):
        pipe.fetch()


def test_dict_param_json_equality(spark):
    df = spark.createDataFrame(
        [(1, '{"a":1,"b":2}'), (2, '{"a":9}')], "id long, props string")
    cond = params_to_filter({"props": {"b": 2, "a": 1}})  # key order differs
    got = [r["id"] for r in df.filter(cond).collect()]
    assert got == [1]
