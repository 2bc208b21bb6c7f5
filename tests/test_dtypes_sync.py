"""Dtype-zoo behavioral tests (FIXTURES F3, mirroring the reference's
tests/test_pipes_dtypes.py): special dtypes inferred from the first batch,
enforced on later batches, widened on conflict, round-tripped exactly."""

import datetime
import uuid
from decimal import Decimal

import pandas as pd
import pytest

from meerschaum_spark.pipe import Pipe

UTC = datetime.timezone.utc


def dtm(*args):
    return datetime.datetime(*args, tzinfo=UTC)


def test_special_dtype_inference_and_roundtrip(spark, instance_dir):
    pipe = Pipe("dtypes", "zoo", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    u = uuid.UUID("12345678-1234-5678-1234-567812345678")
    batch = pd.DataFrame([{
        "dt": dtm(2024, 1, 1), "id": 1,
        "json_col": {"b": 1, "a": [2, 3]},
        "num_col": Decimal("1.000000001"),
        "uuid_col": u,
        "bytes_col": b"\x00\x01",
        "date_col": datetime.date(2024, 1, 1),
        "bool_col": True,
    }])
    res = pipe.sync(batch)
    assert res.success, res.message
    dt = pipe.dtypes
    assert dt["json_col"] == "json"
    assert dt["num_col"].startswith("numeric")
    assert dt["uuid_col"] == "uuid"
    assert dt["bytes_col"] == "bytes"
    [doc] = pipe.get_docs()
    assert doc["json_col"] == '{"a":[2,3],"b":1}'   # canonical: sorted keys
    assert doc["num_col"] == Decimal("1.000000001000000000")
    assert doc["uuid_col"] == str(u)
    assert bytes(doc["bytes_col"]) == b"\x00\x01"
    assert doc["bool_col"] is True


def test_json_identity_is_canonical(spark, instance_dir):
    """Same JSON content with different key order must diff as identical
    (reference: canonical serialization is load-bearing for diffing)."""
    pipe = Pipe("dtypes", "jsonid", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    pipe.sync(pd.DataFrame([{"dt": dtm(2024, 1, 1), "id": 1,
                             "json_col": {"x": 1, "y": 2}}]))
    res = pipe.sync(pd.DataFrame([{"dt": dtm(2024, 1, 1), "id": 1,
                                   "json_col": {"y": 2, "x": 1}}]))
    assert res.inserted == 0 and res.updated == 0
    assert pipe.get_rowcount() == 1


def test_int_to_numeric_widening(spark, instance_dir):
    """int column receiving floats widens to numeric (reference
    get_alter_columns_queries, connectors/sql/_pipes.py:3496-3832)."""
    pipe = Pipe("dtypes", "widen", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    pipe.sync(pd.DataFrame([{"dt": dtm(2024, 1, 1), "id": 1, "val": 1}]))
    assert pipe.dtypes["val"] == "int64"
    res = pipe.sync(pd.DataFrame([{"dt": dtm(2024, 1, 2), "id": 1,
                                   "val": 2.5}]))
    assert res.success
    assert pipe.dtypes["val"] == "numeric"
    vals = sorted(d["val"] for d in pipe.get_docs())
    assert vals == [Decimal("1.000000000000000000"),
                    Decimal("2.500000000000000000")]


def test_explicit_precision_scale(spark, instance_dir):
    pipe = Pipe("dtypes", "prec", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"},
                dtypes={"num_col": "numeric(10,5)"})
    pipe.sync(pd.DataFrame([{"dt": dtm(2024, 1, 1), "id": 1,
                             "num_col": Decimal("3.14159265")}]))
    [doc] = pipe.get_docs()
    assert doc["num_col"] == Decimal("3.14159")   # quantized to scale 5


def test_enforce_false_passthrough(spark, instance_dir):
    """enforce=False skips dtype casting (reference _attributes.py:401-416)."""
    pipe = Pipe("dtypes", "noenf", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"}, enforce=False)
    res = pipe.sync(pd.DataFrame([{"dt": dtm(2024, 1, 1), "id": 1,
                                   "val": 1.5}]))
    assert res.success
    assert pipe.get_rowcount() == 1


def test_tz_naive_and_aware_mix(spark, instance_dir):
    """naive datetimes are treated as UTC; aware ones convert to UTC."""
    pipe = Pipe("dtypes", "tz", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    est = datetime.timezone(datetime.timedelta(hours=-5))
    pipe.sync(pd.DataFrame([
        {"dt": datetime.datetime(2024, 1, 1, 12), "id": 1, "val": 1},
    ]))
    res = pipe.sync(pd.DataFrame([
        {"dt": datetime.datetime(2024, 1, 1, 7, tzinfo=est), "id": 1,
         "val": 1},   # same instant as 12:00 UTC → no-op
    ]))
    assert res.inserted == 0 and res.updated == 0
    assert pipe.get_rowcount() == 1
