import datetime
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from meerschaum_spark import dtypes as D


def test_canonical_dtype_aliases():
    assert D.canonical_dtype("decimal") == "numeric"
    assert D.canonical_dtype("guid") == "uuid"
    assert D.canonical_dtype("blob") == "bytes"
    assert D.canonical_dtype("numeric(10,5)") == "numeric(10,5)"
    assert D.canonical_dtype("timestamp") == "datetime"


def test_to_spark_type():
    assert D.to_spark_type("int") == T.LongType()
    assert D.to_spark_type("numeric(10,5)") == T.DecimalType(10, 5)
    assert D.to_spark_type("numeric") == T.DecimalType(38, 18)
    assert D.to_spark_type("json") == T.StringType()
    assert D.to_spark_type("datetime") == T.TimestampType()
    with pytest.raises(ValueError):
        D.to_spark_type("wat")


def test_widen_dtypes():
    assert D.widen_dtypes("int32", "int64") == "int64"
    assert D.widen_dtypes("int64", "float64") == "numeric"
    assert D.widen_dtypes("int64", "numeric") == "numeric"
    assert D.widen_dtypes("float32", "float64") == "float64"
    assert D.widen_dtypes("int64", "str") == "str"
    assert D.widen_dtypes("date", "datetime") == "datetime"


def test_canonical_json_sorts_keys():
    assert D.canonical_json({"b": 1, "a": [2, {"z": 1, "y": 2}]}) == \
        '{"a":[2,{"y":2,"z":1}],"b":1}'
    # strings that are JSON get re-canonicalized
    assert D.canonical_json('{"b": 1, "a": 2}') == '{"a":2,"b":1}'
    assert D.canonical_json(None) is None


def test_serialize_decimal():
    assert D.serialize_decimal(Decimal("1.50")) == "1.50"
    assert D.serialize_decimal(Decimal("1E+2")) == "100"


def test_quantize_decimal_half_up():
    assert D.quantize_decimal(Decimal("1.005"), 10, 2) == Decimal("1.01")
    assert D.quantize_decimal(Decimal("1.004"), 10, 2) == Decimal("1.00")


def test_datetime_int_roundtrip():
    dt = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456,
                           tzinfo=datetime.timezone.utc)
    n = D.datetime_to_int(dt, "microsecond")
    assert D.int_to_datetime(n, "microsecond") == dt
    secs = D.datetime_to_int(dt, "second")
    assert secs == int(dt.timestamp())


def test_parse_date_bound_datetime_axis():
    b = D.parse_date_bound("2024-01-01 00:00:00")
    assert b == datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    # naive input treated as UTC
    b2 = D.parse_date_bound(datetime.datetime(2024, 1, 1))
    assert b2 == b
    # int on datetime axis = epoch at unit
    b3 = D.parse_date_bound(1704067200, unit="second")
    assert b3 == b


def test_parse_date_bound_int_axis():
    dt = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    assert D.parse_date_bound(dt, "int64", "second") == 1704067200
    assert D.parse_date_bound(1704067200, "int64", "second") == 1704067200
    assert D.parse_date_bound("1704067200", "int64", "second") == 1704067200


def test_round_time():
    dt = datetime.datetime(2024, 1, 1, 12, 34, 56, 789012,
                           tzinfo=datetime.timezone.utc)
    assert D.round_time(dt, "minute") == datetime.datetime(
        2024, 1, 1, 12, 34, tzinfo=datetime.timezone.utc)
    assert D.round_time(dt, "hour") == datetime.datetime(
        2024, 1, 1, 12, tzinfo=datetime.timezone.utc)
