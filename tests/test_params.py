"""Params-filter semantics — mirrors the reference's DB-free unit tests
(tests/utils/test_query_df.py)."""

import datetime

import pytest

from meerschaum_spark.params import (
    combine_filters,
    datetime_filter,
    params_to_filter,
    split_in_ex_values,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "a", 10.0, datetime.datetime(2024, 1, 1)),
        (2, "b", 20.0, datetime.datetime(2024, 1, 2)),
        (3, "a", None, datetime.datetime(2024, 1, 3)),
        (None, "c", 30.0, datetime.datetime(2024, 1, 4)),
        (5, None, 40.0, None),
    ]
    return spark.createDataFrame(rows, "id long, cat string, val double, ts timestamp")


def ids(df, cond):
    out = df.filter(cond).select("id").collect()
    return sorted((r[0] for r in out), key=lambda x: (x is None, x))


def test_split_in_ex():
    assert split_in_ex_values(["a", "_b", "c"]) == (["a", "c"], ["b"])
    assert split_in_ex_values("x") == (["x"], [])
    assert split_in_ex_values(["_None"]) == ([], [None])
    assert split_in_ex_values([None, 1]) == ([None, 1], [])


def test_scalar_equality(df):
    assert ids(df, params_to_filter({"cat": "a"})) == [1, 3]


def test_in_list(df):
    assert ids(df, params_to_filter({"cat": ["a", "b"]})) == [1, 2, 3]


def test_negation(df):
    # '_a' → cat != 'a'; NULL cats are kept (NA-aware negation)
    assert ids(df, params_to_filter({"cat": ["_a"]})) == [2, 5, None]


def test_null_and_not_null(df):
    assert ids(df, params_to_filter({"val": None})) == [3]
    assert ids(df, params_to_filter({"val": "_None"})) == [1, 2, 5, None]


def test_mixed_null_and_values(df):
    # list with None → col IN (...) OR col IS NULL
    assert ids(df, params_to_filter({"val": [10.0, None]})) == [1, 3]


def test_in_and_ex_combined(df):
    assert ids(df, params_to_filter({"cat": ["a", "b", "_b"]})) == [1, 3]


def test_multi_column_and(df):
    assert ids(df, params_to_filter({"cat": "a", "val": 10.0})) == [1]


def test_numeric_negation(df):
    # numbers are never prefix-negated; scalar int
    assert ids(df, params_to_filter({"id": 1})) == [1]
    assert ids(df, params_to_filter({"id": [1, 2]})) == [1, 2]


def test_empty_params(df):
    assert params_to_filter({}) is None
    assert params_to_filter(None) is None


def test_datetime_filter_end_exclusive(df):
    cond = datetime_filter("ts", datetime.datetime(2024, 1, 2),
                           datetime.datetime(2024, 1, 4))
    assert ids(df, cond) == [2, 3]


def test_combine_filters(df):
    cond = combine_filters(
        datetime_filter("ts", datetime.datetime(2024, 1, 1), None),
        params_to_filter({"cat": "a"}),
    )
    assert ids(df, cond) == [1, 3]
