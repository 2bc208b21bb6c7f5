"""Shared query-catalog registry + cross-engine determinism helpers.

``queries.py`` (core/pipe operators) and ``queries_llm.py`` (training-data
pipeline operators) both register here; ``__spark_entry__`` exposes the
union to the driver.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

#: exact-decimal accumulator type for double aggregates (see queries.py
#: module docstring: decimal sums are order-insensitive, doubles are not)
DEC = "decimal(18,6)"


def query(name: str, oracle_sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # pin session confs (UTC timezone above all): the driver may
            # hand us a session in another timezone, which would shift
            # every naive timestamp literal vs the DuckDB oracle
            from meerschaum_spark.session import apply_engine_confs
            apply_engine_confs(spark)
            return fn(spark, sf_dir)
        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle_sql is not None:
            ORACLE[name] = oracle_sql
        return fn
    return deco


def dec(col: str):
    return F.col(col).cast(DEC)


def sum_dbl(col_expr, alias: str):
    """Exact decimal sum surfaced as double."""
    return F.sum(col_expr).cast("double").alias(alias)


def hash60(col):
    """Deterministic 60-bit integer hash from md5 — identical in Spark
    (``conv(substr(md5(x),1,15),16,10)``) and DuckDB
    (``('0x' || substr(md5(x),1,15))::BIGINT``). 15 hex digits keep the
    value positive in a signed 64-bit long."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


HASH60_SQL = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def parallelize(df: DataFrame) -> DataFrame:
    """Spread a small-file scan across all cores before CPU-heavy per-row
    work (hashing, shingling, vector math).

    A 2 MB parquet file arrives as ONE input split, so without this every
    downstream transform runs single-threaded — the local analogue of a
    hot single partition on a cluster. The repartition shuffles only the
    tiny base table; on real multi-file/100 TB inputs it is a no-op cost
    relative to the work it unlocks."""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target)
