"""Parquet table loaders for the engine's test corpus.

One quirk handled here: ``events.parquet`` has shipped with different
physical types for its timestamp across testdata generations —
ns-precision INT64 (which Spark's parquet reader rejects outright,
PARQUET_TYPE_ILLEGAL) and plain µs TIMESTAMP (read as TIMESTAMP_NTZ).
The engine's canonical timestamp is µs-UTC TIMESTAMP (SURVEY §1.2), so
the loader sniffs the *actual* read type and normalizes: raw longs
(under ``spark.sql.legacy.parquet.nanosAsLong``) are floored to µs
JVM-side; NTZ is reinterpreted as UTC via a cast (value-preserving —
the engine pins the session timezone to UTC). No data leaves the
executors either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: tables whose timestamp column is ns-precision in parquet
_NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}

#: resolved-DataFrame cache: reader construction + schema inference +
#: the nanosAsLong conf toggle cost ~100 ms per call (measured), paid by
#: EVERY catalog query. The test corpus is immutable and DataFrames are
#: immutable plans, so caching per (session, path, table) is safe; the
#: shared FileStatusCache still governs file listing per action.
_TABLE_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    for stale in [k for k in _TABLE_CACHE if k[0] != app_id]:
        del _TABLE_CACHE[stale]
    key = (app_id, os.path.abspath(sf_dir), name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = _load_table_uncached(spark, sf_dir, name)
        _TABLE_CACHE[key] = df
    return df


def canonicalize_ts(df: DataFrame, cols: list[str]) -> DataFrame:
    """Normalize timestamp columns to the engine's canonical µs-UTC
    TIMESTAMP, keyed off the type the parquet reader actually produced:

    - ``bigint`` (ns epoch read under ``nanosAsLong``): integer-DIV to
      µs — ns epochs exceed double precision (2^53), so a float division
      would be off by ±1 µs — then ``timestamp_micros``.
    - ``timestamp_ntz``: cast to TIMESTAMP. Value-preserving because the
      session timezone is pinned to UTC.
    - already ``timestamp``: untouched.
    """
    for c in cols:
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, LongType):
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
        elif isinstance(dt, TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str,
                         name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _NANOS_TS_COLS.get(name, [])
    if not ns_cols:
        return spark.read.parquet(path)
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        return canonicalize_ts(spark.read.parquet(path), ns_cols)
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register each table as a temp view (the SQL surface / fetch
    definitions resolve against these)."""
    for name in names or TABLE_NAMES:
        if os.path.isfile(os.path.join(sf_dir, f"{name}.parquet")):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
