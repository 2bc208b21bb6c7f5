"""Parquet table loaders for the engine's test corpus.

One quirk handled here: ``events.parquet`` stores its timestamp with
nanosecond precision, which Spark's parquet reader rejects
(PARQUET_TYPE_ILLEGAL). The engine's canonical timestamp is µs-UTC
(SURVEY §1.2), so we read nanos as raw longs
(``spark.sql.legacy.parquet.nanosAsLong`` — a runtime-settable SQL conf)
and floor to microseconds JVM-side. No data leaves the executors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def _load_table_uncached(spark: SparkSession, sf_dir: str,
                         name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _NANOS_TS_COLS.get(name, [])
    if not ns_cols:
        return spark.read.parquet(path)
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
        for c in ns_cols:
            # integer DIV: ns epochs exceed double precision (2^53), so a
            # float division here would be off by ±1 µs
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
        return df
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register each table as a temp view (the SQL surface / fetch
    definitions resolve against these)."""
    for name in names or TABLE_NAMES:
        if os.path.isfile(os.path.join(sf_dir, f"{name}.parquet")):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
