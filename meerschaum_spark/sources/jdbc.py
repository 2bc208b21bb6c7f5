"""JDBC source (reference S1/S2: connectors/sql/_sql.py:34-439 ``read``
and connectors/sql/_fetch.py:17-85 ``fetch``).

The reference reads in 100k-row chunks through a connection pool; the
Spark equivalent is partitioned JDBC reads — ``partitionColumn`` /
``lowerBound`` / ``upperBound`` / ``numPartitions`` give N parallel
range-bounded cursors, and Catalyst pushes filters/projections into the
remote query. Live-tested end-to-end against embedded Apache Derby
(which ships in Spark's own jars): write → partitioned bounded fetch →
incremental pipe sync → write-back (tests/test_jdbc_live.py).
"""

from __future__ import annotations

import datetime
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    partition_column: str | None = None,
    lower_bound: Any = None,
    upper_bound: Any = None,
    num_partitions: int = 8,
    fetchsize: int = 100_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Build a (possibly partitioned) JDBC scan.

    ``table_or_query``: a table name, or an arbitrary SQL definition —
    wrapped as a subquery alias like the reference's CTE wrapper
    (utils/sql.py:2681-2826); bounds/params filter on top of it and
    Spark pushes them into the remote WHERE clause.
    """
    dbtable = table_or_query
    if " " in table_or_query.strip():
        # SQL-standard identifier (no leading underscore): Derby and
        # Oracle reject correlation names starting with '_'
        dbtable = f"({table_or_query}) AS mrsm_definition"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", _bound_str(lower_bound))
            .option("upperBound", _bound_str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def _bound_str(bound: Any) -> str:
    if isinstance(bound, datetime.datetime):
        return bound.strftime("%Y-%m-%d %H:%M:%S")
    return str(bound)


def jdbc_fetch_definition(
    spark: SparkSession,
    url: str,
    definition: str,
    dt_col: str | None = None,
    begin: Any = None,
    end: Any = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """The pipe-fetch shape over JDBC: definition subquery + incremental
    dt bounds (begin = sync_time − backtrack upstream). Bounds become a
    plain ``.where`` — Spark pushes them into the remote scan, which is
    the reference's append-bounds-outside-the-CTE rewrite
    (connectors/sql/_fetch.py:344-361) done by Catalyst instead of
    string surgery."""
    # range-partition the cursor only when BOTH bounds are known (Spark
    # requires lower+upper); a begin-only incremental fetch stays a single
    # cursor with the bound pushed into the remote WHERE — the backtrack
    # window is small by construction, parallelism there buys nothing
    partition = begin is not None and end is not None
    df = read_jdbc(spark, url, definition,
                   partition_column=dt_col if partition else None,
                   lower_bound=begin, upper_bound=end,
                   num_partitions=num_partitions, properties=properties)
    from meerschaum_spark.params import datetime_filter
    cond = datetime_filter(dt_col, begin, end) if dt_col else None
    return df.filter(cond) if cond is not None else df


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 100_000,
    num_partitions: int | None = None,
    isolation_level: str = "READ_COMMITTED",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC sink (the write half of S1 — reference ``to_sql`` bulk insert,
    connectors/sql/_sql.py:441-640 with the 100k-row chunk inserts).

    Each Spark partition opens one connection and streams ``batchsize``-row
    executeBatch inserts — the distributed analogue of the reference's
    chunked ``to_sql``. ``num_partitions`` caps concurrent connections
    (coalesce before write); ``mode='overwrite'`` truncates-and-loads.

    NOTE: an engine-level *upsert* to JDBC goes through ``Pipe.sync``
    against the parquet store; pushing MERGE semantics to a remote
    database is the reference's per-flavor SQL-template territory, which
    this engine deliberately leaves to the instance store.
    """
    out = df.coalesce(num_partitions) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", isolation_level)
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
