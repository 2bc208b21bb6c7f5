"""Driver contract for the spark-graft builder (PySpark target).

``entry`` exercises the actual engine end-to-end (pipe sync → store →
read path); ``queries``/``oracle_sql`` expose the operator catalog in
``meerschaum_spark.queries`` for the DuckDB correctness gate.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sync the sf0.001 events table through a Pipe (incremental
    diff → partitioned parquet store), then run the parameterized read path
    and an hourly rollup on the stored data."""
    from pyspark.sql import functions as F

    from meerschaum_spark.pipe import Pipe
    from meerschaum_spark.session import apply_engine_confs
    from meerschaum_spark.sources import load_table

    apply_engine_confs(spark)
    sf_dir = "/root/testdata/sf0.001"
    events = load_table(spark, sf_dir, "events")
    instance = tempfile.mkdtemp(prefix="mrsm_entry_")
    try:
        pipe = Pipe("entry", "events", instance=instance, spark=spark,
                    columns={"datetime": "ts", "id": "event_id"})
        pipe.sync(events)
        # second (idempotent) sync proves the diff path
        pipe.sync(events)
        stored = pipe.get_data(order=None)
        result = (
            stored.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"),
                           F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                 .alias("sum_value"))
            .orderBy("bucket", "event_type")
        )
        # materialize before dropping the temp store
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(instance, ignore_errors=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, plus the
    training-data pipeline operators (dedup / similarity / text /
    multimodal)."""
    import meerschaum_spark.queries      # noqa: F401  (registers core ops)
    import meerschaum_spark.queries_llm  # noqa: F401  (registers LLM ops)
    from meerschaum_spark.catalog import QUERIES, ordered
    return ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (keys without an entry get the
    weaker rows-only check)."""
    import meerschaum_spark.queries      # noqa: F401
    import meerschaum_spark.queries_llm  # noqa: F401
    from meerschaum_spark.catalog import ORACLE, ordered
    return ordered(ORACLE, oracle_complete=True)
