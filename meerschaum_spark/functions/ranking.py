"""Distributed total-order ranking — global row numbers without the
single-partition window.

The naive ``row_number() OVER (ORDER BY ...)`` (no PARTITION BY) is the
classic Spark scale trap: Catalyst plans one hash partition, so every row
funnels through a single task — at 100 TB that task never finishes. The
pattern here is the standard distributed fix (zipWithIndex economics on
the DataFrame API):

1. range-partition on the sort key (``repartitionByRange`` — Spark
   samples split points, so ranges are balanced even under skewed keys),
2. count rows per partition (ONE metadata-sized collect of
   ≤ num-partitions rows — the documented gate-materialization pattern),
3. rank each partition locally in parallel and add its cumulative
   offset (an Arrow-batched ``mapInPandas``; no second shuffle, no join).

The result is deterministic REGARDLESS of where the sampled split points
land, provided ``order_cols`` is a TOTAL order (append a unique tiebreak
column) — equal keys straddling a boundary would otherwise take
placement-dependent ranks, so the helper refuses nothing but documents
the contract.

Reference parity: the reference ranks in pandas (``DataFrame.rank`` /
``sort_values().reset_index()``) which is single-node by construction —
this module is the Spark-native equivalent that still works when the
frame doesn't fit one machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _pin_layout(df: DataFrame) -> DataFrame:
    """Materialize ``df`` once so every downstream action sees the SAME
    (sampled) range-partition layout — as a DISK-backed local
    checkpoint. The default MEMORY_AND_DISK checkpoint blocks compete
    with execution memory for the unified pool, and because a local
    checkpoint truncates lineage its blocks are the ONLY copy — under a
    constrained pool (the pressure soak: 1 GiB heap, fraction 0.15)
    the pinned storage starved the range sort's page acquisitions into
    SparkOutOfMemoryError. DISK_ONLY keeps the pool whole; the extra
    read cost is one sequential pass over a frame the caller already
    shuffled."""
    from pyspark import StorageLevel

    return df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)


def global_row_number(
    df: DataFrame,
    order_cols: list,
    rn_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global row number following ``order_cols``
    (strings or Columns, e.g. ``[F.col("m").desc(), "id"]``) without ever
    funneling the frame through one task.

    ``order_cols`` must define a TOTAL order (tie-break with a unique
    column); ranks of duplicate keys would otherwise depend on sampled
    range boundaries. The input is materialized once (localCheckpoint)
    so the per-partition count job and the ranking job read the same
    partition layout — ``repartitionByRange`` samples split points per
    execution, so re-planning it twice could disagree.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # one distributed materialization pins the (sampled) range layout
    part = _pin_layout(df.repartitionByRange(n, *cols))
    # metadata-sized collect: ≤ n rows of (partition id, count)
    counts = (part.withColumn("_pid", F.spark_partition_id())
              .groupBy("_pid").count().collect())
    sizes = {int(r["_pid"]): int(r["count"]) for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    out_schema = T.StructType(
        list(part.schema.fields) + [T.StructField(rn_col, T.LongType())])

    def add_rn(iterator):
        import numpy as np
        from pyspark import TaskContext

        ctx = TaskContext.get()
        base = offsets.get(ctx.partitionId() if ctx else 0, 0)
        seen = 0
        for pdf in iterator:
            pdf = pdf.copy()
            pdf[rn_col] = np.arange(
                base + seen + 1, base + seen + 1 + len(pdf), dtype="int64")
            seen += len(pdf)
            yield pdf

    # in-partition sort (no shuffle) → Arrow-batched local ranking;
    # partition ids survive the narrow dependency, so each task picks
    # up exactly its precomputed offset
    return part.sortWithinPartitions(*cols).mapInPandas(add_rn, out_schema)


def quartile_score(rn_col: str, n_total: int, out_col: str) -> F.Column:
    """1-4 bucket from a global row number: ``((rn-1)*4) div n + 1`` —
    pure integer arithmetic, identical on every engine (unlike NTILE,
    whose remainder-distribution rules differ subtly across engines)."""
    return (F.expr(f"(({rn_col} - 1) * 4) div {int(n_total)}")
            .cast("int") + F.lit(1)).alias(out_col)


def global_running_sum(
    df: DataFrame,
    order_cols: list,
    val_col: str,
    out_col: str = "running",
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Append the global prefix sum of ``val_col`` following
    ``order_cols`` — the distributed sweep-line primitive — without the
    single-partition window a bare ``sum() OVER (ORDER BY ...)`` plans.

    Same 3-step economics as ``global_row_number``: range-partition on
    the (total) order, ONE metadata-sized collect of per-partition SUMS
    (≤ num-partitions rows), then each partition cumsums locally in an
    Arrow batch and adds its exclusive prefix offset — no second
    shuffle, no join, and ties never straddle a boundary ambiguously
    because ``order_cols`` must be a total order. ``val_col`` must be an
    integral column (the offsets accumulate in Python ints — exact at
    any magnitude). ``total_col`` attaches the GRAND total as a literal
    column for free — the offset accumulator already knows it
    driver-side, so consumers that would otherwise run a separate
    ``agg(sum)`` action (and broadcast-join its one row back) skip
    both (measured 2× on ``part_abc_analysis``)."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    part = _pin_layout(df.repartitionByRange(n, *cols))
    sums = (part.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(F.sum(F.col(val_col)).cast("long").alias("_s"))
            .collect())
    psums = {int(r["_pid"]): int(r["_s"]) for r in sums}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(psums):
        offsets[pid] = acc
        acc += psums[pid]
    out_schema = T.StructType(
        list(part.schema.fields) + [T.StructField(out_col, T.LongType())])

    def add_cumsum(iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        base = offsets.get(ctx.partitionId() if ctx else 0, 0)
        for pdf in iterator:
            pdf = pdf.copy()
            pdf[out_col] = pdf[val_col].astype("int64").cumsum() + base
            base += int(pdf[val_col].sum()) if len(pdf) else 0
            yield pdf

    out = part.sortWithinPartitions(*cols).mapInPandas(
        add_cumsum, out_schema)
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(acc).cast("long"))
    return out
