"""Cross-table AS-OF join — the TSDB staple Spark lacks natively.

``asof_join(left, right, ...)`` attaches to each left row the single
right row with the greatest ``right_ts <= left_ts`` (backward,
inclusive) within the same ``by`` group — pandas ``merge_asof`` /
DuckDB ``ASOF JOIN`` semantics, built Spark-first as the UNION-MERGE
shape: tag both sides, union, and carry the latest right-row payload
forward with one ``last(..., ignorenulls)`` window. ONE shuffle on the
``by`` keys, zero range explosion — the non-equi range join Spark would
otherwise plan degenerates to a per-key cross product at scale, and the
``applyInPandas``+``merge_asof`` fallback pays a Python boundary this
composition avoids entirely (same rationale as the same-table
``events_asof_attribution``).

Reference surface: as-of attachment over hypertable-style pipes (the
reference serves these through its TSDB flavors); the same-table
variant has been in the catalog since r4 — this is the general
two-table form.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS, _TAG, _RV = "_mrsm_asof_ts", "_mrsm_asof_tag", "_mrsm_asof_rv"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str | None = None,
    by: Sequence[str] | str | None = None,
    tolerance: Column | None = None,
    how: str = "left",
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: per ``by`` group, each left row gets the right row
    with the greatest ``right_ts`` ≤ its ``left_ts`` (inclusive).

    ``tolerance`` (optional): a Column interval/duration — matches older
    than ``left_ts - tolerance`` are nulled out (pandas merge_asof's
    tolerance contract; the row itself is kept under ``how='left'``).
    ``how``: 'left' keeps unmatched left rows with null right columns;
    'inner' drops them (DuckDB ``ASOF JOIN`` vs ``ASOF LEFT JOIN``).
    Right value columns colliding with left names get ``suffix``.

    Contracts: right rows should be unique per (by, right_ts) — among
    equal-timestamp right rows the winner is arbitrary (same as DuckDB).
    A NULL ``by`` key forms its own group (pandas forbids this; callers
    wanting SQL equality semantics should filter null keys first).
    Scale: one shuffle on ``by``; a group's rows sort within one task —
    ``by`` must be reasonably high-cardinality (or the time axis
    pre-bucketed) for 100 TB inputs, the same constraint every
    windowed-by-key operator carries.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    by = [by] if isinstance(by, str) else list(by or [])
    right_ts = right_ts or left_ts
    rv_cols = [c for c in right.columns if c not in by and c != right_ts]
    out_names = {
        c: (c + suffix if c in left.columns else c)
        for c in [right_ts, *rv_cols]
    }

    # left_ts and right_ts must be union-compatible (both timestamps or
    # both numeric) — unionByName surfaces a type error otherwise
    r = right.select(
        *by,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        F.struct(F.col(right_ts).alias("_ts"),
                 *[F.col(c) for c in rv_cols]).alias(_RV),
        *[F.lit(None).cast(f.dataType).alias(f"_l_{f.name}")
          for f in left.schema.fields],
    )
    l_ = left.select(
        *by,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(r.schema[_RV].dataType).alias(_RV),
        *[F.col(f.name).alias(f"_l_{f.name}") for f in left.schema.fields],
    )
    # right sorts BEFORE left at an equal timestamp (tag 0 < 1) → the
    # inclusive ≤ contract falls out of the frame boundary
    w = (Window.partitionBy(*[F.col(c) for c in by])
         .orderBy(F.col(_TS).asc_nulls_first(), F.col(_TAG).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    attached = (r.unionByName(l_)
                .withColumn(_RV, F.last(_RV, ignorenulls=True).over(w))
                .filter(F.col(_TAG) == 1))
    if tolerance is not None:
        ok = F.col(f"{_RV}._ts") >= (F.col(_TS) - tolerance)
        attached = attached.withColumn(
            _RV, F.when(ok, F.col(_RV)))
    if how == "inner":
        attached = attached.filter(F.col(_RV).isNotNull())
    return attached.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        F.col(f"{_RV}._ts").alias(out_names[right_ts]),
        *[F.col(f"{_RV}.{c}").alias(out_names[c]) for c in rv_cols],
    )
