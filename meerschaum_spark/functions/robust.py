"""Robust-regression building blocks (Theil-Sen) with a hard scale guard.

The catalog query ``events_theil_sen_slope`` runs the O(T²) pairwise-slope
join on an HOURLY pre-aggregate, so T stays small by that query's own
schema — but the OPERATOR itself had no bound (VERDICT r10 #5): a caller
pointing it at a long axis gets a quadratic explosion (T = 1M points →
5·10¹¹ pairs per series). :func:`theil_sen_pairs` owns that bound now:

* ``on_overflow="error"`` (default): an ``assert_true`` expression rides
  the per-series count window, so the JOB fails fast with a typed error
  before the pair join materializes anything — no extra driver action,
  no collect; the guard is evaluated task-side during the first shuffle.
* ``on_overflow="sample"``: deterministic stride downsample (every
  ``ceil(n/max)``-th point in axis order, always keeping the first) —
  the standard bounded Theil-Sen variant for long axes; slopes remain
  exact integer floor divisions on the surviving pairs.

Reference analogue: none (the reference's stats surface is the
timescaledb-style stats_agg family); the cap discipline mirrors
``dedup.LSH_MAX_BUCKET`` / ``CONTAINMENT_PER_DOC_BUDGET`` — every
operator with a super-linear worst case carries its bound in code, not
in a comment (SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Max axis points per series before the pairwise join is refused (or
#: stride-sampled): 5000 points → 12.5M pairs per series, a bounded
#: single-series rank-window sort; a year of hours (8.8k) still fits a
#: coarser bucket or ``on_overflow="sample"``.
THEIL_SEN_MAX_POINTS = 5_000


def theil_sen_pairs(
    points: DataFrame,
    series_cols: list[str],
    x_col: str,
    y_col: str,
    slope_scale: int = 1000,
    max_points: int = THEIL_SEN_MAX_POINTS,
    on_overflow: str = "error",
) -> DataFrame:
    """All pairwise integer slopes per series, scale-guarded.

    Returns columns ``series_cols + [h1, h2, num, den, slope]`` where
    ``slope = floor(num / den)`` in exact int64 (subtract-nonneg-
    remainder spell — both engines agree for negative numerators).
    ``points`` must carry integer ``x_col`` / ``y_col``.
    """
    if on_overflow not in ("error", "sample"):
        raise ValueError(f"on_overflow must be error|sample, "
                         f"got {on_overflow!r}")
    if series_cols:
        # pin the per-series layout explicitly BEFORE the guard window:
        # the window's own exchange is byte-tiny on pre-aggregated axes,
        # so AQE coalesces it — and the pair join that reuses it — onto
        # ONE task (measured 2.3 s single-task for 1.3M pairs on the
        # hourly catalog query). A user repartition is exempt from AQE
        # coalescing (the r7 applyInPandas lesson), the guard window and
        # the join both reuse its hash layout (no extra exchange), and
        # at scale hash-by-series is the layout the join needs anyway.
        points = points.repartition(
            points.sparkSession.sparkContext.defaultParallelism,
            *series_cols)
    wn = Window.partitionBy(*series_cols)
    pts = points.withColumn("_n_pts", F.count(F.lit(1)).over(wn))
    if on_overflow == "error":
        # assert_true rides the job: evaluated task-side, fails the
        # query with a typed error before the O(n²) join runs; the
        # filter keeps the expression alive through optimization
        # (assert_true yields NULL on pass)
        guard = F.assert_true(
            F.col("_n_pts") <= F.lit(int(max_points)),
            F.concat(F.lit(f"theil_sen_pairs: series exceeds "
                           f"max_points={max_points} (got "),
                     F.col("_n_pts").cast("string"),
                     F.lit("); pre-aggregate to a coarser bucket or "
                           "pass on_overflow='sample'")))
        pts = pts.withColumn("_g", guard).filter(F.col("_g").isNull())
    else:
        wx = Window.partitionBy(*series_cols).orderBy(x_col)
        stride = F.expr(f"(_n_pts + {int(max_points)} - 1) "
                        f"div {int(max_points)}")
        pts = (pts.withColumn("_rn", F.row_number().over(wx))
               .filter((F.col("_rn") - 1) % stride == 0)
               .drop("_rn"))
    pts = pts.drop("_n_pts", "_g")
    a = pts.select(*series_cols, F.col(x_col).alias("h1"),
                   F.col(y_col).alias("v1"))
    b = pts.select(*series_cols, F.col(x_col).alias("h2"),
                   F.col(y_col).alias("v2"))
    return (a.join(b, on=list(series_cols))
            .filter(F.col("h2") > F.col("h1"))
            .withColumn("num",
                        (F.col("v2") - F.col("v1")) * int(slope_scale))
            .withColumn("den", F.col("h2") - F.col("h1"))
            .withColumn(
                "slope",
                F.expr("(num - ((num % den + den) % den)) div den"))
            .drop("v1", "v2"))
