"""Skew-handling utilities: explicit key salting for hot keys.

AQE's skew-join splitting (enabled in the engine session) handles most
cases at runtime; these helpers are for the planned-ahead version — when
a known-hot key (the null key, a celebrity id) would otherwise pin one
task: salt fan-out for aggregations (two-phase combine) and replicated
broadcast salting for joins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Uniform random-ish salt derived from a per-row hash (deterministic
    given the row, no RNG — replays identically)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: aggregate on
    (key, salt) first — spreading each hot key over ``n_salts`` reducers —
    then combine partials on the key alone. Supports the decomposable
    aggregates (sum / count / min / max)."""
    salted = with_salt(df, n_salts)
    partial_exprs = []
    final_exprs = []
    for col, how in aggs.items():
        name = f"{how}_{col}"
        if how == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(name))
            final_exprs.append(F.sum(name).alias(name))
        elif how in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, how)(F.col(col)).alias(name))
            final_exprs.append(getattr(F, {"sum": "sum", "min": "min",
                                           "max": "max"}[how])(name).alias(name))
        else:
            raise ValueError(f"{how} is not decomposable over salts")
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side once
    per salt value, join on (key, salt). Each hot key's rows spread over
    ``n_salts`` tasks instead of one."""
    big_s = with_salt(big, n_salts)
    salts = big.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt"))
    small_r = small.crossJoin(F.broadcast(salts))
    return big_s.join(small_r, on=[key, "_salt"], how=how).drop("_salt")
