"""Skew-handling utilities: explicit key salting for hot keys.

AQE's skew-join splitting (enabled in the engine session) handles most
cases at runtime; these helpers are for the planned-ahead version — when
a known-hot key (the null key, a celebrity id) would otherwise pin one
task: salt fan-out for aggregations (two-phase combine), replicated
broadcast salting for joins, and two-phase salted top-K for per-key
window ranks.

Production consumers: ``Pipe._split_existing`` routes its diff marker
join through ``salted_join`` when batch stats show a hot null key
(pipe.py), and ``doc_domain_caps`` builds on ``salted_top_k``
(queries_llm.py) — the reference never needs this layer because its SQL
backends handle distribution server-side (connectors/sql/_pipes.py);
on Spark the partition layout is ours to manage.
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
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    null_safe: bool = False,
) -> DataFrame:
    """Skewed equi-join: salt the big side (deterministic per-row hash),
    replicate the small side once per salt value, join on
    (keys..., salt). Each hot key's rows spread over ``n_salts`` tasks
    instead of one — including the NULL key when ``null_safe=True``
    (``eqNullSafe`` key equality), which a plain shuffle join hashes to
    a single reducer.

    Multiplicity is preserved exactly: every big row carries ONE salt
    and matches only the small-side replica with that salt, so inner /
    left semantics are identical to the unsalted join. Right / full
    joins are REJECTED: an unmatched small-side row exists once per
    replica, so those join types would emit it ``n_salts`` times.
    Returns ``big``'s columns followed by ``small``'s non-key columns."""
    if how.lower().replace("_", "") not in ("inner", "left", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the small side is replicated per salt, so right/full joins "
            "would duplicate unmatched small-side rows n_salts times.")
    keys = [on] if isinstance(on, str) else list(on)
    salt_col = "_mrsm_skw_salt"
    big_s = with_salt(big, n_salts, salt_col).alias("_skb")
    # long to match with_salt's pmod(xxhash64) output type
    salts = big.sparkSession.range(n_salts).select(
        F.col("id").alias(salt_col))
    small_r = small.crossJoin(F.broadcast(salts)).alias("_sks")
    cond: Column = F.col(f"_skb.{salt_col}") == F.col(f"_sks.{salt_col}")
    for k in keys:
        a, b = F.col(f"_skb.{k}"), F.col(f"_sks.{k}")
        cond = cond & (a.eqNullSafe(b) if null_safe else (a == b))
    rest = [c for c in small.columns if c not in keys]
    return (big_s.join(small_r, on=cond, how=how)
            .select(*[F.col(f"_skb.{c}") for c in big.columns],
                    *[F.col(f"_sks.{c}") for c in rest]))


def salted_top_k(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    n_salts: int = 32,
    rank_col: str = "rnk",
) -> DataFrame:
    """Two-phase per-key top-K for skewed keys: a salted LOCAL rank first
    caps every (key, salt) slice at ``k``, so the exact global per-key
    rank sorts at most ``k × n_salts`` rows per key — a key holding half
    the table (the realistic web-crawl-domain case) never lands in one
    window partition. ``order_cols`` must be a deterministic total order
    (add a tie-break column) for the result to be exact. Returns ``df``'s
    columns plus ``rank_col`` (int), rows with rank ≤ k only."""
    salt_col, local_col = "_mrsm_skw_salt", "_mrsm_skw_lr"
    from pyspark.sql import Window
    order_cols = list(order_cols)
    salted = with_salt(df, n_salts, salt_col)
    w_local = Window.partitionBy(*keys, salt_col).orderBy(*order_cols)
    pruned = (salted.withColumn(local_col, F.row_number().over(w_local))
              .filter(F.col(local_col) <= k))
    w_global = Window.partitionBy(*keys).orderBy(*order_cols)
    return (pruned
            .withColumn(rank_col, F.row_number().over(w_global))
            .filter(F.col(rank_col) <= k)
            .drop(salt_col, local_col))
