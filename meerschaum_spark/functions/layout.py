"""Physical-layout helpers: Z-order (Morton) interleaving for
multi-column data clustering.

A lexicographic sort (``optimize(cluster_by=[a, b])``) makes parquet
row-group/file min-max stats selective for the LEADING column only — a
range read on ``b`` still touches every file. Interleaving the bits of
rank-normalized keys gives every clustered column ~equal locality, so
point/range predicates on ANY of them prune files (the Delta/Iceberg
OPTIMIZE ZORDER layout, here as a pure Column expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per key — 16 bits × up to 4 keys stays inside a signed int64
ZORDER_BITS = 16
ZORDER_MAX_KEYS = 4

_NUMERIC = {"byte", "short", "integer", "long", "float", "double",
            "decimal", "date", "timestamp"}


def _numeric_expr(df: DataFrame, key: str) -> Column | None:
    """The key as a double for min-max normalization, or None for types
    where a linear order is meaningless (those hash instead)."""
    dt = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))[key]
    base = dt.typeName().split("(")[0]
    if base not in _NUMERIC:
        return None
    if base == "date":
        return F.col(key).cast("timestamp").cast("double")
    return F.col(key).cast("double")


def _bucket_expr(key: str, num: Column | None, lo, hi, bits: int) -> Column:
    """Map a column into [0, 2^bits): numeric/temporal columns min-max
    normalize against the supplied global stats (driver literals — the
    same broadcast-literal discipline as the IVF centroids); other types
    hash, which trades locality for balance (strings have no meaningful
    linear order for range pruning anyway)."""
    top = (1 << bits) - 1
    if num is not None:
        if lo is None or hi is None or hi == lo:
            return F.lit(0).cast("long")
        span = float(hi) - float(lo)
        scaled = F.floor(((num - F.lit(float(lo))) / F.lit(span))
                         * F.lit(float(top)))
        return F.least(F.greatest(scaled.cast("long"), F.lit(0)),
                       F.lit(top)).cast("long")
    return F.pmod(F.xxhash64(F.col(key)), F.lit(1 << bits)).cast("long")


def zorder_column(df: DataFrame, keys: list[str],
                  bits: int = ZORDER_BITS) -> Column:
    """Morton interleave of the bucketed keys: bit j of key i lands at
    position ``j * len(keys) + i``. Pure shift/and/or Column arithmetic
    — whole-stage codegen, no UDF, no shuffle; the min/max stats for ALL
    numeric keys reduce in ONE aggregate job."""
    if not keys:
        raise ValueError("zorder_column: at least one key required")
    if len(keys) > ZORDER_MAX_KEYS:
        raise ValueError(
            f"zorder_column: {len(keys)} keys exceed ZORDER_MAX_KEYS="
            f"{ZORDER_MAX_KEYS} (16 bits x 4 keys fills the int64)")
    k = len(keys)
    nums = {key: _numeric_expr(df, key) for key in keys}
    aggs = []
    for key, num in nums.items():
        if num is not None:
            aggs += [F.min(num).alias(f"lo_{key}"),
                     F.max(num).alias(f"hi_{key}")]
    stats = df.agg(*aggs).first() if aggs else {}
    buckets = [
        _bucket_expr(key, nums[key],
                     stats[f"lo_{key}"] if nums[key] is not None else None,
                     stats[f"hi_{key}"] if nums[key] is not None else None,
                     bits)
        for key in keys]
    z = F.lit(0).cast("long")
    for i, b in enumerate(buckets):
        for j in range(bits):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * k + i))
    return z
