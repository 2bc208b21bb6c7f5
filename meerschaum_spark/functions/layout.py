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


def _bucket_expr(df: DataFrame, key: str, bits: int) -> Column:
    """Map a column into [0, 2^bits): numeric/temporal columns min-max
    normalize against ONE global stats job (driver literals — the same
    broadcast-literal discipline as the IVF centroids); other types
    hash, which trades locality for balance (strings have no meaningful
    linear order for range pruning anyway)."""
    dt = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))[key]
    base = dt.typeName().split("(")[0]
    top = (1 << bits) - 1
    if base in _NUMERIC:
        if base == "timestamp":
            num = F.col(key).cast("double")
        elif base == "date":
            num = F.col(key).cast("timestamp").cast("double")
        else:
            num = F.col(key).cast("double")
        row = df.agg(F.min(num).alias("lo"), F.max(num).alias("hi")).first()
        lo, hi = row["lo"], row["hi"]
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
    — whole-stage codegen, no UDF, no shuffle (the only job is the
    per-key min/max stats aggregate)."""
    if not keys:
        raise ValueError("zorder_column: at least one key required")
    if len(keys) > ZORDER_MAX_KEYS:
        raise ValueError(
            f"zorder_column: {len(keys)} keys exceed ZORDER_MAX_KEYS="
            f"{ZORDER_MAX_KEYS} (16 bits x 4 keys fills the int64)")
    k = len(keys)
    buckets = [_bucket_expr(df, key, bits) for key in keys]
    z = F.lit(0).cast("long")
    for i, b in enumerate(buckets):
        for j in range(bits):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * k + i))
    return z
