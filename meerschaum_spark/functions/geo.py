"""Distributed geometry operations over WKB ``binary`` columns.

The codec is ``meerschaum_spark.geometry`` (pure Python, dependency-free);
these wrappers run it over Arrow-batched pandas UDFs — the same shape the
multimodal family uses, and the correct Python-boundary pattern at scale
(per-batch, never per-row-Python-call overhead through Py4J).

Reference surface: utils/dtypes/__init__.py:800-882 (serialize /
deserialize) exercised over pipes in tests/test_pipes_dtypes.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meerschaum_spark import geometry as geo

_INFO_SCHEMA = T.StructType([
    T.StructField("geom_type", T.StringType()),
    T.StructField("srid", T.IntegerType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("n_points", T.IntegerType()),
])


def _first_position(g: geo.Geometry):
    c = g.coords
    while c and isinstance(c[0], list):
        c = c[0]
    return c if c else None


def _count_positions(c) -> int:
    if not isinstance(c, list):
        return 0
    if c and not isinstance(c[0], list):
        return 1
    return sum(_count_positions(x) for x in c)


@F.pandas_udf(_INFO_SCHEMA)
def geom_info(wkb: pd.Series) -> pd.DataFrame:
    """WKB → (geom_type, srid, first x, first y, total position count)."""
    out = {"geom_type": [], "srid": [], "x": [], "y": [], "n_points": []}
    for v in wkb:
        if v is None:
            for k in out:
                out[k].append(None)
            continue
        g = geo.from_wkb(bytes(v))
        pos = _first_position(g)
        out["geom_type"].append(g.geom_type)
        out["srid"].append(g.srid)
        out["x"].append(pos[0] if pos else None)
        out["y"].append(pos[1] if pos and len(pos) > 1 else None)
        out["n_points"].append(
            len(g.coords) // (3 if g.has_z else 2)
            if g.geom_type.lower() == "point" and g.coords
            else _count_positions(g.coords))
    return pd.DataFrame(out)


@F.pandas_udf(T.BinaryType())
def wkt_to_wkb(wkt: pd.Series) -> pd.Series:
    """WKT / EWKT strings → EWKB bytes."""
    return wkt.map(lambda v: geo.to_wkb(geo.from_wkt(v))
                   if v is not None else None)


@F.pandas_udf(T.StringType())
def wkb_to_wkt(wkb: pd.Series) -> pd.Series:
    """WKB bytes → WKT text."""
    return wkb.map(lambda v: geo.to_wkt(geo.from_wkb(bytes(v)))
                   if v is not None else None)


def with_geom_info(df: DataFrame, col: str, prefix: str = "geo_") -> DataFrame:
    """Attach decoded geometry metadata columns for a WKB column."""
    info = geom_info(F.col(col))
    return df.select(
        "*",
        info["geom_type"].alias(f"{prefix}type"),
        info["srid"].alias(f"{prefix}srid"),
        info["x"].alias(f"{prefix}x"),
        info["y"].alias(f"{prefix}y"),
        info["n_points"].alias(f"{prefix}n_points"),
    )
