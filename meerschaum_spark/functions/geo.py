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


def _decode_geom_record(v) -> tuple:
    """One WKB value → (geom_type, srid, x, y, n_points) — the single
    decode rule shared by ``geom_info`` (expression UDF) and
    ``with_geom_info`` (mapInPandas), so the two paths can never
    silently disagree."""
    if v is None:
        return (None, None, None, None, None)
    g = geo.from_wkb(bytes(v))
    pos = _first_position(g)
    n_points = (len(g.coords) // (3 if g.has_z else 2)
                if g.geom_type.lower() == "point" and g.coords
                else _count_positions(g.coords))
    return (g.geom_type, g.srid,
            pos[0] if pos else None,
            pos[1] if pos and len(pos) > 1 else None,
            n_points)


@F.pandas_udf(_INFO_SCHEMA)
def geom_info(wkb: pd.Series) -> pd.DataFrame:
    """WKB → (geom_type, srid, first x, first y, total position count)."""
    out = {"geom_type": [], "srid": [], "x": [], "y": [], "n_points": []}
    for v in wkb:
        rec = _decode_geom_record(v)
        for k, val in zip(out, rec):
            out[k].append(val)
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
    """Attach decoded geometry metadata columns for a WKB column.

    One ``mapInPandas`` pass, NOT five struct-field extractions of a
    ``geom_info`` expression: field extraction of a pandas-UDF struct is
    re-inlined per field by CollapseProject, so the expression form
    decodes every geometry up to five times (same hazard
    ``with_point_coords`` documents)."""
    out_schema = T.StructType(list(df.schema.fields) + [
        T.StructField(f"{prefix}type", T.StringType()),
        T.StructField(f"{prefix}srid", T.IntegerType()),
        T.StructField(f"{prefix}x", T.DoubleType()),
        T.StructField(f"{prefix}y", T.DoubleType()),
        T.StructField(f"{prefix}n_points", T.IntegerType()),
    ])
    keep = [f.name for f in df.schema.fields]

    def decode(batches):
        for pdf in batches:
            out = pdf[keep].copy()
            cols = {"type": [], "srid": [], "x": [], "y": [],
                    "n_points": []}
            for v in pdf[col]:
                rec = _decode_geom_record(v)
                for k, val in zip(cols, rec):
                    cols[k].append(val)
            for k, vals in cols.items():
                out[f"{prefix}{k}"] = vals
            yield out

    return df.mapInPandas(decode, out_schema)


# ===========================================================================
# Spatial operators (reference postgis flavor: spatial predicates over
# geometry pipes, connectors/sql/_pipes.py GIST-indexed queries +
# utils/dtypes/__init__.py:800-882). ST_-style semantics, planar (SRID is
# carried, not projected). Python touches only the WKB decode — one
# Arrow batch per task; every aggregation/join stays JVM-side.
# ===========================================================================

_BBOX_SCHEMA = T.StructType([
    T.StructField("xmin", T.DoubleType()),
    T.StructField("ymin", T.DoubleType()),
    T.StructField("xmax", T.DoubleType()),
    T.StructField("ymax", T.DoubleType()),
])


def _walk_positions(c):
    """Yield every (x, y[, z]) position of a nested coords list."""
    if not isinstance(c, list) or not c:
        return
    if not isinstance(c[0], list):
        yield c
        return
    for sub in c:
        yield from _walk_positions(sub)


@F.pandas_udf(_BBOX_SCHEMA)
def geom_bbox(wkb: pd.Series) -> pd.DataFrame:
    """WKB → bounding box (ST_Envelope's extent) over every vertex of any
    geometry type."""
    out = {"xmin": [], "ymin": [], "xmax": [], "ymax": []}
    for v in wkb:
        if v is None:
            for k in out:
                out[k].append(None)
            continue
        g = geo.from_wkb(bytes(v))
        coords = g.coords if g.geom_type.lower() != "point" else [g.coords]
        xs, ys = [], []
        for pos in _walk_positions(coords if coords else []):
            if len(pos) >= 2:
                xs.append(pos[0])
                ys.append(pos[1])
        if not xs:
            for k in out:
                out[k].append(None)
            continue
        out["xmin"].append(min(xs))
        out["ymin"].append(min(ys))
        out["xmax"].append(max(xs))
        out["ymax"].append(max(ys))
    return pd.DataFrame(out)


def _polygon_rings(g: "geo.Geometry") -> list:
    """Flattened ring list of a POLYGON ([ring][pt][xy]) or MULTIPOLYGON
    ([poly][ring][pt][xy]); even-odd parity over ALL rings handles holes
    and disjoint parts alike."""
    t = g.geom_type.lower()
    if t == "polygon":
        return g.coords or []
    if t == "multipolygon":
        return [ring for poly in (g.coords or []) for ring in poly]
    raise ValueError(f"st_contains_point requires a polygonal geometry, "
                     f"got {g.geom_type}")


def _point_in_rings(rings: list, x: float, y: float) -> bool:
    """Even-odd ray casting with the half-open edge rule ((y1 > y) !=
    (y2 > y)) — deterministic at vertex heights; points exactly ON an
    edge are boundary-ambiguous, so oracles use grids that never land
    on one."""
    inside = False
    for ring in rings:
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i][0], ring[i][1]
            x2, y2 = ring[(i + 1) % n][0], ring[(i + 1) % n][1]
            if (y1 > y) != (y2 > y):
                xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                if xint > x:
                    inside = not inside
    return inside


@F.pandas_udf(T.BooleanType())
def st_contains_point(wkb: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    """ST_Contains(polygon, point) for a WKB polygon column against
    coordinate columns. The polygon is usually a broadcast literal — the
    parsed ring set is cached per distinct WKB value, so each Arrow batch
    decodes it once and the per-row work is pure ray casting."""
    ring_cache: dict[bytes, list] = {}
    out = []
    for v, px, py in zip(wkb, x, y):
        if v is None or px is None or py is None:
            out.append(None)
            continue
        key = bytes(v)
        rings = ring_cache.get(key)
        if rings is None:
            rings = ring_cache[key] = _polygon_rings(geo.from_wkb(key))
        out.append(_point_in_rings(rings, float(px), float(py)))
    return pd.Series(out, dtype="object")


_PATH_SCHEMA = T.StructType([
    T.StructField("n_points", T.IntegerType()),
    T.StructField("len_sq_sum", T.LongType()),
])


@F.pandas_udf(_PATH_SCHEMA)
def st_path_stats(wkb: pd.Series) -> pd.DataFrame:
    """LINESTRING WKB → (vertex count, Σ squared segment length). The
    squared form keeps integer-grid paths exactly summable cross-engine
    (Σ(dx²+dy²) is an integer — no float-order sensitivity), which is
    what the closed-form oracles pin; callers wanting metric length take
    sqrt per segment downstream."""
    ns, sums = [], []
    for v in wkb:
        if v is None:
            ns.append(None)
            sums.append(None)
            continue
        g = geo.from_wkb(bytes(v))
        pts = [p for p in _walk_positions(g.coords or [])]
        total = 0
        for a, b in zip(pts, pts[1:]):
            dx, dy = b[0] - a[0], b[1] - a[1]
            total += int(dx * dx + dy * dy)
        ns.append(len(pts))
        sums.append(total)
    return pd.DataFrame({"n_points": ns, "len_sq_sum": sums})


def _ring_shoelace2(ring: list) -> float:
    """Signed DOUBLED shoelace area of one ring (closing edge implied;
    an explicitly closed ring contributes a zero term for the repeated
    vertex, so both conventions give the same sum)."""
    total = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[(i + 1) % n][0], ring[(i + 1) % n][1]
        total += x1 * y2 - x2 * y1
    return total


@F.pandas_udf(T.LongType())
def st_area2(wkb: pd.Series) -> pd.Series:
    """DOUBLED polygon area (ST_Area × 2) as an exact integer for
    integer-grid vertices: |shoelace(shell)| minus Σ|shoelace(hole)| per
    polygon, summed over multipolygon parts. The doubled form keeps
    half-unit triangles exactly representable, so closed-form oracles
    hash-match without float tolerance."""
    out = []
    for v in wkb:
        if v is None:
            out.append(None)
            continue
        g = geo.from_wkb(bytes(v))
        t = g.geom_type.lower()
        polys = [g.coords] if t == "polygon" else (
            g.coords if t == "multipolygon" else None)
        if polys is None:
            raise ValueError(f"st_area2 requires a polygonal geometry, "
                             f"got {g.geom_type}")
        total = 0.0
        for rings in polys:
            if not rings:
                continue
            total += abs(_ring_shoelace2(rings[0]))
            for hole in rings[1:]:
                total -= abs(_ring_shoelace2(hole))
        out.append(int(round(total)))
    return pd.Series(out, dtype="object")


def with_point_coords(df: DataFrame, wkb_col: str,
                      x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Decode a WKB point column to (x, y) doubles in ONE Arrow pass.

    Why not ``geom_info(col)["x"]`` twice: struct-field extraction of a
    pandas-UDF expression gets re-inlined by CollapseProject, so each
    extracted field re-runs the whole decode (measured 2× python passes
    per side in the radius join). ``mapInPandas`` is a single plan node —
    the decode runs exactly once however many fields consumers read."""
    out_fields = [f for f in df.schema.fields if f.name != wkb_col]
    schema = T.StructType(out_fields + [T.StructField(x_col, T.DoubleType()),
                                        T.StructField(y_col, T.DoubleType())])
    keep = [f.name for f in out_fields]

    def decode(batches):
        for pdf in batches:
            out = pdf[keep].copy()
            xs, ys = [], []
            for v in pdf[wkb_col]:
                if v is None:
                    xs.append(None)
                    ys.append(None)
                    continue
                pos = _first_position(geo.from_wkb(bytes(v)))
                xs.append(pos[0] if pos else None)
                ys.append(pos[1] if pos and len(pos) > 1 else None)
            out[x_col] = xs
            out[y_col] = ys
            yield out

    return df.mapInPandas(decode, schema)


def radius_candidate_join(
    a: DataFrame,
    b: DataFrame,
    radius: float,
    ax: str = "x", ay: str = "y",
    bx: str = "x", by: str = "y",
    cell: float | None = None,
) -> DataFrame:
    """Spatial radius join without a cross product: bucket both sides on
    an integer grid of ``cell`` width (default = radius), replicate the
    ``a`` side into its 3×3 cell neighborhood, equi-join on the cell key,
    then apply the exact predicate ``dist² ≤ radius²``.

    The 100 TB shape of ST_DWithin: every true pair shares a join cell by
    construction, so the shuffle is a plain hash equi-join on (cx, cy) —
    candidate volume is proportional to local point density, never |a|×|b|.
    The ×9 replication rides the smaller side (pass it as ``a``). Column
    names of ``a`` and ``b`` must be disjoint (alias beforehand).
    """
    cell = float(cell if cell is not None else radius)
    if cell <= 0:
        raise ValueError("cell width must be positive")
    if cell < radius:
        # the 3×3 neighborhood only covers all true pairs when one cell
        # step bounds the radius — a finer grid would need a wider
        # neighborhood and silently dropping far pairs is worse than
        # refusing
        raise ValueError(
            f"cell width {cell} < radius {radius}: pairs spanning more "
            "than one cell would be missed (use cell >= radius)")
    spark = a.sparkSession
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "_odx int, _ody int")
    a_rep = (a.crossJoin(F.broadcast(offsets))
             .withColumn("_cx", F.floor(F.col(ax) / cell) + F.col("_odx"))
             .withColumn("_cy", F.floor(F.col(ay) / cell) + F.col("_ody"))
             .drop("_odx", "_ody"))
    b_cell = (b.withColumn("_cx", F.floor(F.col(bx) / cell))
              .withColumn("_cy", F.floor(F.col(by) / cell)))
    dist_sq = ((F.col(ax) - F.col(bx)) * (F.col(ax) - F.col(bx))
               + (F.col(ay) - F.col(by)) * (F.col(ay) - F.col(by)))
    return (a_rep.join(b_cell, on=["_cx", "_cy"], how="inner")
            .filter(dist_sq <= F.lit(float(radius) ** 2))
            .drop("_cx", "_cy"))
