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


_XY_SCHEMA = T.StructType([
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
])


@F.pandas_udf(_XY_SCHEMA)
def point_xy(wkb: pd.Series) -> pd.DataFrame:
    """WKB point → (x, y) as an EXPRESSION (ArrowEvalPython), the cheap
    path for TINY geometries. Field extraction re-inlines the UDF per
    field (CollapseProject), so consumers pay one decode per extracted
    field — deliberately accepted here: a point decode is microseconds,
    while the alternative (``with_point_coords``'s mapInPandas) adds a
    WHOLE python-runner layer to the task pipeline, measured at
    ~0.5-1 s per 32-task stage even with warm workers (r8: swapping two
    of these layers out of the radius join cut it ~4x). Use
    ``with_point_coords`` only when the per-geometry decode is itself
    expensive (large polygons, many consumers)."""
    xs, ys = [], []
    for v in wkb:
        if v is None:
            xs.append(None)
            ys.append(None)
            continue
        pos = _first_position(geo.from_wkb(bytes(v)))
        xs.append(pos[0] if pos else None)
        ys.append(pos[1] if pos and len(pos) > 1 else None)
    return pd.DataFrame({"x": xs, "y": ys})


_SEG_SCHEMA = T.StructType([
    T.StructField("x1", T.LongType()),
    T.StructField("y1", T.LongType()),
    T.StructField("x2", T.LongType()),
    T.StructField("y2", T.LongType()),
])


@F.pandas_udf(_SEG_SCHEMA)
def segment_xy(wkb: pd.Series) -> pd.DataFrame:
    """2-point LINESTRING WKB → (x1, y1, x2, y2) longs as an EXPRESSION
    (same runner-layer economics as ``point_xy``: a short-segment decode
    is microseconds, so per-field re-evaluation beats adding a
    mapInPandas layer; ``with_segment_coords`` remains for long/complex
    geometries)."""
    cols: dict[str, list] = {k: [] for k in ("x1", "y1", "x2", "y2")}
    for v in wkb:
        if v is None:
            for k in cols:
                cols[k].append(None)
            continue
        pts = list(_walk_positions(geo.from_wkb(bytes(v)).coords))
        a, b = pts[0], pts[-1]
        for k, val in zip(cols, (a[0], a[1], b[0], b[1])):
            cols[k].append(int(val))
    return pd.DataFrame(cols)


#: Single-eval variants: marking the PURE decode non-deterministic is
#: the supported Spark lever that forbids Catalyst from duplicating or
#: re-inlining an expensive UDF (CollapseProject will not collapse a
#: non-deterministic projection, and projection pushdown through a
#: repartition — which was measured to DUPLICATE the eval below the
#: exchange, one wasted full-corpus codec pass — is blocked). Usage
#: contract: alias the struct in its own select, extract fields in the
#: NEXT select — within one projection a non-deterministic call is NOT
#: deduplicated, so single-select extraction would run it per field.
point_xy_once = point_xy.asNondeterministic()
segment_xy_once = segment_xy.asNondeterministic()


def with_point_coords(df: DataFrame, wkb_col: str,
                      x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Decode a WKB point column to (x, y) doubles in ONE Arrow pass.

    Trade-off vs ``point_xy`` (the expression form): this decodes each
    geometry exactly once however many fields consumers read, but adds a
    dedicated python-runner LAYER (MapInPandas node) to the task
    pipeline — measured ~0.5-1 s per 32-task stage even with warm
    workers. Right when the per-geometry decode dominates (large
    geometries); wrong for points/short segments, where ``point_xy``'s
    re-evaluated extractions are near-free."""
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


# ---------------------------------------------------------------------------
# SRID reprojection (ST_Transform) — closed-form spherical web mercator.
# The reference carries SRID through (de)serialization end-to-end
# (utils/dtypes/__init__.py:800-882) and its postgis flavor serves
# ST_Transform server-side; here the only supported projection pair is
# the closed-form EPSG:4326 <-> EPSG:3857, which covers the web-tiling
# use the geometry dtype exists for without dragging in a CRS database.
# ---------------------------------------------------------------------------

_WEB_R = 6378137.0  # WGS84 semi-major axis (spherical mercator radius)


def _merc_fwd(lon: float, lat: float) -> tuple[float, float]:
    """EPSG:4326 → EPSG:3857. Written as the CANONICAL operation order
    ``R * radians(lon)`` / ``R * log(tan(pi/4 + radians(lat)/2))`` so a
    SQL oracle spelling the same order reproduces the floats bit-for-bit
    (multiplication/addition are correctly rounded everywhere; tan/log
    resolve to the same libm on one host)."""
    import math
    return (_WEB_R * math.radians(lon),
            _WEB_R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)))


def _merc_inv(x: float, y: float) -> tuple[float, float]:
    """EPSG:3857 → EPSG:4326 (same canonical-order contract)."""
    import math
    return (math.degrees(x / _WEB_R),
            math.degrees(2.0 * math.atan(math.exp(y / _WEB_R))
                         - math.pi / 2))


def _map_positions(c: list, fn) -> list:
    if not isinstance(c, list) or not c:
        return c
    if not isinstance(c[0], list):
        out = list(fn(c[0], c[1]))
        return out + list(c[2:])  # z (and m) pass through untouched
    return [_map_positions(sub, fn) for sub in c]


@F.pandas_udf(T.BinaryType())
def st_transform_mercator(wkb: pd.Series, direction: pd.Series) -> pd.Series:
    """ST_Transform between EPSG:4326 and EPSG:3857 over WKB of ANY
    geometry type: every (x, y) position maps through the closed-form
    spherical mercator; z passes through; the output EWKB carries the
    target SRID. ``direction`` is 'fwd' (4326→3857) or 'inv'. One Arrow
    batch per task — the transform is a handful of flops per vertex and
    rides the same decode pass the codec already pays."""
    def _tx(g: "geo.Geometry", fwd: bool) -> "geo.Geometry":
        srid = 3857 if fwd else 4326
        fn = _merc_fwd if fwd else _merc_inv
        if g.geoms:  # GeometryCollection: children carry the coords
            return geo.Geometry(g.geom_type, [], srid, g.has_z,
                                [_tx(c, fwd) for c in g.geoms])
        mapped = _map_positions(
            g.coords if g.geom_type.lower() != "point" else [g.coords], fn)
        coords = mapped[0] if g.geom_type.lower() == "point" else mapped
        return geo.Geometry(g.geom_type, coords, srid, g.has_z)

    out = []
    for v, d in zip(wkb, direction):
        if v is None:
            out.append(None)
            continue
        out.append(geo.to_wkb(_tx(geo.from_wkb(bytes(v)), d == "fwd")))
    return pd.Series(out, dtype="object")


def with_segment_coords(df: DataFrame, wkb_col: str,
                        prefix: str = "s") -> DataFrame:
    """Decode a 2-point LINESTRING WKB column to (x1, y1, x2, y2) longs
    in ONE Arrow pass (same one-plan-node rationale as
    ``with_point_coords``); the caller's intersection predicate then
    stays entirely JVM-side."""
    out_fields = [f for f in df.schema.fields if f.name != wkb_col]
    names = [f"{prefix}x1", f"{prefix}y1", f"{prefix}x2", f"{prefix}y2"]
    schema = T.StructType(out_fields + [
        T.StructField(n, T.LongType()) for n in names])
    keep = [f.name for f in out_fields]

    def decode(batches):
        for pdf in batches:
            out = pdf[keep].copy()
            cols: dict[str, list] = {n: [] for n in names}
            for v in pdf[wkb_col]:
                if v is None:
                    for n in names:
                        cols[n].append(None)
                    continue
                pts = list(_walk_positions(geo.from_wkb(bytes(v)).coords))
                a, b = pts[0], pts[-1]
                for n, val in zip(names, (a[0], a[1], b[0], b[1])):
                    cols[n].append(int(val))
            for n in names:
                out[n] = cols[n]
            yield out

    return df.mapInPandas(decode, schema)


def segments_intersect_cols(
    x1, y1, x2, y2, x3, y3, x4, y4,
) -> F.Column:
    """SEGMENTS-INTERSECT (the classic cross-product orientation test,
    touching endpoints and collinear overlap included) as a pure Column
    expression over integer coordinates — exact int64 arithmetic, fully
    JVM-side, so a pair join evaluates it inside whole-stage codegen
    with no Python boundary."""
    def o(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    def onseg(ax, ay, bx, by, cx, cy):
        return ((F.least(ax, bx) <= cx) & (cx <= F.greatest(ax, bx))
                & (F.least(ay, by) <= cy) & (cy <= F.greatest(ay, by)))

    d1 = o(x3, y3, x4, y4, x1, y1)
    d2 = o(x3, y3, x4, y4, x2, y2)
    d3 = o(x1, y1, x2, y2, x3, y3)
    d4 = o(x1, y1, x2, y2, x4, y4)
    general = ((((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
               & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))))
    touch = (((d1 == 0) & onseg(x3, y3, x4, y4, x1, y1))
             | ((d2 == 0) & onseg(x3, y3, x4, y4, x2, y2))
             | ((d3 == 0) & onseg(x1, y1, x2, y2, x3, y3))
             | ((d4 == 0) & onseg(x1, y1, x2, y2, x4, y4)))
    return general | touch


def _segments_of(g: "geo.Geometry") -> list:
    """Boundary segments ((x1,y1),(x2,y2)) of a linestring / polygon /
    multi variant (polygon rings close implicitly)."""
    t = g.geom_type.lower()
    segs = []

    def line(pts, close=False):
        for a, b in zip(pts, pts[1:]):
            segs.append((a, b))
        if close and len(pts) > 1 and pts[0] != pts[-1]:
            segs.append((pts[-1], pts[0]))

    if t == "linestring":
        line(g.coords or [])
    elif t == "multilinestring":
        for part in g.coords or []:
            line(part)
    elif t == "polygon":
        for ring in g.coords or []:
            line(ring, close=True)
    elif t == "multipolygon":
        for poly in g.coords or []:
            for ring in poly:
                line(ring, close=True)
    elif t == "point":
        p = g.coords
        segs.append((p, p))
    elif t == "multipoint":
        for p in g.coords or []:
            segs.append((p, p))
    elif t == "geometrycollection":
        for child in g.geoms or []:
            segs.extend(_segments_of(child))
    else:
        raise ValueError(f"st_intersects: unsupported type {g.geom_type}")
    return segs


def _polygonal_parts(g: "geo.Geometry") -> list:
    """Ring-lists of every polygonal component (polygon, multipolygon,
    or nested collection members) for containment testing."""
    t = g.geom_type.lower()
    if t in ("polygon", "multipolygon"):
        return [_polygon_rings(g)]
    if t == "geometrycollection":
        out = []
        for child in g.geoms or []:
            out.extend(_polygonal_parts(child))
        return out
    return []


def _py_seg_intersect(a, b) -> bool:
    (p1, p2), (p3, p4) = a, b

    def o(p, q, r):
        return ((q[0] - p[0]) * (r[1] - p[1])
                - (q[1] - p[1]) * (r[0] - p[0]))

    def onseg(p, q, r):
        return (min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
                and min(p[1], q[1]) <= r[1] <= max(p[1], q[1]))

    d1, d2 = o(p3, p4, p1), o(p3, p4, p2)
    d3, d4 = o(p1, p2, p3), o(p1, p2, p4)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and \
            ((d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)):
        return True
    return ((d1 == 0 and onseg(p3, p4, p1))
            or (d2 == 0 and onseg(p3, p4, p2))
            or (d3 == 0 and onseg(p1, p2, p3))
            or (d4 == 0 and onseg(p1, p2, p4)))


@F.pandas_udf(T.BooleanType())
def st_intersects(wkb_a: pd.Series, wkb_b: pd.Series) -> pd.Series:
    """Geometry×geometry ST_Intersects over two WKB columns: true when
    any boundary segments cross/touch, or when one geometry lies inside
    the other (vertex-in-rings containment — covers the
    no-boundary-crossing nesting case). Boundary-pair work is O(n·m) per
    ROW PAIR — callers must pre-pair with a spatial bucket join
    (``radius_candidate_join`` / the segment grid in
    ``geo_segment_intersect_join``), never a cross product."""
    out = []
    for va, vb in zip(wkb_a, wkb_b):
        if va is None or vb is None:
            out.append(None)
            continue
        ga, gb = geo.from_wkb(bytes(va)), geo.from_wkb(bytes(vb))
        segs_a, segs_b = _segments_of(ga), _segments_of(gb)
        hit = any(_py_seg_intersect(a, b) for a in segs_a for b in segs_b)
        if not hit:
            for outer, inner in ((ga, gb), (gb, ga)):
                pos = _first_position(inner) if not inner.geoms else \
                    _first_position(inner.geoms[0])
                if pos is None:
                    continue
                if any(_point_in_rings(rings, pos[0], pos[1])
                       for rings in _polygonal_parts(outer)):
                    hit = True
                    break
        out.append(hit)
    return pd.Series(out, dtype="object")


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
