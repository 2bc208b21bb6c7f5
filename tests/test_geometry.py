"""Geometry dtype end-to-end (F8), mirroring the reference's
tests/test_pipes_dtypes.py geometry round-trips: codec exactness, ingest
sniffing, sync round-trip + idempotency, and the Arrow-batched UDFs."""

import datetime

import pandas as pd
import pytest

from meerschaum_spark import geometry as geo
from meerschaum_spark.pipe import Pipe

UTC = datetime.timezone.utc


def dtm(*args):
    return datetime.datetime(*args, tzinfo=UTC)


WKTS = [
    "POINT (1.5 -2.25)",
    "LINESTRING (0 0, 1 1, 2 0.5)",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
    "MULTIPOINT ((1 2), (3 4))",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
    "POINT Z (1 2 3)",
]


@pytest.mark.parametrize("wkt", WKTS)
def test_wkb_wkt_roundtrip(wkt):
    g = geo.from_wkt(wkt)
    assert geo.from_wkb(geo.to_wkb(g)) == g
    assert geo.from_wkt(geo.to_wkt(g)) == g
    assert geo.from_wkb(geo.to_wkb_hex(g)) == g


def test_ewkt_srid_roundtrip():
    g = geo.from_wkt("SRID=4326;POINT (1 2)")
    assert g.srid == 4326
    rt = geo.from_wkb(geo.to_wkb(g))
    assert rt.srid == 4326
    # include_srid=False strips it (plain ISO WKB)
    assert geo.from_wkb(geo.to_wkb(g, include_srid=False)).srid == 0


def test_geojson_cast():
    g = geo.attempt_cast_to_geometry(
        {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]})
    assert g.geom_type == "Polygon"
    assert geo.from_wkb(geo.to_wkb(g)) == g


def test_serialize_formats():
    out = geo.serialize_geometry("POINT (1 2)", "wkb_hex", srid=4326)
    assert isinstance(out, str)
    assert geo.from_wkb(out).srid == 4326
    assert geo.serialize_geometry("POINT (1 2)", "wkt") == "POINT (1 2)"
    gj = geo.serialize_geometry("POINT (1 2)", "geojson")
    assert gj == {"type": "Point", "coordinates": [1.0, 2.0]}


def test_parse_geometry_dtype():
    assert geo.parse_geometry_dtype("geometry[Point, 4326]") == ("Point", 4326)
    assert geo.parse_geometry_dtype("geometry") == ("geometry", 0)
    with pytest.raises(ValueError):
        geo.parse_geometry_dtype("int64")


def test_sniff_geometry_column():
    from meerschaum_spark.dataframe import sniff_special_dtypes
    pdf = pd.DataFrame([
        {"g": "POINT (1 2)", "j": {"a": 1}, "s": "plain text"},
        {"g": {"type": "Point", "coordinates": [3, 4]}, "j": {"b": 2},
         "s": "POINT (9 9)"},  # mixed str col stays str
    ])
    pdf.loc[1, "s"] = "not geometry"
    sniffed = sniff_special_dtypes(pdf)
    assert sniffed["g"] == "geometry"
    assert sniffed["j"] == "json"
    assert "s" not in sniffed


def test_geometry_sync_roundtrip(spark, instance_dir):
    """WKT in → WKB stored → bytes out; re-sync of identical WKT is a
    no-op (deterministic serialization feeds the full-row anti-join)."""
    pipe = Pipe("geo", "shapes", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"},
                dtypes={"geom": "geometry[Point, 4326]"})
    rows = [{"dt": dtm(2024, 1, 1), "id": i, "geom": f"POINT ({i} {i * 2})"}
            for i in range(1, 4)]
    res = pipe.sync(pd.DataFrame(rows))
    assert res.success and res.inserted == 3
    assert pipe.dtypes["geom"].startswith("geometry")
    docs = {d["id"]: d for d in pipe.get_docs()}
    g1 = geo.from_wkb(bytes(docs[1]["geom"]))
    assert g1.geom_type == "Point"
    assert g1.srid == 4326          # declared SRID stamped on ingest
    assert g1.coords == [1.0, 2.0]
    res2 = pipe.sync(pd.DataFrame(rows))
    assert res2.inserted == 0 and res2.updated == 0


def test_geometry_sniffed_sync(spark, instance_dir):
    """Unregistered geometry column is sniffed from values (WKT + GeoJSON
    mixed) and registered as the geometry dtype."""
    pipe = Pipe("geo", "sniffed", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"})
    pipe.sync(pd.DataFrame([
        {"dt": dtm(2024, 1, 1), "id": 1, "geom": "LINESTRING (0 0, 1 1)"},
        {"dt": dtm(2024, 1, 1), "id": 2,
         "geom": {"type": "Point", "coordinates": [5, 6]}},
    ]))
    assert pipe.dtypes["geom"] == "geometry"
    docs = {d["id"]: d for d in pipe.get_docs()}
    assert geo.from_wkb(bytes(docs[2]["geom"])).coords == [5.0, 6.0]


def test_geo_udfs(spark):
    from pyspark.sql import functions as F
    from meerschaum_spark.functions import geo as G
    df = spark.createDataFrame(
        [(1, "SRID=4326;POINT (10 20)"), (2, "LINESTRING (0 0, 1 1, 2 2)")],
        "id long, wkt string")
    out = G.with_geom_info(
        df.withColumn("wkb", G.wkt_to_wkb(F.col("wkt"))), "wkb")
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["geo_type"] == "Point" and rows[1]["geo_srid"] == 4326
    assert rows[1]["geo_x"] == 10.0 and rows[1]["geo_y"] == 20.0
    assert rows[2]["geo_n_points"] == 3
    back = df.withColumn("wkb", G.wkt_to_wkb(F.col("wkt"))) \
             .withColumn("rt", G.wkb_to_wkt(F.col("wkb"))).collect()
    assert back[1]["rt"] == "LINESTRING (0 0, 1 1, 2 2)"


def test_iso_wkb_z_and_m_parse():
    """ISO WKB encodes dimensionality as code+1000/2000/3000 (the form
    shapely/PostGIS ISO mode emit) — all three variants must parse; M
    ordinates are consumed but not modeled."""
    import struct
    # POINT Z (1 2 3), ISO code 1001
    iso_z = b"\x01" + struct.pack("<I", 1001) + struct.pack("<3d", 1, 2, 3)
    g = geo.from_wkb(iso_z)
    assert g.geom_type == "Point" and g.has_z and g.coords == [1.0, 2.0, 3.0]
    # POINT M (1 2 9), ISO code 2001 — M dropped
    iso_m = b"\x01" + struct.pack("<I", 2001) + struct.pack("<3d", 1, 2, 9)
    g = geo.from_wkb(iso_m)
    assert not g.has_z and g.coords == [1.0, 2.0]
    # POINT ZM (1 2 3 9), ISO code 3001 — Z kept, M dropped
    iso_zm = b"\x01" + struct.pack("<I", 3001) + struct.pack("<4d", 1, 2, 3, 9)
    g = geo.from_wkb(iso_zm)
    assert g.has_z and g.coords == [1.0, 2.0, 3.0]
    # ISO LINESTRING Z, code 1002
    iso_lz = (b"\x01" + struct.pack("<I", 1002) + struct.pack("<I", 2)
              + struct.pack("<3d", 0, 0, 1) + struct.pack("<3d", 1, 1, 2))
    g = geo.from_wkb(iso_lz)
    assert g.geom_type == "LineString" and g.coords[1] == [1.0, 1.0, 2.0]


def test_geometry_column_with_nan_nulls(spark, instance_dir):
    """np.nan (the pandas null placeholder in object columns) is null, not
    geometry data — the sync must store NULL, not crash."""
    import numpy as np
    pipe = Pipe("geo", "nanrows", instance=instance_dir, spark=spark,
                columns={"datetime": "dt", "id": "id"},
                dtypes={"geom": "geometry"})
    pipe.sync(pd.DataFrame([
        {"dt": dtm(2024, 1, 1), "id": 1, "geom": "POINT (1 2)"},
        {"dt": dtm(2024, 1, 2), "id": 2, "geom": np.nan},
    ]))
    docs = {d["id"]: d["geom"] for d in pipe.get_docs()}
    assert docs[2] is None
    assert geo.from_wkb(bytes(docs[1])).coords == [1.0, 2.0]


# ---------------------------------------------------------------------------
# Spatial operators (r7): bbox, point-in-polygon, radius join, path stats
# ---------------------------------------------------------------------------

def test_geom_bbox_multitypes(spark):
    """geom_bbox covers every vertex of point / linestring / polygon /
    multipolygon geometries."""
    from pyspark.sql import functions as F

    from meerschaum_spark.functions import geo as G
    wkts = [
        ("pt", "POINT (3 -2)", (3, -2, 3, -2)),
        ("ls", "LINESTRING (0 0, 5 1, -1 4)", (-1, 0, 5, 4)),
        ("pg", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 1))",
         (0, 0, 4, 4)),
        ("mp", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 7 5, 7 9, 5 5)))",
         (0, 0, 7, 9)),
    ]
    df = spark.createDataFrame([(k, w) for k, w, _ in wkts], "k string, wkt string")
    bbox = G.geom_bbox(G.wkt_to_wkb(F.col("wkt")))
    got = {r["k"]: (r["b"]["xmin"], r["b"]["ymin"], r["b"]["xmax"], r["b"]["ymax"])
           for r in df.select("k", bbox.alias("b")).collect()}
    for k, _, want in wkts:
        assert got[k] == tuple(float(v) for v in want), k
    # null propagates
    nulls = spark.createDataFrame([(None,)], "wkb binary")
    row = nulls.select(G.geom_bbox(F.col("wkb")).alias("b")).first()
    assert row["b"]["xmin"] is None


def test_st_contains_point_holes_and_multipolygon(spark):
    """Even-odd ray casting: holes exclude, disjoint parts both contain,
    and a concave vertex-height ray is handled deterministically."""
    from pyspark.sql import functions as F

    from meerschaum_spark import geometry as geocodec
    from meerschaum_spark.functions import geo as G
    poly = geocodec.to_wkb(geocodec.from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"))
    mp = geocodec.to_wkb(geocodec.from_wkt(
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"))
    cases = [
        # (wkb, x, y, expected)
        (poly, 1.0, 1.0, True),     # inside shell
        (poly, 5.0, 5.0, False),    # inside hole
        (poly, 11.0, 5.0, False),   # outside
        (poly, 4.5, 4.5, False),    # hole interior corner-ish
        (mp, 1.0, 1.0, True),       # first part
        (mp, 6.0, 6.0, True),       # second part
        (mp, 3.0, 3.0, False),      # between parts
    ]
    df = spark.createDataFrame(
        [(i, w, x, y, e) for i, (w, x, y, e) in enumerate(cases)],
        "i int, wkb binary, x double, y double, want boolean")
    out = df.select("i", "want", G.st_contains_point(
        F.col("wkb"), F.col("x"), F.col("y")).alias("got")).collect()
    for r in out:
        assert r["got"] == r["want"], r["i"]


def test_radius_candidate_join_matches_brute_force(spark):
    """The grid-bucketed radius join finds EXACTLY the brute-force pair
    set on deterministic pseudo-random points (including cross-cell
    pairs), for a non-default cell width too."""
    from pyspark.sql import functions as F

    from meerschaum_spark.functions import geo as G
    import random
    rng = random.Random(7)
    pts = [(i, rng.uniform(-50, 50), rng.uniform(-50, 50))
           for i in range(300)]
    a = spark.createDataFrame([(i, x, y) for i, x, y in pts[:80]],
                              "a_id int, x1 double, y1 double")
    b = spark.createDataFrame(pts, "b_id int, x2 double, y2 double")
    r = 4.25
    got = {(row["a_id"], row["b_id"])
           for row in G.radius_candidate_join(
               a, b, radius=r, ax="x1", ay="y1", bx="x2", by="y2")
           .select("a_id", "b_id").collect()}
    want = {(i, j) for i, xa, ya in pts[:80] for j, xb, yb in pts
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= r * r}
    assert got == want and len(want) > 100
    # wider cells must give the same exact answer (fewer, larger buckets)
    got2 = {(row["a_id"], row["b_id"])
            for row in G.radius_candidate_join(
                a, b, radius=r, ax="x1", ay="y1", bx="x2", by="y2",
                cell=10.0)
            .select("a_id", "b_id").collect()}
    assert got2 == want


def test_radius_join_plan_is_equi_join(spark):
    """Scale shape: the candidate join is a hash equi-join on the grid
    cell (broadcast offsets; no cartesian / nested-loop join in the
    plan)."""
    from meerschaum_spark.functions import geo as G
    a = spark.range(100).selectExpr("id as a_id",
                                    "cast(id % 13 as double) as x1",
                                    "cast(id % 7 as double) as y1")
    b = spark.range(1000).selectExpr("id as b_id",
                                     "cast(id % 13 as double) as x2",
                                     "cast(id % 7 as double) as y2")
    joined = G.radius_candidate_join(
        a, b, 2.5, ax="x1", ay="y1", bx="x2", by="y2")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only nested-loop join allowed is the tiny broadcast offsets
    # cross join (9 rows); the a↔b candidate join itself must be an
    # equi-join on the cell key
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_st_path_stats_exact(spark):
    """LINESTRING squared-length sum is the exact integer of the vertex
    walk; single-point paths measure zero."""
    from pyspark.sql import functions as F

    from meerschaum_spark.functions import geo as G
    df = spark.createDataFrame(
        [("a", "LINESTRING (0 0, 3 4, 3 10)"),   # 25 + 36
         ("b", "LINESTRING (5 5)"),
         ("c", None)],
        "k string, wkt string")
    stats = G.st_path_stats(G.wkt_to_wkb(F.col("wkt")))
    got = {r["k"]: (r["s"]["n_points"], r["s"]["len_sq_sum"])
           for r in df.select("k", stats.alias("s")).collect()}
    assert got["a"] == (3, 61)
    assert got["b"] == (1, 0)
    assert got["c"] == (None, None)


def test_st_area2_exact_with_holes(spark):
    """Doubled shoelace area: exact integers for integer-grid polygons,
    holes subtract, multipolygon parts sum, orientation-independent."""
    from pyspark.sql import functions as F

    from meerschaum_spark.functions import geo as G
    cases = [
        ("square", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", 32),
        ("tri", "POLYGON ((0 0, 3 0, 0 3, 0 0))", 9),
        ("cw_square", "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))", 32),
        ("holed", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                  "(2 2, 4 2, 4 4, 2 4, 2 2))", 200 - 8),
        ("multi", "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
                  "((5 5, 8 5, 8 9, 5 9, 5 5)))", 8 + 24),
    ]
    df = spark.createDataFrame([(k, w) for k, w, _ in cases],
                               "k string, wkt string")
    got = {r["k"]: r["a2"] for r in df.select(
        "k", G.st_area2(G.wkt_to_wkb(F.col("wkt"))).alias("a2")).collect()}
    for k, _, want in cases:
        assert got[k] == want, (k, got[k], want)


def test_radius_join_rejects_undersized_cells(spark):
    import pytest as _pytest

    from meerschaum_spark.functions import geo as G
    a = spark.range(2).selectExpr("id a_id", "cast(id as double) x1",
                                  "cast(id as double) y1")
    b = spark.range(2).selectExpr("id b_id", "cast(id as double) x2",
                                  "cast(id as double) y2")
    with _pytest.raises(ValueError, match="cell width"):
        G.radius_candidate_join(a, b, radius=5.0, cell=2.0,
                                ax="x1", ay="y1", bx="x2", by="y2")


def test_mercator_transform_roundtrip_and_srid(spark):
    """st_transform_mercator: forward matches the closed form, the SRID
    travels in the EWKB header both ways, z passes through, and the
    round trip reproduces half-integer lon/lat to <1e-7 degrees."""
    import math

    from pyspark.sql import functions as F

    from meerschaum_spark.functions import geo as G

    pts = [(-179.5, -84.5), (-0.5, 0.5), (12.5, 51.5), (179.5, 84.5)]
    wkbs = [geo.to_wkb(geo.Geometry("Point", [lon, lat], 4326))
            for lon, lat in pts]
    df = spark.createDataFrame([(v,) for v in wkbs], "w binary")
    fwd = df.select(
        G.st_transform_mercator(F.col("w"), F.lit("fwd")).alias("f"))
    rows = [bytes(r["f"]) for r in fwd.collect()]
    for (lon, lat), buf in zip(pts, rows):
        g = geo.from_wkb(buf)
        assert g.srid == 3857
        assert g.coords[0] == 6378137.0 * math.radians(lon)
        assert g.coords[1] == 6378137.0 * math.log(
            math.tan(math.pi / 4 + math.radians(lat) / 2))
    inv = (df.select(G.st_transform_mercator(
        G.st_transform_mercator(F.col("w"), F.lit("fwd")), F.lit("inv"))
        .alias("b")))
    for (lon, lat), r in zip(pts, inv.collect()):
        g = geo.from_wkb(bytes(r["b"]))
        assert g.srid == 4326
        assert abs(g.coords[0] - lon) < 1e-7
        assert abs(g.coords[1] - lat) < 1e-7
    # z passes through a LINESTRING Z untouched
    lz = geo.from_wkt("SRID=4326;LINESTRING Z (10 20 7.5, 11 21 8.5)")
    out = spark.createDataFrame([(geo.to_wkb(lz),)], "w binary").select(
        G.st_transform_mercator(F.col("w"), F.lit("fwd")).alias("f"))
    gz = geo.from_wkb(bytes(out.first()["f"]))
    assert gz.has_z and [p[2] for p in gz.coords] == [7.5, 8.5]
    # GeometryCollection children (coords live in .geoms) transform too
    gc = geo.from_wkt("SRID=4326;GEOMETRYCOLLECTION (POINT (10 20), "
                      "LINESTRING (0 0, 30 40.5))")
    out = spark.createDataFrame([(geo.to_wkb(gc),)], "w binary").select(
        G.st_transform_mercator(F.col("w"), F.lit("fwd")).alias("f"))
    gg = geo.from_wkb(bytes(out.first()["f"]))
    assert gg.srid == 3857 and len(gg.geoms) == 2
    assert gg.geoms[0].coords[0] == 6378137.0 * math.radians(10)


def test_st_intersects_geometry_pairs(spark):
    """Geometry×geometry ST_Intersects: crossing lines, endpoint touch,
    collinear overlap, disjoint, polygon×line crossing, and full
    containment (no boundary crossing) — both nesting directions."""
    from pyspark.sql import functions as F

    from meerschaum_spark.functions import geo as G

    def w(wkt):
        return geo.to_wkb(geo.from_wkt(wkt))

    cases = [
        ("LINESTRING (0 0, 10 10)", "LINESTRING (0 10, 10 0)", True),
        ("LINESTRING (0 0, 5 5)", "LINESTRING (5 5, 9 1)", True),   # touch
        ("LINESTRING (0 0, 4 0)", "LINESTRING (2 0, 8 0)", True),   # collinear
        ("LINESTRING (0 0, 4 0)", "LINESTRING (5 1, 9 1)", False),
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "LINESTRING (-5 5, 15 5)", True),                          # crosses
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "LINESTRING (2 2, 3 3)", True),                            # inside
        ("LINESTRING (2 2, 3 3)",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", True),          # reversed
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))", False),
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "POLYGON ((3 3, 4 3, 4 4, 3 4, 3 3))", True),              # nested
        ("GEOMETRYCOLLECTION (POINT (50 50), LINESTRING (0 0, 4 4))",
         "LINESTRING (0 4, 4 0)", True),                # collection member
        ("GEOMETRYCOLLECTION (POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0)))",
         "POINT (5 5)", True),                          # containment in GC
    ]
    df = spark.createDataFrame(
        [(i, w(a), w(b)) for i, (a, b, _) in enumerate(cases)],
        "i int, a binary, b binary")
    got = {r["i"]: r["hit"] for r in df.select(
        "i", G.st_intersects(F.col("a"), F.col("b")).alias("hit")).collect()}
    for i, (a, b, want) in enumerate(cases):
        assert got[i] == want, (a, b, want)


def test_segments_intersect_cols_matches_python(spark):
    """The JVM column predicate and the Python CLRS reference must agree
    on every small-integer segment pair (exhaustive over a dense set:
    crossings, touches, collinear overlaps, points)."""
    import itertools

    from pyspark.sql import functions as F

    from meerschaum_spark.functions.geo import (
        _py_seg_intersect,
        segments_intersect_cols,
    )

    pts = [(0, 0), (2, 0), (1, 1), (2, 2), (0, 2)]
    segs = list(itertools.combinations(range(len(pts)), 2)) + [(0, 0)]
    rows = []
    for (i1, i2), (j1, j2) in itertools.product(segs, segs):
        rows.append(pts[i1] + pts[i2] + pts[j1] + pts[j2])
    df = spark.createDataFrame(
        rows, "x1 long, y1 long, x2 long, y2 long, "
              "x3 long, y3 long, x4 long, y4 long")
    hit = segments_intersect_cols(*[F.col(c) for c in df.columns])
    got = [r["h"] for r in df.select(hit.alias("h")).collect()]
    want = [_py_seg_intersect(((r[0], r[1]), (r[2], r[3])),
                              ((r[4], r[5]), (r[6], r[7])))
            for r in rows]
    assert got == want


def test_wkb_parser_adversarial_fuzz():
    """The WKB codec parses stored USER bytes on the hot path: arbitrary
    and truncated/corrupted buffers must raise a clean error (ValueError
    family / struct.error) promptly — never hang, recurse forever, or
    allocate unboundedly (a claimed element count beyond the buffer must
    fail on read, not pre-allocate)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def assert_clean(buf: bytes):
        try:
            geo.from_wkb(buf)
        except Exception as exc:  # noqa: BLE001 — the contract IS the type
            assert isinstance(exc, (ValueError, struct_error, IndexError,
                                    NotImplementedError)), \
                (type(exc), buf.hex())

    from struct import error as struct_error

    @settings(max_examples=300, deadline=None)
    @given(st.binary(min_size=0, max_size=64))
    def fuzz_random(buf):
        assert_clean(buf)

    fuzz_random()

    # structured corruption: take valid geometries and truncate / flip
    valid = [geo.to_wkb(geo.from_wkt(w)) for w in WKTS]

    @settings(max_examples=300, deadline=None)
    @given(st.sampled_from(valid), st.data())
    def fuzz_corrupt(buf, data):
        cut = data.draw(st.integers(0, len(buf)))
        mutated = bytearray(buf[:cut] + buf[cut + 1:])
        if mutated:
            pos = data.draw(st.integers(0, len(mutated) - 1))
            mutated[pos] ^= data.draw(st.integers(1, 255))
        assert_clean(bytes(mutated))

    fuzz_corrupt()

    # hostile claimed counts: header says 2^31 points, buffer is tiny —
    # must error fast instead of allocating
    import struct as _s
    import time as _t
    hostile = b"\x01" + _s.pack("<I", 2) + _s.pack("<I", 0x7FFFFFFF)
    t0 = _t.monotonic()
    assert_clean(hostile)
    assert _t.monotonic() - t0 < 2.0
