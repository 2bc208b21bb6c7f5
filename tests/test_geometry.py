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
