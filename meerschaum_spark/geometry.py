"""Geometry dtype support: WKT / WKB / EWKB / GeoJSON codecs, pure Python.

Covers the reference's geometry surface (utils/dtypes/__init__.py:800-882
serialize_geometry / deserialize_geometry, :349-437
attempt_cast_to_geometry + WKT/WKB detection, utils/dataframe.py:1151-1220
geometry sniffing) without shapely/geopandas — the container has neither,
and the engine only needs the codec: geometry columns are stored as WKB
``binary`` columns in parquet, and all heavy per-row work runs through
Arrow-batched pandas UDFs, so a dependency-free codec keeps the hot path
self-contained.

Supported types: Point, LineString, Polygon, MultiPoint, MultiLineString,
MultiPolygon, GeometryCollection — 2D and Z variants — with EWKB SRID
embedding (PostGIS-style flag 0x20000000).
"""

from __future__ import annotations

import binascii
import re
import struct
from dataclasses import dataclass, field
from typing import Any

_GEOM_TYPES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}
_GEOM_CODES = {v.lower(): k for k, v in _GEOM_TYPES.items()}
_EWKB_SRID_FLAG = 0x20000000
_WKB_Z_FLAG = 0x80000000
_WKB_M_FLAG = 0x40000000
_ISO_Z_OFFSET = 1000  # ISO WKB encodes Z as code + 1000

_WKT_RE = re.compile(
    r"^\s*(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON|"
    r"GEOMETRYCOLLECTION)\s*(Z|ZM|M)?\s*(\(|EMPTY)",
    re.IGNORECASE,
)
_SRID_PREFIX_RE = re.compile(r"^\s*SRID\s*=\s*(\d+)\s*;", re.IGNORECASE)


@dataclass
class Geometry:
    """Minimal geometry value: type name, nested coordinate lists, SRID.

    ``coords`` nesting by type: Point → [x, y(, z)]; LineString/MultiPoint →
    [[x, y], ...]; Polygon/MultiLineString → [[[x, y], ...], ...];
    MultiPolygon → one level deeper. GeometryCollection stores child
    ``Geometry`` objects in ``geoms`` instead.
    """

    geom_type: str
    coords: list = field(default_factory=list)
    srid: int = 0
    has_z: bool = False
    geoms: list["Geometry"] = field(default_factory=list)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Geometry):
            return NotImplemented
        return (self.geom_type == other.geom_type and self.coords == other.coords
                and self.srid == other.srid and self.has_z == other.has_z
                and self.geoms == other.geoms)


# ---------------------------------------------------------------------------
# WKB
# ---------------------------------------------------------------------------

def _write_coords(out: list[bytes], coords: list, depth: int, has_z: bool) -> None:
    dims = 3 if has_z else 2
    if depth == 0:  # a single position
        out.append(struct.pack(f"<{dims}d", *coords[:dims]))
        return
    out.append(struct.pack("<I", len(coords)))
    for sub in coords:
        _write_coords(out, sub, depth - 1, has_z)


_DEPTHS = {
    "point": 0, "linestring": 1, "polygon": 2,
    "multipoint": 1, "multilinestring": 2, "multipolygon": 3,
}


def to_wkb(geom: Geometry, include_srid: bool = True) -> bytes:
    """Serialize to little-endian (E)WKB. SRID is embedded PostGIS-style
    when ``include_srid`` and ``geom.srid`` is non-zero (reference
    serialize_geometry passes include_srid=True)."""
    key = geom.geom_type.lower()
    code = _GEOM_CODES[key]
    header_code = code
    if geom.has_z:
        header_code |= _WKB_Z_FLAG
    emit_srid = include_srid and geom.srid
    if emit_srid:
        header_code |= _EWKB_SRID_FLAG
    out: list[bytes] = [b"\x01", struct.pack("<I", header_code)]
    if emit_srid:
        out.append(struct.pack("<I", geom.srid))
    if key == "geometrycollection":
        out.append(struct.pack("<I", len(geom.geoms)))
        for child in geom.geoms:
            out.append(to_wkb(child, include_srid=False))
    elif key == "multipolygon":
        # multi-geometries embed full WKB children
        out.append(struct.pack("<I", len(geom.coords)))
        for poly in geom.coords:
            out.append(to_wkb(Geometry("Polygon", poly, 0, geom.has_z),
                              include_srid=False))
    elif key in ("multipoint", "multilinestring"):
        child_type = "Point" if key == "multipoint" else "LineString"
        out.append(struct.pack("<I", len(geom.coords)))
        for child in geom.coords:
            out.append(to_wkb(Geometry(child_type, child, 0, geom.has_z),
                              include_srid=False))
    else:
        _write_coords(out, geom.coords, _DEPTHS[key], geom.has_z)
    return b"".join(out)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        chunk = self.buf[self.pos:self.pos + n]
        if len(chunk) < n:
            raise ValueError("Truncated WKB.")
        self.pos += n
        return chunk


def _read_coords(r: _Reader, depth: int, has_z: bool, bo: str,
                 has_m: bool = False) -> list:
    dims = 2 + (1 if has_z else 0) + (1 if has_m else 0)
    keep = 3 if has_z else 2
    if depth == 0:
        vals = list(struct.unpack(f"{bo}{dims}d", r.take(8 * dims)))
        return vals[:keep]  # M ordinates are parsed but not modeled
    (n,) = struct.unpack(f"{bo}I", r.take(4))
    return [_read_coords(r, depth - 1, has_z, bo, has_m) for _ in range(n)]


def _parse_wkb_body(r: _Reader) -> Geometry:
    byte_order = r.take(1)
    bo = "<" if byte_order == b"\x01" else ">"
    (raw,) = struct.unpack(f"{bo}I", r.take(4))
    srid = 0
    if raw & _EWKB_SRID_FLAG:
        (srid,) = struct.unpack(f"{bo}I", r.take(4))
    has_z = bool(raw & _WKB_Z_FLAG)
    has_m = bool(raw & _WKB_M_FLAG)
    # strip EWKB flag bits BEFORE the ISO-offset check: ISO WKB encodes
    # dimensionality as code + 1000 (Z) / 2000 (M) / 3000 (ZM), so the
    # offset must be inspected on the unmasked low bits (masking with
    # 0xFF first would make ISO Z/ZM input unparseable)
    code = raw & 0x0FFFFFFF
    if 1000 <= code < 4000:  # ISO Z / M / ZM encodings
        has_z = has_z or code < 2000 or code >= 3000
        has_m = has_m or code >= 2000
        code %= 1000
    if code not in _GEOM_TYPES:
        raise ValueError(f"Unknown WKB geometry code: {code}")
    name = _GEOM_TYPES[code]
    key = name.lower()
    if key == "geometrycollection":
        (n,) = struct.unpack(f"{bo}I", r.take(4))
        geoms = [_parse_wkb_body(r) for _ in range(n)]
        hz = any(g.has_z for g in geoms)
        return Geometry(name, [], srid, hz, geoms)
    if key in ("multipoint", "multilinestring", "multipolygon"):
        (n,) = struct.unpack(f"{bo}I", r.take(4))
        children = [_parse_wkb_body(r) for _ in range(n)]
        coords = [c.coords for c in children]
        hz = any(c.has_z for c in children)
        return Geometry(name, coords, srid, hz)
    coords = _read_coords(r, _DEPTHS[key], has_z, bo, has_m)
    return Geometry(name, coords, srid, has_z)


def from_wkb(data: bytes | str) -> Geometry:
    """Parse (E)WKB bytes or a hex string (reference deserialize_geometry
    accepts both)."""
    if isinstance(data, str):
        data = binascii.unhexlify(data.strip())
    return _parse_wkb_body(_Reader(bytes(data)))


def to_wkb_hex(geom: Geometry, include_srid: bool = True) -> str:
    return to_wkb(geom, include_srid).hex()


# ---------------------------------------------------------------------------
# WKT
# ---------------------------------------------------------------------------

def _fmt_num(x: float) -> str:
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x)


def _wkt_coords(coords: list, depth: int) -> str:
    if depth == 0:
        return " ".join(_fmt_num(c) for c in coords)
    inner = ", ".join(_wkt_coords(c, depth - 1) for c in coords)
    return f"({inner})" if depth > 0 else inner


def to_wkt(geom: Geometry) -> str:
    key = geom.geom_type.lower()
    name = geom.geom_type.upper()
    z = " Z" if geom.has_z else ""
    if key == "geometrycollection":
        if not geom.geoms:
            return f"{name}{z} EMPTY"
        inner = ", ".join(to_wkt(g) for g in geom.geoms)
        return f"{name}{z} ({inner})"
    if not geom.coords:
        return f"{name}{z} EMPTY"
    if key == "point":
        return f"{name}{z} ({_wkt_coords(geom.coords, 0)})"
    depth = _DEPTHS[key]
    inner = ", ".join(_wkt_coords(c, depth - 1) for c in geom.coords)
    return f"{name}{z} ({inner})"


def _tokenize_wkt_numbers(block: str, depth: int) -> list:
    block = block.strip()
    if depth == 0:
        return [float(t) for t in block.split()]
    # split on commas at the current nesting level
    parts, level, start = [], 0, 0
    for i, ch in enumerate(block):
        if ch == "(":
            level += 1
        elif ch == ")":
            level -= 1
        elif ch == "," and level == 0:
            parts.append(block[start:i])
            start = i + 1
    parts.append(block[start:])
    out = []
    for part in parts:
        part = part.strip()
        if part.startswith("(") and part.endswith(")"):
            part = part[1:-1]
        out.append(_tokenize_wkt_numbers(part, depth - 1))
    return out


def from_wkt(text: str) -> Geometry:
    srid = 0
    m = _SRID_PREFIX_RE.match(text)
    if m:  # EWKT "SRID=4326;POINT (...)"
        srid = int(m.group(1))
        text = text[m.end():]
    m = _WKT_RE.match(text)
    if not m:
        raise ValueError(f"Not WKT: {text[:40]!r}")
    name_map = {v.lower(): v for v in _GEOM_TYPES.values()}
    name = name_map[m.group(1).lower()]
    has_z = (m.group(2) or "").upper().startswith("Z")
    rest = text[m.start(3):].strip()
    if rest.upper() == "EMPTY":
        return Geometry(name, [], srid, has_z)
    if not (rest.startswith("(") and rest.endswith(")")):
        raise ValueError(f"Malformed WKT: {text[:40]!r}")
    body = rest[1:-1]
    key = name.lower()
    if key == "geometrycollection":
        parts, level, start = [], 0, 0
        for i, ch in enumerate(body):
            if ch == "(":
                level += 1
            elif ch == ")":
                level -= 1
            elif ch == "," and level == 0:
                parts.append(body[start:i])
                start = i + 1
        parts.append(body[start:])
        geoms = [from_wkt(p.strip()) for p in parts]
        return Geometry(name, [], srid, any(g.has_z for g in geoms), geoms)
    coords = _tokenize_wkt_numbers(body, _DEPTHS[key])
    return Geometry(name, coords, srid, has_z)


# ---------------------------------------------------------------------------
# GeoJSON
# ---------------------------------------------------------------------------

def from_geojson(obj: dict) -> Geometry:
    gtype = obj.get("type", "")
    if gtype == "GeometryCollection":
        geoms = [from_geojson(g) for g in obj.get("geometries", [])]
        return Geometry("GeometryCollection", [], 0,
                        any(g.has_z for g in geoms), geoms)
    if gtype.lower() not in _GEOM_CODES:
        raise ValueError(f"Not a GeoJSON geometry: {obj!r}")
    coords = obj.get("coordinates", [])

    def depth_first(c):
        return depth_first(c[0]) if isinstance(c, (list, tuple)) and c \
            and isinstance(c[0], (list, tuple)) else c

    pos = depth_first(coords)
    has_z = isinstance(pos, (list, tuple)) and len(pos) > 2 or (
        gtype == "Point" and len(coords) > 2)
    return Geometry(gtype, _listify(coords), 0, bool(has_z))


def to_geojson(geom: Geometry) -> dict:
    if geom.geom_type.lower() == "geometrycollection":
        return {"type": "GeometryCollection",
                "geometries": [to_geojson(g) for g in geom.geoms]}
    return {"type": geom.geom_type, "coordinates": geom.coords}


def _listify(c):
    if isinstance(c, (list, tuple)):
        return [_listify(x) for x in c]
    return float(c)


# ---------------------------------------------------------------------------
# detection / casting (the ingest funnel's entry points)
# ---------------------------------------------------------------------------

def looks_like_wkt(value: Any) -> bool:
    return isinstance(value, str) and bool(
        _WKT_RE.match(_SRID_PREFIX_RE.sub("", value, count=1)))


def looks_like_geojson_geometry(value: Any) -> bool:
    return (isinstance(value, dict)
            and (value.get("type", "").lower() in _GEOM_CODES
                 or value.get("type") == "GeometryCollection")
            and ("coordinates" in value or "geometries" in value))


def attempt_cast_to_geometry(value: Any) -> Geometry:
    """WKT str / EWKT / WKB bytes / WKB-hex str / GeoJSON dict → Geometry
    (reference utils/dtypes/__init__.py:349-437)."""
    if isinstance(value, Geometry):
        return value
    if isinstance(value, (bytes, bytearray)):
        return from_wkb(bytes(value))
    if isinstance(value, dict):
        return from_geojson(value)
    if isinstance(value, str):
        if looks_like_wkt(value):
            return from_wkt(value)
        return from_wkb(value)  # hex WKB
    raise ValueError(f"Cannot interpret {value!r} as geometry.")


def serialize_geometry(value: Any, geometry_format: str = "wkb",
                       srid: int | None = None) -> Any:
    """Any geometry input → the requested storage format (reference
    serialize_geometry, same format names)."""
    if value is None:
        return None
    geom = attempt_cast_to_geometry(value)
    if srid and not geom.srid:
        geom.srid = srid
    if geometry_format == "wkb":
        return to_wkb(geom)
    if geometry_format == "wkb_hex":
        return to_wkb_hex(geom)
    if geometry_format == "wkt":
        return to_wkt(geom)
    if geometry_format == "geojson":
        return to_geojson(geom)
    raise ValueError(f"Unknown geometry format: {geometry_format!r}")


def parse_geometry_dtype(dtype: str) -> tuple[str, int]:
    """``geometry[LineString, 4326]`` → ('LineString', 4326) (reference
    get_geometry_type_srid, utils/dtypes/__init__.py:1007-1093). Accepts
    ``geometry``/``geography`` with ``[...]`` or ``(...)`` modifiers."""
    m = re.match(r"^\s*(geometry|geography)\s*[\[(]?([^\])]*)[\])]?\s*$",
                 dtype, re.IGNORECASE)
    if not m:
        raise ValueError(f"Not a geometry dtype: {dtype!r}")
    geom_type, srid = "geometry", 0
    body = (m.group(2) or "").strip()
    if body:
        for part in (p.strip() for p in body.split(",")):
            if not part:
                continue
            if part.isdigit():
                srid = int(part)
            else:
                geom_type = part
    return geom_type, srid
