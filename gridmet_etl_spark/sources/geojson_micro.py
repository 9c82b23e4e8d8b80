"""Pure-python GeoJSON and GeoPackage feature readers — closing the last
two branches of ``convert_features``'s suffix dispatch without geopandas
(the shp_micro pattern: real bytes of real public formats).

- GeoJSON (RFC 7946): ``json`` stdlib parse of a FeatureCollection;
  Point / Polygon / MultiPolygon / LineString geometries, properties
  carried through; centroids use the same shoelace area-centroid as
  shp_micro (== shapely's ``geometry.centroid`` for polygons).
- GeoPackage (OGC 12-128r17): the stdlib ``sqlite3`` opens the container;
  the feature table comes from ``gpkg_contents`` (data_type='features'),
  its geometry column from ``gpkg_geometry_columns``; each geometry BLOB
  is the GeoPackage binary header (magic 'GP', version, flags byte whose
  envelope-indicator bits size the envelope) followed by STANDARD WKB —
  parsed here for Point/Polygon/MultiPolygon/LineString, either byte
  order.

Both return the ``read_shapefile`` contract: a pandas frame of feature
properties plus lat/lon (centroid) and geometry (normalized
little-endian WKB), which ``convert_features`` turns into the engine's
feature parquet.
"""

from __future__ import annotations

import json
import struct

import pandas as pd

from .shp_micro import (
    _polygon_centroid,
    _ring_centroid_terms,
    _wkb_linestring,
    _wkb_point,
    _wkb_polygon,
)

__all__ = ["read_geojson", "read_geopackage"]


def _wkb_multipolygon(polys: list[list[list[tuple[float, float]]]]) -> bytes:
    out = [b"\x01", struct.pack("<II", 6, len(polys))]
    out += [_wkb_polygon(rings) for rings in polys]
    return b"".join(out)


def _multipolygon_centroid(
    polys: list[list[list[tuple[float, float]]]]
) -> tuple[float, float]:
    a_sum = tx_sum = ty_sum = 0.0
    for rings in polys:
        for ring in rings:
            a, tx, ty = _ring_centroid_terms(ring)
            a_sum += a
            tx_sum += tx
            ty_sum += ty
    if abs(a_sum) < 1e-300:  # degenerate: fall back to vertex mean
        pts = [p for rings in polys for ring in rings for p in ring]
        return (
            sum(p[0] for p in pts) / len(pts),
            sum(p[1] for p in pts) / len(pts),
        )
    # same normalization as shp_micro._polygon_centroid: terms carry /6,
    # areas carry /2, so centroid = Σterms / Σareas
    return tx_sum / a_sum, ty_sum / a_sum


def _geom_to_row(geom: dict) -> tuple[float, float, bytes | None]:
    """(centroid_lon, centroid_lat, normalized WKB) for one GeoJSON
    geometry object."""
    gtype = geom["type"]
    coords = geom.get("coordinates")
    if gtype == "Point":
        x, y = float(coords[0]), float(coords[1])
        return x, y, _wkb_point(x, y)
    if gtype == "Polygon":
        rings = [[(float(x), float(y)) for x, y, *_ in ring] for ring in coords]
        cx, cy = _polygon_centroid(rings)
        return cx, cy, _wkb_polygon(rings)
    if gtype == "MultiPolygon":
        polys = [
            [[(float(x), float(y)) for x, y, *_ in ring] for ring in rings]
            for rings in coords
        ]
        cx, cy = _multipolygon_centroid(polys)
        return cx, cy, _wkb_multipolygon(polys)
    if gtype == "LineString":
        pts = [(float(x), float(y)) for x, y, *_ in coords]
        cx = sum(p[0] for p in pts) / len(pts)
        cy = sum(p[1] for p in pts) / len(pts)
        return cx, cy, _wkb_linestring(pts)
    raise ValueError(f"geojson_micro: unsupported geometry type {gtype!r}")


def read_geojson(path: str) -> pd.DataFrame:
    """FeatureCollection → (properties…, lat, lon, geometry-WKB) frame."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    if doc.get("type") != "FeatureCollection":
        raise ValueError(
            f"geojson_micro: expected a FeatureCollection, got {doc.get('type')!r}"
        )
    rows = []
    for feat in doc.get("features", []):
        props = dict(feat.get("properties") or {})
        geom = feat.get("geometry")
        if geom is None:
            props.update({"lon": None, "lat": None, "geometry": None})
        else:
            x, y, wkb = _geom_to_row(geom)
            props.update({"lon": x, "lat": y, "geometry": wkb})
        rows.append(props)
    return pd.DataFrame(rows)


# -- GeoPackage -------------------------------------------------------------


def _rd(fmt: str, buf: bytes, off: int) -> tuple:
    return struct.unpack_from(fmt, buf, off)


def _parse_wkb(buf: bytes, off: int = 0):
    """(centroid_lon, centroid_lat, normalized WKB bytes) from standard
    WKB at ``off`` (either byte order; 2-D coordinates used, Z/M flags via
    the ISO type-code convention are reduced modulo 1000)."""
    bo = "<" if buf[off] == 1 else ">"
    (code,) = _rd(bo + "I", buf, off + 1)
    if code & 0xE0000000:
        # PostGIS EWKB dimension/SRID flag bits — not ISO WKB; parsing as
        # ISO would misalign every coordinate. Fail loudly (ADVICE r6).
        raise ValueError(f"EWKB flag bits in geometry type code 0x{code:08x}")
    base = code % 1000
    # ISO type-code thousands digit: 0→XY, 1→XYZ, 2→XYM, 3→XYZM. Reading
    # all ZM codes as 3 coords would misalign ZM points (4 doubles each)
    # and silently return garbage centroids (ADVICE r6).
    dim_code = code // 1000
    if dim_code > 3:
        raise ValueError(f"unknown WKB dimension code {dim_code} (type {code})")
    ncoord = (2, 3, 3, 4)[dim_code]
    pos = off + 5

    def point(p):
        vals = _rd(bo + "d" * ncoord, buf, p)
        return (vals[0], vals[1]), p + 8 * ncoord

    def ring(p):
        (n,) = _rd(bo + "I", buf, p)
        p += 4
        pts = []
        for _ in range(n):
            pt, p = point(p)
            pts.append(pt)
        return pts, p

    if base == 1:  # Point
        (x, y), pos = point(pos)
        return x, y, _wkb_point(x, y)
    if base == 2:  # LineString
        pts, pos = ring(pos)
        cx = sum(p[0] for p in pts) / len(pts)
        cy = sum(p[1] for p in pts) / len(pts)
        return cx, cy, _wkb_linestring(pts)
    if base == 3:  # Polygon
        (nr,) = _rd(bo + "I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nr):
            r, pos = ring(pos)
            rings.append(r)
        cx, cy = _polygon_centroid(rings)
        return cx, cy, _wkb_polygon(rings)
    if base == 6:  # MultiPolygon
        (np_,) = _rd(bo + "I", buf, pos)
        pos += 4
        polys = []
        for _ in range(np_):
            sub_bo = "<" if buf[pos] == 1 else ">"
            (sub_code,) = struct.unpack_from(sub_bo + "I", buf, pos + 1)
            assert sub_code % 1000 == 3, "MultiPolygon member must be Polygon"
            p = pos + 5
            (nr,) = struct.unpack_from(sub_bo + "I", buf, p)
            p += 4
            rings = []
            # rings of the member polygon use the member's byte order
            for _ in range(nr):
                (n,) = struct.unpack_from(sub_bo + "I", buf, p)
                p += 4
                pts = []
                for _ in range(n):
                    vals = struct.unpack_from(sub_bo + "d" * ncoord, buf, p)
                    pts.append((vals[0], vals[1]))
                    p += 8 * ncoord
                rings.append(pts)
            polys.append(rings)
            pos = p
        cx, cy = _multipolygon_centroid(polys)
        return cx, cy, _wkb_multipolygon(polys)
    raise ValueError(f"geojson_micro: unsupported WKB geometry code {code}")


def _strip_gpkg_header(blob: bytes) -> int:
    """Offset of the WKB payload inside a GeoPackage geometry BLOB
    (OGC 12-128r17 §2.1.3): 'GP' magic, version, flags — envelope size is
    selected by flag bits 1-3 — then srs_id, envelope, WKB."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob (no GP magic)")
    flags = blob[3]
    env_code = (flags >> 1) & 0b111
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env_code)
    if env_len is None:
        raise ValueError(f"invalid GeoPackage envelope indicator {env_code}")
    return 8 + env_len


def read_geopackage(path: str, layer: str | None = None) -> pd.DataFrame:
    """First (or named) feature layer of a .gpkg → the read_shapefile
    contract frame. stdlib sqlite3 only."""
    import sqlite3

    con = sqlite3.connect(path)
    try:
        tables = con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'"
            " ORDER BY table_name"
        ).fetchall()
        if not tables:
            raise ValueError("geopackage has no feature layers")
        names = [t[0] for t in tables]
        table = layer if layer is not None else names[0]
        if table not in names:
            raise ValueError(f"layer {table!r} not in {names}")
        (geom_col,) = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
            (table,),
        ).fetchone()
        cols = [
            r[1]
            for r in con.execute(f'PRAGMA table_info("{table}")').fetchall()
        ]
        attr_cols = [c for c in cols if c != geom_col]
        sel = ", ".join(f'"{c}"' for c in attr_cols + [geom_col])
        rows = []
        for rec in con.execute(f'SELECT {sel} FROM "{table}"'):
            props = dict(zip(attr_cols, rec[:-1]))
            blob = rec[-1]
            if blob is None:
                props.update({"lon": None, "lat": None, "geometry": None})
            else:
                blob = bytes(blob)
                x, y, wkb = _parse_wkb(blob, _strip_gpkg_header(blob))
                props.update({"lon": x, "lat": y, "geometry": wkb})
            rows.append(props)
        return pd.DataFrame(rows)
    finally:
        con.close()
