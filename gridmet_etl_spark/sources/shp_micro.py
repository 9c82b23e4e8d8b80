"""Vendored pure-python ESRI shapefile micro-reader (S2 fallback).

Implements just enough of the PUBLIC ESRI Shapefile Technical Description
(July 1998 white paper) and dBASE III header layout to ingest feature
polygons/points without geopandas: .shp geometry records (Point=1,
PolyLine=3, Polygon=5), .dbf attribute columns, optional .prj sanity check
(geographic CRS only — projected CRS still needs pyproj/geopandas, same
gate as operators/bbox.py::project_bounds).

This is NOT a GIS library: it exists so `convert_features` (readers.py,
reference etl.py:549-568 suffix dispatch) has a real, injectable-free
``.shp`` code path in minimal containers — convert_features falls back to
``read_shapefile`` when geopandas is absent; exercised end-to-end by
tests/test_shp_micro.py. Output matches the geopandas path's contract:
feature_id, lat/lon (true area centroid for polygons — shoelace formula,
the same value gdf.geometry.centroid yields), geometry as WKB.

All parsing is driver-side: feature tables are dimension-sized (10⁴–10⁶
rows), the same scale boundary as the geopandas path.
"""

from __future__ import annotations

import struct
from pathlib import Path

import pandas as pd

_SHAPE_POINT = 1
_SHAPE_POLYLINE = 3
_SHAPE_POLYGON = 5


def _ring_centroid_terms(pts: list[tuple[float, float]]) -> tuple[float, float, float]:
    """Signed shoelace area and centroid numerator terms for one ring.
    Signs cancel consistently across outer (CW in shapefiles) and hole
    (CCW) rings, so summing raw signed terms over all rings and dividing
    yields the holes-respecting area centroid."""
    a = cx = cy = 0.0
    for (x0, y0), (x1, y1) in zip(pts, pts[1:] + pts[:1]):
        cross = x0 * y1 - x1 * y0
        a += cross
        cx += (x0 + x1) * cross
        cy += (y0 + y1) * cross
    return a / 2.0, cx / 6.0, cy / 6.0


def _polygon_centroid(rings: list[list[tuple[float, float]]]) -> tuple[float, float]:
    area = cx = cy = 0.0
    for ring in rings:
        a, tx, ty = _ring_centroid_terms(ring)
        area += a
        cx += tx
        cy += ty
    if area == 0.0:  # degenerate: fall back to vertex mean
        pts = [p for ring in rings for p in ring]
        return (
            sum(p[0] for p in pts) / len(pts),
            sum(p[1] for p in pts) / len(pts),
        )
    return cx / area, cy / area


def _wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, 1, x, y)


def _wkb_polygon(rings: list[list[tuple[float, float]]]) -> bytes:
    out = [struct.pack("<BII", 1, 3, len(rings))]
    for ring in rings:
        out.append(struct.pack("<I", len(ring)))
        out.extend(struct.pack("<dd", x, y) for x, y in ring)
    return b"".join(out)


def _wkb_linestring(pts: list[tuple[float, float]]) -> bytes:
    out = [struct.pack("<BII", 1, 2, len(pts))]
    out.extend(struct.pack("<dd", x, y) for x, y in pts)
    return b"".join(out)


def _read_shp(path: Path) -> list[tuple[float, float, bytes | None]]:
    """Yield (centroid_lon, centroid_lat, wkb) per .shp record."""
    buf = path.read_bytes()
    if len(buf) < 100 or struct.unpack(">i", buf[:4])[0] != 9994:
        raise ValueError(f"{path} is not a shapefile (bad file code)")
    file_len = struct.unpack(">i", buf[24:28])[0] * 2  # 16-bit words → bytes
    pos, out = 100, []
    while pos + 8 <= min(file_len, len(buf)):
        _recno, content_len = struct.unpack(">ii", buf[pos : pos + 8])
        body = buf[pos + 8 : pos + 8 + content_len * 2]
        pos += 8 + content_len * 2
        shape_type = struct.unpack("<i", body[:4])[0]
        if shape_type == 0:  # null shape
            out.append((float("nan"), float("nan"), None))
        elif shape_type == _SHAPE_POINT:
            x, y = struct.unpack("<dd", body[4:20])
            out.append((x, y, _wkb_point(x, y)))
        elif shape_type in (_SHAPE_POLYLINE, _SHAPE_POLYGON):
            n_parts, n_points = struct.unpack("<ii", body[36:44])
            parts = struct.unpack(f"<{n_parts}i", body[44 : 44 + 4 * n_parts])
            pts_off = 44 + 4 * n_parts
            pts = [
                struct.unpack("<dd", body[pts_off + 16 * k : pts_off + 16 * k + 16])
                for k in range(n_points)
            ]
            rings = [
                pts[parts[i] : (parts[i + 1] if i + 1 < n_parts else n_points)]
                for i in range(n_parts)
            ]
            if shape_type == _SHAPE_POLYGON:
                # shapefile rings repeat the first point as the last; drop it
                # for the shoelace (it contributes a zero term either way)
                x, y = _polygon_centroid(rings)
                out.append((x, y, _wkb_polygon(rings)))
            else:
                flat = [p for r in rings for p in r]
                x = sum(p[0] for p in flat) / len(flat)
                y = sum(p[1] for p in flat) / len(flat)
                out.append((x, y, _wkb_linestring(flat)))
        else:
            raise NotImplementedError(
                f"shape type {shape_type} not supported by the micro-reader; "
                "install geopandas for full GIS ingest"
            )
    return out


def _read_dbf(path: Path) -> pd.DataFrame:
    """dBASE III attribute table: fixed-width ASCII records."""
    buf = path.read_bytes()
    n_rec = struct.unpack("<I", buf[4:8])[0]
    hdr_size, rec_size = struct.unpack("<HH", buf[8:12])
    fields = []
    pos = 32
    while pos < hdr_size - 1 and buf[pos] != 0x0D:
        name = buf[pos : pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fields.append((name, ftype, flen))
        pos += 32
    rows = []
    pos = hdr_size
    for _ in range(n_rec):
        rec = buf[pos : pos + rec_size]
        pos += rec_size
        if not rec or rec[0:1] == b"*":  # deleted record
            continue
        vals, off = {}, 1
        for name, ftype, flen in fields:
            raw = rec[off : off + flen].decode("ascii", "replace").strip()
            off += flen
            if ftype == "N":
                vals[name] = (
                    None if raw == "" else (float(raw) if "." in raw else int(raw))
                )
            else:
                vals[name] = raw
        rows.append(vals)
    return pd.DataFrame(rows, columns=[f[0] for f in fields])


def _check_prj(path: Path) -> None:
    prj = path.with_suffix(".prj")
    if prj.exists():
        wkt = prj.read_text().upper()
        # WKT1 spells a projected CRS "PROJCS[", WKT2 "PROJCRS[" — match
        # both, else a projected shapefile silently ingests meters as
        # degrees (the exact failure bbox.py::project_bounds guards).
        if "PROJCS" in wkt or "PROJCRS" in wkt:
            raise NotImplementedError(
                "projected-CRS shapefile: the micro-reader cannot reproject; "
                "install geopandas/pyproj (engine convention is lon/lat)"
            )


def read_shapefile(path: str) -> pd.DataFrame:
    """(feature attributes…, lat, lon, geometry-WKB) pandas frame from a
    .shp/.dbf pair — the micro-reader twin of ``gpd.read_file`` for the
    shapes the ETL's feature tables use."""
    shp = Path(path)
    geoms = _read_shp(shp)
    dbf = shp.with_suffix(".dbf")
    attrs = _read_dbf(dbf) if dbf.exists() else pd.DataFrame(index=range(len(geoms)))
    _check_prj(shp)
    if len(attrs) != len(geoms):
        raise ValueError(
            f".dbf has {len(attrs)} records but .shp has {len(geoms)} shapes"
        )
    attrs = attrs.copy()
    attrs["lon"] = [g[0] for g in geoms]
    attrs["lat"] = [g[1] for g in geoms]
    attrs["geometry"] = [g[2] for g in geoms]
    return attrs
