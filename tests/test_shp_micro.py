"""End-to-end coverage for the vendored shapefile micro-reader (S2
fallback): a synthetic .shp/.dbf/.prj trio written from the PUBLIC ESRI
white-paper layout, converted via sources.readers.convert_features (which
falls back to shp_micro when geopandas is absent — the only configuration
this container has), then scanned by read_features on Spark.

Reference parity: etl.py:549-568 dispatches .shp through gpd.read_file and
consumes only the centroid lat/lon (helper.py:58,69); the micro-reader
contract is the same (feature_id, lat, lon, geometry-WKB).
"""

from __future__ import annotations

import math
import struct
from pathlib import Path

import pytest

from gridmet_etl_spark.sources.readers import convert_features, read_features
from gridmet_etl_spark.sources.shp_micro import read_shapefile


def _shp_bytes(records: list[bytes], shape_type: int) -> bytes:
    """Assemble a .shp file: 100-byte header + (recno, words, body) records."""
    recs = []
    for i, body in enumerate(records):
        recs.append(struct.pack(">ii", i + 1, len(body) // 2) + body)
    content = b"".join(recs)
    total_words = (100 + len(content)) // 2
    header = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
    header += struct.pack("<ii", 1000, shape_type)
    header += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)  # bbox unused by reader
    return header + content


def _polygon_body(rings: list[list[tuple[float, float]]]) -> bytes:
    pts = [p for r in rings for p in r]
    parts, off = [], 0
    for r in rings:
        parts.append(off)
        off += len(r)
    body = struct.pack("<i", 5)
    body += struct.pack("<4d", 0, 0, 0, 0)  # record bbox, unused
    body += struct.pack("<ii", len(rings), len(pts))
    body += struct.pack(f"<{len(parts)}i", *parts)
    for x, y in pts:
        body += struct.pack("<dd", x, y)
    return body


def _point_body(x: float, y: float) -> bytes:
    return struct.pack("<idd", 1, x, y)


def _dbf_bytes(field: str, values: list[int]) -> bytes:
    """Single numeric-column dBASE III table."""
    flen = 10
    hdr_size = 32 + 32 + 1
    rec_size = 1 + flen
    head = bytes([0x03, 99, 1, 1]) + struct.pack("<I", len(values))
    head += struct.pack("<HH", hdr_size, rec_size) + b"\x00" * 20
    fdesc = field.encode("ascii").ljust(11, b"\x00") + b"N" + b"\x00" * 4
    fdesc += bytes([flen, 0]) + b"\x00" * 14
    recs = b"".join(b" " + str(v).rjust(flen).encode() for v in values)
    return head + fdesc + b"\x0d" + recs


def _write_trio(tmp: Path, name: str, shp: bytes, dbf: bytes, prj: str | None) -> Path:
    p = tmp / f"{name}.shp"
    p.write_bytes(shp)
    (tmp / f"{name}.dbf").write_bytes(dbf)
    if prj is not None:
        (tmp / f"{name}.prj").write_text(prj)
    return p


_GEO_WKT1 = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
)
_PROJ_WKT2 = (
    'PROJCRS["NAD83 / Conus Albers",BASEGEOGCRS["NAD83"],'
    'CONVERSION["Albers Equal Area"],CS[Cartesian,2]]'
)


def test_convert_shp_end_to_end(spark, tmp_path):
    """Square + square-with-hole polygons: convert_features (micro-reader
    fallback) → parquet → read_features; centroids match the shoelace/
    hole-respecting values."""
    outer = [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)]
    # unit hole in the corner shifts the area centroid away from (2, 2):
    # A=16-1=15, c = (16*2 - 1*0.5)/15 = 2.1
    hole = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    shp = _shp_bytes(
        [_polygon_body([outer]), _polygon_body([outer, hole])], shape_type=5
    )
    dbf = _dbf_bytes("HRU_ID", [7, 9])
    path = _write_trio(tmp_path, "feat", shp, dbf, _GEO_WKT1)

    out = convert_features(str(path), fid_col="hru_id")
    assert out.endswith(".parquet")
    df = read_features(spark, out).orderBy("feature_id")
    rows = df.collect()
    assert [r.feature_id for r in rows] == [7, 9]
    assert rows[0].lat == pytest.approx(2.0) and rows[0].lon == pytest.approx(2.0)
    assert rows[1].lon == pytest.approx(2.1) and rows[1].lat == pytest.approx(2.1)
    # WKB survives the round-trip: polygon type 3, 2 rings on the holed one
    b, t, nrings = struct.unpack("<BII", bytes(rows[1].geometry)[:9])
    assert (b, t, nrings) == (1, 3, 2)


def test_convert_shp_points_and_row_index_fid(spark, tmp_path):
    shp = _shp_bytes([_point_body(-120.5, 45.25), _point_body(-119.0, 44.0)], 1)
    dbf = _dbf_bytes("GAGE", [3, 4])
    path = _write_trio(tmp_path, "pts", shp, dbf, _GEO_WKT1)
    out = convert_features(str(path))  # fid_col default absent → row index
    rows = read_features(spark, out).orderBy("feature_id").collect()
    assert [r.feature_id for r in rows] == [0, 1]
    assert rows[0].lon == pytest.approx(-120.5)
    assert rows[0].lat == pytest.approx(45.25)


def test_projected_prj_rejected_wkt1_and_wkt2(tmp_path):
    shp = _shp_bytes([_point_body(1.0, 2.0)], 1)
    dbf = _dbf_bytes("ID", [1])
    for i, wkt in enumerate(
        ['PROJCS["Albers",GEOGCS["NAD83"]]', _PROJ_WKT2]
    ):
        path = _write_trio(tmp_path, f"proj{i}", shp, dbf, wkt)
        with pytest.raises(NotImplementedError, match="projected-CRS"):
            read_shapefile(str(path))


def test_geographic_prj_accepted(tmp_path):
    shp = _shp_bytes([_point_body(1.0, 2.0)], 1)
    dbf = _dbf_bytes("ID", [1])
    path = _write_trio(tmp_path, "geo", shp, dbf, _GEO_WKT1)
    df = read_shapefile(str(path))
    assert list(df["ID"]) == [1]
    assert math.isclose(df["lon"][0], 1.0) and math.isclose(df["lat"][0], 2.0)


def test_bad_file_code_raises(tmp_path):
    p = tmp_path / "junk.shp"
    p.write_bytes(b"\x00" * 120)
    with pytest.raises(ValueError, match="bad file code"):
        read_shapefile(str(p))


def test_dbf_shp_count_mismatch_raises(tmp_path):
    shp = _shp_bytes([_point_body(0.0, 0.0)], 1)
    dbf = _dbf_bytes("ID", [1, 2])
    path = _write_trio(tmp_path, "mis", shp, dbf, None)
    with pytest.raises(ValueError, match="records"):
        read_shapefile(str(path))
