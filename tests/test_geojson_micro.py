"""Pure-python GeoJSON + GeoPackage readers (sources/geojson_micro.py).

The GeoPackage test hand-assembles a REAL .gpkg per the OGC 12-128r17
spec — stdlib sqlite3 container, gpkg_contents/gpkg_geometry_columns
registry rows, geometry BLOBs with the 'GP' header and standard WKB —
so the reader is exercised against spec bytes, not against itself
(the shp_micro/nc_micro golden discipline)."""

import json
import sqlite3
import struct

import pytest

from gridmet_etl_spark.sources.geojson_micro import (
    read_geojson,
    read_geopackage,
)

_UNIT_SQUARE = [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]]


def _collection() -> dict:
    return {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"hru_id": 7, "name": "pt"},
                "geometry": {"type": "Point", "coordinates": [-104.5, 39.25]},
            },
            {
                "type": "Feature",
                "properties": {"hru_id": 8, "name": "sq"},
                "geometry": {"type": "Polygon", "coordinates": _UNIT_SQUARE},
            },
            {
                "type": "Feature",
                "properties": {"hru_id": 9, "name": "mp"},
                "geometry": {
                    "type": "MultiPolygon",
                    # two unit squares: [0,1]² and [10,11]² -> centroid (5.5, .5)... area-weighted equal -> x=5.5, y=0.5
                    "coordinates": [
                        [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                        [[[10, 0], [11, 0], [11, 1], [10, 1], [10, 0]]],
                    ],
                },
            },
        ],
    }


def test_read_geojson_centroids_and_wkb(tmp_path):
    p = tmp_path / "f.geojson"
    p.write_text(json.dumps(_collection()))
    df = read_geojson(str(p)).set_index("hru_id")
    assert (df.loc[7, "lon"], df.loc[7, "lat"]) == (-104.5, 39.25)
    # WKB point golden: 01 (LE), type 1, two f64
    assert df.loc[7, "geometry"] == b"\x01" + struct.pack("<I", 1) + struct.pack(
        "<dd", -104.5, 39.25
    )
    assert (df.loc[8, "lon"], df.loc[8, "lat"]) == (2.0, 2.0)  # square centroid
    assert (df.loc[9, "lon"], df.loc[9, "lat"]) == (5.5, 0.5)  # area-weighted
    # MultiPolygon WKB header: LE, type 6, 2 members
    assert df.loc[9, "geometry"][:9] == b"\x01" + struct.pack("<II", 6, 2)
    assert df.loc[8, "name"] == "sq"


def test_read_geojson_rejects_non_collection(tmp_path):
    p = tmp_path / "g.geojson"
    p.write_text(json.dumps({"type": "Feature"}))
    with pytest.raises(ValueError, match="FeatureCollection"):
        read_geojson(str(p))


def _gp_blob(wkb: bytes, with_envelope: bool = False) -> bytes:
    """Spec-assembled GeoPackage geometry BLOB: 'GP', version 0, flags
    (envelope indicator in bits 1-3, LE byte-order bit 0), srs_id, then
    the envelope (4 doubles when indicated) and the WKB."""
    flags = 0b0000_0001  # little-endian header
    env = b""
    if with_envelope:
        flags |= 0b0000_0010  # envelope indicator 1: [minx,maxx,miny,maxy]
        env = struct.pack("<dddd", 0.0, 4.0, 0.0, 4.0)
    return b"GP" + bytes([0, flags]) + struct.pack("<i", 4326) + env + wkb


def test_read_geopackage_spec_assembled(tmp_path):
    path = str(tmp_path / "f.gpkg")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT,"
        " identifier TEXT, srs_id INTEGER)"
    )
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT,"
        " column_name TEXT, geometry_type_name TEXT, srs_id INTEGER)"
    )
    con.execute("CREATE TABLE hru (hru_id INTEGER, name TEXT, geom BLOB)")
    con.execute(
        "INSERT INTO gpkg_contents VALUES ('hru', 'features', 'hru', 4326)"
    )
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES ('hru', 'geom', 'GEOMETRY', 4326)"
    )
    pt_wkb = b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", -100.0, 45.0)
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    poly_wkb = (
        b"\x01"
        + struct.pack("<II", 3, 1)
        + struct.pack("<I", len(ring))
        + b"".join(struct.pack("<dd", *p) for p in ring)
    )
    # big-endian WKB point exercises the byte-order switch
    pt_be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", -90.0, 41.5)
    con.execute(
        "INSERT INTO hru VALUES (1, 'pt', ?)", (sqlite3.Binary(_gp_blob(pt_wkb)),)
    )
    con.execute(
        "INSERT INTO hru VALUES (2, 'sq', ?)",
        (sqlite3.Binary(_gp_blob(poly_wkb, with_envelope=True)),),
    )
    con.execute(
        "INSERT INTO hru VALUES (3, 'be', ?)", (sqlite3.Binary(_gp_blob(pt_be)),)
    )
    con.commit()
    con.close()

    df = read_geopackage(path).set_index("hru_id")
    assert (df.loc[1, "lon"], df.loc[1, "lat"]) == (-100.0, 45.0)
    assert (df.loc[2, "lon"], df.loc[2, "lat"]) == (2.0, 2.0)
    assert (df.loc[3, "lon"], df.loc[3, "lat"]) == (-90.0, 41.5)
    # normalized output WKB is little-endian regardless of input order
    assert df.loc[3, "geometry"][0:1] == b"\x01"


def test_convert_features_geojson_and_gpkg_end_to_end(spark, tmp_path, monkeypatch):
    """The S2 dispatch without geopandas: .geojson converts to the engine
    feature parquet and reads back through spark with correct centroids."""
    import builtins

    from gridmet_etl_spark.sources.readers import convert_features

    real_import = builtins.__import__

    def no_gpd(name, *a, **kw):
        if name == "geopandas":
            raise ImportError("geopandas disabled for test")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_gpd)
    p = tmp_path / "feats.geojson"
    p.write_text(json.dumps(_collection()))
    out = convert_features(str(p), fid_col="hru_id")
    got = {r.feature_id: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {7, 8, 9}
    assert (got[8].lon, got[8].lat) == (2.0, 2.0)
    assert got[7].geometry is not None


def test_wkb_dimension_codes(tmp_path):
    """ADVICE r6: ISO Z/M/ZM type codes carry 3/3/4 doubles per point —
    the old '>=1000 means 3 coords' rule parsed ZM points misaligned.
    EWKB flag bits must raise, never silently mis-parse."""
    from gridmet_etl_spark.sources.geojson_micro import _parse_wkb

    def pt(code, *vals):
        return struct.pack("<BI" + "d" * len(vals), 1, code, *vals)

    # XY / XYZ / XYM / XYZM points all yield the same 2-D centroid
    assert _parse_wkb(pt(1, -104.5, 39.25))[:2] == (-104.5, 39.25)
    assert _parse_wkb(pt(1001, -104.5, 39.25, 1500.0))[:2] == (-104.5, 39.25)
    assert _parse_wkb(pt(2001, -104.5, 39.25, 7.0))[:2] == (-104.5, 39.25)
    assert _parse_wkb(pt(3001, -104.5, 39.25, 1500.0, 7.0))[:2] == (
        -104.5,
        39.25,
    )
    # ZM LineString: 4 doubles per point must stay aligned across points
    ls = struct.pack("<BII", 1, 3002, 2) + struct.pack(
        "<8d", 0.0, 0.0, 5.0, 9.0, 2.0, 2.0, 5.0, 9.0
    )
    assert _parse_wkb(ls)[:2] == (1.0, 1.0)
    # EWKB (PostGIS flag bits) raises instead of mis-parsing
    with pytest.raises(ValueError, match="EWKB"):
        _parse_wkb(struct.pack("<BId", 1, 0x80000001, 0.0))
    with pytest.raises(ValueError, match="EWKB"):
        _parse_wkb(struct.pack("<BIId", 1, 0x20000001, 4326, 0.0))
