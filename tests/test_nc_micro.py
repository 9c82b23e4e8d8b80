"""NetCDF-3 classic micro writer/reader (sources/nc_micro.py).

The golden test hand-derives the expected byte layout from the PUBLIC
classic-format spec (Unidata "NetCDF File Format Specifications") rather
than from the writer — magic, tag words, 4-byte name padding, attribute
payloads, vsize/begin offsets, big-endian data — so writer and spec are
checked against each other, not against themselves. (No independent
netCDF implementation ships in this container; this is the shp_micro
golden-bytes precedent.)
"""

import struct

import numpy as np
import pytest

from gridmet_etl_spark.sources.nc_micro import read_netcdf3, write_netcdf3


def test_spec_golden_bytes(tmp_path):
    """dims {x:2}, one global attr, one int var [7,-1] — the full file is
    exactly the 112 spec-derived bytes below (header 104 = 8 magic+numrecs,
    20 dim_list, 32 gatt_list, 44 var_list; then 8 bytes of data)."""
    path = str(tmp_path / "g.nc")
    write_netcdf3(
        path,
        dims={"x": 2},
        variables=[("v", ["x"], {}, np.array([7, -1], dtype="i4"))],
        global_attrs={"title": "t"},
    )
    expected = b"".join(
        [
            b"CDF\x01",  # magic: classic, 32-bit offsets
            struct.pack(">i", 0),  # numrecs = 0
            struct.pack(">ii", 0x0A, 1),  # NC_DIMENSION, 1 dim
            struct.pack(">i", 1), b"x\x00\x00\x00",  # name "x" padded to 4
            struct.pack(">i", 2),  # dim length
            struct.pack(">ii", 0x0C, 1),  # NC_ATTRIBUTE, 1 global attr
            struct.pack(">i", 5), b"title\x00\x00\x00",  # name padded
            struct.pack(">ii", 2, 1), b"t\x00\x00\x00",  # NC_CHAR, len 1
            struct.pack(">ii", 0x0B, 1),  # NC_VARIABLE, 1 var
            struct.pack(">i", 1), b"v\x00\x00\x00",  # name "v"
            struct.pack(">i", 1),  # ndims
            struct.pack(">i", 0),  # dimid 0 -> "x"
            struct.pack(">ii", 0, 0),  # vatt_list ABSENT
            struct.pack(">i", 4),  # nc_type NC_INT
            struct.pack(">i", 8),  # vsize = 2 * 4 bytes
            struct.pack(">i", 104),  # begin = header length
            struct.pack(">i", 7), struct.pack(">i", -1),  # big-endian data
        ]
    )
    got = open(path, "rb").read()
    assert len(got) == 112
    assert got == expected


def test_roundtrip_dims_attrs_fill_and_types(tmp_path):
    """(time, nhru) extract with a double grid (fill-valued hole), float
    and int coordinate vars, str/int/float/array attributes — everything
    survives a write→read round trip exactly."""
    path = str(tmp_path / "r.nc")
    grid = np.array([[20.5, 18.25], [21.0, 9.96920996838687e36]], dtype="f8")
    write_netcdf3(
        path,
        dims={"time": 2, "nhru": 2},
        variables=[
            ("time", ["time"], {"units": "days since 1970-01-01",
                                "calendar": "standard"},
             np.array([19875.0, 19876.0], dtype="f8")),
            ("nhru", ["nhru"], {"ids": np.array([4, 5])},
             np.array([4, 5], dtype="i4")),
            ("tmax", ["time", "nhru"],
             {"_FillValue": 9.96920996838687e36, "scale": 0.5, "rank": 3},
             grid),
            ("frac", ["nhru"], {}, np.array([0.25, 0.75], dtype="f4")),
        ],
        global_attrs={"Conventions": "CF-1.8", "featureType": "timeSeries"},
    )
    dims, gatts, data = read_netcdf3(path)
    assert dims == {"time": 2, "nhru": 2}
    assert gatts == {"Conventions": "CF-1.8", "featureType": "timeSeries"}
    assert data["time"][1]["calendar"] == "standard"
    assert data["nhru"][2].dtype == np.dtype(">i4")
    assert list(data["nhru"][2]) == [4, 5]
    assert list(data["nhru"][1]["ids"]) == [4, 5]
    vdims, vattrs, arr = data["tmax"]
    assert vdims == ["time", "nhru"]
    assert vattrs["_FillValue"] == 9.96920996838687e36
    assert vattrs["scale"] == 0.5 and vattrs["rank"] == 3
    np.testing.assert_array_equal(arr, grid)
    np.testing.assert_allclose(data["frac"][2], [0.25, 0.75])


def test_odd_length_names_and_char_padding(tmp_path):
    """Names/attr strings whose lengths aren't multiples of 4 exercise the
    padding rules; a 3-byte var of NC_BYTE exercises data padding (vsize
    rounds 3 -> 4)."""
    path = str(tmp_path / "p.nc")
    write_netcdf3(
        path,
        dims={"abcde": 3},
        variables=[("b", ["abcde"], {"note": "xyz"},
                    np.array([1, 2, 3], dtype="i1"))],
        global_attrs={},
    )
    dims, gatts, data = read_netcdf3(path)
    assert dims == {"abcde": 3} and gatts == {}
    assert data["b"][1]["note"] == "xyz"
    assert list(data["b"][2]) == [1, 2, 3]
    assert len(open(path, "rb").read()) % 4 == 0  # trailing data padded


def test_rejects_out_of_scope_inputs(tmp_path):
    path = str(tmp_path / "bad.nc")
    with pytest.raises(ValueError, match="64-bit"):
        write_netcdf3(path, {"x": 1},
                      [("v", ["x"], {}, np.array([1], dtype="i8"))])
    with pytest.raises(ValueError, match="shape"):
        write_netcdf3(path, {"x": 2},
                      [("v", ["x"], {}, np.array([1], dtype="i4"))])
    open(path, "wb").write(b"CDF\x02" + b"\x00" * 16)  # 64-bit-offset file
    with pytest.raises(ValueError, match="classic"):
        read_netcdf3(path)
