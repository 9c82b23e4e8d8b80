"""Pure-python NetCDF-3 "classic" writer + reader — no xarray / netCDF4 /
scipy. The micro-backend that keeps the K1/K2 NetCDF export surface REAL
in environments without a netCDF stack (the shp_micro precedent: real
bytes, no injected readers), while the engine's canonical format stays
parquet.

Format: the public NetCDF classic file format specification (Unidata,
"NetCDF File Format Specifications"; also NASA ESDS-RFC-011). Everything
is big-endian; names and data are padded to 4-byte boundaries:

    netcdf_file = magic numrecs dim_list gatt_list var_list data
    magic       = 'C' 'D' 'F' \\x01                  (classic, 32-bit offsets)
    numrecs     = int                                 (0 here: no record dim)
    dim_list    = ABSENT | 0x0A nelems [name dimlen]...
    gatt_list   = ABSENT | 0x0C nelems [name nc_type nelems values]...
    var_list    = ABSENT | 0x0B nelems
                  [name ndims dimid... vatt_list nc_type vsize begin]...
    ABSENT      = 0 0
    data        = each fixed-size variable contiguous at its 'begin',
                  rounded up to a 4-byte boundary

Scope (deliberate): fixed dimensions only (numrecs = 0 — the gridmet
exports are bounded (time, nhru) extracts, not appended streams), types
NC_BYTE/NC_CHAR/NC_SHORT/NC_INT/NC_FLOAT/NC_DOUBLE, attribute values of
str / int / float / numeric sequences. Unsupported inputs raise.

Reference parity: the reference writes its NetCDF outputs through
xarray.to_netcdf (reference gridmet-etl etl.py:585-607, helper.py
write_optimized_netcdf); sources/writers.py:export_netcdf keeps that path
when xarray IS importable and falls back to this module's classic subset
otherwise — closing one of the round-3 "gated real-I/O never exercised"
items with real bytes instead of an injected fake.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

__all__ = ["write_netcdf3", "read_netcdf3", "NC_TYPES"]

_MAGIC = b"CDF\x01"
_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type -> (numpy dtype, size in bytes)
NC_TYPES = {
    1: (np.dtype(">i1"), 1),  # NC_BYTE
    2: (np.dtype("S1"), 1),  # NC_CHAR
    3: (np.dtype(">i2"), 2),  # NC_SHORT
    4: (np.dtype(">i4"), 4),  # NC_INT
    5: (np.dtype(">f4"), 4),  # NC_FLOAT
    6: (np.dtype(">f8"), 8),  # NC_DOUBLE
}
_KIND_TO_NC = {"i1": 1, "S1": 2, "i2": 3, "i4": 4, "f4": 5, "f8": 6}


def _nc_type_of(arr: np.ndarray) -> int:
    key = arr.dtype.str.lstrip("<>=|")
    if key == "i8":  # classic has no 64-bit int: require explicit downcast
        raise ValueError(
            "NetCDF classic has no 64-bit integer type; cast to int32/float64"
        )
    if key not in _KIND_TO_NC:
        raise ValueError(f"unsupported dtype {arr.dtype} for NetCDF classic")
    return _KIND_TO_NC[key]


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _attr_payload(value: Any) -> tuple[int, int, bytes]:
    """(nc_type, nelems, padded bytes) for one attribute value."""
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return 2, len(raw), _pad4(raw)
    if isinstance(value, bytes):
        return 2, len(value), _pad4(value)
    arr = np.atleast_1d(np.asarray(value))
    if arr.dtype.kind == "i":
        arr = arr.astype(">i4")
    elif arr.dtype.kind == "f":
        arr = arr.astype(">f8")
    else:
        raise ValueError(f"unsupported attribute value type {arr.dtype}")
    return _nc_type_of(arr), arr.size, _pad4(arr.tobytes())


def _att_list(attrs: dict[str, Any]) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)  # ABSENT
    out = [struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))]
    for k, v in attrs.items():
        t, n, payload = _attr_payload(v)
        out.append(_name(k) + struct.pack(">ii", t, n) + payload)
    return b"".join(out)


def write_netcdf3(
    path: str,
    dims: dict[str, int],
    variables: list[tuple[str, list[str], dict[str, Any], np.ndarray]],
    global_attrs: dict[str, Any] | None = None,
) -> str:
    """Write a NetCDF-3 classic file.

    dims: name -> length (order defines dimids). variables: (name,
    dim_names, attrs, array) with array.shape matching the named dims in
    order. Returns path."""
    dim_ids = {n: i for i, n in enumerate(dims)}
    enc: list[tuple[str, list[int], dict[str, Any], np.ndarray, int, int]] = []
    for vname, vdims, vattrs, arr in variables:
        arr = np.asarray(arr)
        shape = tuple(dims[d] for d in vdims)
        if arr.shape != shape:
            raise ValueError(
                f"{vname}: array shape {arr.shape} != dims {vdims} {shape}"
            )
        t = _nc_type_of(np.asarray(arr, dtype=arr.dtype.newbyteorder(">")))
        be = arr.astype(NC_TYPES[t][0])
        nbytes = be.size * NC_TYPES[t][1]
        vsize = nbytes + (-nbytes % 4)  # spec: vsize includes padding
        enc.append((vname, [dim_ids[d] for d in vdims], vattrs, be, t, vsize))

    def header(begins: list[int]) -> bytes:
        out = [_MAGIC, struct.pack(">i", 0)]  # numrecs = 0 (no record dim)
        if dims:
            out.append(struct.pack(">ii", _NC_DIMENSION, len(dims)))
            for n, ln in dims.items():
                out.append(_name(n) + struct.pack(">i", ln))
        else:
            out.append(struct.pack(">ii", 0, 0))
        out.append(_att_list(global_attrs or {}))
        if enc:
            out.append(struct.pack(">ii", _NC_VARIABLE, len(enc)))
            for (vname, ids, vattrs, _be, t, vsize), begin in zip(enc, begins):
                out.append(_name(vname))
                out.append(struct.pack(">i", len(ids)))
                out.extend(struct.pack(">i", i) for i in ids)
                out.append(_att_list(vattrs))
                out.append(struct.pack(">iii", t, vsize, begin))
        else:
            out.append(struct.pack(">ii", 0, 0))
        return b"".join(out)

    # two passes: header length is begin-independent (begins are fixed
    # 4-byte ints), so size it with zeros, then lay variables out after it
    hlen = len(header([0] * len(enc)))
    begins, off = [], hlen
    for _vname, _ids, _vattrs, _be, _t, vsize in enc:
        begins.append(off)
        off += vsize
    with open(path, "wb") as f:
        f.write(header(begins))
        for _vname, _ids, _vattrs, be, _t, vsize in enc:
            raw = be.tobytes()
            f.write(raw + b"\x00" * (vsize - len(raw)))
    return path


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf, self.pos = buf, 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def name(self) -> str:
        n = self.i4()
        raw = self.take(n + (-n % 4))[:n]
        return raw.decode("utf-8")


def _read_attrs(c: _Cursor) -> dict[str, Any]:
    tag, n = c.i4(), c.i4()
    if tag == 0:
        return {}
    if tag != _NC_ATTRIBUTE:
        raise ValueError(f"bad attribute list tag {tag:#x}")
    attrs: dict[str, Any] = {}
    for _ in range(n):
        k = c.name()
        t, nelems = c.i4(), c.i4()
        dt, sz = NC_TYPES[t]
        raw = c.take(nelems * sz + (-(nelems * sz) % 4))[: nelems * sz]
        if t == 2:
            attrs[k] = raw.decode("utf-8")
        else:
            vals = np.frombuffer(raw, dtype=dt)
            attrs[k] = vals[0].item() if nelems == 1 else vals.copy()
    return attrs


def read_netcdf3(
    path: str,
) -> tuple[dict[str, int], dict[str, Any], dict[str, tuple[list[str], dict[str, Any], np.ndarray]]]:
    """Read a NetCDF-3 classic file written by write_netcdf3 (or any
    producer staying in the fixed-dimension classic subset). Returns
    (dims, global_attrs, {var: (dim_names, attrs, array)})."""
    buf = open(path, "rb").read()
    if buf[:4] != _MAGIC:
        raise ValueError(
            f"not a NetCDF classic file (magic {buf[:4]!r}; CDF\\x02/HDF5 "
            "64-bit-offset and netCDF-4 containers are out of scope)"
        )
    c = _Cursor(buf)
    c.take(4)
    numrecs = c.i4()
    if numrecs not in (0,):  # STREAMING sentinel / record vars unsupported
        raise ValueError(f"record dimensions unsupported (numrecs={numrecs})")
    tag, n = c.i4(), c.i4()
    dims: dict[str, int] = {}
    if tag == _NC_DIMENSION:
        for _ in range(n):
            dname = c.name()  # NB: name MUST be read before the length
            dims[dname] = c.i4()
    elif tag != 0:
        raise ValueError(f"bad dim list tag {tag:#x}")
    gatts = _read_attrs(c)
    tag, n = c.i4(), c.i4()
    out: dict[str, tuple[list[str], dict[str, Any], np.ndarray]] = {}
    dim_names = list(dims)
    if tag == _NC_VARIABLE:
        for _ in range(n):
            vname = c.name()
            ndims = c.i4()
            ids = [c.i4() for _ in range(ndims)]
            vattrs = _read_attrs(c)
            t, _vsize, begin = c.i4(), c.i4(), c.i4()
            dt, sz = NC_TYPES[t]
            vdims = [dim_names[i] for i in ids]
            shape = tuple(dims[d] for d in vdims)
            count = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(
                buf[begin : begin + count * sz], dtype=dt
            ).reshape(shape)
            out[vname] = (vdims, vattrs, arr.copy())
    elif tag != 0:
        raise ValueError(f"bad var list tag {tag:#x}")
    return dims, gatts, out
