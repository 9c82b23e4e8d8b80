"""Pure-python DAP2 (OPeNDAP) client for the ingest path — the sixth and
last micro-backend: a real wire-format parser for the protocol the
reference reads grids over (xarray/pydap → OPeNDAP), so
``make_opendap_fetcher`` runs against REAL .dods bytes with no xarray,
netCDF4, or pydap installed.

Implements the public DAP 2.0 spec (ESE-RFC-004 / the OPeNDAP "Data
Access Protocol" specification):

- ``.dods`` response = DDS text header, the literal ``\\nData:\\n``
  separator, then XDR-encoded values (big-endian; every array prefixed by
  its element count TWICE as u32; Float32/Int32 4 B, Float64 8 B);
- DDS grammar subset: ``Dataset { ... } name;`` containing Grid
  declarations (``Grid { ARRAY: <decl>; MAPS: <decl>...; } name;``) and
  plain typed arrays — the structures gridded-climate servers emit;
- ``.das`` attribute text for CF time decoding (``units "days since
  YYYY-MM-DD"`` / ``hours since``), the piece xarray gets from the DAS.

``open_dods(path_or_url)`` returns a MicroDataset exposing exactly the
xarray sub-API the fetcher uses — ``isel``, ``sel`` (inclusive label
slices, string dates on decoded time), ``__getitem__().to_dataframe()``
— so ``make_opendap_fetcher(catalog_rec, open_dataset=open_dods)`` is the
REAL ingest path end-to-end (reference parity: etl.py:273-281 drives
xarray the same way). Local paths serve spec-assembled test fixtures;
http(s) URLs fetch through urllib.
"""

from __future__ import annotations

import re
import struct
from datetime import date, datetime, timedelta

import numpy as np
import pandas as pd

__all__ = ["open_dods", "parse_dods", "parse_das", "MicroDataset"]

_XDR = {
    "float32": (">f4", 4),
    "float64": (">f8", 8),
    "int32": (">i4", 4),
    "uint32": (">u4", 4),
}

_DECL = re.compile(
    r"^(Float32|Float64|Int32|UInt32)\s+(\w+)((?:\[\w+\s*=\s*\d+\])+);$",
    re.IGNORECASE,
)
_DIM = re.compile(r"\[(\w+)\s*=\s*(\d+)\]")


def _parse_decl(line: str) -> tuple[str, str, list[tuple[str, int]]] | None:
    m = _DECL.match(line.strip())
    if not m:
        return None
    typ, name, dims_s = m.group(1).lower(), m.group(2), m.group(3)
    dims = [(d, int(n)) for d, n in _DIM.findall(dims_s)]
    return typ, name, dims


def _parse_dds(text: str) -> list[tuple[str, str, list[tuple[str, int]]]]:
    """Flat declaration list in XDR serialization order: for a Grid the
    ARRAY decl first, then each MAP decl (DAP2 serializes grids that
    way); plain array decls appear where they stand."""
    decls: list[tuple[str, str, list[tuple[str, int]]]] = []
    lines = [ln.strip() for ln in text.splitlines()]
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("Grid {"):
            i += 1
            grid: list[tuple[str, str, list[tuple[str, int]]]] = []
            section = None
            while i < len(lines) and not lines[i].startswith("}"):
                if lines[i].upper().startswith("ARRAY"):
                    section = "array"
                elif lines[i].upper().startswith("MAPS"):
                    section = "maps"
                else:
                    d = _parse_decl(lines[i])
                    if d is not None:
                        if section == "array":
                            grid.insert(0, d)
                        else:
                            grid.append(d)
                i += 1
            decls.extend(grid)
        else:
            d = _parse_decl(ln)
            if d is not None:
                decls.append(d)
        i += 1
    return decls


def parse_das(text: str) -> dict[str, dict[str, str]]:
    """{var: {attr: value}} for String attributes — enough for CF
    ``units``. DAS blocks look like ``varname { String units "..."; }``."""
    out: dict[str, dict[str, str]] = {}
    cur: str | None = None
    for ln in text.splitlines():
        s = ln.strip()
        m = re.match(r"^(\w+)\s*\{$", s)
        if m and m.group(1).lower() != "attributes":
            cur = m.group(1)
            out.setdefault(cur, {})
            continue
        if s.startswith("}"):
            cur = None
            continue
        m = re.match(r'^String\s+(\w+)\s+"(.*)";$', s)
        if m and cur is not None:
            out[cur][m.group(1)] = m.group(2)
    return out


_SINCE = re.compile(
    r"^(days|hours)\s+since\s+(\d{4})-(\d{1,2})-(\d{1,2})", re.IGNORECASE
)


def _decode_time(values: np.ndarray, units: str) -> np.ndarray | None:
    m = _SINCE.match(units.strip())
    if not m:
        return None
    unit = m.group(1).lower()
    # decode to full datetimes (NOT dates): date + timedelta would discard
    # sub-day components, collapsing 6-hourly coords (0,6,12,18h) onto
    # duplicate day labels — diverging from the xarray path's datetime64
    # coords and making inclusive sel() slices ambiguous (ADVICE r6). The
    # fetcher's pd.to_datetime(...).dt.date still does any day collapse.
    epoch = datetime(int(m.group(2)), int(m.group(3)), int(m.group(4)))
    scale = 1.0 if unit == "days" else 1.0 / 24.0
    return np.array(
        [epoch + timedelta(days=float(v) * scale) for v in values], dtype=object
    )


class _VarView:
    def __init__(self, ds: MicroDataset, name: str):
        self._ds, self._name = ds, name

    def to_dataframe(self) -> pd.DataFrame:
        ds, name = self._ds, self._name
        dims = ds.dims_of[name]
        idx = pd.MultiIndex.from_product(
            [ds.coords[d] for d in dims], names=dims
        )
        return pd.DataFrame(
            {name: ds.arrays[name].reshape(-1)}, index=idx
        )


class MicroDataset:
    """The xarray sub-API make_opendap_fetcher drives: isel / sel /
    ``ds[var].to_dataframe()``."""

    def __init__(
        self,
        arrays: dict[str, np.ndarray],
        dims_of: dict[str, list[str]],
        coords: dict[str, np.ndarray],
    ):
        self.arrays = arrays
        self.dims_of = dims_of
        self.coords = coords

    def _slice(self, dim_slices: dict[str, slice]) -> MicroDataset:
        coords = dict(self.coords)
        for d, sl in dim_slices.items():
            coords[d] = self.coords[d][sl]
        arrays = {}
        for name, arr in self.arrays.items():
            sel = tuple(
                dim_slices.get(d, slice(None)) for d in self.dims_of[name]
            )
            arrays[name] = arr[sel]
        return MicroDataset(arrays, self.dims_of, coords)

    def isel(self, indexers: dict[str, slice]) -> MicroDataset:
        return self._slice(indexers)

    def sel(self, indexers: dict[str, slice]) -> MicroDataset:
        """Inclusive label slices (the xarray convention). String labels
        compare against decoded datetime coords via ISO parsing; a
        date-only upper label includes the WHOLE day (xarray partial
        string indexing), so 6-hourly coords at 06/12/18h still fall
        inside `sel(time=slice("2020-01-01", "2020-01-05"))`."""
        dim_slices: dict[str, slice] = {}
        for d, sl in indexers.items():
            vals = self.coords[d]
            lo, hi = sl.start, sl.stop
            is_dt = len(vals) and isinstance(vals[0], date)
            hi_excl = None

            def _parse(label):
                full = datetime.fromisoformat(label)
                if isinstance(vals[0], datetime):
                    return full
                return full.date()

            if isinstance(lo, str) and is_dt:
                lo = _parse(lo)
            if isinstance(hi, str) and is_dt:
                if len(hi) <= 10 and isinstance(vals[0], datetime):
                    # date-only label on sub-daily coords: whole-day bound
                    hi_excl = _parse(hi) + timedelta(days=1)
                    hi = None
                else:
                    hi = _parse(hi)
            mask = np.ones(len(vals), dtype=bool)
            if lo is not None:
                mask &= np.array([v >= lo for v in vals])
            if hi is not None:
                mask &= np.array([v <= hi for v in vals])
            if hi_excl is not None:
                mask &= np.array([v < hi_excl for v in vals])
            nz = np.nonzero(mask)[0]
            if len(nz) == 0:
                dim_slices[d] = slice(0, 0)
            else:
                dim_slices[d] = slice(int(nz[0]), int(nz[-1]) + 1)
        return self._slice(dim_slices)

    def __getitem__(self, name: str) -> _VarView:
        return _VarView(self, name)


def parse_dods(payload: bytes, das_text: str = "") -> MicroDataset:
    sep = b"\nData:\n"
    cut = payload.find(sep)
    if cut < 0:
        raise ValueError("not a DAP2 .dods response (no Data: separator)")
    decls = _parse_dds(payload[:cut].decode("ascii"))
    buf = payload[cut + len(sep):]
    pos = 0
    arrays: dict[str, np.ndarray] = {}
    dims_of: dict[str, list[str]] = {}
    dim_len: dict[str, int] = {}
    for typ, name, dims in decls:
        dt, size = _XDR[typ]
        n = 1
        for d, ln in dims:
            n *= ln
            dim_len[d] = ln
        n1, n2 = struct.unpack_from(">II", buf, pos)
        if n1 != n or n2 != n:
            raise ValueError(
                f"XDR length prefix mismatch for {name}: header says {n1}/{n2},"
                f" DDS says {n}"
            )
        pos += 8
        arr = np.frombuffer(buf, dtype=dt, count=n, offset=pos)
        pos += n * size
        # native byte order: pandas index machinery rejects big-endian
        arr = arr.astype(np.dtype(dt).newbyteorder("="))
        arrays[name] = arr.reshape([ln for _d, ln in dims])
        dims_of[name] = [d for d, _ln in dims]
    # coordinate variables: 1-D arrays named after their dimension; dims
    # with no coordinate array get positional indexes (xarray convention)
    coords: dict[str, np.ndarray] = {}
    attrs = parse_das(das_text) if das_text else {}
    for d, ln in dim_len.items():
        if d in arrays and dims_of[d] == [d]:
            vals = arrays[d]
            units = attrs.get(d, {}).get("units", "")
            decoded = _decode_time(vals, units) if units else None
            coords[d] = decoded if decoded is not None else vals
        else:
            coords[d] = np.arange(ln)
    return MicroDataset(arrays, dims_of, coords)


def open_dods(path_or_url: str) -> MicroDataset:
    """Open a .dods resource (local file or http(s) URL); the sibling
    ``.das`` is read when present for CF time decoding."""
    if path_or_url.startswith(("http://", "https://")):
        from urllib.request import urlopen  # pragma: no cover - network

        with urlopen(path_or_url) as r:
            payload = r.read()
        das = ""
        try:
            with urlopen(path_or_url.rsplit(".", 1)[0] + ".das") as r:
                das = r.read().decode("ascii")
        except Exception:  # noqa: BLE001 - DAS is optional
            das = ""
        return parse_dods(payload, das)
    payload = open(path_or_url, "rb").read()
    das = ""
    das_path = path_or_url.rsplit(".", 1)[0] + ".das"
    try:
        das = open(das_path, encoding="ascii").read()
    except OSError:
        das = ""
    return parse_dods(payload, das)
