"""Pure-python projected-CRS support for the bbox path — no pyproj.

Implements the two projections CONUS gridded-climate catalogs actually
use, from the public formulas in John P. Snyder, *Map Projections — A
Working Manual* (USGS Professional Paper 1395, 1987):

- Lambert Conformal Conic, 2 standard parallels, ellipsoidal
  (Snyder §15, eqs. 14-15, 15-1..15-11) — daymet/NLDAS-style grids;
- Albers Equal Area Conic, 2 standard parallels, ellipsoidal
  (Snyder §14, eqs. 14-1..14-21) — EPSG:5070 "NAD83 / Conus Albers".

Forward AND inverse, so tests can pin closed-loop roundtrips plus the
projection-defining invariants no wrong formula survives:

- LCC is conformal with true scale on both standard parallels → the
  local meridian/parallel scale factors are EQUAL everywhere (isotropy)
  and exactly 1 at lat_1/lat_2;
- AEA is equal-area → a small geographic quadrilateral's projected area
  equals its ellipsoidal area at any latitude;
- both: (lat_0, lon_0) maps exactly to (x_0, y_0).

Accepted CRS forms: proj4 strings (``+proj=lcc ... / +proj=aea ...``)
and the common CONUS EPSG code 5070. ``sources/readers.py`` /
``operators/bbox.py`` consult this module when pyproj is absent, the
same micro-backend pattern as shp_micro (shapefiles) and nc_micro
(NetCDF-3): real math behind the gate instead of a raise.

Reference parity: the reference calls ``gdf.to_crs(cat["crs"])``
(etl.py:322) through pyproj; this replays the same transform for the
grid CRSes the domain uses.
"""

from __future__ import annotations

import math

__all__ = ["parse_crs", "MicroProj", "supports"]

_ELLIPSOIDS = {
    # name: (a, 1/f); rf = 0 means sphere
    "grs80": (6378137.0, 298.257222101),
    "wgs84": (6378137.0, 298.257223563),
    "clrk66": (6378206.4, 294.9786982),  # Clarke 1866 (from a/b below)
    "sphere": (6370997.0, 0.0),
}
# Clarke 1866 is canonically given by a and b:
_CLRK66_A, _CLRK66_B = 6378206.4, 6356583.8

_EPSG = {
    # NAD83 / Conus Albers
    "5070": "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
    "+x_0=0 +y_0=0 +ellps=GRS80 +units=m +no_defs",
}


def _parse_proj4(crs: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for tok in crs.split():
        if not tok.startswith("+"):
            continue
        body = tok[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            out[k.lower()] = v
        else:
            out[body.lower()] = ""
    return out


def parse_crs(crs: str) -> dict[str, str] | None:
    """proj4 param dict for a supported CRS string, else None."""
    c = crs.strip()
    if c.lower().startswith("epsg:"):
        c = _EPSG.get(c.split(":", 1)[1].strip(), "")
        if not c:
            return None
    if "+proj=" not in c:
        return None
    params = _parse_proj4(c)
    if params.get("proj") not in ("lcc", "aea"):
        return None
    return params


def supports(crs: str | None) -> bool:
    return bool(crs) and parse_crs(str(crs)) is not None


def _ellipsoid(params: dict[str, str]) -> tuple[float, float]:
    """(a, e) from +a/+b, +a/+rf, +ellps, or +R."""
    if "r" in params:
        return float(params["r"]), 0.0
    if "a" in params:
        a = float(params["a"])
        if "b" in params:
            b = float(params["b"])
            e2 = 1.0 - (b * b) / (a * a)
        elif "rf" in params:
            f = 1.0 / float(params["rf"])
            e2 = f * (2.0 - f)
        else:
            e2 = 0.0
        return a, math.sqrt(e2)
    name = params.get("ellps", "wgs84").lower()
    if name == "clrk66":
        a, b = _CLRK66_A, _CLRK66_B
        return a, math.sqrt(1.0 - (b * b) / (a * a))
    a, rf = _ELLIPSOIDS.get(name, _ELLIPSOIDS["wgs84"])
    if rf == 0.0:
        return a, 0.0
    f = 1.0 / rf
    return a, math.sqrt(f * (2.0 - f))


class MicroProj:
    """Forward/inverse transformer lon/lat(deg) ↔ projected meters for one
    parsed LCC or AEA definition."""

    def __init__(self, crs: str):
        params = parse_crs(crs)
        if params is None:
            raise ValueError(f"unsupported CRS for proj_micro: {crs!r}")
        self.kind = params["proj"]
        self.a, self.e = _ellipsoid(params)
        g = lambda k, d=0.0: float(params.get(k, d))  # noqa: E731
        self.lat0 = math.radians(g("lat_0"))
        self.lon0 = math.radians(g("lon_0"))
        self.lat1 = math.radians(g("lat_1"))
        self.lat2 = math.radians(g("lat_2", math.degrees(self.lat1)))
        self.x0 = g("x_0")
        self.y0 = g("y_0")
        if self.kind == "lcc":
            self._setup_lcc()
        else:
            self._setup_aea()

    # Snyder eq. 14-15: m = cosφ / sqrt(1 − e² sin²φ)
    def _m(self, phi: float) -> float:
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1.0 - (self.e * s) ** 2)

    # Snyder eq. 15-9: t = tan(π/4 − φ/2) / [(1−e sinφ)/(1+e sinφ)]^(e/2)
    def _t(self, phi: float) -> float:
        s = self.e * math.sin(phi)
        return math.tan(math.pi / 4.0 - phi / 2.0) / (
            (1.0 - s) / (1.0 + s)
        ) ** (self.e / 2.0)

    # Snyder eq. 3-12: q = (1−e²)[ sinφ/(1−e²sin²φ) − (1/2e)·ln((1−e sinφ)/(1+e sinφ)) ]
    def _q(self, phi: float) -> float:
        s = math.sin(phi)
        if self.e == 0.0:
            return 2.0 * s
        es = self.e * s
        return (1.0 - self.e**2) * (
            s / (1.0 - es * es)
            - (1.0 / (2.0 * self.e)) * math.log((1.0 - es) / (1.0 + es))
        )

    def _setup_lcc(self) -> None:
        m1, m2 = self._m(self.lat1), self._m(self.lat2)
        t0, t1, t2 = self._t(self.lat0), self._t(self.lat1), self._t(self.lat2)
        if abs(self.lat1 - self.lat2) > 1e-12:
            self.n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        else:
            self.n = math.sin(self.lat1)
        self.f_ = m1 / (self.n * t1**self.n)  # Snyder 15-10
        self.rho0 = self.a * self.f_ * t0**self.n  # Snyder 15-7a

    def _setup_aea(self) -> None:
        m1, m2 = self._m(self.lat1), self._m(self.lat2)
        q0, q1, q2 = self._q(self.lat0), self._q(self.lat1), self._q(self.lat2)
        if abs(self.lat1 - self.lat2) > 1e-12:
            self.n = (m1 * m1 - m2 * m2) / (q2 - q1)  # Snyder 14-14
        else:
            self.n = math.sin(self.lat1)
        self.c_ = m1 * m1 + self.n * q1  # Snyder 14-13
        self.rho0 = self.a * math.sqrt(self.c_ - self.n * q0) / self.n  # 14-12a

    # -- forward ---------------------------------------------------------
    def forward(self, lon_deg: float, lat_deg: float) -> tuple[float, float]:
        lam = math.radians(lon_deg)
        phi = math.radians(lat_deg)
        dlam = math.remainder(lam - self.lon0, 2.0 * math.pi)
        if self.kind == "lcc":
            t = self._t(phi)
            rho = self.a * self.f_ * t**self.n  # Snyder 15-7
            theta = self.n * dlam  # 14-4
        else:
            q = self._q(phi)
            rho = self.a * math.sqrt(self.c_ - self.n * q) / self.n  # 14-12
            theta = self.n * dlam  # 14-4
        x = self.x0 + rho * math.sin(theta)  # 14-1
        y = self.y0 + self.rho0 - rho * math.cos(theta)  # 14-2
        return x, y

    # -- inverse ---------------------------------------------------------
    def inverse(self, x: float, y: float) -> tuple[float, float]:
        dx = x - self.x0
        dy = self.rho0 - (y - self.y0)
        rho = math.hypot(dx, dy)
        if self.n < 0:
            rho, dx, dy = -rho, -dx, -dy
        theta = math.atan2(dx, dy)
        lam = self.lon0 + theta / self.n
        if self.kind == "lcc":
            t = (rho / (self.a * self.f_)) ** (1.0 / self.n)  # Snyder 15-11
            phi = math.pi / 2.0 - 2.0 * math.atan(t)  # sphere seed (7-13)
            for _ in range(12):  # Snyder 7-9 iteration
                s = self.e * math.sin(phi)
                phi = math.pi / 2.0 - 2.0 * math.atan(
                    t * ((1.0 - s) / (1.0 + s)) ** (self.e / 2.0)
                )
        else:
            q = (self.c_ - (rho * self.n / self.a) ** 2) / self.n  # 14-19
            if self.e == 0.0:
                phi = math.asin(q / 2.0)
            else:
                qp = self._q(math.pi / 2.0)
                ratio = max(-1.0, min(1.0, q / qp))
                phi = math.asin(ratio)  # seed
                for _ in range(12):  # Snyder 3-16 iteration
                    s = math.sin(phi)
                    es = self.e * s
                    phi = phi + (1.0 - es * es) ** 2 / (
                        2.0 * math.cos(phi)
                    ) * (
                        q / (1.0 - self.e**2)
                        - s / (1.0 - es * es)
                        + (1.0 / (2.0 * self.e))
                        * math.log((1.0 - es) / (1.0 + es))
                    )
        return math.degrees(lam), math.degrees(phi)
