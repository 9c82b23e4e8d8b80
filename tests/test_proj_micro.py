"""Pure-python LCC/Albers projections (sources/proj_micro.py).

Golden values are the NUMERIC EXAMPLES published in Snyder, *Map
Projections — A Working Manual* (USGS PP 1395, 1987), Appendix A —
an independent implementation of the same public formulas, so writer and
spec check each other (the nc_micro/shp_micro discipline). The invariant
tests pin the properties that DEFINE each projection; no wrong formula
passes them by accident."""

import math

import pytest

from gridmet_etl_spark.sources.proj_micro import MicroProj, parse_crs, supports

_AEA_CLRK = (
    "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
    "+x_0=0 +y_0=0 +ellps=clrk66"
)
_LCC_CLRK = (
    "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 "
    "+x_0=0 +y_0=0 +ellps=clrk66"
)


def test_snyder_pp1395_albers_example():
    """Snyder PP1395 Albers ellipsoidal example (Clarke 1866, φ=35°,
    λ=−75°): x = 1,885,472.7 m, y = 1,535,925.0 m."""
    x, y = MicroProj(_AEA_CLRK).forward(-75.0, 35.0)
    assert abs(x - 1885472.7) < 0.1
    assert abs(y - 1535925.0) < 0.1


def test_snyder_pp1395_lcc_example():
    """Snyder PP1395 LCC ellipsoidal example (Clarke 1866, φ=35°,
    λ=−75°): x = 1,894,410.9 m, y = 1,564,649.5 m."""
    x, y = MicroProj(_LCC_CLRK).forward(-75.0, 35.0)
    assert abs(x - 1894410.9) < 0.1
    assert abs(y - 1564649.5) < 0.1


def test_origin_maps_to_false_origin_and_roundtrip():
    for crs in (_AEA_CLRK, _LCC_CLRK, "EPSG:5070"):
        p = MicroProj(crs)
        x, y = p.forward(math.degrees(p.lon0), math.degrees(p.lat0))
        assert abs(x - p.x0) < 1e-6 and abs(y - p.y0) < 1e-6
        for lon, lat in ((-120.3, 48.7), (-96.0, 23.0), (-71.1, 26.2)):
            lon2, lat2 = p.inverse(*p.forward(lon, lat))
            assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-7


def _ellipsoidal_quad_area(p, lon, lat, d):
    """Ellipsoidal area of a small lon/lat quad ≈ M·N·cosφ·dλ·dφ with
    M, N the meridional / prime-vertical radii — exact enough at d=1e-3°
    to pin the equal-area property to 1e-6 relative."""
    a, e = p.a, p.e
    phi = math.radians(lat)
    s2 = (e * math.sin(phi)) ** 2
    m_rad = a * (1 - e * e) / (1 - s2) ** 1.5
    n_rad = a / math.sqrt(1 - s2)
    return m_rad * n_rad * math.cos(phi) * math.radians(d) ** 2


def test_albers_is_equal_area_everywhere():
    """The defining invariant: projected quad area == ellipsoidal quad
    area at latitudes far from the standard parallels."""
    p = MicroProj("EPSG:5070")
    d = 1e-3
    for lon, lat in ((-120.0, 32.0), (-96.0, 23.0), (-80.0, 48.0), (-104.0, 39.7)):
        quad = [
            p.forward(lon, lat),
            p.forward(lon + d, lat),
            p.forward(lon + d, lat + d),
            p.forward(lon, lat + d),
        ]
        proj_area = 0.0  # shoelace
        for (x1, y1), (x2, y2) in zip(quad, quad[1:] + quad[:1]):
            proj_area += x1 * y2 - x2 * y1
        proj_area = abs(proj_area) / 2.0
        true_area = _ellipsoidal_quad_area(p, lon, lat + d / 2, d)
        assert abs(proj_area / true_area - 1.0) < 1e-5


def test_lcc_is_conformal_with_unit_scale_on_parallels():
    """The defining invariants: meridian scale == parallel scale at any
    point (isotropy ⇒ angles preserved), and scale == 1 exactly on both
    standard parallels."""
    p = MicroProj(_LCC_CLRK)
    d = 1e-5

    def scales(lon, lat):
        x0, y0 = p.forward(lon, lat)
        xe, ye = p.forward(lon + d, lat)
        xn, yn = p.forward(lon, lat + d)
        phi = math.radians(lat)
        s2 = (p.e * math.sin(phi)) ** 2
        m_rad = p.a * (1 - p.e**2) / (1 - s2) ** 1.5
        n_rad = p.a / math.sqrt(1 - s2)
        h = math.hypot(xn - x0, yn - y0) / (m_rad * math.radians(d))
        k = math.hypot(xe - x0, ye - y0) / (n_rad * math.cos(phi) * math.radians(d))
        return h, k

    for lon, lat in ((-96.0, 30.0), (-120.0, 44.0), (-75.0, 35.0)):
        h, k = scales(lon, lat)
        assert abs(h / k - 1.0) < 1e-6  # conformal: isotropic local scale
    for lat in (33.0, 45.0):  # true scale on the standard parallels
        h, k = scales(-100.0, lat)
        assert abs(k - 1.0) < 1e-6


def test_parse_and_supports():
    assert supports("EPSG:5070")
    assert supports(_LCC_CLRK)
    assert not supports("EPSG:4326")
    assert not supports("+proj=utm +zone=10")
    assert parse_crs("+proj=longlat +datum=WGS84") is None


def test_project_bounds_falls_back_to_proj_micro(monkeypatch):
    """The F10 path end-to-end without pyproj: projected-CRS catalog
    bounds reproject through proj_micro instead of raising; unsupported
    projected CRSes still raise actionably."""
    import builtins

    from gridmet_etl_spark.operators import bbox as B

    real_import = builtins.__import__

    def no_pyproj(name, *a, **kw):
        if name == "pyproj":
            raise ImportError("pyproj disabled for test")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_pyproj)
    bounds = {"minx": -105.0, "maxx": -104.0, "miny": 39.0, "maxy": 40.0}
    out = B.project_bounds(bounds, "EPSG:5070")
    p = MicroProj("EPSG:5070")
    exp_sw = p.forward(-105.0, 39.0)
    assert out["minx"] <= exp_sw[0] <= out["maxx"]
    assert out["miny"] <= exp_sw[1] <= out["maxy"]
    assert out["maxx"] - out["minx"] > 50_000  # ~1 degree of meters
    with pytest.raises(ValueError, match="proj_micro does not recognize"):
        B.project_bounds(bounds, "+proj=utm +zone=13 +datum=NAD83")
    # geographic CRS stays identity without pyproj
    assert B.project_bounds(bounds, "EPSG:4326") == bounds
