"""CFSv2 twin of the real-data golden (VERDICT r7 item 3, "and the cfsv2
twin"): both forecast pipelines run over the reference's real
cfsv2_nhru01a_weights.csv × a deterministic synthetic ensemble grid on
the weights' (i,j) domain, checked per-HRU against an independent
numpy/pandas implementation of the whole chain (weighted mean / exact
ensemble median → K→°C → the helper.py:204-227 RH physics), and the
NetCDF export structurally asserted against cfsv2_median_header.md
(julian calendar, per-var units/long_name, sentinel fill)."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

CFSV2_CSV = "/root/reference/data/nhru_01a/cfsv2_nhru01a_weights.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CFSV2_CSV), reason="reference data not mounted"
)

_VARS = ["tmmx", "tmmn", "pr", "sph"]
_BASE = {"tmmx": 280.0, "tmmn": 260.0, "pr": 0.0, "sph": 0.0}
_SCALE = {"tmmx": 10.0, "tmmn": 10.0, "pr": 10.0, "sph": 100000.0}
_N_DAYS = 3
_N_ENS = 4


def _val(i, j, di, vi, e, var):
    raw = (i * 31 + j * 17 + di * 7 + vi * 13 + e * 29) % 1000
    return raw / _SCALE[var] + _BASE[var]


@pytest.fixture(scope="module")
def wpdf():
    return pd.read_csv(CFSV2_CSV)


@pytest.fixture(scope="module")
def grid_ens_pdf(wpdf):
    cells = wpdf[["i", "j"]].drop_duplicates().reset_index(drop=True)
    frames = []
    for vi, var in enumerate(_VARS):
        for di in range(_N_DAYS):
            for e in range(_N_ENS):
                f = cells.copy()
                f["var"] = var
                f["ens"] = e
                f["time"] = pd.Timestamp("2024-04-01") + pd.Timedelta(days=di)
                f["lat"] = 49.0 - f["i"] * 0.04167
                f["lon"] = -125.0 + f["j"] * 0.04167
                f["value"] = _val(
                    f["i"].to_numpy(), f["j"].to_numpy(), di, vi, e, var
                )
                frames.append(f)
    out = pd.concat(frames, ignore_index=True)
    out["time"] = out["time"].dt.date
    return out


def _elev_pdf(wpdf):
    fids = np.sort(wpdf["nhru_v1_1"].unique())
    return pd.DataFrame(
        {"feature_id": fids, "hru_elev": (fids % 400) * 5.0}
    )


def _np_rh(tmmx_k, tmmn_k, sph, elev):
    t_avg = (tmmx_k + tmmn_k) / 2.0
    p = 1013.25 * np.exp(-9.80665 * elev / (287.05 * t_avg))
    e = sph * p / 0.622
    tc = t_avg - 273.15
    svp = 6.1094 * np.exp(17.625 * tc / (tc + 243.04))
    return e / svp * 100.0


def _np_weighted(wpdf, values_per_cell):
    """values_per_cell: callable (i, j) arrays -> value array; returns
    per-HRU Series of sum(w*v)/sum(w)."""
    v = values_per_cell(wpdf["i"].to_numpy(), wpdf["j"].to_numpy())
    g = pd.DataFrame(
        {"fid": wpdf["nhru_v1_1"], "num": wpdf["wght"].to_numpy() * v,
         "den": wpdf["wght"]}
    ).groupby("fid").sum()
    return g["num"] / g["den"]


def test_cfsv2_ensemble_pipeline_real_weights_numpy_golden(
    spark, wpdf, grid_ens_pdf
):
    from gridmet_etl_spark.plans.cfsv2 import cfsv2_ensemble_pipeline
    from gridmet_etl_spark.sources.readers import read_weights_csv

    weights = read_weights_csv(spark, CFSV2_CSV, fid_col="nhru_v1_1")
    grid = spark.createDataFrame(grid_ens_pdf)
    elev = spark.createDataFrame(_elev_pdf(wpdf))
    out = cfsv2_ensemble_pipeline(grid, weights, elev)
    pdf = out.toPandas()
    assert len(pdf) == 2462 * _N_DAYS * _N_ENS

    # spot-check golden on a deterministic (day, ens) slice
    di, e = 1, 2
    day = pd.Timestamp("2024-04-01").date() + pd.Timedelta(days=di)
    sl = pdf[(pdf["time"] == day) & (pdf["ens"] == e)].set_index("feature_id")
    wm = {
        var: _np_weighted(
            wpdf, lambda i, j, vi=vi, var=var: _val(i, j, di, vi, e, var)
        )
        for vi, var in enumerate(_VARS)
    }
    elev_s = _elev_pdf(wpdf).set_index("feature_id")["hru_elev"]
    np.testing.assert_allclose(
        sl["tmax"].sort_index(), wm["tmmx"].sort_index() - 273.15, rtol=1e-9
    )
    np.testing.assert_allclose(
        sl["tmin"].sort_index(), wm["tmmn"].sort_index() - 273.15, rtol=1e-9
    )
    np.testing.assert_allclose(
        sl["prcp"].sort_index(), wm["pr"].sort_index(), rtol=1e-9
    )
    rh = _np_rh(
        wm["tmmx"].sort_index().to_numpy(),
        wm["tmmn"].sort_index().to_numpy(),
        wm["sph"].sort_index().to_numpy(),
        elev_s.sort_index().to_numpy(),
    )
    np.testing.assert_allclose(sl["humidity"].sort_index(), rh, rtol=1e-7)


def test_cfsv2_median_pipeline_real_weights_numpy_golden_and_header(
    spark, wpdf, grid_ens_pdf, tmp_path
):
    """Method 1: exact per-cell ensemble median FIRST (median and
    weighted mean do not commute), then the weighted aggregation; export
    asserted against cfsv2_median_header.md structure (julian calendar,
    tmax/tmin/prcp units, sentinel fill, nhru=2462)."""
    from gridmet_etl_spark.plans.cfsv2 import cfsv2_median_pipeline
    from gridmet_etl_spark.sources.nc_micro import read_netcdf3
    from gridmet_etl_spark.sources.readers import read_weights_csv
    from gridmet_etl_spark.sources.writers import export_netcdf

    weights = read_weights_csv(spark, CFSV2_CSV, fid_col="nhru_v1_1")
    grid = spark.createDataFrame(grid_ens_pdf)
    elev = spark.createDataFrame(_elev_pdf(wpdf))
    out = cfsv2_median_pipeline(grid, weights, elev)
    pdf = out.toPandas()
    assert len(pdf) == 2462 * _N_DAYS

    di = 0
    day = pd.Timestamp("2024-04-01").date()
    sl = pdf[pdf["time"] == day].set_index("feature_id")

    def med(var, vi):
        def f(i, j):
            vals = np.stack(
                [_val(i, j, di, vi, e, var) for e in range(_N_ENS)]
            )
            return np.median(vals, axis=0)

        return _np_weighted(wpdf, f)

    np.testing.assert_allclose(
        sl["tmax"].sort_index(), med("tmmx", 0).sort_index() - 273.15,
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        sl["prcp"].sort_index(), med("pr", 2).sort_index(), rtol=1e-9
    )

    # header parity (cfsv2_median_header.md:7-44): julian calendar,
    # per-var units/long_name, sentinel fill, nhru=2462
    path = str(tmp_path / "cfsv2_median.nc")
    export_netcdf(out, path, calendar="julian")
    dims, gatts, variables = read_netcdf3(path)
    assert dims == {"time": _N_DAYS, "nhru": 2462}
    assert variables["time"][1]["calendar"] == "julian"
    expected = {
        "tmax": ("tmmx", "degree_Celsius"),
        "tmin": ("tmmn", "degree_Celsius"),
        "prcp": ("pr", "millimeter"),
    }
    for name, (long_name, units) in expected.items():
        _dims, attrs, arr = variables[name]
        assert _dims == ["time", "nhru"]
        assert attrs["long_name"] == long_name and attrs["units"] == units
        assert attrs["_FillValue"] == pytest.approx(9.96920996838687e36)


def test_cfsv2_ensemble_header_parity(spark, wpdf, grid_ens_pdf, tmp_path):
    """Method 2 per-member export asserted against the published
    cfsv2_ensemble_header.md (VERDICT r7 item 4): each member file carries
    dims (time, nhru=2462), tmax/tmin/prcp(time, nhru) with the gridMET
    long_name/units pairs and the 9.96920996838687e+36 fill sentinel,
    julian calendar, CF-1.8 — plus the SCALAR `ens` member-id variable
    (cfsv2_ensemble_header.md:55 `int64 ens ;`; the reference builds the
    concat dim="ens" cube, etl.py:355-357, then writes one file per
    member). Classic-container divergence: ens exports as i4 like nhru
    (NetCDF-3 has no 64-bit int; documented in writers.py)."""
    from gridmet_etl_spark.plans.cfsv2 import cfsv2_ensemble_pipeline
    from gridmet_etl_spark.sources.nc_micro import read_netcdf3
    from gridmet_etl_spark.sources.readers import read_weights_csv
    from gridmet_etl_spark.sources.writers import export_netcdf

    weights = read_weights_csv(spark, CFSV2_CSV, fid_col="nhru_v1_1")
    grid = spark.createDataFrame(grid_ens_pdf)
    elev = spark.createDataFrame(_elev_pdf(wpdf))
    out = cfsv2_ensemble_pipeline(grid, weights, elev)

    # unfiltered multi-member frame must refuse the flat export loudly
    with pytest.raises(ValueError, match="ens"):
        export_netcdf(out, str(tmp_path / "bad.nc"), calendar="julian")

    for member in (0, _N_ENS - 1):
        path = str(tmp_path / f"cfsv2_ens_{member}.nc")
        export_netcdf(
            out.filter(F.col("ens") == member), path, calendar="julian"
        )
        dims, gatts, variables = read_netcdf3(path)
        assert dims == {"time": _N_DAYS, "nhru": 2462}
        assert gatts["Conventions"] == "CF-1.8"
        assert gatts["featureType"] == "timeSeries"
        assert variables["time"][1]["calendar"] == "julian"
        # scalar per-member coordinate (cfsv2_ensemble_header.md:55)
        ens_dims, _ens_attrs, ens_arr = variables["ens"]
        assert ens_dims == []
        assert int(ens_arr) == member
        expected = {
            "tmax": ("tmmx", "degree_Celsius"),
            "tmin": ("tmmn", "degree_Celsius"),
            "prcp": ("pr", "millimeter"),
        }
        for name, (long_name, units) in expected.items():
            vdims, attrs, arr = variables[name]
            assert vdims == ["time", "nhru"]
            assert attrs["long_name"] == long_name and attrs["units"] == units
            assert attrs["_FillValue"] == pytest.approx(9.96920996838687e36)
            assert arr.shape == (_N_DAYS, 2462)
