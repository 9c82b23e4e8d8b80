"""CLI end-to-end runs, writer layout/sidecar, ingest-job plumbing with an
injected synthetic fetcher, real-bytes NetCDF export."""

import json
import os
import datetime as dt
from datetime import date

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.cli import main, valid_date
from gridmet_etl_spark.sources.ingest import TASK_SCHEMA, build_slice_tasks, fetch_grid, ingest_to_parquet
from gridmet_etl_spark.sources.writers import export_netcdf, write_output


def test_valid_date():
    import argparse

    assert valid_date("1980-01-01") == "1980-01-01"
    with pytest.raises(argparse.ArgumentTypeError):
        valid_date("01/01/1980")


def test_cli_gridmet_end_to_end(spark, fixdir, tmp_path):
    rc = main(
        [
            "gridmet-etl",
            "--grid", os.path.join(fixdir, "grid.parquet"),
            "--weights", os.path.join(fixdir, "weights.parquet"),
            "--features", os.path.join(fixdir, "features.parquet"),
            "--start-date", "1980-01-01",
            "--end-date", "1980-01-07",
            "--partial",
            "--fill-missing",
            "--out", str(tmp_path),
        ]
    )
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "converted"))
    assert out.count() == 50 * 7  # all features incl. filled, all days
    sidecar = json.load(open(tmp_path / "converted_attrs.json"))
    assert sidecar["variables"]["tmax"]["units"] == "degree_Celsius"
    assert sidecar["Conventions"] == "CF-1.8"


def test_cli_cfsv2_method2_partitioned(spark, fixdir, tmp_path):
    rc = main(
        [
            "cfsv2-etl",
            "--grid-ens", os.path.join(fixdir, "grid_ens.parquet"),
            "--weights", os.path.join(fixdir, "weights_ens.parquet"),
            "--elevation", os.path.join(fixdir, "myparam.param"),
            "--method", "2",
            "--out", str(tmp_path),
        ]
    )
    assert rc == 0
    out_dir = tmp_path / "converted_ensemble"
    assert any(p.name.startswith("ens=") for p in out_dir.iterdir())  # K4 per-member layout
    out = spark.read.parquet(str(out_dir))
    assert out.select("ens").distinct().count() == 48


def test_cli_elevation_from_prms(spark, fixdir, tmp_path):
    """--elevation accepts the raw PRMS param file (S7 parse path)."""
    rc = main(
        [
            "cfsv2-etl",
            "--grid-ens", os.path.join(fixdir, "grid_ens.parquet"),
            "--weights", os.path.join(fixdir, "weights_ens.parquet"),
            "--elevation", os.path.join(fixdir, "myparam.param"),
            "--method", "1",
            "--out", str(tmp_path),
        ]
    )
    assert rc == 0
    assert (tmp_path / "converted_median").exists()


def test_cli_run_date_partition(spark, fixdir, tmp_path):
    """T3: --run-date lands the forecast snapshot under run_date=<d>/."""
    rc = main(
        [
            "cfsv2-etl",
            "--grid-ens", os.path.join(fixdir, "grid_ens.parquet"),
            "--weights", os.path.join(fixdir, "weights_ens.parquet"),
            "--elevation", os.path.join(fixdir, "elevation.parquet"),
            "--method", "2",
            "--run-date", "2024-06-01",
            "--out", str(tmp_path),
        ]
    )
    assert rc == 0
    base = tmp_path / "converted_ensemble" / "run_date=2024-06-01"
    assert base.exists()
    assert any(p.name.startswith("ens=") for p in base.iterdir())


def test_netcdf_export_real_bytes_no_injection(spark, tmp_path):
    """export_netcdf produces a REAL netCDF file in every environment:
    NETCDF4 via xarray when importable, else NetCDF-3 classic via the
    pure-python micro-writer — never a NotImplementedError gate. Verified
    by re-reading the classic bytes and checking values, fill cells, CF
    time encoding and the calendar attribute."""
    import numpy as np

    from gridmet_etl_spark.schemas import NETCDF_FILL_VALUE
    from gridmet_etl_spark.sources.nc_micro import read_netcdf3
    from gridmet_etl_spark.sources.writers import export_netcdf_classic

    rows = [
        (1, dt.date(2024, 6, 1), 20.5),
        (1, dt.date(2024, 6, 2), 21.0),
        (2, dt.date(2024, 6, 1), 18.25),
        # (2, 2024-06-02) missing -> must export as the CF fill value
    ]
    df = spark.createDataFrame(rows, ["feature_id", "time", "tmax"])
    path = str(tmp_path / "extract.nc")
    out = export_netcdf(df, path)  # xarray absent here -> classic fallback
    assert out == path
    assert open(path, "rb").read(4) == b"CDF\x01"
    dims, gatts, data = read_netcdf3(path)
    assert dims == {"time": 2, "nhru": 2}
    assert gatts["Conventions"] == "CF-1.8"
    tdims, tattrs, tvals = data["time"]
    assert tattrs["units"].startswith("days since 1970-01-01")
    assert "calendar" in tattrs
    assert list(tvals) == [
        (dt.date(2024, 6, 1) - dt.date(1970, 1, 1)).days,
        (dt.date(2024, 6, 2) - dt.date(1970, 1, 1)).days,
    ]
    vdims, vattrs, grid = data["tmax"]
    assert vdims == ["time", "nhru"]
    assert vattrs["_FillValue"] == NETCDF_FILL_VALUE
    assert grid[0, 0] == 20.5 and grid[1, 0] == 21.0 and grid[0, 1] == 18.25
    assert grid[1, 1] == NETCDF_FILL_VALUE
    # explicit-classic entry point writes the same bytes
    p2 = str(tmp_path / "extract2.nc")
    export_netcdf_classic(df, p2)
    assert open(p2, "rb").read() == open(path, "rb").read()
    assert np.asarray(data["nhru"][2]).tolist() == [1, 2]


def _make_synthetic_fetcher():
    """Returns a closure (serialized by value, so executors don't need to
    import this test module). value = i*1000 + j + day ordinal % 100."""

    def fetcher(task: dict) -> pd.DataFrame:
        import pandas as _pd

        days = _pd.date_range(task["t0"], task["t1"], freq="D").date
        rows = []
        for d in days:
            for i in range(task["i0"], task["i1"] + 1):
                for j in range(task["j0"], task["j1"] + 1):
                    rows.append(
                        (task["var"], -1, d, i, j, 49.4 - i * 0.04167, -124.8 + j * 0.04167,
                         float(i * 1000 + j) + d.toordinal() % 100)
                    )
        return _pd.DataFrame(
            rows, columns=["var", "ens", "time", "i", "j", "lat", "lon", "value"]
        )

    return fetcher


def test_ingest_job_plumbing(spark, tmp_path):
    recs = [
        {"URL": "http://example/tmmx", "variable": "tmmx"},
        {"URL": "http://example/pr", "variable": "pr"},
    ]
    tasks = build_slice_tasks(
        spark, recs, date(1980, 1, 1), date(1980, 1, 10),
        bbox_cells=(0, 9, 0, 9), days_per_task=5, tile_cells=5,
    )
    # 2 vars × 2 time windows × 2×2 tiles = 16 tasks
    assert tasks.count() == 16
    fetcher = _make_synthetic_fetcher()
    grid = fetch_grid(tasks, fetcher)
    assert grid.count() == 2 * 10 * 10 * 10  # vars × days × cells
    # landing layout partitioned by var/time → partition pruning downstream
    landing = str(tmp_path / "landing")
    ingest_to_parquet(tasks, fetcher, landing)
    assert os.path.exists(os.path.join(landing, "var=tmmx"))
    back = spark.read.parquet(landing)
    assert back.filter((F.col("var") == "pr") & (F.col("i") == 3) & (F.col("j") == 4)).count() == 10
    v = back.filter(
        (F.col("var") == "pr") & (F.col("i") == 3) & (F.col("j") == 4)
    ).orderBy("time").collect()[0]
    assert v.value == pytest.approx(3004.0 + date(1980, 1, 1).toordinal() % 100)


def test_ingest_append_batches_equal_one_shot(spark, tmp_path):
    """Variable-batched landing (mode='append', the single-box scratch-disk
    accommodation tools/ingest_stress.py --batch-vars uses) produces the
    same table as the one-DAG one-shot."""
    recs = [
        {"URL": "http://example/tmmx", "variable": "tmmx"},
        {"URL": "http://example/pr", "variable": "pr"},
    ]
    fetcher = _make_synthetic_fetcher()
    kw = dict(bbox_cells=(0, 9, 0, 9), days_per_task=5, tile_cells=5)
    one = str(tmp_path / "one")
    ingest_to_parquet(
        build_slice_tasks(spark, recs, date(1980, 1, 1), date(1980, 1, 10), **kw),
        fetcher, one,
    )
    batched = str(tmp_path / "batched")
    for bi, rec in enumerate(recs):
        ingest_to_parquet(
            build_slice_tasks(spark, [rec], date(1980, 1, 1), date(1980, 1, 10), **kw),
            fetcher, batched, mode="overwrite" if bi == 0 else "append",
        )
    a = spark.read.parquet(one)
    b = spark.read.parquet(batched)
    assert a.count() == b.count() == 2 * 10 * 10 * 10
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_cli_corpus_etl_end_to_end(spark, tmp_path):
    docs_path, bench_path, out = str(tmp_path / "docs"), str(tmp_path / "bench"), str(tmp_path / "out")
    rows = [(i, f"document number {i} body text") for i in range(40)]
    rows.append((50, "document number 7 body text"))  # exact dup of doc 7
    rows.append((51, "held out benchmark prompt"))
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(docs_path)
    spark.createDataFrame(
        [(900, "HELD OUT benchmark prompt")], ["doc_id", "text"]
    ).write.parquet(bench_path)
    rc = main([
        "corpus-etl", "--docs", docs_path, "--benchmark", bench_path,
        "--budget", "40", "--out", out,
    ])
    assert rc == 0
    got = spark.read.parquet(out)
    ids = {r.doc_id for r in got.collect()}
    assert 50 not in ids and 51 not in ids and 7 in ids and len(ids) == 40
    # split-partitioned layout on disk
    assert any(d.startswith("split=") for d in os.listdir(out))
    train = got.filter(F.col("split") == "train")
    assert train.filter(F.col("shard").isNull()).count() == 0


def _make_fake_open_dataset():
    """url -> duck-typed stand-in for the xarray Dataset API surface the
    production fetcher drives (positional isel, label sel on time, variable
    selection, to_dataframe). Defined inside a factory so cloudpickle ships
    it by value to executors. Grid: 20x20, lat DESCENDING from Y1=49.4
    (toptobottom false), days 1980-01-01..06, value = i*1000 + j + day_idx;
    cell (i=3, j=2) is NaN on the second day."""
    import numpy as _np
    import pandas as _pd

    RES, Y1, X1 = 0.04167, 49.4, -124.76667

    class _FakeVar:
        def __init__(self, df, var):
            self._df, self._var = df, var

        def to_dataframe(self):
            return self._df[["day", "latitude", "longitude", self._var]].set_index(
                ["day", "latitude", "longitude"]
            )

    class _FakeDs:
        def __init__(self, df, coords):
            self._df, self._coords = df, coords

        def isel(self, indexers):
            df = self._df
            for dim, slc in indexers.items():
                keep = set(self._coords[dim][slc])
                df = df[df[dim].isin(keep)]
            return _FakeDs(df, self._coords)

        def sel(self, indexers):
            df = self._df
            for dim, slc in indexers.items():
                lo, hi = _pd.Timestamp(slc.start), _pd.Timestamp(slc.stop)
                df = df[(df[dim] >= lo) & (df[dim] <= hi)]
            return _FakeDs(df, self._coords)

        def __getitem__(self, var):
            return _FakeVar(self._df, var)

    def open_dataset(url):
        days = _pd.date_range("1980-01-01", "1980-01-06", freq="D")
        lats = Y1 - RES * _np.arange(20)  # storage row 0 = north edge
        lons = X1 + RES * _np.arange(20)
        recs = []
        for d_idx, d in enumerate(days):
            for i, la in enumerate(lats):
                for j, lo in enumerate(lons):
                    v = float(i * 1000 + j + d_idx)
                    if (i, j) == (3, 2) and d_idx == 2:
                        v = float("nan")
                    recs.append((d, la, lo, v))
        df = _pd.DataFrame(recs, columns=["day", "latitude", "longitude", "air_temp"])
        return _FakeDs(df, {"day": days, "latitude": lats, "longitude": lons})

    return open_dataset


def test_opendap_fetcher_maps_dims_to_grid_schema(spark):
    """S5 completion: the production fetcher's dim/var -> GRID_SCHEMA mapping
    (T_name/X_name/Y_name/varname from the catalog record, descending-lat
    index arithmetic, NaN -> NULL) runs end-to-end on a synthetic dataset
    with the network read injected."""
    from gridmet_etl_spark.sources.ingest import make_opendap_fetcher

    rec = {
        "URL": "http://example/ds",
        "T_name": "day",
        "X_name": "longitude",
        "Y_name": "latitude",
        "varname": "air_temp",
        "variable": "tmmx",
        "X1": -124.76667,
        "Y1": 49.4,
        "resX": 0.04167,
        "resY": 0.04167,
        "ncols": 20,
        "nrows": 20,
        "toptobottom": False,
    }
    fetcher = make_opendap_fetcher(rec, open_dataset=_make_fake_open_dataset())
    task = {
        "url": rec["URL"], "var": "tmmx",
        "t0": date(1980, 1, 2), "t1": date(1980, 1, 4),
        "i0": 2, "i1": 4, "j0": 1, "j1": 3,
    }
    pdf = fetcher(task)
    assert list(pdf.columns) == ["var", "ens", "time", "i", "j", "lat", "lon", "value"]
    assert len(pdf) == 3 * 3 * 3  # days x lats x lons
    assert set(pdf["var"]) == {"tmmx"} and set(pdf["ens"]) == {-1}
    # cell indexes recomputed against the FULL grid origin (not slice-local)
    assert set(pdf["i"]) == {2, 3, 4} and set(pdf["j"]) == {1, 2, 3}
    # value formula survives the mapping; NaN became NA (-> SQL NULL)
    d2 = pdf[(pdf["i"] == 2) & (pdf["j"] == 3) & (pdf["time"] == date(1980, 1, 2))]
    assert float(d2["value"].iloc[0]) == 2004.0  # i*1000 + j + day_idx(=1)
    missing = pdf[pdf["value"].isna()]
    assert len(missing) == 1
    assert (missing["i"].iloc[0], missing["j"].iloc[0]) == (3, 2)
    assert missing["time"].iloc[0] == date(1980, 1, 3)

    # and through the distributed fan-out: NULL lands as SQL NULL
    tasks = spark.createDataFrame([tuple(task[k] for k in
        ["url", "var", "t0", "t1", "i0", "i1", "j0", "j1"])], TASK_SCHEMA)
    grid = fetch_grid(tasks, fetcher)
    assert grid.count() == 27
    assert grid.filter(F.col("value").isNull()).count() == 1


def _parse_golden_header(path):
    """Extract {var: {attr: value}} from a reference ncdump header dump."""
    import re

    attrs = {}
    for m in re.finditer(r'^\s+(\w+):(\w+) = "?([^";]*?)"? ;', open(path).read(), re.M):
        var, key, val = m.groups()
        attrs.setdefault(var, {})[key] = val
    return attrs


@pytest.mark.parametrize(
    "golden,calendar,vars_checked",
    [
        ("/root/reference/gm_header.md", "proleptic_gregorian",
         ["tmax", "tmin", "prcp", "rhmax", "rhmin", "ws", "humidity"]),
        ("/root/reference/cfsv2_median_header.md", "julian",
         ["tmax", "tmin", "prcp"]),
    ],
)
def test_sidecar_matches_golden_header(spark, tmp_path, golden, calendar, vars_checked):
    """Structural comparison against the reference's published NetCDF
    headers: per-variable units/long_name and the PER-PIPELINE time
    calendar (gridMET proleptic_gregorian, CFSv2 julian) must match what
    our sidecar would stamp at the NetCDF edge."""
    gold = _parse_golden_header(golden)
    df = spark.createDataFrame(
        [(1, date(2024, 4, 1)) + tuple(float(i) for i in range(len(vars_checked)))],
        "feature_id long, time date, " + ", ".join(f"{v} double" for v in vars_checked),
    )
    write_output(df, str(tmp_path), file_prefix="hdr", calendar=calendar)
    side = json.load(open(tmp_path / "hdr_attrs.json"))["variables"]
    assert side["time"]["calendar"] == gold["time"]["calendar"] == calendar
    for v in vars_checked:
        assert side[v]["units"] == gold[v]["units"], v
        assert side[v]["long_name"] == gold[v]["long_name"], v
