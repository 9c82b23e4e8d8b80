"""Python Data Source (grid_slices): end-to-end read, task-level filter
pushdown pruning, and equivalence with the ingest.py mapInPandas path."""

import json

import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.sources.grid_source import (
    GridSliceDataSource,
    GridSliceReader,
    synthetic_fetcher_factory,
)

CATALOG = {
    "URL": "mem://test",
    "variable": "tmmx",
    "X1": -120.0,
    "Y1": 49.0,
    "resX": 0.5,
    "resY": 0.5,
    "toptobottom": False,
}

OPTS = {
    "catalog_json": json.dumps(CATALOG),
    "start": "2021-01-01",
    "end": "2021-01-20",
    "bbox_cells": "0,7,0,15",  # 8 x 16 cells
    "days_per_task": "10",
    "tile_cells": "8",
    "fetcher": "synthetic",
}


@pytest.fixture()
def reader(spark):
    # runtime-settable SQL conf; required whenever a Python source
    # implements pushFilters (session.py sets it for engine sessions)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GridSliceDataSource)
    return (
        spark.read.format("grid_slices")
        .options(**OPTS)
        .load()
    )


def test_grid_source_reads_all_cells(spark, reader):
    # 20 days x 8 x 16 cells
    assert reader.count() == 20 * 8 * 16
    row = reader.where("i = 2 AND j = 3").orderBy("time").first()
    assert row.lat == 49.0 - 2 * 0.5 and row.lon == -120.0 + 3 * 0.5
    assert row.var == "tmmx" and row.ens == -1


def test_grid_source_time_filter_correct(spark, reader):
    got = reader.where("time >= DATE'2021-01-15'").count()
    assert got == 6 * 8 * 16  # 15..20 inclusive


def test_push_filters_prune_tasks():
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    r = GridSliceReader(OPTS)
    n_all = len(r.partitions())
    assert n_all == 2 * 1 * 2  # 2 windows x 1 i-tile x 2 j-tiles
    returned = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("time",), __import__("datetime").date(2021, 1, 11)),
                EqualTo(("var",), "tmmx"),
            ]
        )
    )
    assert len(returned) == 2  # every filter handed back for exact re-apply
    assert len(r.partitions()) == 2  # second 10-day window only

    r2 = GridSliceReader(OPTS)
    list(r2.pushFilters([EqualTo(("var",), "other_var")]))
    assert len(r2.partitions()) == 0


def test_matches_ingest_mapinpandas_path(spark, reader):
    from datetime import date

    from gridmet_etl_spark.sources.ingest import build_slice_tasks, fetch_grid

    tasks = build_slice_tasks(
        spark,
        [{"URL": "mem://test", "variable": "tmmx"}],
        date(2021, 1, 1),
        date(2021, 1, 20),
        (0, 7, 0, 15),
        days_per_task=10,
        tile_cells=8,
    )
    via_ingest = fetch_grid(tasks, synthetic_fetcher_factory(CATALOG))
    a = sorted(tuple(r) for r in reader.collect())
    b = sorted(tuple(r) for r in via_ingest.collect())
    assert a == b
