"""Ingest boundary for remote rasters (SURVEY §2.1 S5).

The reference opens OPeNDAP endpoints lazily via xarray and lets the server
slice (etl.py:273-281). Spark has no vanilla OPeNDAP source, so the engine
defines an INGEST JOB: a slice-task table (one row per (var, time-chunk,
spatial tile)) fanned out with ``mapInPandas`` — each task fetches its slice
through an injectable fetcher and emits long-form grid rows. The same bbox +
period predicates the reference pushes into OPeNDAP (P2/P3) are applied
per-task BEFORE materialization, so the ingest moves only the needed cells.

The default fetcher requires a NetCDF/OPeNDAP client (not in this
container); tests inject a synthetic fetcher. The distributed plumbing —
task generation, fan-out, schema, partitioned landing — is real.

At production scale: tasks ≈ nT/chunk × tiles; each task is one HTTP range
read; the landing write partitions by (var, date) so every downstream query
prunes. This replaces the reference's single-process fetch with an
embarrassingly parallel stage.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from datetime import date, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import GRID_SCHEMA

SliceFetcher = Callable[[dict], pd.DataFrame]
"""(task row dict) -> long-form pdf with columns
   var, ens, time, i, j, lat, lon, value for that slice."""

TASK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("var", T.StringType(), False),
        T.StructField("t0", T.DateType(), False),
        T.StructField("t1", T.DateType(), False),
        T.StructField("i0", T.IntegerType(), False),
        T.StructField("i1", T.IntegerType(), False),
        T.StructField("j0", T.IntegerType(), False),
        T.StructField("j1", T.IntegerType(), False),
    ]
)


def build_slice_tasks(
    spark: SparkSession,
    catalog_records: list[dict],
    start: date,
    end: date,
    bbox_cells: tuple[int, int, int, int],
    days_per_task: int = 30,
    tile_cells: int = 128,
) -> DataFrame:
    """Task table: (url, var, time window, cell-index tile), pre-filtered to
    the bbox (the P2 pushdown, applied at task construction — nothing outside
    the feature bounds is ever fetched)."""
    i0, i1, j0, j1 = bbox_cells
    rows = []
    for rec in catalog_records:
        t = start
        while t <= end:
            t_hi = min(t + timedelta(days=days_per_task - 1), end)
            for ti in range(i0, i1 + 1, tile_cells):
                for tj in range(j0, j1 + 1, tile_cells):
                    rows.append(
                        (
                            rec["URL"],
                            rec["variable"],
                            t,
                            t_hi,
                            ti,
                            min(ti + tile_cells - 1, i1),
                            tj,
                            min(tj + tile_cells - 1, j1),
                        )
                    )
            t = t_hi + timedelta(days=1)
    return spark.createDataFrame(rows, TASK_SCHEMA)


def fetch_grid(tasks: DataFrame, fetcher: SliceFetcher) -> DataFrame:
    """Fan the slice tasks out across executors; each task fetches its slice
    and yields long-form rows. One task = one remote read = one Arrow batch
    stream — no shuffle; repartition count = parallel fetch width."""

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for task in pdf.to_dict(orient="records"):
                out = fetcher(task)
                if out is not None and len(out):
                    yield out[[f.name for f in GRID_SCHEMA.fields]]

    return tasks.repartition(max(tasks.count(), 1)).mapInPandas(_fetch, GRID_SCHEMA)


def ingest_to_parquet(
    tasks: DataFrame, fetcher: SliceFetcher, landing_dir: str
) -> str:
    """Materialize the fetched grid partitioned by (var, time) — the layout
    every downstream P2/P3 predicate prunes against."""
    grid = fetch_grid(tasks, fetcher)
    (
        grid.write.mode("overwrite")
        .partitionBy("var", "time")
        .option("compression", "zstd")
        .parquet(landing_dir)
    )
    return landing_dir


def opendap_fetcher(task: dict) -> pd.DataFrame:  # pragma: no cover - needs netCDF client
    """Default fetcher: real OPeNDAP slice read. Requires xarray+netCDF4
    (absent here); kept as the documented production path."""
    try:
        import xarray as xr
    except ImportError as exc:
        raise NotImplementedError(
            "OPeNDAP ingest requires xarray+netCDF4; inject a custom fetcher"
        ) from exc
    ds = xr.open_dataset(task["url"])
    sub = ds.isel(
        lat=slice(task["i0"], task["i1"] + 1), lon=slice(task["j0"], task["j1"] + 1)
    ).sel(day=slice(str(task["t0"]), str(task["t1"])))
    df = sub.to_dataframe().reset_index()
    raise NotImplementedError("map source dims/vars into GRID_SCHEMA per catalog record")
