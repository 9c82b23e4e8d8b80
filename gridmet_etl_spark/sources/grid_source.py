"""First-class Spark source for remote grid rasters — the Python Data
Source API (Spark 4) form of the ingest job in ``ingest.py``.

The reference opens OPeNDAP endpoints through xarray and lets the server
slice (reference etl.py:273-281); ``ingest.py`` re-expresses that as an
explicit task table + ``mapInPandas`` fan-out. This module goes one step
further and makes the raster a REAL Spark table:

    spark.dataSource.register(GridSliceDataSource)
    df = (spark.read.format("grid_slices")
          .option("catalog_json", json.dumps(catalog_record))
          .option("start", "2021-01-01").option("end", "2021-01-31")
          .option("bbox_cells", "0,127,0,255")
          .option("fetcher", "synthetic")       # or "module:callable"
          .load())
    df.where("var = 'tmmx' AND time >= DATE'2021-01-10'")  # pruned + pushed

Why this shape wins at 100 TB:

- **One InputPartition per (var, time-window, spatial tile) slice task** —
  Spark schedules the remote reads like any other scan: locality-free,
  retryable per task, width = number of tasks.
- **Filter pushdown prunes tasks before any fetch.** ``pushFilters``
  consumes ``var`` equality and ``time`` range conjuncts and drops whole
  slice tasks (the P2/P3 pushdown the reference does by URL slicing);
  filters are also left for Spark to re-apply, because task granularity
  is a superset of the predicate.
- **Arrow batches straight from the fetcher** — ``read`` yields one
  RecordBatch per slice, no row-at-a-time Python.

The network boundary stays injectable exactly like ``ingest.py``: the
``fetcher`` option names ``synthetic`` (deterministic in-process generator,
used by tests and demos), a ``module:callable`` factory resolving to a
``SliceFetcher``, or defaults to the real OPeNDAP fetcher
(``make_opendap_fetcher``, requires xarray+netCDF4 at runtime).
"""

from __future__ import annotations

import json
from datetime import date, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from ..schemas import GRID_SCHEMA

FORMAT_NAME = "grid_slices"


def synthetic_fetcher_factory(catalog_rec: dict):
    """Deterministic in-process fetcher: value = f(var, time, i, j) via a
    stable crc32 (NOT builtin hash(), which is per-process salted);
    lat/lon from the record's grid origin. Exercises the full source path
    with zero network."""
    import zlib

    import pandas as pd

    x1 = float(catalog_rec.get("X1", 0.0))
    y1 = float(catalog_rec.get("Y1", 0.0))
    res = float(catalog_rec.get("resX", 1.0))

    def _fetch(task: dict) -> pd.DataFrame:
        rows = []
        t, t1 = task["t0"], task["t1"]
        while t <= t1:
            for i in range(task["i0"], task["i1"] + 1):
                for j in range(task["j0"], task["j1"] + 1):
                    h = zlib.crc32(
                        f"{task['var']}|{t.toordinal()}|{i}|{j}".encode()
                    ) % 1000
                    rows.append(
                        (
                            task["var"],
                            -1,
                            t,
                            i,
                            j,
                            y1 - i * res,
                            x1 + j * res,
                            float(h) / 10.0,
                        )
                    )
            t = t + timedelta(days=1)
        return pd.DataFrame(
            rows, columns=[f.name for f in GRID_SCHEMA.fields]
        )

    return _fetch


def _resolve_fetcher(options: dict, catalog_rec: dict):
    spec = options.get("fetcher", "")
    if spec == "synthetic":
        return synthetic_fetcher_factory(catalog_rec)
    if ":" in spec:
        import importlib

        mod, fn = spec.split(":", 1)
        return getattr(importlib.import_module(mod), fn)(catalog_rec)
    from .ingest import make_opendap_fetcher

    return make_opendap_fetcher(catalog_rec)


def _build_tasks(options: dict, catalog_rec: dict) -> list[dict]:
    start = date.fromisoformat(options["start"])
    end = date.fromisoformat(options["end"])
    i0, i1, j0, j1 = (int(x) for x in options["bbox_cells"].split(","))
    days = int(options.get("days_per_task", "30"))
    tile = int(options.get("tile_cells", "128"))
    url = catalog_rec.get("URL", "")
    var = catalog_rec.get("variable", "value")
    tasks = []
    t = start
    while t <= end:
        t_hi = min(t + timedelta(days=days - 1), end)
        for ti in range(i0, i1 + 1, tile):
            for tj in range(j0, j1 + 1, tile):
                tasks.append(
                    {
                        "url": url,
                        "var": var,
                        "t0": t,
                        "t1": t_hi,
                        "i0": ti,
                        "i1": min(ti + tile - 1, i1),
                        "j0": tj,
                        "j1": min(tj + tile - 1, j1),
                    }
                )
        t = t_hi + timedelta(days=1)
    return tasks


class GridSliceReader(DataSourceReader):
    def __init__(self, options: dict):
        self._options = dict(options)
        self._catalog = json.loads(options["catalog_json"])
        self._tasks = _build_tasks(self._options, self._catalog)

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        """Prune slice tasks with var-equality and time-range conjuncts.
        Every filter is also yielded back: a task spans a window/tile, so
        the source guarantees only a SUPERSET of the predicate and Spark
        must re-apply it exactly."""
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if isinstance(f, EqualTo) and col == "var":
                self._tasks = [t for t in self._tasks if t["var"] == f.value]
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)) and col == "time":
                lo = f.value
                self._tasks = [t for t in self._tasks if t["t1"] >= lo]
            elif isinstance(f, (LessThan, LessThanOrEqual)) and col == "time":
                hi = f.value
                self._tasks = [t for t in self._tasks if t["t0"] <= hi]
            yield f

    def partitions(self):
        return [
            InputPartition(
                {k: (v.isoformat() if isinstance(v, date) else v) for k, v in t.items()}
            )
            for t in self._tasks
        ]

    def read(self, partition):
        import pyarrow as pa

        task = dict(partition.value)
        task["t0"] = date.fromisoformat(task["t0"])
        task["t1"] = date.fromisoformat(task["t1"])
        fetcher = _resolve_fetcher(self._options, self._catalog)
        pdf = fetcher(task)
        if pdf is None or not len(pdf):
            return
        cols = [f.name for f in GRID_SCHEMA.fields]
        # cast to the declared Arrow schema — pandas int columns arrive as
        # int64 while GRID_SCHEMA declares int32, and Spark's Arrow reader
        # trusts the batch's physical types
        target = pa.schema(
            [
                pa.field("var", pa.string()),
                pa.field("ens", pa.int32()),
                pa.field("time", pa.date32()),
                pa.field("i", pa.int32()),
                pa.field("j", pa.int32()),
                pa.field("lat", pa.float64()),
                pa.field("lon", pa.float64()),
                pa.field("value", pa.float64()),
            ]
        )
        tbl = pa.Table.from_pandas(pdf[cols], preserve_index=False).cast(target)
        yield from tbl.to_batches()


class GridSliceDataSource(DataSource):
    """``spark.read.format("grid_slices")`` — remote raster as a table."""

    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        return GRID_SCHEMA

    def reader(self, schema):
        return GridSliceReader(self.options)
