"""gridmet_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `rmcd-mscb/gridmet-etl`
(area-weighted spatial interpolation of gridded climate rasters onto polygon
features), re-expressed Spark-first.

Design stance (SURVEY.md §7): not a port. The reference's xarray
``(time, lat, lon)`` / ``(ens, time, lat, lon)`` arrays become long-form
DataFrames ``grid(var, [ens,] time, i, j, lat, lon, value)``; every operator
in SURVEY.md §2 is a declarative DataFrame transformation planned by Catalyst;
Parquet is canonical storage; NetCDF/OPeNDAP live only at ingest/export edges.

Scale posture: weights/features/catalog are small dimensions → broadcast
joins; the grid fact table is the 100 TB side → partition by (var, date),
never shuffled except for the single groupBy((feature_id, [ens,] time))
aggregation, which benefits from map-side partial aggregation.
"""

__version__ = "0.1.0"
