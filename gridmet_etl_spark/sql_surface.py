"""SQL entry point: register the engine's tables as temp views and run
ANSI SQL through Catalyst.

The reference has no SQL surface (its only declarative fragments are pandas
``.query`` strings, etl.py:171/659 — P1); this module subsumes that and the
rest of the §2 operator inventory for SQL users: the same plans come out of
``spark.sql`` as out of the DataFrame builders, so every DataFrame-level
guarantee (broadcast weights join, pushdown, single-shuffle agg) holds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def register_domain_tables(spark: SparkSession, fixdir: str) -> list[str]:
    """Create temp views for the domain tables present in ``fixdir``."""
    names = []
    for name in ["grid", "grid_ens", "weights", "weights_ens", "features", "catalog", "elevation"]:
        p = os.path.join(fixdir, f"{name}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(name)
            names.append(name)
    return names


def register_testdata_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create temp views for the TPC-H-ish driver tables at ``sf_dir``."""
    names = []
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ]:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(name)
            names.append(name)
    p = os.path.join(sf_dir, "events.parquet")
    if os.path.exists(p):
        from .sources.readers import read_events

        read_events(spark, p).createOrReplaceTempView("events")
        names.append("events")
    return names


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run SQL against the registered views (thin passthrough — the point is
    the registration conventions above)."""
    return spark.sql(query)
