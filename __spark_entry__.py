"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship gridmet pipeline on sf0.001-adjacent
fixtures; ``queries()`` exposes every implemented SURVEY.md §2 operator as a
(spark, sf_dir) callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL
(tables region/nation/customer/supplier/part/orders/lineitem/events/
documents/embeddings are pre-registered views; domain fixtures are read by
absolute parquet path).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gridmet_etl_spark.contract import DOMAIN_QUERIES  # noqa: E402
from gridmet_etl_spark.contract_ext import EXT_QUERIES  # noqa: E402

ALL_QUERIES = {**DOMAIN_QUERIES, **EXT_QUERIES}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full gridmet-etl pipeline analogue (weighted agg →
    pivot → unit conversion → derived humidity) on the seed-42 fixtures."""
    from gridmet_etl_spark.contract import q_gridmet_pipeline

    return q_gridmet_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items() if sql is not None}
