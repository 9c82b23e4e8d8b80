"""Great-circle (haversine) spatial operators over lat/lon point relations:
radius-bounded k-nearest-neighbor join with exact cell blocking.

Scale shape: the naive kNN join is all-pairs — O(N²) at any scale. With a
RADIUS bound R the join becomes exact under grid blocking: assign every
point to a (lat_cell, lon_cell) bucket whose side length covers R in both
axes, replicate each LEFT point into its 3×3 cell neighborhood (a 9×
explode of the points relation, not of pairs), and equi-join on the cell
key. Every true pair within R falls in some replicated cell, so the
blocked join misses nothing; candidate volume is bounded by local point
density, not N². The only shuffles are the two cell-keyed exchanges of the
(small) point relations and the per-left top-k partial — at 100 TB of
points the pair relation never materializes beyond each cell
neighborhood.

Exactness condition: ``cell_deg`` ≥ R expressed in degrees along BOTH
axes. Latitude: 1° ≈ 111.32 km everywhere. Longitude: 1° ≈
111.32·cos(lat) km, so the constraint binds at the highest |lat| in the
data — callers pass a ``cell_deg`` sized for their extent (asserted
against ``max_abs_lat``).

Determinism: ranking on a transcendental (haversine) result is
cross-engine-fragile at the ulp level, so neighbors rank on the distance
ROUNDED to ``rank_round`` digits with the neighbor id as tie-break — the
same discipline as the cosine top-k family (similarity.py).

Reference anchor: the reference's nearest-feature search is a serial
scipy cKDTree per variable (etl.py helper path); this is the
distributed, join-planned equivalent.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["haversine_km", "geo_knn"]

EARTH_RADIUS_KM = 6371.0
KM_PER_DEG_LAT = 111.32


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km — the standard haversine form. Built
    entirely from codegen trig expressions; written identically in the SQL
    oracles so both engines evaluate the same formula text."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_knn(
    points: DataFrame,
    k: int = 3,
    radius_km: float = 50.0,
    cell_deg: float = 1.0,
    max_abs_lat: float = 60.0,
    id_col: str = "point_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    rank_round: int = 6,
) -> DataFrame:
    """Exact k-nearest-neighbors within ``radius_km`` for every point,
    excluding self. Output: (point_id, neighbor_id, dist_km, rnk).

    Left points explode into their 3×3 cell neighborhood; right points
    keep their own cell — one equi join on (cell_lat, cell_lon), then the
    haversine radius filter and a per-left top-k window. The window
    partitions on the left id, so the sort is per-point candidate lists
    (density-bounded), never a global sort.
    """
    if cell_deg * KM_PER_DEG_LAT < radius_km:
        raise ValueError("cell_deg too small for radius_km along latitude")
    if cell_deg * KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat)) < radius_km:
        raise ValueError(
            "cell_deg too small for radius_km along longitude at max_abs_lat"
        )
    base = points.select(
        F.col(id_col).alias("_id"),
        F.col(lat_col).cast("double").alias("_lat"),
        F.col(lon_col).cast("double").alias("_lon"),
        F.floor(F.col(lat_col) / cell_deg).alias("_cl"),
        F.floor(F.col(lon_col) / cell_deg).alias("_cn"),
    )
    left = (
        base.withColumn("_dl", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_dn", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("_id").alias("point_id"),
            F.col("_lat").alias("llat"),
            F.col("_lon").alias("llon"),
            (F.col("_cl") + F.col("_dl")).alias("jcl"),
            (F.col("_cn") + F.col("_dn")).alias("jcn"),
        )
    )
    right = base.select(
        F.col("_id").alias("neighbor_id"),
        F.col("_lat").alias("rlat"),
        F.col("_lon").alias("rlon"),
        F.col("_cl").alias("jcl"),
        F.col("_cn").alias("jcn"),
    )
    dist = haversine_km(F.col("llat"), F.col("llon"), F.col("rlat"), F.col("rlon"))
    cand = (
        left.join(right, ["jcl", "jcn"])
        .where(F.col("neighbor_id") != F.col("point_id"))
        .select(
            "point_id",
            "neighbor_id",
            (F.round(dist, rank_round) + F.lit(0.0)).alias("dist_km"),
        )
        .where(F.col("dist_km") <= radius_km)
    )
    w = Window.partitionBy("point_id").orderBy("dist_km", "neighbor_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )
