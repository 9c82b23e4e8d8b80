"""Ray-cast point-in-polygon and supersampled coverage weights: geometric
ground truth on hand-built polygons, normalization invariants on the
fixture rings, and the broadcast plan shape."""

import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.spatial_weights import (
    cell_coverage_weights,
    point_in_polygon,
)


@pytest.fixture(scope="module")
def unit_square(spark):
    # CCW unit square (0,0)-(1,1)
    return spark.createDataFrame(
        [(1, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0])],
        "feature_id long, xs array<double>, ys array<double>",
    )


def test_square_membership(spark, unit_square):
    pts = spark.createDataFrame(
        [
            (1, 0.5, 0.5),   # inside
            (2, 1.5, 0.5),   # outside (right)
            (3, -0.5, 0.5),  # outside (left)
            (4, 0.25, 0.75), # inside
            (5, 0.5, 1.5),   # outside (above; bbox-pruned)
        ],
        "pid long, lon double, lat double",
    )
    got = sorted(
        r["pid"] for r in point_in_polygon(pts, unit_square).select("pid").collect()
    )
    assert got == [1, 4]


def test_concave_polygon(spark):
    # U-shape: the notch (0.5, 0.8) is OUTSIDE despite being in the bbox
    poly = spark.createDataFrame(
        [
            (
                7,
                [0.0, 1.0, 1.0, 0.7, 0.7, 0.3, 0.3, 0.0],
                [0.0, 0.0, 1.0, 1.0, 0.3, 0.3, 1.0, 1.0],
            )
        ],
        "feature_id long, xs array<double>, ys array<double>",
    )
    pts = spark.createDataFrame(
        [(1, 0.5, 0.8), (2, 0.15, 0.8), (3, 0.5, 0.15)],
        "pid long, lon double, lat double",
    )
    got = sorted(r["pid"] for r in point_in_polygon(pts, poly).select("pid").collect())
    assert got == [2, 3]  # notch point excluded, both arms/base included


def test_coverage_weights_sum_to_one_per_feature(spark, fixdir):
    polys = spark.read.parquet(f"{fixdir}/polygons.parquet")
    cells = (
        spark.read.parquet(f"{fixdir}/grid.parquet")
        .where(F.col("var") == "tmmx")
        .select("i", "j", "lon", "lat")
        .distinct()
    )
    w = cell_coverage_weights(cells, polys, cell_size=0.04167, supersample=3)
    sums = w.groupBy("feature_id").agg(F.sum("wght").alias("s")).collect()
    assert len(sums) > 0
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums)
    # fractional coverage exists (boundary cells): some weights differ
    per_feat = w.groupBy("feature_id").agg(
        F.countDistinct(F.round("wght", 9)).alias("nv")
    )
    assert per_feat.where(F.col("nv") > 1).count() > 0


def test_supersample_one_is_center_mask(spark, unit_square):
    # 2 cells: center of first inside, second outside
    cells = spark.createDataFrame(
        [(0, 0, 0.5, 0.5), (0, 1, 2.0, 0.5)], "i int, j int, lon double, lat double"
    )
    w = cell_coverage_weights(cells, unit_square, cell_size=0.1, supersample=1).collect()
    assert len(w) == 1 and w[0]["j"] == 0 and abs(w[0]["wght"] - 1.0) < 1e-12


def test_half_covered_cell_fraction(spark, unit_square):
    # cell centered on the square's right edge (x=1): 3×3 lattice → the 3
    # subpoints at dx=-size/3 are inside, dx=0 and +size/3 outside → 3/9;
    # a fully-interior cell contributes 9/9 → weights 0.25 / 0.75
    cells = spark.createDataFrame(
        [(0, 0, 1.0, 0.5), (0, 1, 0.5, 0.5)], "i int, j int, lon double, lat double"
    )
    w = {r["j"]: r["wght"] for r in cell_coverage_weights(
        cells, unit_square, cell_size=0.3, supersample=3
    ).collect()}
    assert abs(w[0] - 0.25) < 1e-12 and abs(w[1] - 0.75) < 1e-12


def test_plan_broadcasts_polygons(spark, fixdir):
    polys = spark.read.parquet(f"{fixdir}/polygons.parquet")
    cells = (
        spark.read.parquet(f"{fixdir}/grid.parquet")
        .where(F.col("var") == "tmmx")
        .select("i", "j", "lon", "lat")
        .distinct()
    )
    df = cell_coverage_weights(cells, polys, cell_size=0.04167, supersample=3)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    # tile-bucketed pairing: an EQUI broadcast hash join on the tile id —
    # NOT a nested-loop over all (subpoint, polygon) pairs
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "PythonEval" not in plan  # pure Column HOFs, no UDF
