"""Spark-native areal-weight GENERATION: the one step of the reference's
workflow it outsources (gdptools precomputes the weights CSV the reference
loads at gridmet_etl/etl.py:600-605). Given polygon features and the grid's
cell geometry, derive the cell→feature weights inside the engine:

- ``point_in_polygon``: even-odd ray casting of each cell center against
  each polygon ring, written entirely in Column HOFs (``aggregate`` over
  the vertex index sequence) — JVM codegen, no UDF, and the identical
  arithmetic is expressible in DuckDB list lambdas for the oracle.
- ``cell_coverage_weights``: supersampled fractional coverage — each cell
  tests an s×s lattice of interior subpoints and the weight is the inside
  fraction, normalized per feature (→ the area-weight approximation; s=1
  degenerates to the binary-mask weighting).

Scale shape: polygons are a feature-sized dimension → broadcast; the cell
relation scans once with a bbox range prefilter (BroadcastNestedLoopJoin,
output bounded by Σ cells-in-bbox). The ray cast is O(vertices) per
surviving pair inside whole-stage codegen. The per-feature normalization
is a |features|-keyed output-sized shuffle. Nothing corpus-sized moves: at
a 585×1386 national grid × 10⁵ basins this is the same plan, just more
tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ray_cast_inside(px: Column, py: Column, xs: Column, ys: Column) -> Column:
    """Even-odd crossing count of the horizontal ray from (px, py): odd →
    inside. The XOR straddle test guards the edge-slope division (lazy
    CASE branches in both engines; Spark emits NULL on 0/0 under non-ANSI
    and never evaluates the untaken branch under ANSI codegen)."""
    n = F.size(xs)

    def crossing(i: Column) -> Column:
        j = (i % n) + 1
        xi, yi = F.element_at(xs, i), F.element_at(ys, i)
        xj, yj = F.element_at(xs, j), F.element_at(ys, j)
        straddles = (yi > py) != (yj > py)
        x_at_y = (xj - xi) * (py - yi) / (yj - yi) + xi
        # the division stays strictly inside the straddle branch: straddling
        # implies yj != yi, and CASE branches evaluate lazily in both
        # engines — a horizontal edge can never divide by zero even under
        # Spark 4 ANSI mode
        return F.when(straddles, F.when(px < x_at_y, 1).otherwise(0)).otherwise(0)

    crossings = F.aggregate(
        F.sequence(F.lit(1), n), F.lit(0), lambda acc, i: acc + crossing(i)
    )
    return crossings % 2 == 1


def point_in_polygon(
    points: DataFrame,
    polygons: DataFrame,
    x_col: str = "lon",
    y_col: str = "lat",
) -> DataFrame:
    """Pairs (point ⨯ polygon) where the point lies inside the ring.

    ``points``: any relation with (x_col, y_col); ``polygons``:
    (feature_id, xs, ys) with xs/ys the ring vertex arrays (closed
    implicitly). The polygon side is broadcast with precomputed bboxes so
    the join condition prunes pairs before the O(vertices) ray cast runs.

    NOTE: the bbox range join is a BroadcastNestedLoopJoin — every
    (point, polygon) pair evaluates the predicate. Right for dim-sized
    point sets; for corpus-sized point streams use the tile-bucketed
    equi-join inside ``cell_coverage_weights`` (measured 25× at 811k
    cells × 50 rings).
    """
    px, py = F.col(x_col), F.col(y_col)
    polys = F.broadcast(
        polygons.select(
            "feature_id",
            "xs",
            "ys",
            F.array_min("xs").alias("_bxmin"),
            F.array_max("xs").alias("_bxmax"),
            F.array_min("ys").alias("_bymin"),
            F.array_max("ys").alias("_bymax"),
        )
    )
    paired = points.join(
        polys,
        (px >= F.col("_bxmin"))
        & (px <= F.col("_bxmax"))
        & (py >= F.col("_bymin"))
        & (py <= F.col("_bymax")),
    )
    return paired.where(_ray_cast_inside(px, py, F.col("xs"), F.col("ys"))).drop(
        "_bxmin", "_bxmax", "_bymin", "_bymax"
    )


def cell_coverage_weights(
    cells: DataFrame,
    polygons: DataFrame,
    cell_size: float,
    supersample: int = 3,
    x_col: str = "lon",
    y_col: str = "lat",
    tile_size: float | None = None,
) -> DataFrame:
    """Per-(feature, cell) normalized areal weights by supersampling: an
    s×s lattice of interior subpoints per cell (offsets (k+0.5)/s - 0.5 of
    the cell size, so s=1 is the center), coverage = inside-fraction,
    weight = coverage / Σ_feature coverage. Output: (feature_id, i, j,
    wght) — the reference's weights-CSV schema, generated in-engine.

    Cell↔polygon pairing is TILE-BUCKETED: polygons replicate onto every
    coarse tile their bbox overlaps (≤4 with the default tile ≥ bbox
    diameter); each subpoint computes its single tile id and EQUI-joins —
    a codegen BroadcastHashJoin whose pair stream is Σ polygons-per-tile,
    NOT |subpoints|×|polygons|. (The naive all-pairs bbox form plans a
    BroadcastNestedLoopJoin that evaluates every pair: 365M interpreted
    predicate evaluations ≈ 38 s at the 585×1386 national grid vs ~2 s
    bucketed — the LSH lesson applied to geometry.) The per-pair bbox
    check stays as the exact pre-filter before the ray cast; the only
    shuffles are the coverage rollup and per-feature normalization.
    """
    s = int(supersample)
    offs = [((k + 0.5) / s - 0.5) * cell_size for k in range(s)]
    sub = F.array(
        *[
            F.struct(
                (F.col(x_col) + F.lit(dx)).alias("sx"),
                (F.col(y_col) + F.lit(dy)).alias("sy"),
            )
            for dx in offs
            for dy in offs
        ]
    )
    pts = cells.select("i", "j", x_col, y_col, F.explode(sub).alias("_p")).select(
        "i", "j", F.col("_p.sx").alias("sx"), F.col("_p.sy").alias("sy")
    )
    if tile_size is None:
        # tile ≥ the largest bbox extent → a polygon overlaps ≤ 2 tiles
        # per axis; derived once from the polygon relation (dim-sized agg)
        ext = polygons.select(
            F.greatest(
                F.max(F.array_max("xs") - F.array_min("xs")),
                F.max(F.array_max("ys") - F.array_min("ys")),
            ).alias("e")
        ).first()["e"]
        tile_size = float(ext) * 1.001
    t = float(tile_size)
    tiled_polys = polygons.select(
        "feature_id",
        "xs",
        "ys",
        F.array_min("xs").alias("_bxmin"),
        F.array_max("xs").alias("_bxmax"),
        F.array_min("ys").alias("_bymin"),
        F.array_max("ys").alias("_bymax"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("_bxmin") / t).cast("long"),
                F.floor(F.col("_bxmax") / t).cast("long"),
            )
        ).alias("_tx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("_bymin") / t).cast("long"),
                F.floor(F.col("_bymax") / t).cast("long"),
            )
        ).alias("_ty"),
    )
    keyed_pts = pts.withColumn("_tx", F.floor(F.col("sx") / t).cast("long")).withColumn(
        "_ty", F.floor(F.col("sy") / t).cast("long")
    )
    px, py = F.col("sx"), F.col("sy")
    paired = keyed_pts.join(F.broadcast(tiled_polys), ["_tx", "_ty"]).where(
        (px >= F.col("_bxmin"))
        & (px <= F.col("_bxmax"))
        & (py >= F.col("_bymin"))
        & (py <= F.col("_bymax"))
    )
    hits = paired.where(_ray_cast_inside(px, py, F.col("xs"), F.col("ys")))
    # normalization stays in EXACT integers until one final division:
    # wght = hits_in_cell / hits_in_feature. Summing the k/s² doubles
    # instead would make the total order-dependent, and these weights are
    # exact rationals that LAND on round-half boundaries (3/128 =
    # 0.0234375) — an lsb of float-sum reordering flips the rounding
    # (observed vs the oracle). Same discipline as classifier_score.
    cov = hits.groupBy("feature_id", "i", "j").agg(F.count("*").alias("_cnt"))
    tot = cov.groupBy("feature_id").agg(F.sum("_cnt").alias("_tot"))
    return (
        cov.join(F.broadcast(tot), "feature_id")
        .select(
            "feature_id",
            "i",
            "j",
            (F.col("_cnt") / F.col("_tot")).alias("wght"),
        )
    )


def polygon_metrics(polys: DataFrame, ndigits: int = 6) -> DataFrame:
    """Shoelace area + vertex-weighted centroid per polygon ring — the
    geometry summary the reference delegates to geopandas (`.area`,
    `.centroid` via shapely), computed as pure higher-order-function
    column expressions over the (xs, ys) vertex arrays: zero shuffles,
    zero UDFs, codegen end-to-end, so 10⁹ polygons cost one scan.

    Shoelace (rings stored OPEN — the closing edge is added explicitly):
    2A = Σ_k (x_k·y_{k+1} − x_{k+1}·y_k) + (x_n·y_1 − x_1·y_n);
    centroid C = (1/6A)·Σ (p_k + p_{k+1})·cross_k (same wrap term).
    Signed math keeps orientation; area is reported absolute, and the
    true-centroid formula divides by the SIGNED area so it is
    orientation-independent. Degenerate (zero-area) rings fall back to
    the vertex mean. Output: (feature_id, n_vertices, area, cx, cy)."""
    cross_terms = (
        "transform(sequence(0, size(xs) - 2), k -> "
        "xs[k] * ys[k + 1] - xs[k + 1] * ys[k])"
    )
    wrap = "(element_at(xs, -1) * ys[0] - xs[0] * element_at(ys, -1))"
    two_a = f"aggregate({cross_terms}, 0D, (a, t) -> a + t) + {wrap}"
    cx_terms = (
        "transform(sequence(0, size(xs) - 2), k -> "
        "(xs[k] + xs[k + 1]) * (xs[k] * ys[k + 1] - xs[k + 1] * ys[k]))"
    )
    cy_terms = (
        "transform(sequence(0, size(xs) - 2), k -> "
        "(ys[k] + ys[k + 1]) * (xs[k] * ys[k + 1] - xs[k + 1] * ys[k]))"
    )
    cx_wrap = f"(element_at(xs, -1) + xs[0]) * {wrap}"
    cy_wrap = f"(element_at(ys, -1) + ys[0]) * {wrap}"
    cx_sum = f"aggregate({cx_terms}, 0D, (a, t) -> a + t) + {cx_wrap}"
    cy_sum = f"aggregate({cy_terms}, 0D, (a, t) -> a + t) + {cy_wrap}"
    mean_x = "aggregate(xs, 0D, (a, t) -> a + t) / size(xs)"
    mean_y = "aggregate(ys, 0D, (a, t) -> a + t) / size(ys)"
    out = polys.select(
        "feature_id",
        F.size("xs").alias("n_vertices"),
        F.expr(two_a).alias("_2a"),
        F.expr(cx_sum).alias("_cxs"),
        F.expr(cy_sum).alias("_cys"),
        F.expr(mean_x).alias("_mx"),
        F.expr(mean_y).alias("_my"),
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    degenerate = F.abs(F.col("_2a")) < 1e-12
    return out.select(
        "feature_id",
        "n_vertices",
        rnd(F.abs(F.col("_2a")) / 2).alias("area"),
        rnd(
            F.when(degenerate, F.col("_mx")).otherwise(
                F.col("_cxs") / (F.lit(3.0) * F.col("_2a"))
            )
        ).alias("cx"),
        rnd(
            F.when(degenerate, F.col("_my")).otherwise(
                F.col("_cys") / (F.lit(3.0) * F.col("_2a"))
            )
        ).alias("cy"),
    )
