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

__all__ = ["haversine_km", "geo_knn", "geo_radius_pairs", "idw_interpolate"]

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
    cand = geo_radius_pairs(
        points,
        radius_km=radius_km,
        cell_deg=cell_deg,
        max_abs_lat=max_abs_lat,
        id_col=id_col,
        lat_col=lat_col,
        lon_col=lon_col,
        rank_round=rank_round,
    )
    w = Window.partitionBy("point_id").orderBy("dist_km", "neighbor_id")
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def geo_radius_pairs(
    points: DataFrame,
    radius_km: float = 50.0,
    cell_deg: float = 1.0,
    max_abs_lat: float = 60.0,
    id_col: str = "point_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    rank_round: int = 6,
) -> DataFrame:
    """All (point, neighbor) pairs within ``radius_km``, self excluded —
    the exact cell-blocked ε-neighborhood join that geo_knn and DBSCAN
    both rank/aggregate over. Output: (point_id, neighbor_id, dist_km),
    both directions present. Same exactness condition as geo_knn:
    ``cell_deg`` must cover the radius along both axes."""
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
    return cand


def idw_interpolate(
    stations: DataFrame,
    targets: DataFrame,
    value_col: str = "value",
    power: int = 2,
    radius_km: float = 50.0,
    cell_deg: float = 1.0,
    max_abs_lat: float = 60.0,
    station_id: str = "station_id",
    target_id: str = "target_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    rank_round: int = 6,
    out_round: int = 6,
    zero_eps: float = 0.01,
) -> DataFrame:
    """Inverse-distance-weighted interpolation: every target point gets
    ``sum(v / d^p) / sum(1 / d^p)`` over the stations within ``radius_km``
    — the classic scattered-station → analysis-point estimator (the
    station-data analogue of the reference's grid→polygon weighted mean,
    etl.py:421-447, with 1/d^p in place of areal weights).

    Scale shape: identical to ``geo_knn`` — targets explode into their 3×3
    cell neighborhood (9× the TARGET relation, which is the small side),
    stations keep their own cell, one equi join on the cell key, then ONE
    target-keyed partial-agg shuffle whose volume is |targets|, independent
    of station count or pair fan-out. No window, no global sort.

    Convention at d≈0 (a station within ``zero_eps`` km of the target —
    default 10 m): the IDW weight diverges and near-zero distances would
    amplify float-sum reorder noise past the rounding guard, so such
    targets take the AVERAGE of the snapped station values — the standard
    guard, expressed as a conditional aggregate so the DuckDB oracle can
    replay it verbatim.

    Determinism: weights are computed from the ROUNDED distance (the same
    discipline as geo_knn ranking — transcendental ulp drift across
    engines), and the output value is rounded at ``out_round``.

    Output: (target_id, n_stations, idw_value) for targets with ≥1
    in-radius station.
    """
    if cell_deg * KM_PER_DEG_LAT < radius_km:
        raise ValueError("cell_deg too small for radius_km along latitude")
    if cell_deg * KM_PER_DEG_LAT * math.cos(math.radians(max_abs_lat)) < radius_km:
        raise ValueError(
            "cell_deg too small for radius_km along longitude at max_abs_lat"
        )
    tgt = targets.select(
        F.col(target_id).alias("_tid"),
        F.col(lat_col).cast("double").alias("tlat"),
        F.col(lon_col).cast("double").alias("tlon"),
        F.floor(F.col(lat_col) / cell_deg).alias("_cl"),
        F.floor(F.col(lon_col) / cell_deg).alias("_cn"),
    )
    tgt9 = (
        tgt.withColumn("_dl", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_dn", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "_tid",
            "tlat",
            "tlon",
            (F.col("_cl") + F.col("_dl")).alias("jcl"),
            (F.col("_cn") + F.col("_dn")).alias("jcn"),
        )
    )
    st = stations.select(
        F.col(station_id).alias("_sid"),
        F.col(lat_col).cast("double").alias("slat"),
        F.col(lon_col).cast("double").alias("slon"),
        F.col(value_col).cast("double").alias("_v"),
        F.floor(F.col(lat_col) / cell_deg).alias("jcl"),
        F.floor(F.col(lon_col) / cell_deg).alias("jcn"),
    )
    dist = haversine_km(F.col("tlat"), F.col("tlon"), F.col("slat"), F.col("slon"))
    cand = (
        tgt9.join(st, ["jcl", "jcn"])
        .select(
            "_tid",
            "_v",
            (F.round(dist, rank_round) + F.lit(0.0)).alias("d"),
        )
        .where(F.col("d") <= radius_km)
    )
    wgt = F.lit(1.0) / F.pow(F.col("d"), power)
    agg = cand.groupBy("_tid").agg(
        F.count(F.lit(1)).alias("n_stations"),
        F.min("d").alias("_dmin"),
        F.avg(F.when(F.col("d") < zero_eps, F.col("_v"))).alias("_v0"),
        F.sum(F.when(F.col("d") >= zero_eps, F.col("_v") * wgt)).alias("_num"),
        F.sum(F.when(F.col("d") >= zero_eps, wgt)).alias("_den"),
    )
    return agg.select(
        F.col("_tid").alias(target_id),
        F.col("n_stations"),
        (
            F.round(
                F.when(F.col("_dmin") < zero_eps, F.col("_v0")).otherwise(
                    F.col("_num") / F.col("_den")
                ),
                out_round,
            )
            + F.lit(0.0)
        ).alias("idw_value"),
    )


def morans_i(
    cells: DataFrame,
    i_col: str = "i",
    j_col: str = "j",
    value_col: str = "value",
    ndigits: int = 6,
) -> DataFrame:
    """Moran's I spatial autocorrelation over a regular grid with rook
    (4-neighbor) contiguity weights — the "is this field spatially
    clustered or noise" number (the reference's gridMET rasters are
    exactly this shape; rmcd-mscb/gridmet-etl etl.py serves them):
    I = (n/ΣW)·Σ w_ab z_a z_b / Σ z² with w = 1 for edge-sharing cells.
    I → +1 clustered, ≈ −1/(n−1) random, → −1 checkerboard.

    Determinism discipline: ``value_col`` must be INTEGER (quantize at
    the caller); expanding z = x − S/n and multiplying through by n²
    makes the cross term exact:
    n²·Σ_edges z_a z_b = n²·Σxy − n·S·Σ(x_a+x_b) + |E|·S², so
    I = num / (|E| · (n·Σx² − S²)) is one division of exact
    DECIMAL(38,0) forms. Missing cells simply contribute no edges
    (island cells lower |E| — the standard treatment).

    Scale shape: TWO equi self-joins on shifted (i, j) keys build the
    rook edge list (each |cells|-keyed — no spatial index needed on a
    grid), then one moment pass; nothing quadratic.

    Output (1 row): (n, n_edges, i_moran, e_i)."""
    base = cells.select(
        F.col(i_col).alias("_i"),
        F.col(j_col).alias("_j"),
        F.col(value_col).cast("long").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    right = base.select(
        (F.col("_i") - 1).alias("_i"),
        F.col("_j"),
        F.col("_x").alias("_xb"),
    )
    down = base.select(
        F.col("_i"),
        (F.col("_j") - 1).alias("_j"),
        F.col("_x").alias("_xb"),
    )
    edges = base.join(right, ["_i", "_j"]).select(
        F.col("_x").alias("_xa"), "_xb"
    ).unionByName(
        base.join(down, ["_i", "_j"]).select(
            F.col("_x").alias("_xa"), "_xb"
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("_x"))).alias("s"),
        F.sum(dec(F.col("_x")) * F.col("_x")).alias("q"),
    )
    eacc = edges.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(dec(F.col("_xa")) * F.col("_xb")).alias("sxy"),
        F.sum(dec(F.col("_xa")) + F.col("_xb")).alias("sab"),
    )
    jn = tot.crossJoin(F.broadcast(eacc))
    n = F.col("n").cast("double")
    num = (
        n * n * F.col("sxy").cast("double")
        - n * F.col("s").cast("double") * F.col("sab").cast("double")
        + F.col("n_edges").cast("double") * F.col("s").cast("double")
        * F.col("s").cast("double")
    )
    den = F.col("n_edges").cast("double") * (
        n * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    )
    i_moran = F.when(
        (F.col("n_edges") == 0) | (den == 0.0), F.lit(0.0)
    ).otherwise(num / den)
    e_i = F.when(F.col("n") < 2, F.lit(0.0)).otherwise(-1.0 / (n - 1.0))
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return jn.select(
        F.col("n"),
        F.col("n_edges"),
        rnd(i_moran).alias("i_moran"),
        rnd(e_i).alias("e_i"),
    )


def gearys_c(
    cells: DataFrame,
    i_col: str = "i",
    j_col: str = "j",
    value_col: str = "value",
    ndigits: int = 6,
) -> DataFrame:
    """Geary's C spatial autocorrelation (rook contiguity) — Moran's I's
    local-contrast companion (sensitive to edge-level differences where I
    measures global covariance; the pair is the standard raster QA readout
    for fields like the reference's gridMET slices, etl.py raster path):
    C = (n−1)·Σ_edges (x_a−x_b)² / (2·ΣW·Σ(x−x̄)²), w = 1 on shared edges.
    C → 0 clustered, ≈ 1 random, → 2 checkerboard.

    Determinism: ``value_col`` must be pre-quantized INTEGER. Multiplying
    through by n turns the variance into the exact integer (n·Σx² − S²),
    so C = (n−1)·n·Σd² / (2·|E|·(n·Σx² − S²)) is ONE double division of
    exact DECIMAL(38,0) accumulations (each undirected edge appears once
    in the edge list; ΣW over ordered pairs = 2·|E| — the 2s cancel
    against the doubled numerator sum, leaving the form above).

    Scale shape: identical to ``morans_i`` — two shifted equi self-joins
    on grid keys build the rook edges, one moment pass, nothing quadratic.

    Output (1 row): (n, n_edges, c_geary, e_c)."""
    base = cells.select(
        F.col(i_col).alias("_i"),
        F.col(j_col).alias("_j"),
        F.col(value_col).cast("long").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    right = base.select(
        (F.col("_i") - 1).alias("_i"), F.col("_j"), F.col("_x").alias("_xb")
    )
    down = base.select(
        F.col("_i"), (F.col("_j") - 1).alias("_j"), F.col("_x").alias("_xb")
    )
    edges = base.join(right, ["_i", "_j"]).select(
        F.col("_x").alias("_xa"), "_xb"
    ).unionByName(
        base.join(down, ["_i", "_j"]).select(F.col("_x").alias("_xa"), "_xb")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("_x"))).alias("s"),
        F.sum(dec(F.col("_x")) * F.col("_x")).alias("q"),
    )
    eacc = edges.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(dec(F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb"))).alias("sdd"),
    )
    jn = tot.crossJoin(F.broadcast(eacc))
    n = F.col("n").cast("double")
    num = (n - 1.0) * n * F.col("sdd").cast("double")
    den = (
        2.0
        * F.col("n_edges").cast("double")
        * (n * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast("double"))
    )
    c_geary = F.when(
        (F.col("n_edges") == 0) | (den == 0.0), F.lit(0.0)
    ).otherwise(num / den)
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return jn.select(
        F.col("n"),
        F.col("n_edges"),
        rnd(c_geary).alias("c_geary"),
        rnd(F.when(F.col("n") < 2, F.lit(0.0)).otherwise(F.lit(1.0))).alias("e_c"),
    )


def getis_ord_gstar(
    cells: DataFrame,
    i_col: str = "i",
    j_col: str = "j",
    value_col: str = "value",
    ndigits: int = 6,
) -> DataFrame:
    """Getis–Ord Gi* hot/cold-spot z-score PER CELL (rook + self
    neighborhood) — the raster hotspot detector (where Moran's I says
    "clustered somewhere", Gi* says WHERE):
    Gi* = (Σ_{b∈N(a)} x_b − x̄·m_a) / (S·sqrt((n·m_a − m_a²)/(n−1)))
    with m_a = |N(a)| (4-neighbors + self; borders and missing cells
    simply have smaller m — the standard treatment).

    Determinism: integer inputs; local sums and global moments are exact
    DECIMAL(38,0); multiplying num/den by n gives
    z = (n·L_a − S·m_a) / (sqrt(n·Q − S²) · sqrt((n·m_a − m_a²)/(n−1)))
    — two correctly-rounded sqrts and one division in a FIXED operand
    order, written identically in the DuckDB oracle.

    Scale shape: the neighborhood sum is a UNION of 5 shifted projections
    of the cell relation grouped back on (i, j) then inner-joined to the
    existing cells — all equi operations on grid keys, output one row per
    cell; global moments broadcast. Nothing quadratic, no spatial index.

    Output (n rows): (i, j, m, local_sum, z_gstar)."""
    base = cells.select(
        F.col(i_col).alias("_i"),
        F.col(j_col).alias("_j"),
        F.col(value_col).cast("long").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    shifts = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)]
    contrib = None
    for di, dj in shifts:
        c = base.select(
            (F.col("_i") + di).alias("_i"),
            (F.col("_j") + dj).alias("_j"),
            F.col("_x").alias("_xn"),
        )
        contrib = c if contrib is None else contrib.unionByName(c)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    local = contrib.groupBy("_i", "_j").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(dec(F.col("_xn"))).alias("lsum"),
    )
    cellsn = base.join(local, ["_i", "_j"])
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("_x"))).alias("s"),
        F.sum(dec(F.col("_x")) * F.col("_x")).alias("q"),
    )
    jn = cellsn.crossJoin(F.broadcast(tot))
    n = F.col("n").cast("double")
    m = F.col("m").cast("double")
    num = n * F.col("lsum").cast("double") - F.col("s").cast("double") * m
    den = F.sqrt(
        n * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast("double")
    ) * F.sqrt((n * m - m * m) / (n - F.lit(1.0)))
    z = F.when((F.col("n") < 2) | (den == 0.0), F.lit(0.0)).otherwise(num / den)
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return jn.select(
        F.col("_i").alias("i"),
        F.col("_j").alias("j"),
        F.col("m"),
        F.col("lsum").cast("long").alias("local_sum"),
        rnd(z).alias("z_gstar"),
    )


def semivariogram(
    cells: DataFrame,
    i_col: str = "i",
    j_col: str = "j",
    value_col: str = "value",
    max_lag: int = 6,
    ndigits: int = 6,
) -> DataFrame:
    """Empirical semivariogram γ(h) along the grid axes, h = 1..max_lag
    (axis-pooled isotropic estimate): γ(h) = Σ_pairs (x_a−x_b)² /
    (2·N_h). The spatial-correlation-length readout raster consumers fit
    range/sill/nugget models to (the reference's gridMET fields are the
    canonical input shape).

    Determinism: integer inputs; Σd² exact DECIMAL(38,0) per lag; one
    double division per output row.

    Scale shape: 2·max_lag equi self-joins on shifted grid keys (each
    |cells|-sized, pruned by the join key — no distance computation, no
    spatial index, nothing quadratic); one k-row aggregate.

    Output (max_lag rows): (lag, n_pairs, gamma)."""
    base = cells.select(
        F.col(i_col).alias("_i"),
        F.col(j_col).alias("_j"),
        F.col(value_col).cast("long").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    pairs = None
    for h in range(1, int(max_lag) + 1):
        ri = base.select(
            (F.col("_i") - h).alias("_i"), F.col("_j"), F.col("_x").alias("_xb")
        )
        rj = base.select(
            F.col("_i"), (F.col("_j") - h).alias("_j"), F.col("_x").alias("_xb")
        )
        p = base.join(ri, ["_i", "_j"]).select(
            F.lit(h).alias("lag"), F.col("_x").alias("_xa"), "_xb"
        ).unionByName(
            base.join(rj, ["_i", "_j"]).select(
                F.lit(h).alias("lag"), F.col("_x").alias("_xa"), "_xb"
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    acc = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(dec(F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb"))).alias("sdd"),
    )
    gamma = F.when(F.col("n_pairs") == 0, F.lit(0.0)).otherwise(
        F.col("sdd").cast("double") / (2.0 * F.col("n_pairs").cast("double"))
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n_pairs"),
        rnd(gamma).alias("gamma"),
    )


def ripley_k(
    cells: DataFrame,
    i_col: str = "i",
    j_col: str = "j",
    max_r: int = 4,
    area: int | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Ripley's K for a point pattern on a grid (Chebyshev distance,
    no edge correction — documented choice; border cells simply find
    fewer neighbors, biasing K̂ down symmetrically on both engines):
    K̂(r) = A·Σ_{a≠b} 1(d(a,b) ≤ r)/n² — is the pattern clustered
    (K̂ above the CSR expectation (2r+1)²−1 scaled) or inhibited?

    Scale shape: the (2·max_r+1)²−1 neighbor offsets EXPLODE onto the
    point relation (|points|·|offsets| rows, offsets bounded) and ONE
    equi join on (i, j) counts all ordered pairs per distance — no
    distance predicate, no quadratic candidate set.

    Determinism: pair counts are exact integers; K̂ is one double
    expression. ``area`` defaults to the bounding-box cell count (an
    exact integer derived from the data).

    Output per r = 1..max_r: (r, n_points, n_pairs, k_est)."""
    base = cells.select(
        F.col(i_col).alias("_i"), F.col(j_col).alias("_j")
    ).distinct()
    offs = [
        (di, dj, max(abs(di), abs(dj)))
        for di in range(-max_r, max_r + 1)
        for dj in range(-max_r, max_r + 1)
        if (di, dj) != (0, 0)
    ]
    off_df = F.array(
        *[
            F.struct(
                F.lit(di).alias("di"), F.lit(dj).alias("dj"), F.lit(d).alias("d")
            )
            for di, dj, d in offs
        ]
    )
    shifted = (
        base.select("_i", "_j", F.explode(off_df).alias("_o"))
        .select(
            (F.col("_i") + F.col("_o.di")).alias("_i"),
            (F.col("_j") + F.col("_o.dj")).alias("_j"),
            F.col("_o.d").alias("_d"),
        )
    )
    hits = shifted.join(base, ["_i", "_j"]).groupBy("_d").agg(
        F.count(F.lit(1)).cast("long").alias("_pairs_at")
    )
    # densify: a distance ring with ZERO pairs must still emit its row
    # (cumulative K(r) is defined for every r = 1..max_r)
    rings = cells.sparkSession.createDataFrame(
        [(r,) for r in range(1, int(max_r) + 1)], "_d int"
    )
    dense = rings.join(hits, "_d", "left").na.fill({"_pairs_at": 0})
    wc = Window.orderBy("_d").rowsBetween(Window.unboundedPreceding, 0)
    cum = dense.select(
        F.col("_d").alias("r"),
        F.sum("_pairs_at").over(wc).cast("long").alias("n_pairs"),
    )
    ext = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        (
            (F.max("_i") - F.min("_i") + 1) * (F.max("_j") - F.min("_j") + 1)
        ).cast("long").alias("_bbox"),
    )
    jn = cum.crossJoin(F.broadcast(ext))
    a = F.lit(float(area)) if area is not None else F.col("_bbox").cast("double")
    k_est = F.when(F.col("n_points") == 0, F.lit(0.0)).otherwise(
        a
        * F.col("n_pairs").cast("double")
        / (F.col("n_points").cast("double") * F.col("n_points").cast("double"))
    )
    return jn.select(
        F.col("r").cast("int").alias("r"),
        "n_points",
        "n_pairs",
        (F.round(k_est, ndigits) + F.lit(0.0)).alias("k_est"),
    )
