"""Planner-statistics operators: MCV tables, exact equi-height histogram
bounds, zone-map (data-skipping) statistics, and a stats-driven left-deep
join-order advisor — the ANALYZE-TABLE layer a 100 TB warehouse runs so
query planning is driven by measured numbers, not guesses.

Spark collects similar statistics via ``ANALYZE TABLE ... COMPUTE STATISTICS
FOR COLUMNS`` into the catalog; these operators materialize them as plain
DataFrames so they are queryable, mergeable across ingest batches, joinable
into QA reports, and oracle-checkable. The reference has no optimizer
(SURVEY §4 — its plan is the Python call order), so this is engine-extension
surface: the statistics layer Catalyst's CBO would consume.

Scale notes (local[32] tests, 1000-executor design):

- ``mcv_stats`` stacks c columns row-locally (map-side ×c, collapsed by
  partial aggregation before the one |column,value| shuffle); the top-k
  window is row_number+filter, which Spark rewrites to WindowGroupLimit —
  per-partition k-pruning BEFORE the exchange, so a high-NDV column never
  funnels its full value set through one task.
- ``equiheight_bounds`` rides ``scale.global_rank`` (range partition +
  |partitions|-row offset cumsum) — never a single-partition data sort.
  Bucket boundaries depend only on the sorted value MULTISET (bucket b's
  members are rank positions [b·n/nb, (b+1)·n/nb)), so no tie-break column
  is needed for determinism.
- ``zone_map_stats`` is the same ranked pass aggregated to |zones| rows;
  ``zone_prune_report`` then joins a bounded literal predicate relation
  against the zone relation (|zones| = n/zone_rows — the zone table for a
  100 TB fact at 1M-row zones is ~100k rows, driver-safe by construction).
- ``join_chain_advisor`` reduces each side to a ONE-ROW stats aggregate
  (count + join-key NDV) and combines the three 1-row relations with
  broadcast crossJoins — the candidate enumeration never touches data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import topk_per_group
from .scale import global_rank


def mcv_stats(
    df: DataFrame,
    cols: Sequence[str],
    k: int = 5,
    ndigits: int = 6,
) -> DataFrame:
    """Most-common-value table (pg_stats style): for each column in
    ``cols``, the top-k values by frequency (value-string tie-break) with
    their occurrence fraction of non-null rows.

    Output: (column, value, n, frac, rnk) — value cast to string so one
    relation carries mixed-typed columns, exactly like the catalog's MCV
    slot."""
    stacked = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.col(c).cast("string").alias("value"),
                        )
                        for c in cols
                    ]
                )
            ).alias("s")
        )
        .select("s.*")
        .where(F.col("value").isNotNull())
    )
    counts = stacked.groupBy("column", "value").agg(F.count(F.lit(1)).alias("n"))
    nn = stacked.groupBy("column").agg(F.count(F.lit(1)).alias("n_nonnull"))
    top = topk_per_group(counts, ["column"], order_col="n", id_col="value", k=k)
    return (
        top.join(F.broadcast(nn), "column")
        .select(
            "column",
            "value",
            "n",
            (F.round(F.col("n") / F.col("n_nonnull").cast("double"), ndigits) + F.lit(0.0)).alias(
                "frac"
            ),
            F.col("rank").cast("int").alias("rnk"),
        )
    )


def equiheight_bounds(
    df: DataFrame,
    value_col: str,
    nb: int = 8,
) -> DataFrame:
    """Exact equi-height histogram: rows are ranked globally on
    ``value_col`` (distributed range partition, no single-partition sort)
    and bucket b = floor((rn-1)·nb / n) collects ranks [b·n/nb, (b+1)·n/nb)
    — each bucket holds n/nb rows ±1. Output per bucket: its lower bound
    (min value) and exact row count. NULLs are dropped (they carry no
    ordering information; the profile layer counts them separately).

    This is the optimizer's height-balanced histogram: selectivity of a
    range predicate = covered buckets / nb."""
    nonnull = df.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    ranked = global_rank(nonnull, "v", with_rank=False)
    # count-only pass (no sort) — re-deriving n from the ranked lineage
    # would execute the range partition + sort a second time
    total = nonnull.agg(F.count(F.lit(1)).alias("n_total"))
    bucket = F.floor((F.col("rn") - 1) * nb / F.col("n_total")).cast("int")
    return (
        ranked.crossJoin(F.broadcast(total))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def zone_map_stats(
    df: DataFrame,
    order_col: str,
    stat_cols: Sequence[str],
    zone_rows: int = 4096,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Zone-map (block-range / data-skipping) statistics under a layout
    CLUSTERED on ``order_col``: rows are globally ranked on the layout key,
    zone = floor((rn-1)/zone_rows) models the physical block, and each
    zone records min/max of every ``stat_cols`` entry plus its row count —
    exactly the parquet row-group / ORC stripe index a scan prunes with.

    Zone contents are rank-determined, so for a layout key with ties the
    zone STATISTICS of tied boundary rows can differ between engines only
    if stat_cols values differ within a tie run — callers who need strict
    cross-engine determinism pass ``tie_cols`` completing a unique sort key
    (the contract query uses (l_orderkey, l_linenumber)).
    Output: (zone, n_rows, <c>_min/<c>_max ...)."""
    ranked = global_rank(
        df.select(
            F.col(order_col).alias("_ok"),
            *[F.col(c) for c in dict.fromkeys([*tie_cols, *stat_cols])],
        ),
        "_ok",
        tie_cols=list(tie_cols),
        with_rank=False,
    )
    zone = F.floor((F.col("rn") - 1) / zone_rows).cast("int")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return ranked.groupBy(zone.alias("zone")).agg(*aggs)


def zone_prune_report(
    zones: DataFrame,
    predicates: Sequence[tuple[str, str, object, object]],
    ndigits: int = 6,
) -> DataFrame:
    """Given a ``zone_map_stats`` relation and range predicates
    ``(name, col, lo, hi)`` (lo/hi as plan-time literals of the zone
    column's own type), report how much a zone-pruned scan would skip:
    (predicate, n_zones, n_zones_scanned, n_rows_scanned, prune_frac).

    A zone is scanned iff [col_min, col_max] overlaps [lo, hi] — the
    standard block-skipping test, inlined per predicate as a TYPED
    comparison on that predicate's min/max pair (never a stringly-typed
    dispatch: '9' > '10' lexicographically). The predicate set is a
    bounded literal explode against the |zones|-row stats table; no
    fact-table access at all (that is the point: the advisor answers 'is
    this layout worth it for this workload' from statistics alone)."""
    preds = F.array(
        *[
            F.struct(
                F.lit(name).alias("predicate"),
                (
                    (F.col(f"{col}_max") >= F.lit(lo))
                    & (F.col(f"{col}_min") <= F.lit(hi))
                ).alias("hit"),
            )
            for name, col, lo, hi in predicates
        ]
    )
    exploded = zones.select(F.col("n_rows"), F.explode(preds).alias("p"))
    hit = F.col("p.hit")
    per = exploded.groupBy(F.col("p.predicate").alias("predicate")).agg(
        F.count(F.lit(1)).alias("n_zones"),
        F.sum(hit.cast("long")).alias("n_zones_scanned"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(F.lit(0))).alias("n_rows_scanned"),
        F.sum("n_rows").alias("n_rows_total"),
    )
    return per.select(
        "predicate",
        "n_zones",
        "n_zones_scanned",
        "n_rows_scanned",
        (
            F.round(
                F.lit(1.0) - F.col("n_rows_scanned") / F.col("n_rows_total").cast("double"),
                ndigits,
            )
            + F.lit(0.0)
        ).alias("prune_frac"),
    )


def join_chain_advisor(
    a: DataFrame,
    a_key: str,
    b: DataFrame,
    b_key_a: str,
    b_key_c: str,
    c: DataFrame,
    c_key: str,
    names: tuple[str, str, str] = ("A", "B", "C"),
) -> DataFrame:
    """Cost-based left-deep order choice for the chain A ⋈ₖ₁ B ⋈ₖ₂ C using
    the textbook uniform-NDV estimator |R ⋈ S| = |R|·|S| / max(ndv_R(k),
    ndv_S(k)) — the System-R / Catalyst-CBO formula, fed by one-row stats
    aggregates (count + exact join-key NDV per side; swap in HLL NDV at the
    scale where exact distinct is not worth its shuffle).

    Candidates: start with A⋈B (intermediate est_ab) or B⋈C (est_bc); the
    A–C start has no join key and is scored as the cross product — the
    advisor exists to rank it out. Output one row per candidate:
    (join_order, est_intermediate, est_final, chosen). Integer arithmetic
    (floor) throughout, so the ranking is engine-exact."""
    sa = a.agg(
        F.count(F.lit(1)).alias("n_a"), F.countDistinct(a_key).alias("ndv_a")
    )
    sb = b.agg(
        F.count(F.lit(1)).alias("n_b"),
        F.countDistinct(b_key_a).alias("ndv_b_a"),
        F.countDistinct(b_key_c).alias("ndv_b_c"),
    )
    sc = c.agg(
        F.count(F.lit(1)).alias("n_c"), F.countDistinct(c_key).alias("ndv_c")
    )
    stats = sa.crossJoin(F.broadcast(sb)).crossJoin(F.broadcast(sc))
    est_ab = F.floor(
        F.col("n_a") * F.col("n_b") / F.greatest("ndv_a", "ndv_b_a")
    )
    est_bc = F.floor(
        F.col("n_b") * F.col("n_c") / F.greatest("ndv_b_c", "ndv_c")
    )
    est_ac = F.col("n_a") * F.col("n_c")  # no key: cross product
    # final size is order-independent under the uniform assumption; compute
    # it off the AB intermediate (key k2's NDV survives B unchanged)
    est_final = F.floor(est_ab * F.col("n_c") / F.greatest("ndv_b_c", "ndv_c"))
    n_ab, n_bc = names[0] + "*" + names[1], names[1] + "*" + names[2]
    n_ac = names[0] + "*" + names[2]
    cands = F.array(
        F.struct(F.lit(n_ab + " first").alias("join_order"), est_ab.alias("est_intermediate")),
        F.struct(F.lit(n_bc + " first").alias("join_order"), est_bc.alias("est_intermediate")),
        F.struct(F.lit(n_ac + " first (cross)").alias("join_order"), est_ac.alias("est_intermediate")),
    )
    best = F.least(est_ab, est_bc, est_ac)
    return (
        stats.select(
            F.explode(cands).alias("cand"),
            est_final.alias("est_final"),
            best.alias("_best"),
        )
        .select(
            F.col("cand.join_order").alias("join_order"),
            F.col("cand.est_intermediate").alias("est_intermediate"),
            "est_final",
            (F.col("cand.est_intermediate") == F.col("_best")).alias("chosen"),
        )
    )


def selectivity_estimate(
    bounds: DataFrame,
    lo: float,
    hi: float,
    ndigits: int = 6,
) -> DataFrame:
    """Histogram selectivity estimation: given an ``equiheight_bounds``
    relation, estimate how many rows a range predicate [lo, hi] selects
    under the uniform-within-bucket assumption — the estimator every CBO
    runs against its height-balanced histograms. Fully-covered buckets
    contribute their exact count; a partially-covered bucket contributes
    count · overlap/(width) (degenerate zero-width buckets contribute
    all-or-nothing). One |buckets|-row pass; the fact table is never
    touched. Output: ONE row (est_rows, sel_est)."""
    b_lo, b_hi, n = F.col("lo"), F.col("hi"), F.col("n_rows")
    llo, lhi = F.lit(float(lo)), F.lit(float(hi))
    ov = F.least(lhi, b_hi) - F.greatest(llo, b_lo)
    frac = F.when(
        (b_hi <= lhi) & (b_lo >= llo), F.lit(1.0)
    ).when(
        b_hi == b_lo,
        F.when((b_lo >= llo) & (b_lo <= lhi), F.lit(1.0)).otherwise(F.lit(0.0)),
    ).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), ov / (b_hi - b_lo)))
    )
    return bounds.agg(
        (F.round(F.sum(frac * n), ndigits) + F.lit(0.0)).alias("est_rows"),
        (
            F.round(F.sum(frac * n) / F.sum(n), ndigits) + F.lit(0.0)
        ).alias("sel_est"),
    )


def qerror(est: F.Column, actual: F.Column, ndigits: int = 6) -> F.Column:
    """Classic q-error: max(est/actual, actual/est) with the standard
    ≥1-clamp guards (est and actual floored at 1 so empty results don't
    divide by zero) — the metric cardinality-estimation papers report."""
    e = F.greatest(est.cast("double"), F.lit(1.0))
    a = F.greatest(actual.cast("double"), F.lit(1.0))
    return F.round(F.greatest(e / a, a / e), ndigits) + F.lit(0.0)


def layout_advisor(
    df: DataFrame,
    layouts: Sequence[str],
    predicates: Sequence[tuple[str, str, object, object]],
    zone_rows: int = 4096,
    tie_cols: Sequence[str] = (),
    ndigits: int = 6,
) -> DataFrame:
    """Data-layout (clustering-key) advisor: for each candidate layout
    column, build its zone-map statistics and score the whole predicate
    WORKLOAD's prune rates — the measured answer to 'which sort key should
    this table be written with'. One ranked pass per candidate (|layouts|
    sorts of the stats columns, each aggregated straight down to |zones|
    rows); the per-layout score is the mean prune_frac over the workload.

    Output: (layout, predicate, prune_frac, layout_score, chosen) — one
    row per layout×predicate, ``chosen`` marking the best-scoring layout
    (layout-name tie-break)."""
    stat_cols = sorted({c for _, c, _, _ in predicates})
    reports = []
    for lc in layouts:
        zones = zone_map_stats(
            df, lc, stat_cols=stat_cols, zone_rows=zone_rows, tie_cols=tie_cols
        )
        rep = zone_prune_report(zones, predicates, ndigits=ndigits)
        reports.append(
            rep.select(
                F.lit(lc).alias("layout"),
                "predicate",
                "prune_frac",
            )
        )
    allrep = reports[0]
    for r in reports[1:]:
        allrep = allrep.unionByName(r)
    from pyspark.sql import Window

    score = F.round(
        F.avg("prune_frac").over(Window.partitionBy("layout")), ndigits
    ) + F.lit(0.0)
    scored = allrep.withColumn("layout_score", score)
    best = F.max(F.struct(F.col("layout_score"), F.col("layout"))).over(
        Window.partitionBy()
    )
    return scored.select(
        "layout",
        "predicate",
        "prune_frac",
        "layout_score",
        (
            (F.col("layout_score") == best["layout_score"])
            & (F.col("layout") == best["layout"])
        ).alias("chosen"),
    )


def curve_layout_compare(
    cells: DataFrame,
    boxes: Sequence[tuple[str, int, int, int, int]],
    bits: int = 6,
    zone_rows: int = 64,
    ndigits: int = 6,
) -> DataFrame:
    """Space-filling-curve layout bake-off: build zone maps for the SAME
    cell set clustered by Morton (zorder_key) and by Hilbert
    (hilbert_key_stages), score every bbox predicate with the 2-D
    block-skipping test (zone scanned iff BOTH its i-range and j-range
    overlap the box), and report per (curve, box) prune rates — the
    layout_advisor question answered across curves, from statistics
    alone.

    Hilbert wins on square-ish boxes because it has no Z-jumps: a box maps
    to fewer, longer key runs, so fewer zones straddle it. boxes:
    (name, ilo, ihi, jlo, jhi) plan-time literals. Costs two bounded
    global ranks of the |cells| relation; no fact-table rescans."""
    from .scale import hilbert_key_stages, zorder_key

    base = cells.select("i", "j")
    zk = base.select("i", "j", zorder_key("i", "j", bits=bits).alias("key"))
    hk = hilbert_key_stages(base, bits=bits, out_col="key")
    zones = zone_map_stats(zk, "key", ["i", "j"], zone_rows).withColumn(
        "curve", F.lit("zorder")
    ).unionByName(
        zone_map_stats(hk, "key", ["i", "j"], zone_rows).withColumn(
            "curve", F.lit("hilbert")
        )
    )
    preds = F.array(
        *[
            F.struct(
                F.lit(name).alias("box"),
                (
                    (F.col("i_max") >= F.lit(ilo))
                    & (F.col("i_min") <= F.lit(ihi))
                    & (F.col("j_max") >= F.lit(jlo))
                    & (F.col("j_min") <= F.lit(jhi))
                ).alias("hit"),
            )
            for name, ilo, ihi, jlo, jhi in boxes
        ]
    )
    exploded = zones.select("curve", "n_rows", F.explode(preds).alias("p"))
    hit = F.col("p.hit")
    per = exploded.groupBy("curve", F.col("p.box").alias("box")).agg(
        F.count(F.lit(1)).alias("n_zones"),
        F.sum(hit.cast("long")).alias("n_zones_scanned"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(F.lit(0))).alias(
            "n_rows_scanned"
        ),
        F.sum("n_rows").alias("n_rows_total"),
    )
    return per.select(
        "curve",
        "box",
        "n_zones",
        "n_zones_scanned",
        "n_rows_scanned",
        (
            F.round(
                F.lit(1.0)
                - F.col("n_rows_scanned") / F.col("n_rows_total").cast("double"),
                ndigits,
            )
            + F.lit(0.0)
        ).alias("prune_frac"),
    )
