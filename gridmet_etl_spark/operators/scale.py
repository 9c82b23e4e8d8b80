"""Scale utilities: bucketed co-located joins and skew-salted aggregation.

These are the knobs the 100 TB deployment turns (SURVEY §4, BASELINE
targets); local tests assert their plan-level effects so the properties are
regression-guarded, not aspirational.

- **Bucketing**: writing the grid bucketed by (i, j) makes the weights join
  AND the per-cell ensemble median shuffle-free for any table written with
  the same bucketing (exchange elimination via HashClusteredDistribution).
  At 100 TB this is the difference between re-shuffling the fact table per
  query and never shuffling it at all.
- **Salting**: when group keys are heavily skewed (one feature covering a
  continent; one document hash owning half the corpus), a two-phase
  salted aggregation bounds any single task's input. AQE's skew-join
  handling covers joins; this covers aggregations, which AQE does not
  re-split.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: tuple[str, ...] = ("i", "j"),
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Persist as a bucketed (+ optionally sorted) table. Joins/groupBys on
    a prefix-compatible key against same-bucketed tables skip their
    exchange; sorted buckets additionally skip the sort of a sort-merge
    join."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a stale location from a previous session (in-memory catalog, on-disk
    # warehouse) blocks saveAsTable — clear it
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table_name.lower()}", ignore_errors=True)

    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def salted_sum(
    df: DataFrame,
    group_cols: list[str],
    agg_cols: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation for algebraic aggregates:
    phase 1 groups on (keys, salt) — bounding any task to ~1/n_salts of the
    hottest key — phase 2 merges partials on the true keys.

    ``agg_cols``: {column: "sum"|"count"|"min"|"max"}. Algebraic only —
    avg/median must be decomposed by the caller (sum+count / percentile
    sketch)."""
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    phase1_aggs = []
    for c, how in agg_cols.items():
        if how == "count":
            phase1_aggs.append(F.count(c).alias(f"_p_{c}"))
        elif how == "sum":
            phase1_aggs.append(F.sum(c).alias(f"_p_{c}"))
        elif how == "min":
            phase1_aggs.append(F.min(c).alias(f"_p_{c}"))
        elif how == "max":
            phase1_aggs.append(F.max(c).alias(f"_p_{c}"))
        else:
            raise ValueError(f"non-algebraic aggregate {how!r}")
    merge = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    phase2_aggs = [
        merge[how](f"_p_{c}").alias(f"{how}_{c}") for c, how in agg_cols.items()
    ]
    return (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(*phase1_aggs)
        .groupBy(*group_cols)
        .agg(*phase2_aggs)
    )


def zorder_key(
    i: Column | str,
    j: Column | str,
    bits: int = 16,
) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of two cell
    indexes — the write-layout clustering key that keeps spatially-near
    cells byte-near in storage, so a bbox predicate touches O(few) row
    groups instead of striping across the whole file. Pure bit arithmetic
    (codegen, no shuffle); used as ``df.repartitionByRange(N,
    zorder_key("i","j")).sortWithinPartitions(...)`` at write time.

    Sound for 0 ≤ i,j < 2^bits (grid indexes are bounded by the raster
    dims); bits ≤ 31 keeps the result in a positive long.
    """
    ic = F.col(i) if isinstance(i, str) else i
    jc = F.col(j) if isinstance(j, str) else j
    ic, jc = ic.cast("long"), jc.cast("long")
    key = F.lit(0).cast("long")
    for b in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftrightunsigned(ic, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftrightunsigned(jc, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return key


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi-join for a hot-keyed fact against a small dim WITHOUT
    broadcast (the fallback when the dim exceeds the broadcast budget but a
    handful of fact keys dominate): the fact side salts each row into one of
    ``n_salts`` sub-keys; the dim side replicates every row across all
    salts. The shuffle then spreads the hottest key over n_salts tasks
    instead of one straggler. Result is EXACTLY the plain join (salting
    only refines the partitioning — the oracle is the unsalted form).

    AQE's skew-join handles the sort-merge case adaptively; explicit
    salting remains the portable form for shuffle-hash joins and for
    engines/stages where AQE cannot split (e.g. bucketed tables).

    Output: fact columns + dim columns (key deduplicated).
    """
    salt = (F.rand(seed=7) * n_salts).cast("int")
    f = fact.withColumn("_salt", salt)
    d = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    return f.join(d, [key, "_salt"]).drop("_salt")


def global_rank(
    df: DataFrame,
    order_col: str,
    tie_cols: Sequence[str] = (),
    n_parts: int | None = None,
    with_rank: bool = True,
) -> DataFrame:
    """Distributed GLOBAL ranking — the scale-correct replacement for the
    `Window.orderBy(...)` single-partition global sort.

    Shape: range-repartition on the order column (equal values co-locate —
    RangePartitioner maps a key to exactly one partition) and sort within
    partitions; per-row positions come from ``monotonically_increasing_id``
    (consecutive within a sorted partition), so NO second full-data
    exchange is needed — the only extra relations are the |partitions|-row
    count/min-id stats (whose offset cumsum is the one bounded
    single-partition window) and the |distinct values|-row tie relation
    (average rank of a tie run = first_rank + (run_len−1)/2, since global
    row numbers within a tie run are consecutive). Output adds:

    - ``rn``:   global row number under (order_col, tie_cols) order
    - ``rank``: average rank over ties on order_col alone (the form rank
      tests need: Mann-Whitney, AUC, KS). Skipped entirely when
      ``with_rank=False`` — rn-only consumers (quantile_normalize) avoid
      the tie groupBy + join pair.

    The tie join is value-keyed; Catalyst broadcasts it while the distinct
    relation is small and falls back to a shuffle join at cardinality —
    consumers that only need per-value ranks (rank sums per group) can
    aggregate the tie relation directly.
    """
    from pyspark.sql import Window

    n = n_parts or df.sparkSession.sparkContext.defaultParallelism
    rp = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col, *tie_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    # CORRECTNESS: pin ONE evaluation of the partitioned+sorted relation.
    # The stats branch below and the probe side both consume rp; when
    # column pruning makes their subplans differ (any payload column does
    # it), Catalyst plans TWO range exchanges whose partition bounds are
    # sampled independently (RangePartitioner seeds by rdd id) — then _m0/
    # _c come from one partitioning and _mid from another, and rn silently
    # gains gaps+duplicates. The lazy local checkpoint makes every branch
    # read the same materialized partitions (and, as a bonus, runs the
    # range sort ONCE instead of once per branch; the build side always
    # completes before the probe stage, so materialization is race-free).
    rp = rp.localCheckpoint(eager=False)
    stats = rp.groupBy("_pid").agg(
        F.count("*").alias("_c"), F.min("_mid").alias("_m0")
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = stats.select(
        "_pid",
        "_m0",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
    )
    ranked = (
        rp.join(F.broadcast(offs), "_pid")
        .withColumn("rn", F.col("_mid") - F.col("_m0") + 1 + F.col("_off"))
        .drop("_pid", "_mid", "_m0", "_off")
    )
    if not with_rank:
        return ranked
    # ties on order_col occupy consecutive global row numbers, so the
    # average rank of a run is min + (len-1)/2 — no second ranking pass
    avg_r = ranked.groupBy(order_col).agg(
        (F.min("rn") + (F.count("*") - 1) / 2.0).alias("rank")
    )
    return ranked.join(avg_r, order_col)


def hilbert_key_stages(
    df: DataFrame,
    i_col: str = "i",
    j_col: str = "j",
    bits: int = 6,
    out_col: str = "hkey",
) -> DataFrame:
    """Hilbert-curve index d = xy2d(i, j) for 0 ≤ i,j < 2^bits — the
    clustering key that strictly dominates Morton for range scans: the
    Hilbert curve has no Z-shaped jumps, so a square bbox maps to fewer,
    longer runs of the key (fewer row groups touched; see the
    curve_layout_compare query for the measured prune-rate gap).

    The classic per-bit rotate-and-reflect recurrence is SEQUENTIAL in the
    bit index, so it is unrolled as ``bits`` chained projections — each
    stage references the previous stage's columns BY NAME (no expression-
    tree doubling), all codegen, no shuffle, O(bits) cost per row. The
    same unroll maps 1:1 onto chained CTEs for the DuckDB oracle.

    Returns df plus ``out_col`` (BIGINT); input columns pass through.
    """
    keep = [c for c in df.columns]
    cur = df.select(
        *keep,
        F.col(i_col).cast("long").alias("_hx"),
        F.col(j_col).cast("long").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    for b in reversed(range(bits)):
        s = 1 << b
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        cur = cur.select(
            *keep,
            "_hx",
            "_hy",
            "_hd",
            rx.cast("long").alias("_rx"),
            ry.cast("long").alias("_ry"),
        )
        x_new = (
            F.when(
                F.col("_ry") == 0,
                F.when(F.col("_rx") == 1, F.lit(s - 1) - F.col("_hy")).otherwise(
                    F.col("_hy")
                ),
            )
            .otherwise(F.col("_hx"))
        )
        y_new = (
            F.when(
                F.col("_ry") == 0,
                F.when(F.col("_rx") == 1, F.lit(s - 1) - F.col("_hx")).otherwise(
                    F.col("_hx")
                ),
            )
            .otherwise(F.col("_hy"))
        )
        d_new = F.col("_hd") + F.lit(s * s) * (
            (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry"))
        )
        cur = cur.select(
            *keep,
            x_new.alias("_hx"),
            y_new.alias("_hy"),
            d_new.alias("_hd"),
        )
    return cur.select(*keep, F.col("_hd").alias(out_col))
