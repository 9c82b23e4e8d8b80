"""Deterministic sampling / splitting / shard-packing operators for
training-data pipelines (BASELINE.json north star: the export side of a
100 TB corpus — train/val/test splits, stratified subsampling, and packing
documents into token-budgeted output shards).

Everything here is DETERMINISTIC (hash-derived, no RNG) so results are
reproducible across runs, engines, and partitionings — and therefore
DuckDB-oracle-checkable. The hash primitive is the cross-engine trick from
the dedup/similarity operators: Spark ``conv(substr(md5(s),1,6),16,10)`` ≡
DuckDB ``CAST('0x'||substr(md5(s),1,6) AS BIGINT)`` — 24 bits of md5 as an
integer in [0, 2^24).

Scale notes per operator are in the docstrings; the headline one is
``pack_shards``'s two-level prefix sum, which replaces the
single-partition global running-sum window with a per-group window plus a
broadcast of group offsets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 1 << 24  # 24 bits of md5 → integer bucket space


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic uniform bucket in [0, 2^24) from md5 of the key (+salt).
    Pure codegen expression; identical values in the DuckDB oracle."""
    s = F.concat(F.lit(salt), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 6), 16, 10).cast("long")


def sql_hash_bucket(key_expr: str, salt: str = "") -> str:
    """DuckDB twin of ``hash_bucket`` (single source of truth for oracles)."""
    return (
        f"CAST(('0x' || substr(md5('{salt}' || CAST({key_expr} AS VARCHAR)), 1, 6))"
        f" AS BIGINT)"
    )


def hash_sample(
    docs: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash bucket falls
    below ``fraction`` of the bucket space. Unlike ``df.sample`` this is
    stable across runs/partitionings and reproducible in any engine —
    membership is a pure function of the id. Narrow filter, no shuffle;
    predicate evaluates at scan speed over 100 TB."""
    return docs.filter(hash_bucket(F.col(id_col), salt) < int(fraction * HASH_BUCKETS))


def deterministic_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/'test' by default) by
    hash-bucket range — the standard leakage-safe way to split a training
    corpus: membership depends only on the id, so re-runs, new data, and
    different partitionings never move a document across splits.

    ``weights`` maps label → fraction (must sum to ~1); ranges are assigned
    in dict order. Narrow projection — no shuffle."""
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = hash_bucket(F.col(id_col), salt)
    expr = None
    upper = 0.0
    labels = list(weights.items())
    for label, w in labels[:-1]:
        upper += w
        cond = bucket < int(upper * HASH_BUCKETS)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last_label = labels[-1][0]
    split = F.lit(last_label) if expr is None else expr.otherwise(F.lit(last_label))
    return docs.withColumn("split", split)


def stratified_sample(
    docs: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen deterministically: rank rows within each stratum by
    hash-of-id and keep the first n. One shuffle on the strata key.

    Scale: the window is per-stratum, so parallelism = number of strata; a
    skewed stratum serializes through one task. For huge strata, pre-filter
    with ``hash_sample`` at a few× the target rate, then rank — the window
    then sees O(n_per_stratum) rows per stratum instead of the full corpus."""
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def mixture_sample(
    docs: DataFrame,
    source_col: str,
    target_counts: dict[str, int],
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Training-mix sampling: draw a fixed number of documents PER SOURCE
    (the "data mixture" step of corpus assembly — e.g. 3 parts web, 1 part
    code, 1 part books). Deterministic: within each source, rows are ranked
    by hash-of-id and the first ``target_counts[source]`` kept; sources not
    in the dict are dropped. Smaller-than-target sources yield all rows
    (upsampling/repetition is the trainer's job, not the sampler's).

    Same scale shape as ``stratified_sample``: one shuffle on the source
    key; pre-thin giant sources with ``hash_sample`` first."""
    quota = F.create_map(
        *[F.lit(x) for kv in target_counts.items() for x in kv]
    )[F.col(source_col)]
    w = Window.partitionBy(source_col).orderBy(
        hash_bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        docs.withColumn("_q", quota)
        .filter(F.col("_q").isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_q"))
        .drop("_q", "_rk")
    )


def mixture_weights(
    docs: DataFrame,
    source_col: str = "source",
    size_col: str | None = None,
    alpha: float = 0.5,
    ndigits: int = 6,
) -> DataFrame:
    """Temperature-smoothed source mixture shares — the step that DECIDES
    the per-source quotas ``mixture_sample`` consumes. Raw share p_i =
    n_i/Σn over-trains the biggest crawl; the temperature-α mixture
    q_i ∝ n_i^α (α<1 upweights small high-quality sources — multilingual
    and data-mixture practice) flattens it.

    ``size_col=None`` sizes sources by document count, else by Σ size_col
    (token-weighted). α=0.5 (the default) is computed via sqrt, which IEEE
    correctly rounds — bit-identical across engines, so the contract query
    hash-checks exactly; other α use pow (libm, last-ulp engine variance).

    Scale shape: ONE |sources|-row partial agg; the normalization terms
    are a broadcast 1-row scalar. Output: (source, n_docs, size,
    share_raw, share_temp), shares rounded at ``ndigits``.
    """
    size_expr = (
        F.count(F.lit(1)).cast("double")
        if size_col is None
        else F.sum(size_col).cast("double")
    )
    per = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"), size_expr.alias("_sz")
    )
    temp = (
        F.sqrt(F.col("_sz")) if alpha == 0.5 else F.pow(F.col("_sz"), F.lit(alpha))
    )
    sized = per.withColumn("_t", temp)
    tot = sized.agg(
        F.sum("_sz").alias("_tot_sz"), F.sum("_t").alias("_tot_t")
    )
    return (
        sized.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            F.col("_sz").cast("long").alias("size"),
            (F.round(F.col("_sz") / F.col("_tot_sz"), ndigits) + F.lit(0.0)).alias(
                "share_raw"
            ),
            (F.round(F.col("_t") / F.col("_tot_t"), ndigits) + F.lit(0.0)).alias(
                "share_temp"
            ),
        )
    )


def pack_shards(
    docs: DataFrame,
    budget: int,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    group_width: int = 1_000_000,
) -> DataFrame:
    """Pack documents (in ``id_col`` order) into consecutive output shards
    of ≈ ``budget`` size units each: shard = floor(running_sum_exclusive /
    budget). The standard "write the corpus as N-token training shards" op.

    Scale design — the naive formulation is a running-sum window over a
    GLOBAL ordering, which Spark executes as a single-partition sort (one
    task sees 100 TB). Instead, a two-level prefix sum with identical
    output:

    1. group rows by coarse id range (``g = id div group_width``);
    2. per-group totals → cumulative offsets (tiny aggregate, broadcast
       back via join);
    3. within-group running sum (window partitioned BY GROUP — parallel),
       plus the group's offset.

    Output: (id, size, shard). Deterministic: depends only on ids + sizes.
    """
    g = (F.col(id_col) / group_width).cast("long").alias("_g")
    sized = docs.select(F.col(id_col), F.col(size_col)).withColumn("_g", g)
    totals = sized.groupBy("_g").agg(F.sum(size_col).alias("_gtotal"))
    offsets = totals.select(
        "_g",
        (
            F.sum("_gtotal").over(Window.orderBy("_g").rowsBetween(Window.unboundedPreceding, -1))
        ).alias("_offset"),
    ).fillna({"_offset": 0})
    w = (
        Window.partitionBy("_g")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        sized.join(F.broadcast(offsets), "_g")
        .withColumn("_before", F.coalesce(F.sum(size_col).over(w), F.lit(0)) + F.col("_offset"))
        .select(
            F.col(id_col),
            F.col(size_col),
            (F.col("_before") / budget).cast("long").alias("shard"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    salt: str = "wrs",
    round_digits: int = 6,
) -> DataFrame:
    """Weighted reservoir sampling (Efraimidis–Spirakis A-ES): each row gets
    key ``u^(1/w)`` with deterministic uniform ``u`` derived from md5 of the
    id; the k largest keys are a weighted sample without replacement.

    We rank on ``ln(u)/w`` (monotone in ``u^(1/w)``, avoids pow underflow
    for large weights), rounded so both engines agree on the rank order,
    with the id as tie-break. ``u = (bucket+1)/2^24`` ∈ (0, 1].

    Scale: pure scan + TakeOrderedAndProject (per-partition partial top-k,
    driver merges k rows) — no shuffle, no single-partition stage, stable
    under any partitioning of a 100 TB input.
    """
    u = (hash_bucket(F.col(id_col), salt) + 1) / F.lit(float(HASH_BUCKETS))
    # + 0.0 normalizes IEEE -0.0 (u == 1 gives ln 1 = 0, and a tiny negative
    # key rounds to -0.0 on one engine and 0.0 on the other — r9 sweep)
    key = F.round(F.log(u) / F.col(weight_col), round_digits) + F.lit(0.0)
    return (
        docs.select(
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            key.alias("wrs_key"),
        )
        .orderBy(F.col("wrs_key").desc(), F.col(id_col))
        .limit(k)
    )


# Curriculum difficulty-tier thresholds on chars-per-1000-tokens (mean word
# length * 1000, integer-floored). Fixed constants — NOT data-dependent
# quantiles — so stage assignment is a scan-speed predicate that never
# re-buckets when the corpus grows.
CURRICULUM_THRESHOLDS = (5300, 5500, 5650)


def curriculum_order(
    docs: DataFrame,
    thresholds: tuple[int, ...] = CURRICULUM_THRESHOLDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "curr",
) -> DataFrame:
    """Curriculum ordering for training: assign each document a difficulty
    stage (easy → hard tiers of mean word length, a classic text-difficulty
    proxy) and a deterministic within-stage shuffle key. Sorting the corpus
    by (stage, order_key) on write yields a curriculum schedule with
    shuffled stages.

    Difficulty = floor(n_chars * 1000 / n_tokens) in exact integer
    arithmetic (cross-engine safe — no float rounding at bucket edges).
    Pure projection: no shuffle, no window; the actual ordering is a
    sort-on-write concern downstream.
    """
    from .textops import tokens

    ntok = F.size(tokens(text_col))
    diff = F.floor(F.length(F.col(text_col)).cast("long") * 1000 / ntok).cast("long")
    stage = F.lit(len(thresholds))
    for i, t in enumerate(reversed(thresholds)):
        stage = F.when(diff < t, F.lit(len(thresholds) - 1 - i)).otherwise(stage)
    return docs.select(
        F.col(id_col),
        diff.alias("difficulty"),
        stage.cast("int").alias("stage"),
        hash_bucket(F.col(id_col), salt).alias("order_key"),
    )


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` (desc; id asc tie-break) —
    the per-domain 'keep the best k' curation gate. The window partitions
    per group (parallelism = |groups|, never a global sort); at extreme
    per-group cardinality the same contract is served by a groupBy
    min_by-heap aggregate, but the windowed form pipelines into
    whole-stage codegen and AQE handles moderate skew.

    Output: df columns + rank.
    """
    from pyspark.sql import Window

    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc(), F.col(id_col))
    return df.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def temporal_split(
    df: DataFrame,
    ts_col: str,
    train_end: str,
    test_start: str,
) -> DataFrame:
    """Leakage-safe TEMPORAL split for time-series training: rows strictly
    before ``train_end`` are 'train', rows at/after ``test_start`` are
    'test', and the [train_end, test_start) band is the EMBARGO — held out
    of both sides so look-ahead features computed over windows at the train
    boundary cannot peek into test (the purged/embargoed split from
    financial ML). Pure projection — a partition-pruning predicate at
    scale, no shuffle."""
    ts = F.col(ts_col)
    split = (
        F.when(ts < F.lit(train_end).cast("timestamp"), F.lit("train"))
        .when(ts >= F.lit(test_start).cast("timestamp"), F.lit("test"))
        .otherwise(F.lit("embargo"))
    )
    return df.withColumn("split", split)


def class_balance(
    df: DataFrame,
    label_col: str,
    id_col: str,
    neg_keep_pct: int = 10,
    salt: str = "bal",
) -> DataFrame:
    """Negative downsampling with importance-weight compensation — the
    CTR-training standard for 100:1 class skew: keep every positive, keep
    a deterministic md5 ``neg_keep_pct``% of negatives, and attach
    ``weight`` (1 for positives, 100/neg_keep_pct for kept negatives) so
    weighted statistics remain unbiased estimates of the full data
    (Σ weight over kept negatives ≈ original negative count).

    Hash sampling (not random) keeps the draw reproducible, join-stable
    across reruns, and oracle-replayable; row-local predicate → zero
    shuffles, fully scan-pushed."""
    pct = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    keep = (F.col(label_col) == 1) | (pct < neg_keep_pct)
    w = F.when(F.col(label_col) == 1, F.lit(1.0)).otherwise(
        F.lit(100.0 / neg_keep_pct)
    )
    return df.filter(keep).withColumn("weight", w)


def group_kfold(
    df: DataFrame,
    group_col: str,
    k: int = 5,
    label_col: str | None = None,
    salt: str = "fold",
) -> DataFrame:
    """Group-leakage-safe k-fold assignment report (sklearn GroupKFold's
    property, hash-deterministic): every row of a group lands in the SAME
    fold (fold = md5 bucket of the group key mod k), so entities never
    straddle train/validation — the per-group twin of deterministic_split.
    Re-runs, new rows, and repartitioning never move a group.

    Output per fold: (fold, n_groups, n_rows[, n_pos, pos_e4]) — the size
    and class-balance readout you check BEFORE trusting CV variance
    (hash folds are balanced in expectation, not by construction; this
    measures the realized skew). One counting agg; the fold column is a
    narrow projection usable directly as a filter."""
    fold = (hash_bucket(F.col(group_col), salt) % k).cast("int").alias("fold")
    base = df.select(fold, F.col(group_col).alias("_g"),
                     *([F.col(label_col).alias("_y")] if label_col else []))
    aggs = [
        F.countDistinct("_g").alias("n_groups"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    if label_col:
        aggs.append(F.sum(F.col("_y").cast("long")).alias("n_pos"))
    out = base.groupBy("fold").agg(*aggs)
    if label_col:
        out = out.withColumn("pos_e4", F.expr("n_pos * 10000 div n_rows"))
    return out


def neyman_allocation(
    df: DataFrame,
    strata_cols: Sequence[str],
    value_col: str,
    budget: int,
    ndigits: int = 6,
) -> DataFrame:
    """Neyman (optimal) sample allocation over an INTEGER value column
    (quantize money to cents upstream): stratum h gets sample share
    ∝ N_h·σ_h — minimum-variance allocation of a labeling/eval budget,
    the principled replacement for proportional splits when strata have
    very different spreads.

    Exactness: per-stratum moments are exact integer sums (Σv, Σv² as
    DECIMAL(38,0)); σ_h = √((nΣv²−(Σv)²)/(n(n−1))) over identical
    operands. The N_h·σ_h weights are made order-independent integers by
    max-normalized e12 quantization (the kruskal pattern), then seats are
    apportioned by the EXACT largest-remainder method
    (packing.largest_remainder_alloc): Σ alloc == budget, every stratum
    ≥ its floor quota. All-constant strata (every σ_h = 0) fall back to
    proportional-to-N_h weights rather than 0/0.

    Scale shape: one data pass for moments; everything after is
    |strata|-sized.

    Output per stratum: (*strata_cols, n_h, mean, sd, weight_e12,
    base_quota, alloc)."""
    from .packing import largest_remainder_alloc

    keys = list(strata_cols)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum(dec(F.col(value_col))).alias("_sv"),
        F.sum(dec(F.col(value_col)) * F.col(value_col)).alias("_svv"),
    )
    nn = F.col("n_h").cast("double")
    var = F.when(
        F.col("n_h") <= 1, F.lit(0.0)
    ).otherwise(
        (nn * F.col("_svv").cast("double")
         - F.col("_sv").cast("double") * F.col("_sv").cast("double"))
        / (nn * (nn - 1.0))
    )
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    stats = per.withColumn("_w", nn * sd)
    wmax = stats.agg(F.max("_w").alias("_wmax"))
    q = F.when(
        F.col("_wmax") > 0.0,
        F.floor(F.col("_w") / F.col("_wmax") * 1e12).cast("long"),
    ).otherwise(F.col("n_h"))  # all-constant strata: proportional fallback
    weighted = stats.crossJoin(F.broadcast(wmax)).withColumn("weight_e12", q)
    alloc = largest_remainder_alloc(
        weighted.select(*keys, "weight_e12"),
        budget,
        key_cols=keys,
        weight_col="weight_e12",
    )
    out = weighted.join(alloc.select(*keys, "base_quota", "alloc"), keys)
    return out.select(
        *keys,
        "n_h",
        (F.round(F.col("_sv").cast("double") / nn, ndigits) + F.lit(0.0)).alias(
            "mean"
        ),
        (F.round(sd, ndigits) + F.lit(0.0)).alias("sd"),
        "weight_e12",
        "base_quota",
        "alloc",
    )
