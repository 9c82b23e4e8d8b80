"""Physical-plan assertions: the scale properties the engine promises
(broadcast joins, single-shuffle aggregation, pushdown/pruning) hold in the
executed plan — regression-guarded, not just documented."""

import pytest
from pyspark.sql import functions as F

from gridmet_etl_spark.operators.pivot import pivot_wide
from gridmet_etl_spark.operators.weighted_agg import (
    weighted_mean_all_vars,
    weighted_mean_wide,
)
from gridmet_etl_spark.plans.cfsv2 import cfsv2_ensemble_pipeline
from gridmet_etl_spark.plans.gridmet import gridmet_pipeline

GRIDMET_SRC = ["tmmx", "tmmn", "pr", "rmax", "rmin", "vs"]


def _plan(df) -> str:
    """Final (post-AQE) executed plan: collect() executes THIS DataFrame's
    QueryExecution so AdaptiveSparkPlan reports the real physical operators
    (a write would spawn a separate QueryExecution and leave this one
    unfinalized)."""
    df.collect()
    full = df._jdf.queryExecution().executedPlan().toString()
    # AQE toString prints "== Final Plan ==" followed by "== Initial Plan ==";
    # assertions must only see the final section or exchanges double-count
    return full.split("== Initial Plan ==")[0]


@pytest.fixture(scope="module")
def uncached_dir(spark, fixdir, tmp_path_factory):
    """Fixture parquet copied to a unique path: Spark's CacheManager
    substitutes cached InMemoryRelations for ANY matching logical subtree,
    so reading the original path would silently reuse the suite's cache and
    hide the FileScan these tests assert on."""
    import shutil

    d = tmp_path_factory.mktemp("uncached")
    for name in ["grid.parquet", "weights.parquet"]:
        shutil.copy(f"{fixdir}/{name}", d / name)
    return str(d)


@pytest.fixture()
def fresh_grid(spark, uncached_dir):
    from gridmet_etl_spark.sources.readers import read_grid

    return read_grid(spark, f"{uncached_dir}/grid.parquet")


@pytest.fixture()
def fresh_weights(spark, uncached_dir):
    from gridmet_etl_spark.sources.readers import read_weights_parquet

    return read_weights_parquet(spark, f"{uncached_dir}/weights.parquet")


def test_wide_agg_single_shuffle(spark, fresh_grid, fresh_weights):
    """weighted_mean_wide: exactly 1 data exchange (plus the broadcast)."""
    plan = _plan(weighted_mean_wide(fresh_grid, fresh_weights, GRIDMET_SRC, masked=True))
    n_exchanges = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_exchanges == 1, plan
    assert "BroadcastHashJoin" in plan


def test_wide_agg_equals_pivot_path(spark, grid, weights):
    """The 1-shuffle conditional agg ≡ the 2-shuffle long-agg→pivot path."""
    wide = weighted_mean_wide(grid, weights, GRIDMET_SRC, masked=True)
    long_agg = weighted_mean_all_vars(grid, weights, variables=GRIDMET_SRC, masked=True)
    pivoted = pivot_wide(long_agg, {v: v for v in GRIDMET_SRC})
    a = wide.orderBy("feature_id", "time").toPandas()
    b = pivoted.orderBy("feature_id", "time").toPandas()[a.columns]
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-12)


def test_wide_agg_strict_equals_pivot_path(spark, grid, weights):
    wide = weighted_mean_wide(grid, weights, GRIDMET_SRC, masked=False)
    long_agg = weighted_mean_all_vars(grid, weights, variables=GRIDMET_SRC, masked=False)
    pivoted = pivot_wide(long_agg, {v: v for v in GRIDMET_SRC})
    a = wide.orderBy("feature_id", "time").toPandas()
    b = pivoted.orderBy("feature_id", "time").toPandas()[a.columns]
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-12)


def test_gridmet_pipeline_scan_pruned(spark, fresh_grid, fresh_weights):
    """Column pruning + var-IN pushdown must reach the parquet scan."""
    plan = _plan(gridmet_pipeline(fresh_grid, fresh_weights, partial=True))
    assert "PushedFilters: [In(var" in plan
    import re

    schemas = re.findall(r"ReadSchema: (struct<[^>]*>)", plan)
    grid_schema = next(s for s in schemas if "var:string" in s)
    assert "lat" not in grid_schema and "lon" not in grid_schema  # pruned


def test_ensemble_pipeline_single_shuffle_agg(spark, grid_ens, weights_ens, elevation):
    """Method 2 (all 48 members): one data exchange for the whole weighted
    aggregation — the reference's 48 sequential pipelines, as one shuffle."""
    plan = _plan(cfsv2_ensemble_pipeline(grid_ens, weights_ens, elevation))
    n_exchanges = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_exchanges == 1, plan


def test_whole_stage_codegen_covers_physics(spark, grid_ens, weights_ens, elevation):
    """Physics/unit expressions stay inside WholeStageCodegen (no Python)."""
    import re

    plan = _plan(cfsv2_ensemble_pipeline(grid_ens, weights_ens, elevation))
    # codegen stages print as "*(n) Operator" in executed-plan strings
    assert re.search(r"\*\(\d+\) (Project|HashAggregate)", plan), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_shards_no_global_window(spark):
    """pack_shards must not sort 100 TB into one partition: every window
    in the plan is partitioned (per-group), except over the tiny per-group
    offsets relation. The global-ordering window would appear as a Window
    directly over a SinglePartition exchange of the FULL input."""
    from pyspark.sql import functions as F

    from gridmet_etl_spark.operators.sampling import pack_shards

    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n_tokens")
    )
    df = pack_shards(docs, budget=500, group_width=1000)
    plan = _plan(df)
    # the data-bearing window is hash-partitioned by the group key
    assert "hashpartitioning(_g" in plan, plan
    # the only single-partition exchange feeds the per-group offsets (rows
    # ≈ n/group_width), which is then broadcast — count it, don't ban it
    assert plan.count("SinglePartition") <= 1, plan


def test_decontaminate_exact_broadcasts_eval_set(spark):
    """The eval fingerprint set must broadcast: the 100 TB train side is
    never shuffled for the semi join."""
    from pyspark.sql import functions as F

    from gridmet_etl_spark.operators.decontam import decontaminate_exact

    train = spark.range(5000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    ev = spark.range(10).select(
        (F.col("id") + 20).alias("doc_id"), F.concat(F.lit("t"), F.col("id") + 20).alias("text")
    )
    plan = _plan(decontaminate_exact(train, ev))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_vocab_topk_uses_take_ordered(spark):
    """Global top-k must be TakeOrderedAndProject (per-partition top-k,
    driver merge) — not a global sort."""
    from pyspark.sql import functions as F

    from gridmet_etl_spark.operators.textops import vocab_topk

    docs = spark.range(2000).select(
        F.concat(F.lit("w"), (F.col("id") % 97).cast("string"), F.lit(" common tok")).alias("text")
    )
    plan = _plan(vocab_topk(docs, 10))
    assert "TakeOrderedAndProject" in plan, plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime filter evidence: when the dim side carries a selective
    non-join-key predicate and broadcast is off (the 100 TB shuffle-join
    regime), Catalyst injects a bloom_filter_agg on the dim join keys and
    a might_contain probe on the FACT side — rows that cannot join are
    dropped at scan time, before the shuffle. The thresholds below are
    the knobs a production deployment sets; defaults only differ in
    sizing."""
    before = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        fact = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        dim = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"])
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan.lower() or "BloomFilter" in plan, plan
    finally:
        for k, v in before.items():
            spark.conf.set(k, v)


def test_cfsv2_400m_stress_plan(spark):
    """The 398M-cell-value stress geometry (bench.py, VERDICT r7 item 5)
    compiles to the SAME plan as the production pipeline: exactly one
    data exchange (output-group partials), weights broadcast, the 398M-row
    grid never shuffles. Plan-only — the execution lives in bench.py."""
    import bench

    grid, weights = bench._cfsv2_400m_inputs(spark)
    from gridmet_etl_spark.operators.weighted_agg import weighted_mean_wide

    df = weighted_mean_wide(
        grid, weights, ["tmmx", "tmmn", "pr", "sph"], extra_keys=("ens",)
    )
    plan = _plan(df)
    n_exchanges = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_exchanges == 1, plan
    assert "BroadcastHashJoin" in plan


def test_minhash_signature_plan_hash_aggregate(spark):
    """The xxhash64 (scale-path) MinHash signature aggregation must stay in
    HashAggregate with ONE shingle pipeline. MIN over a STRING buffer has no
    mutable fixed-width aggregation buffer, so an innocent
    ``.cast("string")`` on the hash silently downgrades the whole signature
    aggregation to SortAggregate — a full per-partition sort of the exploded
    shingle relation (>80 GB of spill at the 1M-doc ×10 corpus; found and
    fixed in r9, dedup.py::_seed_hash). This is the regression guard
    SCALE.md's minhash entry promises."""
    from gridmet_etl_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared boilerplate text") for i in range(64)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, n_seeds=16, hash_fn="xxhash64")
    plan = _plan(sigs)
    assert "SortAggregate" not in plan, plan
    assert "HashAggregate" in plan, plan
    # exactly ONE shingle explode feeds the signature aggregation — the
    # Generate(explode) node must not be duplicated by a re-derivation
    assert plan.count("Generate") == 1, plan


def test_minhash_lsh_star_xxhash_plan_sortagg_free(spark):
    """The full banded-LSH star pipeline on the scale hash: no SortAggregate
    anywhere in the executed plan (bands derive from the wide signature
    relation; every aggregation buffer stays fixed-width LONG)."""
    from gridmet_etl_spark.operators.dedup import minhash_lsh_star

    docs = spark.createDataFrame(
        [(i, f"document number {i % 8} near duplicate body text padding") for i in range(64)],
        "doc_id long, text string",
    )
    star = minhash_lsh_star(docs, hash_fn="xxhash64")
    plan = _plan(star)
    assert "SortAggregate" not in plan, plan


def test_asof_bucketed_plan_no_sortagg_one_data_exchange_family(spark):
    """r12 (VERDICT r11 item 5): the segment-and-merge as-of used to build
    its per-(key, bucket) summary with a separate max_by(struct)
    SortAggregate plus a distinct over (key, bucket) — two extra data-sized
    exchanges. Both now fold into the one (key, bucket) window pass
    (whole-partition last(ignorenulls) + row_number()==1 representative),
    so the executed plan must carry NO SortAggregate, NO standalone
    HashAggregate (the old distinct), and exactly two canonically-distinct
    data exchange shapes over the union relation (the shared (k, b) window
    exchange — AQE stage-reuses the twin — plus the bucket-summary side's
    (k) / (k, b) hops, which are |key-bucket|-sized, not row-sized)."""
    from datetime import datetime, timedelta

    from gridmet_etl_spark.operators.asof import asof_join

    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i % 3, base + timedelta(seconds=37 * i), float(i)) for i in range(64)],
        "k long, ts timestamp, lv double",
    )
    right = spark.createDataFrame(
        [(i % 3, base + timedelta(seconds=53 * i), float(i)) for i in range(48)],
        "k long, ts timestamp, rv double",
    )
    out = asof_join(left, right, on="k", bucket_seconds=600)
    plan = _plan(out)
    assert "SortAggregate" not in plan, plan
    assert "max_by" not in plan, plan
    assert "HashAggregate" not in plan, plan  # the old distinct is gone


def test_cms_join_size_estimate_and_no_sortagg(spark):
    """r12 (VERDICT r11 item 7, negative probe documented in sketch.py):
    the tagged-union single-exchange variant measured ~1.6× slower at the
    14M-key geometry, so the two-sided build + (row, bucket) join stays.
    Guard what IS promised: the sketch build aggregates in HashAggregate
    (fixed-width long buffers, never SortAggregate) and the estimate
    upper-bounds the true join size."""
    from gridmet_etl_spark.operators.sketch import cms_join_size

    left = spark.range(0, 512).selectExpr("id as jk")
    right = spark.range(256, 768).selectExpr("id as jk")
    est = cms_join_size(left, right, "jk", depth=4, width=64)
    plan = _plan(est)
    assert "SortAggregate" not in plan, plan
    row = est.collect()[0]
    # sanity: estimate upper-bounds the true join size (overlap 256)
    assert row["est_rows"] >= 256, row
