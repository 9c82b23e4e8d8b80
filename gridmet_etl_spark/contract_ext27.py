"""Round-9 wave-8 contract entries: two retail-analytics OLAP shapes —
year-over-year top movers (the TPC-DS q74 growth-ratio pattern: self-join
a yearly rollup on adjacent years, rank by ratio) and price elasticity
(closed-form per-brand OLS of quantity on discount from exact moments).

Discipline: revenue quantizes to integer cents and discounts to e4
integers; the growth ratio and slope are single divisions of exact
DECIMAL(38,0)/BIGINT forms (identical doubles on both engines, so even
the ORDER BY on the ratio agrees bit-for-bit); ranking tiebreaks on the
key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .contract import R, _t

EXT27_QUERIES: dict = {}

# ---------------------------------------------------------------------------
# yoy_growth: top-20 customers by revenue growth into the latest year
# ---------------------------------------------------------------------------

_YOY_MIN_PREV_CENTS = 10_000  # $100 floor keeps tiny denominators out


def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q74-shaped year-over-year movers: yearly revenue rollup per
    customer, self-joined on (latest year, latest−1), top 20 growth
    ratios (prev ≥ $100; ties break on custkey). The yearly rollup is
    one partial-agg shuffle; the adjacent-year join is customer-keyed."""
    o = spark.read.parquet(_t(sf_dir, "orders"))
    yearly = o.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.year("o_orderdate").alias("yr"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "cents"
        )
    )
    ymax = o.agg(F.max(F.year("o_orderdate")).alias("_y"))
    cur = yearly.join(
        F.broadcast(ymax), yearly.yr == ymax._y
    ).select("custkey", F.col("cents").alias("cur_cents"))
    prev = yearly.join(
        F.broadcast(ymax), yearly.yr == ymax._y - 1
    ).select("custkey", F.col("cents").alias("prev_cents"))
    j = cur.join(prev, "custkey").filter(
        F.col("prev_cents") >= _YOY_MIN_PREV_CENTS
    )
    ratio = F.col("cur_cents").cast("double") / F.col("prev_cents").cast(
        "double"
    )
    # TakeOrderedAndProject (orderBy+limit), NOT a global rank window: the
    # joined relation is |customers|-sized and a single-partition window
    # over it would funnel the whole table through one task at scale —
    # the 20-row result then ranks in a bounded window
    top = j.orderBy(ratio.desc(), F.col("custkey")).limit(20)
    w = Window.orderBy(
        (
            F.col("cur_cents").cast("double")
            / F.col("prev_cents").cast("double")
        ).desc(),
        F.col("custkey"),
    )
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "rank",
            "custkey",
            (F.round(F.col("prev_cents").cast("double") / 100.0, R) + 0).alias(
                "prev_rev"
            ),
            (F.round(F.col("cur_cents").cast("double") / 100.0, R) + 0).alias(
                "cur_rev"
            ),
            (F.round(ratio, R) + F.lit(0.0)).alias("growth"),
        )
    )


SQL_YOY_GROWTH = f"""
WITH yearly AS (
  SELECT o_custkey AS custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1, 2),
ymax AS (SELECT CAST(max(year(o_orderdate)) AS BIGINT) AS y FROM orders),
j AS (
  SELECT c.custkey, c.cents AS cur_cents, p.cents AS prev_cents
  FROM yearly c
  JOIN yearly p ON p.custkey = c.custkey, ymax
  WHERE c.yr = ymax.y AND p.yr = ymax.y - 1
    AND p.cents >= {_YOY_MIN_PREV_CENTS}),
ranked AS (
  SELECT custkey, cur_cents, prev_cents,
         CAST(row_number() OVER (
           ORDER BY CAST(cur_cents AS DOUBLE) / CAST(prev_cents AS DOUBLE)
             DESC, custkey) AS INT) AS rank
  FROM j)
SELECT rank, custkey,
       ROUND(CAST(prev_cents AS DOUBLE) / 100.0, {R}) + 0 AS prev_rev,
       ROUND(CAST(cur_cents AS DOUBLE) / 100.0, {R}) + 0 AS cur_rev,
       ROUND(CAST(cur_cents AS DOUBLE) / CAST(prev_cents AS DOUBLE), {R})
         + 0 AS growth
FROM ranked WHERE rank <= 20
"""


EXT27_QUERIES["yoy_growth"] = (q_yoy_growth, SQL_YOY_GROWTH)

# ---------------------------------------------------------------------------
# price_elasticity: per-brand OLS slope of quantity on discount
# ---------------------------------------------------------------------------


def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand discount elasticity: closed-form OLS slope (and corr) of
    line-item quantity on the e4-quantized discount — five exact
    DECIMAL(38,0) moments per brand, one division each. Does a deeper
    discount move volume, brand by brand?"""
    li = spark.read.parquet(_t(sf_dir, "lineitem")).select(
        "l_partkey",
        F.round(F.col("l_discount") * 1e4, 0).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    part = spark.read.parquet(_t(sf_dir, "part")).select(
        "p_partkey", "p_brand"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    acc = j.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
        F.sum(dec(F.col("y")) * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = n * F.col("sxy").cast("double") - sx * sy
    denx = n * F.col("sxx").cast("double") - sx * sx
    deny = n * F.col("syy").cast("double") - sy * sy
    slope = F.when(denx == 0.0, F.lit(0.0)).otherwise(num / denx)
    corr = F.when((denx <= 0.0) | (deny <= 0.0), F.lit(0.0)).otherwise(
        num / (F.sqrt(denx) * F.sqrt(deny))
    )
    return acc.select(
        "brand",
        "n",
        (F.round(slope * 1e4, R) + F.lit(0.0)).alias("qty_per_discount"),
        (F.round(corr, R) + F.lit(0.0)).alias("corr"),
    )


SQL_PRICE_ELASTICITY = f"""
WITH j AS (
  SELECT p_brand AS brand,
         CAST(round(l_discount * 1e4) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey),
acc AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM j GROUP BY brand),
fin AS (
  SELECT brand, n,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
  FROM acc)
SELECT brand, n,
       ROUND((CASE WHEN denx = 0.0 THEN 0.0 ELSE num / denx END) * 1e4,
             {R}) + 0 AS qty_per_discount,
       ROUND(CASE WHEN denx <= 0.0 OR deny <= 0.0 THEN 0.0
             ELSE num / (sqrt(denx) * sqrt(deny)) END, {R}) + 0 AS corr
FROM fin
"""


EXT27_QUERIES["price_elasticity"] = (q_price_elasticity, SQL_PRICE_ELASTICITY)
