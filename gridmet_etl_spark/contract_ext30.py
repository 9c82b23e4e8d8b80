"""Round-9 wave-11 contract entries (the 400-query milestone): normalized
mutual information between two categorical columns (the symmetric
association scalar chi_square/cramers_v lead to; info_gain is its
directed cousin) and the Chao1 species-richness estimator of corpus
vocabulary ("how many unique tokens does this corpus REALLY have" —
the unseen-mass companion to vocab_coverage, same frequency-of-
frequencies relation).

Discipline: contingency cells and frequency-of-frequencies are exact
integers; p·ln terms quantize e12 before the bounded-cell sum; Chao1 is
one fixed-order double expression of three exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .contract import R, _t

EXT30_QUERIES: dict = {}

# ---------------------------------------------------------------------------
# nmi_assoc: market segment ↔ order priority association
# ---------------------------------------------------------------------------


def q_nmi_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized mutual information between customer market segment and
    order priority: MI = Σ_ij (n_ij/N)·ln(N·n_ij/(n_i·n_j)), NMI =
    MI/√(H_row·H_col) ∈ [0, 1]. All from the exact |segments|×|priorities|
    contingency relation; per-cell terms e12-quantize before the bounded
    sum (chi_square says "dependent?"; this says HOW MUCH, in nats,
    comparably across tables)."""
    o = spark.read.parquet(_t(sf_dir, "orders")).select(
        "o_custkey", "o_orderpriority"
    )
    c = spark.read.parquet(_t(sf_dir, "customer")).select(
        "c_custkey", "c_mktsegment"
    )
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("a"), F.col("o_orderpriority").alias("b")
    )
    cells = j.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("nij"))
    ra = cells.groupBy("a").agg(F.sum("nij").cast("long").alias("ni"))
    rb = cells.groupBy("b").agg(F.sum("nij").cast("long").alias("nj"))
    tot = cells.agg(F.sum("nij").cast("long").alias("n"))
    full = (
        cells.join(F.broadcast(ra), "a")
        .join(F.broadcast(rb), "b")
        .crossJoin(F.broadcast(tot))
    )
    nn = F.col("n").cast("double")
    pij = F.col("nij").cast("double") / nn
    lift = (
        nn * F.col("nij").cast("double")
        / (F.col("ni").cast("double") * F.col("nj").cast("double"))
    )
    mi_q = F.round(pij * F.log(lift) * 1e12, 0).cast("long")
    acc = full.agg(
        F.sum(mi_q).cast("long").alias("_mi"),
        F.min("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    ha_q = ra.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.round(
                (F.col("ni").cast("double") / F.col("n").cast("double"))
                * -F.log(F.col("ni").cast("double") / F.col("n").cast("double"))
                * 1e12,
                0,
            ).cast("long")
        ).cast("long").alias("_ha")
    )
    hb_q = rb.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.round(
                (F.col("nj").cast("double") / F.col("n").cast("double"))
                * -F.log(F.col("nj").cast("double") / F.col("n").cast("double"))
                * 1e12,
                0,
            ).cast("long")
        ).cast("long").alias("_hb")
    )
    out = acc.crossJoin(F.broadcast(ha_q)).crossJoin(F.broadcast(hb_q))
    mi = F.col("_mi").cast("double") / 1e12
    ha = F.col("_ha").cast("double") / 1e12
    hb = F.col("_hb").cast("double") / 1e12
    nmi = F.when((ha <= 0.0) | (hb <= 0.0), F.lit(0.0)).otherwise(
        mi / (F.sqrt(ha) * F.sqrt(hb))
    )
    rnd = lambda c2: F.round(c2, R) + F.lit(0.0)  # noqa: E731
    return out.select(
        F.col("n"),
        F.col("n_cells"),
        rnd(mi).alias("mi_nats"),
        rnd(ha).alias("h_row"),
        rnd(hb).alias("h_col"),
        rnd(nmi).alias("nmi"),
    )


SQL_NMI_ASSOC = f"""
WITH j AS (
  SELECT c_mktsegment AS a, o_orderpriority AS b
  FROM orders JOIN customer ON o_custkey = c_custkey),
cells AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS nij FROM j GROUP BY a, b),
ra AS (SELECT a, CAST(sum(nij) AS BIGINT) AS ni FROM cells GROUP BY a),
rb AS (SELECT b, CAST(sum(nij) AS BIGINT) AS nj FROM cells GROUP BY b),
tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cells),
acc AS (
  SELECT CAST(sum(CAST(round((CAST(nij AS DOUBLE) / CAST(tot.n AS DOUBLE))
                * ln(CAST(tot.n AS DOUBLE) * CAST(nij AS DOUBLE)
                     / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)))
                * 1e12) AS BIGINT)) AS BIGINT) AS mi,
         min(tot.n) AS n, CAST(count(*) AS BIGINT) AS n_cells
  FROM cells JOIN ra USING (a) JOIN rb USING (b), tot),
ha AS (
  SELECT CAST(sum(CAST(round((CAST(ni AS DOUBLE) / CAST(tot.n AS DOUBLE))
                * -ln(CAST(ni AS DOUBLE) / CAST(tot.n AS DOUBLE))
                * 1e12) AS BIGINT)) AS BIGINT) AS h FROM ra, tot),
hb AS (
  SELECT CAST(sum(CAST(round((CAST(nj AS DOUBLE) / CAST(tot.n AS DOUBLE))
                * -ln(CAST(nj AS DOUBLE) / CAST(tot.n AS DOUBLE))
                * 1e12) AS BIGINT)) AS BIGINT) AS h FROM rb, tot)
SELECT acc.n, acc.n_cells,
       ROUND(CAST(acc.mi AS DOUBLE) / 1e12, {R}) + 0 AS mi_nats,
       ROUND(CAST(ha.h AS DOUBLE) / 1e12, {R}) + 0 AS h_row,
       ROUND(CAST(hb.h AS DOUBLE) / 1e12, {R}) + 0 AS h_col,
       ROUND(CASE WHEN ha.h <= 0 OR hb.h <= 0 THEN 0.0
             ELSE CAST(acc.mi AS DOUBLE) / 1e12
                  / (sqrt(CAST(ha.h AS DOUBLE) / 1e12)
                     * sqrt(CAST(hb.h AS DOUBLE) / 1e12)) END, {R}) + 0
         AS nmi
FROM acc, ha, hb
"""


EXT30_QUERIES["nmi_assoc"] = (q_nmi_assoc, SQL_NMI_ASSOC)

# ---------------------------------------------------------------------------
# chao1_richness: how many unique tokens does the corpus really have?
# ---------------------------------------------------------------------------


def q_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate of the document vocabulary:
    Ĉ = D + f₁·(f₁−1)/(2·(f₂+1)) (the bias-corrected form, defined even
    when f₂ = 0) from the exact frequency-of-frequencies — the unseen-
    vocabulary mass vocab_coverage's Good–Turing view reads the other way.
    One token count agg + one |distinct counts|-row reduction."""
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    fof = counts.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("f"))
    acc = fof.agg(
        F.sum("f").cast("long").alias("d_observed"),
        F.sum(F.when(F.col("c") == 1, F.col("f")).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, F.col("f")).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    chao1 = F.col("d_observed").cast("double") + f1 * (f1 - 1.0) / (
        2.0 * (f2 + 1.0)
    )
    rnd = lambda c2: F.round(c2, R) + F.lit(0.0)  # noqa: E731
    return acc.select(
        "d_observed",
        "f1",
        "f2",
        rnd(chao1).alias("chao1"),
        rnd(
            F.col("d_observed").cast("double")
            / (
                F.col("d_observed").cast("double")
                + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0))
            )
        ).alias("coverage_of_estimate"),
    )


SQL_CHAO1_RICHNESS = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
tok2 AS (SELECT token FROM toks WHERE token <> ''),
counts AS (SELECT token, count(*) AS c FROM tok2 GROUP BY token),
fof AS (SELECT c, CAST(count(*) AS BIGINT) AS f FROM counts GROUP BY c),
acc AS (
  SELECT CAST(sum(f) AS BIGINT) AS d_observed,
         CAST(sum(CASE WHEN c = 1 THEN f ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN c = 2 THEN f ELSE 0 END) AS BIGINT) AS f2
  FROM fof)
SELECT d_observed, f1, f2,
       ROUND(CAST(d_observed AS DOUBLE)
             + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
               / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), {R}) + 0 AS chao1,
       ROUND(CAST(d_observed AS DOUBLE)
             / (CAST(d_observed AS DOUBLE)
                + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
                  / (2.0 * (CAST(f2 AS DOUBLE) + 1.0))), {R}) + 0
         AS coverage_of_estimate
FROM acc
"""


EXT30_QUERIES["chao1_richness"] = (q_chao1_richness, SQL_CHAO1_RICHNESS)
