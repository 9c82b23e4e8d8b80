"""Round-3 session-D contract entries: product-quantization ANN (codebook
training, write-time encoding, ADC search), HyperLogLog sketch rollup
tables, and operational depth added this session.

Float discipline as contract.py: float aggregates rounded to R=6 in BOTH
engines; ANN ranks order by the ROUNDED score with id tie-breaks so
cross-engine float noise cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .contract import R, _t

_EMB_DIM = 64
_PQ_M = 4
_PQ_KSUB = 8
_PQ_ITER = 2
_PQ_DSUB = _EMB_DIM // _PQ_M


# ---------------------------------------------------------------------------
# Product quantization: codes + ADC top-k
# ---------------------------------------------------------------------------


def _pq_books(spark: SparkSession, sf_dir: str):
    from .operators.pq import pq_refine, pq_seed_codebooks

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    books = pq_refine(
        emb,
        pq_seed_codebooks(emb, m=_PQ_M, ksub=_PQ_KSUB, dim=_EMB_DIM),
        n_iter=_PQ_ITER,
    )
    return emb, books


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ index build: 2-round Lloyd per subspace from lowest-id seeds,
    then the write-time code assignment. Integer output — robust to
    float-sum order; the oracle unrolls the same rounds as CTEs keyed by
    the subspace id (operators/pq.py docstring has the scale argument:
    per-round shuffle and driver traffic are m*ksub*dsub rows)."""
    from .operators.pq import pq_encode

    emb, books = _pq_books(spark, sf_dir)
    return pq_encode(emb, books)


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-10 for the 5 lowest-id queries over the PQ
    codes: LUT entries rounded to 9, ADC sum rounded to R, ascending with
    neighbor-id ties — bit-stable across engines."""
    from .operators.pq import pq_adc_topk, pq_encode

    emb, books = _pq_books(spark, sf_dir)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_adc_topk(codes, queries, books, k=10, rank_round=R)


def _sql_pq_ctes(m: int = _PQ_M, ksub: int = _PQ_KSUB, n_iter: int = _PQ_ITER,
                 dsub: int = _PQ_DSUB) -> str:
    """Shared CTE chain: subvector relation, seeded codebooks, unrolled
    Lloyd rounds (L2 argmin, lowest-code ties, per-dim mean, empty cells
    keep their centroid), final assignment ``codes``. All m subspaces ride
    one chain — the subspace id is a key, mirroring the Spark job."""
    assign = lambda cents, out: f"""
s_{out} AS (
  SELECT t.vec_id, t.s, c.code,
         sum((t.v[j] - c.c[j]) * (t.v[j] - c.c[j])) AS dist
  FROM sub t, {cents} c, generate_series(1, {dsub}) g(j)
  WHERE c.s = t.s
  GROUP BY t.vec_id, t.s, c.code),
{out} AS (
  SELECT vec_id, s, code FROM (
    SELECT vec_id, s, code,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rn
    FROM s_{out}) WHERE rn = 1)"""
    parts = [
        f"""e AS (SELECT vec_id, embedding FROM embeddings),
sub AS (
  SELECT vec_id, s,
         list_transform(list_slice(embedding, s * {dsub} + 1, s * {dsub} + {dsub}),
                        x -> CAST(x AS DOUBLE)) AS v
  FROM e, generate_series(0, {m - 1}) g(s)),
c0 AS (
  SELECT s, CAST(row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS INTEGER) AS code,
         v AS c
  FROM sub
  WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT {ksub}))"""
    ]
    for it in range(n_iter):
        parts.append(assign(f"c{it}", f"a{it}"))
        parts.append(f"""
m{it} AS (
  SELECT a.s, a.code, j, avg(t.v[j]) AS mu
  FROM a{it} a JOIN sub t ON a.vec_id = t.vec_id AND a.s = t.s,
       generate_series(1, {dsub}) g(j)
  GROUP BY a.s, a.code, j),
c{it + 1} AS (
  SELECT p.s, p.code, coalesce(n.c, p.c) AS c
  FROM c{it} p LEFT JOIN
       (SELECT s, code, list(mu ORDER BY j) AS c FROM m{it} GROUP BY s, code) n
       ON p.s = n.s AND p.code = n.code)""")
    parts.append(assign(f"c{n_iter}", "codes"))
    return "WITH " + ",".join(parts)


def _sql_pq_codes(m: int = _PQ_M) -> str:
    cols = ",\n       ".join(
        f"CAST(max(CASE WHEN s = {s} THEN code END) AS INTEGER) AS code_{s}"
        for s in range(m)
    )
    return f"""{_sql_pq_ctes()},
wide AS (
  SELECT vec_id,
       {cols}
  FROM codes GROUP BY vec_id)
SELECT * FROM wide
"""


def _sql_pq_topk(k: int = 10) -> str:
    return f"""{_sql_pq_ctes()},
lut AS (
  SELECT q.vec_id AS query_id, c.s, c.code,
         ROUND(sum((q.v[j] - c.c[j]) * (q.v[j] - c.c[j])), 9) AS d
  FROM sub q, c{_PQ_ITER} c, generate_series(1, {_PQ_DSUB}) g(j)
  WHERE q.vec_id < 5 AND c.s = q.s
  GROUP BY q.vec_id, c.s, c.code),
scored AS (
  SELECT l.query_id, a.vec_id AS neighbor_id, ROUND(sum(l.d), {R}) AS adc_dist
  FROM codes a JOIN lut l ON a.s = l.s AND a.code = l.code
  WHERE a.vec_id <> l.query_id
  GROUP BY l.query_id, a.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, adc_dist, rank FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# HyperLogLog rollup tables
# ---------------------------------------------------------------------------


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-rollup pattern: per-(event_type, day) HLL sketches of
    user_id built ONCE from the events scan, then merged up to event_type
    WITHOUT rescanning events — the pre-aggregation distinct counts cannot
    do with plain sums. Hashed projection: exact twin + within-5%% boolean
    (sketch bytes are engine-specific; the approx_aggs pattern)."""
    from .operators.sketch import hll_merge, hll_rollup

    ev = spark.read.parquet(_t(sf_dir, "events"))
    daily = hll_rollup(
        ev.withColumn("day", F.to_date("ts")), ["event_type", "day"], "user_id"
    )
    merged = hll_merge(daily, ["event_type"]).select("event_type", "approx_distinct")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"), F.count("*").alias("n_rows")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_users",
            F.col("n_rows"),
            (
                F.abs(F.col("approx_distinct") - F.col("n_users"))
                <= 0.05 * F.col("n_users")
            ).alias("approx_ok"),
        )
    )


SQL_HLL_ROLLUP = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_rows,
       TRUE AS approx_ok
FROM events GROUP BY event_type
"""


EXT4_QUERIES = {
    "pq_codes": (q_pq_codes, _sql_pq_codes()),
    "pq_topk": (q_pq_topk, _sql_pq_topk()),
    "hll_rollup": (q_hll_rollup, SQL_HLL_ROLLUP),
}
