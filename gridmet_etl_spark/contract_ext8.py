"""Round-5 contract entries: corpus-scale dedup shapes and mixture design —

- ``minhash_lsh_star``: star-expanded LSH candidates (dedup.py
  ``minhash_lsh_star``) — each doc pairs only with its bucket's min-id
  representative. The all-pairs bucket join is quadratic in bucket size
  and real corpora have hub buckets (the sf0.1 synthetic corpus has a
  1673-doc one); star edges are linear and span the SAME connected
  components, so dedup clustering is unchanged (pytest-proved in
  tests/test_round5.py against the all-pairs form).
- ``line_dedup``: C4/RefinedWeb-style corpus-wide duplicate-line removal
  with document reassembly (dedup.py ``line_dedup``). The synthetic docs
  are single-line, so the query derives deterministic 8-token lines
  row-locally in BOTH engines before deduping.
- ``mixture_weights``: temperature-α source mixture shares (sampling.py
  ``mixture_weights``) — the quota-setting step ahead of mixture_sample.
  α=0.5 runs via sqrt (IEEE correctly rounded ⇒ engine-bit-identical).

Reference parity note: these extend the training-data surface beyond the
reference ETL (SURVEY §2 extension rows); the reference has no dedup or
mixture stage (its corpus is a raster grid), so oracles are the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .contract import R, _t
from .contract_ext import _SHINGLE_SQL
from .operators.dedup import N_MINHASH_SEEDS, ROWS_PER_BAND

EXT8_QUERIES: dict = {}


# ---------------------------------------------------------------------------
# minhash_lsh_star: bucket-linear LSH candidates (same components as all-pairs)
# ---------------------------------------------------------------------------


def q_minhash_lsh_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star candidates over the same bounded slice as ``minhash_lsh`` —
    the corpus-scale candidate form (bucket-linear, hub-bucket-proof)."""
    from .operators.dedup import minhash_lsh_star

    docs = spark.read.parquet(_t(sf_dir, "documents")).filter(F.col("doc_id") < 300)
    return minhash_lsh_star(docs).select("doc_a", "doc_b")


SQL_MINHASH_LSH_STAR = f"""
WITH shingles AS ({_SHINGLE_SQL}),
sigs AS (
  SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || sh)) AS mh
  FROM shingles, generate_series(0, {N_MINHASH_SEEDS - 1}) s(seed)
  GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, CAST(floor(seed / {ROWS_PER_BAND}) AS INT) AS band,
         md5(string_agg(mh, '|' ORDER BY seed)) AS band_key
  FROM sigs GROUP BY doc_id, CAST(floor(seed / {ROWS_PER_BAND}) AS INT)),
reps AS (
  SELECT band, band_key, min(doc_id) AS doc_a, count(*) AS n
  FROM bands GROUP BY band, band_key)
SELECT DISTINCT r.doc_a, b.doc_id AS doc_b
FROM bands b
JOIN reps r ON r.band = b.band AND r.band_key = b.band_key
WHERE r.n > 1 AND b.doc_id <> r.doc_a
"""


EXT8_QUERIES["minhash_lsh_star"] = (q_minhash_lsh_star, SQL_MINHASH_LSH_STAR)


# ---------------------------------------------------------------------------
# line_dedup: corpus-wide duplicate-line removal + reassembly
# ---------------------------------------------------------------------------

_LINE_W = 8  # tokens per derived line (synthetic docs are single-line)


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line dedup over deterministic 8-token lines of every
    document: only a duplicated line's first (doc_id, line_no) occurrence
    survives; docs are reassembled from surviving lines. Line derivation
    is row-local slice arithmetic (identical in the oracle)."""
    from .operators.dedup import line_dedup

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    lines = docs.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("_a"),
    ).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(_a), {_LINE_W}),"
                f" st -> array_join(slice(_a, st, {_LINE_W}), ' '))"
            )
        ).alias("line_no", "line"),
    )
    return line_dedup(lines)


SQL_LINE_DEDUP = f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
lines AS (
  -- fixed-bound series + WHERE (this DuckDB build rejects lateral
  -- len(a) bounds), same pattern as the shingle CTE
  SELECT doc_id, CAST((s.st - 1) / {_LINE_W} AS INT) AS line_no,
         array_to_string(a[s.st : s.st + {_LINE_W - 1}], ' ') AS line
  FROM base, generate_series(1, 4000, {_LINE_W}) s(st)
  WHERE s.st <= len(a)),
keyed AS (SELECT doc_id, line_no, md5(line) AS d FROM lines),
firsts AS (
  SELECT doc_id, line_no,
         row_number() OVER (PARTITION BY d ORDER BY doc_id, line_no) AS rn
  FROM keyed),
kept AS (
  SELECT l.doc_id, l.line_no, l.line
  FROM lines l JOIN firsts f
    ON f.doc_id = l.doc_id AND f.line_no = l.line_no AND f.rn = 1),
agg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY line_no) AS text
  FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT t.doc_id, t.n_lines, coalesce(a.n_kept, 0) AS n_kept,
       coalesce(a.text, '') AS text
FROM tot t LEFT JOIN agg a ON a.doc_id = t.doc_id
"""


EXT8_QUERIES["line_dedup"] = (q_line_dedup, SQL_LINE_DEDUP)


# ---------------------------------------------------------------------------
# mixture_weights: temperature-α source mixture shares
# ---------------------------------------------------------------------------


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token(char)-weighted per-source mixture shares at α=0.5 — the
    quota-setting companion to mixture_sample."""
    from .operators.sampling import mixture_weights

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return mixture_weights(docs, source_col="source", size_col="n_chars", ndigits=R)


SQL_MIXTURE_WEIGHTS = f"""
WITH per AS (
  SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS DOUBLE) AS sz
  FROM documents GROUP BY source),
tot AS (SELECT sum(sz) AS ts, sum(sqrt(sz)) AS tt FROM per)
SELECT source, n_docs, CAST(sz AS BIGINT) AS size,
       ROUND(sz / ts, {R}) + 0 AS share_raw,
       ROUND(sqrt(sz) / tt, {R}) + 0 AS share_temp
FROM per CROSS JOIN tot
"""


EXT8_QUERIES["mixture_weights"] = (q_mixture_weights, SQL_MIXTURE_WEIGHTS)
