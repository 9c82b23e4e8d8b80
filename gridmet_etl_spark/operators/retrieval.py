"""Corpus retrieval / collocation operators: BM25 ranked retrieval and
PMI bigram collocations over the documents table.

Both are pure ``pyspark.sql.functions`` plans (no UDFs) designed for a
100 TB corpus scan:

- ``bm25_topk`` filters the token array to the query vocabulary BEFORE the
  explode, so the exploded relation is |docs| x |matched query terms| —
  independent of document length. Corpus-wide statistics (N, avg doclen)
  are a single 1-row aggregate cross-joined (broadcast) back; per-term
  document frequencies are a |query|-row relation joined broadcast. The
  final top-k is ``orderBy().limit()`` → TakeOrderedAndProject (per-partition
  partial top-k, no single-partition window).
- ``pmi_bigrams`` shuffles only vocabulary-sized count relations (partial
  aggregation map-side); the corpus itself is scanned once and never
  shuffled.

Determinism/parity: tokenization is single-space split, scores use a fixed
arithmetic shape (same division order in the DuckDB oracle), and ranking is
on the rounded score with the natural key as tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import tokens, word_ngrams

BM25_K1 = 1.5
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25 (Lucene idf
    variant: ``ln(1 + (N - df + .5)/(df + .5))`` — always positive).

    Output: (doc_id, dl, n_matched, score) — score rounded for
    cross-engine rank stability, ties broken by doc_id.
    """
    qset = sorted(set(query_terms))
    toks = tokens(text_col)
    base = docs.select(F.col(id_col), F.size(toks).alias("dl"), toks.alias("_toks"))
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )  # 1 row -> broadcast cross join
    tf = (
        base.select(
            id_col,
            "dl",
            # prune to query vocabulary BEFORE exploding: output is bounded by
            # matches, not document length
            F.explode(F.filter(F.col("_toks"), lambda t: t.isin(*qset))).alias("term"),
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))  # |query| rows
    joined = tf.join(F.broadcast(dfc), "term").crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfc = F.col("tf").cast("double")
    norm = tfc + F.lit(BM25_K1) * (
        F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl
    )
    contrib = idf * tfc * F.lit(BM25_K1 + 1.0) / norm
    scored = (
        joined.groupBy(id_col, "dl")
        .agg(
            F.count("*").alias("n_matched"),
            F.round(F.sum(contrib), round_digits).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def inverted_index(
    docs: DataFrame,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Posting-list inverted index: per term, document frequency, total term
    frequency, and the doc_id-ordered posting list rendered as
    ``"doc:tf,doc:tf,..."``.

    One explode + two partial-aggregated shuffles; the second is
    vocabulary-sized. Posting-list skew is real (stop-words at corpus scale
    have |docs|-length lists): pair with a ``min_df``/stop-list or shard hot
    terms downstream — the groupBy itself is AQE-skew-splittable because the
    list render is associative-free only at the final agg.
    """
    toks = tokens(text_col)
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
    )
    posting = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(id_col), F.col("tf")))),
            lambda x: F.concat_ws(":", x[id_col].cast("string"), x["tf"].cast("string")),
        ),
        ",",
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("total_tf"),
            posting.alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )


def pmi_bigrams(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information:
    ``pmi = ln((c_xy / N2) / ((c_x / N1) * (c_y / N1)))``.

    The arithmetic is staged as double divisions in a fixed order (never
    products of raw counts, which would overflow int64 at corpus scale).
    Output: (bigram, c_xy, c_x, c_y, pmi), ranked by rounded pmi with the
    bigram string as tie-break.
    """
    toks = tokens(text_col)
    uni = (
        docs.select(F.explode(toks).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    bi = (
        docs.select(F.explode(word_ngrams(toks, 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c_xy"))
        .where(F.col("c_xy") >= min_count)
    )
    n1 = uni.agg(F.sum("c").alias("n1"))  # 1 row
    n2 = (
        docs.select(F.size(word_ngrams(toks, 2)).alias("nb"))
        .agg(F.sum("nb").alias("n2"))
    )  # 1 row
    parts = bi.select(
        "bigram",
        "c_xy",
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("x"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("y"),
    )
    joined = (
        parts.join(uni.select(F.col("term").alias("x"), F.col("c").alias("c_x")), "x")
        .join(uni.select(F.col("term").alias("y"), F.col("c").alias("c_y")), "y")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
    )
    p_xy = F.col("c_xy").cast("double") / F.col("n2")
    p_x = F.col("c_x").cast("double") / F.col("n1")
    p_y = F.col("c_y").cast("double") / F.col("n1")
    out = joined.select(
        "bigram",
        "c_xy",
        "c_x",
        "c_y",
        F.round(F.log(p_xy / (p_x * p_y)), round_digits).alias("pmi"),
    )
    return out.orderBy(F.col("pmi").desc(), F.col("bigram")).limit(k)


def mrr(
    hits: DataFrame,
    rel_col: str = "rel",
    query_col: str = "query_id",
    rank_col: str = "rank",
    ndigits: int = 6,
) -> DataFrame:
    """Mean-reciprocal-rank inputs: per query, the rank of the FIRST
    relevant hit and its reciprocal (0.0 when nothing relevant ranked).
    One query-keyed partial agg over the (already k-bounded) hit relation
    — the eval never touches the corpus. Emit per-query rows; the scalar
    MRR is their average (callers aggregate when they want one number,
    keeping this relation hash-checkable row-by-row).

    Output: (query_id, first_rel_rank nullable, rr)."""
    agg = hits.groupBy(query_col).agg(
        F.min(F.when(F.col(rel_col) == 1, F.col(rank_col))).alias("first_rel_rank")
    )
    return agg.select(
        query_col,
        "first_rel_rank",
        (
            F.round(
                F.coalesce(F.lit(1.0) / F.col("first_rel_rank"), F.lit(0.0)), ndigits
            )
            + F.lit(0.0)
        ).alias("rr"),
    )


def tfidf_topk_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    ndigits: int = 6,
) -> DataFrame:
    """Top-k most characteristic terms per document by TF·IDF
    (idf = ln(N/df), unsmoothed — every df ≥ 1 by construction): the
    keyword/topic-fingerprint view of a corpus (bm25_topk ranks DOCS for a
    query; this ranks TERMS for a doc).

    Scale shape: tf is one (doc, token)-keyed partial agg over the token
    stream; df is one token-keyed agg (vocab-sized) broadcast back; N is a
    1-row scalar. The per-doc top-k window runs over each doc's distinct
    terms only. Ranking is on the ROUNDED score with the token as
    tie-break (the house oracle-parity discipline).

    Output: (id, token, tf, score, rnk), rnk 1..k best-first."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    ).where(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    df_rel = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = docs.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    scored = (
        tf.join(df_rel, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            "tf",
            (
                F.round(
                    F.col("tf") * F.log(F.col("_n") / F.col("_df")), ndigits
                )
                + F.lit(0.0)
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "token", "tf", "score", "rnk")
    )


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    k: int = 20,
    c: int = 60,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval systems (Cormack et al. 2009):
    fused score = Σ_systems 1/(c + rank), the standard hybrid-search merge
    of a lexical (BM25) and a dense (embedding) ranking.

    Float discipline: the reciprocal is computed as the SCALED-INTEGER
    ``scale DIV (c + rank)`` so the fused score is an exact BIGINT in any
    engine — no summation-order or rounding hazard at the top-k boundary
    (1/(c+r) sums at double precision can differ by an ulp across engines
    and flip ties). Monotonicity in rank is preserved exactly for
    c + rank ≤ √scale ≈ 31k, far beyond any practical candidate depth.

    Inputs are (system_name, ranking) pairs where each ranking carries
    (id_col, rank) — candidate lists, i.e. top-k relations, so this is
    bounded k·N rows end-to-end regardless of corpus size; the fusion
    never touches the corpus. Output: (id, n_systems, rrf_score BIGINT,
    fused_rank), ties broken by id."""
    from pyspark.sql.window import Window

    contribs = None
    for _name, r in rankings:
        part = r.select(
            F.col(id_col).alias("_id"),
            F.expr(f"{scale} DIV ({c} + rank)").cast("long").alias("_contrib"),
        )
        contribs = part if contribs is None else contribs.unionByName(part)
    assert contribs is not None, "at least one ranking required"
    fused = contribs.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_systems"),
        F.sum("_contrib").cast("long").alias("rrf_score"),
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
        .select(F.col("_id").alias(id_col), "n_systems", "rrf_score", "fused_rank")
    )


def feature_hash(
    docs: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick vectorizer (Weinberger et al. 2009): token → feature
    index md5-hash % dim, with a ±1 sign from an independent hash bit so
    collisions cancel in expectation instead of biasing counts upward.
    Output: sparse (id, idx, val) triples — the fixed-dimension,
    vocabulary-free featurizer that feeds logistic_gd/ridge without a
    vocab broadcast or a dictionary shuffle.

    Scale shape: explode → ONE (id, idx) partial-agg shuffle, output
    bounded by nnz ≤ tokens; integer-exact (signed counts), md5 parity
    with the DuckDB oracle."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    idx = (
        F.conv(F.substring(F.md5(F.concat(F.lit("fh:"), F.col("tok"))), 1, 6), 16, 10)
        .cast("long")
        % dim
    )
    sign = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("fs:"), F.col("tok"))), 1, 2), 16, 10)
        .cast("long")
        % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        toks.select(F.col(id_col), idx.alias("idx"), sign.alias("s"))
        .groupBy(id_col, "idx")
        .agg(F.sum("s").cast("long").alias("val"))
        .filter(F.col("val") != 0)
    )


def average_precision_at_k(
    hits: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    n_rel_col: str = "n_rel_total",
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """AP@k per query over an already-k-bounded hit relation (MAP's
    per-query rows — callers average for the scalar): AP@k =
    (Σ_{i ≤ k, relᵢ=1} P@i) / min(R, k) with P@i the precision at rank i
    and R = ``n_rel_col`` (the query's corpus-wide relevant count, joined
    on upstream). Completes the eval trio: RR grades time-to-first-hit,
    NDCG the graded ordering, AP the uninterpolated precision mass.

    Exactness: P@i = cumrel_i/i is carried as the scaled integer
    cumrelᵢ·10⁹ div i (both engines floor identically — the reciprocal-
    rank discipline), the per-query term sum is an exact int64, and the
    single closing division is over identical exact operands. Bound:
    k·10⁹ ≪ 2⁶³ for any sane k.

    Scale shape: one k-bounded window per query + one query-keyed agg —
    the eval never touches the corpus.

    Output per query: (query_id, n_rel_topk, n_rel_total, ap)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(query_col)
        .orderBy(rank_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    terms = hits.filter(F.col(rank_col) <= k).select(
        query_col,
        rank_col,
        rel_col,
        F.col(n_rel_col).alias("_nr"),
        F.sum(F.col(rel_col).cast("long")).over(w).alias("_cum"),
    )
    agg = terms.groupBy(query_col).agg(
        F.sum(F.col(rel_col).cast("long")).cast("long").alias("n_rel_topk"),
        F.first("_nr").cast("long").alias("n_rel_total"),
        F.sum(
            F.when(
                F.col(rel_col) == 1,
                F.expr(f"_cum * CAST(1000000000 AS BIGINT) div {rank_col}"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("_ap_e9"),
    )
    denom = F.least(F.col("n_rel_total"), F.lit(k).cast("long"))
    ap = F.when(denom <= 0, F.lit(0.0)).otherwise(
        F.col("_ap_e9").cast("double") / (denom.cast("double") * 1e9)
    )
    return agg.select(
        query_col,
        "n_rel_topk",
        "n_rel_total",
        (F.round(ap, ndigits) + F.lit(0.0)).alias("ap"),
    )
