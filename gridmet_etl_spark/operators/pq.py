"""Product quantization (PQ) — the compressed-codes ANN scale path.

IVF (similarity.py) prunes WHICH vectors a query scans; PQ shrinks WHAT is
scanned: each d-dim vector becomes m single-byte codes (one per d/m-dim
subspace, each quantized against its own ksub-entry codebook), a 32x-256x
compression that lets a 10^10-vector index fit in cluster memory. Queries
score candidates with asymmetric distance computation (ADC): the query
precomputes an m x ksub lookup table of exact subspace distances, and each
candidate costs m table lookups instead of d multiplies (Jegou, Douze,
Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI 2011).

Engine mapping — every stage is a DataFrame op with the same determinism
discipline as the IVF/k-means path (lowest-id seeds, lowest-code ties,
empty cells keep their centroid), so the whole index build AND the ADC
search carry an exact DuckDB oracle (unrolled-Lloyd CTEs per subspace,
contract_ext4.py):

- ``pq_codebooks``: m independent k-means run in the SAME job — the
  subspace id is just another grouping key. Per Lloyd round: one
  expression-only assignment projection (zero shuffle) + ONE exchange
  keyed (sub, code, dim) whose partial-agg output is m x ksub x dsub rows;
  the driver collects only that centroid matrix (~kilobytes) per round.
- ``pq_encode``: expression-only argmin per subspace -> m code columns.
  Write-time op, zero shuffle — at 100 TB the codes table (m bytes/row)
  is written next to the raw vectors once and queried forever after.
- ``pq_adc_topk``: the codes relation never shuffles; the per-query LUT
  is m broadcast joins (one per subspace, each against a |q| x ksub slice
  of the LUT relation), folded into one ADC sum, then the per-query top-k
  window. The only exchange carries scored candidate rows.

Reference parity: the reference has no ANN surface at all — this extends
the engine for the embedding-corpus workloads BASELINE.json names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PQ_M = 4  # subspaces
PQ_KSUB = 8  # codes per subspace (production: 256 = 1 byte)
PQ_DIM = 64  # driver embeddings dimension


def _sub_slice(vec_col: str, sub: int, dsub: int) -> Column:
    """Subvector s of the embedding: 1-indexed slice [s*dsub+1, (s+1)*dsub]."""
    return F.slice(F.col(vec_col), sub * dsub + 1, dsub)


def _l2sq(v: Column, c: list[float]) -> Column:
    """Exact squared L2 between a subvector column and a literal centroid,
    as a flat codegen sum (no HOF lambdas — they run interpreted)."""
    terms = [
        (F.element_at(v, j + 1).cast("double") - F.lit(float(c[j]))) ** 2
        for j in range(len(c))
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _argmin_code(v: Column, codebook: list[list[float]]) -> Column:
    """Nearest-centroid code for one subvector: array_sort over
    (distance, code) structs — ties resolve to the lowest code, matching
    the oracle's row_number ORDER BY dist, code."""
    entries = [
        F.struct(_l2sq(v, c).alias("dist"), F.lit(code).alias("code"))
        for code, c in enumerate(codebook)
    ]
    return F.array_sort(F.array(*entries))[0]["code"]


def pq_seed_codebooks(
    corpus: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = PQ_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic seeds: subspace s's codebook starts as the s-th
    subvectors of the ksub lowest-id vectors (same convention as
    ivf_centroids). Returns m x ksub x (dim/m)."""
    dsub = dim // m
    rows = corpus.orderBy(F.col(id_col)).limit(ksub).select(vec_col).collect()
    vecs = [[float(x) for x in r[0]] for r in rows]
    return [
        [v[s * dsub : (s + 1) * dsub] for v in vecs]
        for s in range(m)
    ]


def pq_refine(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    n_iter: int = 2,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Lloyd refinement of all m sub-codebooks in one job per round:
    assignment is a zero-shuffle projection (m argmin expressions over
    literal centroids); the mean recompute is ONE exchange keyed
    (sub, code, dim) with partial aggregation, so the shuffle and the
    driver collect are both m x ksub x dsub rows (~kB) regardless of
    corpus size. Empty cells keep their previous centroid."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    books = [[list(map(float, c)) for c in cb] for cb in codebooks]
    for _ in range(n_iter):
        assigned = corpus.select(
            *[
                _argmin_code(_sub_slice(vec_col, s, dsub), books[s]).alias(f"_a{s}")
                for s in range(m)
            ],
            *[_sub_slice(vec_col, s, dsub).alias(f"_v{s}") for s in range(m)],
        )
        long = assigned.select(
            F.posexplode(F.array(*[F.col(f"_a{s}") for s in range(m)])).alias(
                "sub", "code"
            ),
            F.array(*[F.col(f"_v{s}") for s in range(m)]).alias("_vs"),
        ).select(
            "sub",
            "code",
            F.posexplode(F.element_at("_vs", F.col("sub") + 1)).alias("dim", "x"),
        )
        means = (
            long.groupBy("sub", "code", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("mu"))
            .collect()
        )
        new = {}
        for r in means:
            new.setdefault((r["sub"], r["code"]), [0.0] * dsub)[r["dim"]] = float(
                r["mu"]
            )
        books = [
            [new.get((s, c), books[s][c]) for c in range(ksub)] for s in range(m)
        ]
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Codes table (vec_id, code_0..code_{m-1}): expression-only argmin per
    subspace — a narrow write-time projection, zero shuffle. At 100 TB this
    is the only pass over the raw vectors; every later search touches just
    these m small ints per row."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    return corpus.select(
        F.col(id_col),
        *[
            _argmin_code(_sub_slice(vec_col, s, dsub), codebooks[s]).alias(f"code_{s}")
            for s in range(m)
        ],
    )


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rank_round: int | None = 6,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes. The query side builds its
    exact per-subspace LUT as literal expressions (|q| x m x ksub distance
    exprs — queries are a small batch by contract, same stance as
    cosine_topk); each corpus row's ADC distance is m element_at lookups
    into the broadcast LUT arrays. The codes relation scans once and never
    shuffles; the per-query window exchange carries the scored rows.

    Output (query_id, neighbor_id, adc_dist, rank) ranks ascending ADC
    distance, rounded to ``rank_round`` for cross-engine tie stability,
    ties to the lowest neighbor_id."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    # LUT relation: one row per query, with m arrays of ksub exact
    # subspace distances (query subvector vs every centroid literal)
    lut = queries.select(
        F.col(query_id_col),
        *[
            F.array(
                *[
                    F.round(_l2sq(_sub_slice(vec_col, s, dsub), codebooks[s][c]), 9)
                    for c in range(ksub)
                ]
            ).alias(f"_lut{s}")
            for s in range(m)
        ],
    )
    adc = None
    for s in range(m):
        term = F.element_at(F.col(f"_lut{s}"), F.col(f"code_{s}") + 1)
        adc = term if adc is None else adc + term
    scored = (
        codes.crossJoin(F.broadcast(lut))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            F.round(adc, rank_round if rank_round is not None else 9).alias("adc_dist"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "adc_dist", "rank")
    )
