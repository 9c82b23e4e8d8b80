"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Query vectors are broadcast; the corpus is scanned once; per-partition
  top-k via window rank. All JVM-side (F.aggregate/zip_with dot products).
- ``cosine_topk_lsh``: sign-random-projection LSH bucketing — the scale
  path. Corpus is bucketed once (write-time in production), probes search
  only matching buckets (multi-probe across all bucket bits via the
  ``n_probes`` Hamming-ball expansion).
- ``embedding_near_dups``: all-pairs-above-threshold near-dup detection
  bucketed by LSH key so only same-bucket pairs are scored.

At 100 TB the brute-force path is one scan + broadcast (no shuffle of the
corpus); the LSH path turns top-k into a bucket-pruned scan. Python never
touches vectors — everything is higher-order SQL functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rank_round: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × scan corpus → rank.
    Excludes self-matches (same id). Ties break toward lower neighbor id.
    ``rank_round`` ranks on the rounded similarity instead — used when the
    ranking must be reproducible across engines with different float-sum
    orders. Output: (query_id, neighbor_id, cosine_sim, rank)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    sim = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim"),
        )
    )
    order_col = (
        F.round("cosine_sim", rank_round) if rank_round is not None else F.col("cosine_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        order_col.desc(), F.col("neighbor_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine_sim", "rank")
    )


def cosine_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rank_round: int | None = None,
) -> DataFrame:
    """Exact brute-force top-k, Arrow-vectorized: the production path for
    big corpora. The (tiny) query set is collected once and closed over as
    a normalized float64 matrix; ``mapInPandas`` computes each Arrow batch's
    similarities as ONE numpy matmul (batch × dim @ dim × nq) and emits only
    the per-batch top-k candidates per query; a final window rank merges
    ≤ k × n_batches candidates per query into the exact global top-k.

    Identical results to ``cosine_topk`` (same tie-break: sim desc,
    neighbor_id asc); ~10× the per-row throughput of the higher-order-
    function dot product, which evaluates an interpreted lambda per
    element. The corpus is still scanned once, shuffled never (candidate
    set is k·n_batches rows, output-sized)."""
    import numpy as np
    from pyspark.sql import types as T

    qrows = queries.select(query_id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = T.StructType(
        [
            T.StructField(query_id_col, T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def _batches(pdfs):
        import pandas as pd

        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            # Arrow hands the list column over as a Series of np.ndarray —
            # vstack is the no-copy-per-element path (a per-row list() walk
            # costs more than the matmul itself)
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            S = Mn @ Qn.T  # (batch, nq)
            for j in range(len(qids)):
                s, qid = S[:, j], qids[j]
                mask = ids != qid
                s_m, ids_m = s[mask], ids[mask]
                if not len(ids_m):
                    continue
                top = min(k, len(ids_m))
                # exact per-batch top-k with the global tie-break order.
                # rank_round must round HALF-UP (away from zero) to agree
                # with the final window's F.round — np.round is half-to-even
                # and would prune a row the merge would have kept on exact
                # .5 boundaries
                if rank_round is not None:
                    f = 10.0**rank_round
                    key = np.sign(s_m) * np.floor(np.abs(s_m) * f + 0.5) / f
                else:
                    key = s_m
                order = np.lexsort((ids_m, -key))[:top]
                yield pd.DataFrame(
                    {
                        query_id_col: np.full(top, qid),
                        "neighbor_id": ids_m[order],
                        "cosine_sim": s_m[order],
                    }
                )

    cand = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(_batches, out_schema)
    order_col = (
        F.round("cosine_sim", rank_round) if rank_round is not None else F.col("cosine_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(order_col.desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine_sim", "rank")
    )


def quantize_embeddings(
    corpus: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization for embedding storage: scale =
    max|x| / 127, q[d] = round(x[d] / scale). Cuts the 100 TB embedding
    footprint ~4× (float32 → int8 + one float scale); recall loss for
    cosine search is ~0.1% at 64-1024 dims. Row-local expressions only —
    computable at write time, no shuffle.

    Adds ``{vec_col}_q8`` (array<tinyint>) and ``{vec_col}_scale``
    (float); ``dequantize_embeddings`` inverts (lossy to 1/254 of the max
    component)."""
    amax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    return corpus.withColumn(f"{vec_col}_scale", scale.cast("float")).withColumn(
        f"{vec_col}_q8",
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") / F.col(f"{vec_col}_scale")).cast("tinyint"),
        ),
    )


def dequantize_embeddings(
    corpus: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Inverse of ``quantize_embeddings``: reconstructs ``vec_col`` as
    array<float> from the int8 codes + per-vector scale."""
    return corpus.withColumn(
        vec_col,
        F.transform(
            F.col(f"{vec_col}_q8"),
            lambda q: (q.cast("double") * F.col(f"{vec_col}_scale")).cast("float"),
        ),
    )


N_LSH_PLANES = 8
# plane components are embedded as plan literals: n_planes × _SRP_MAX_DIM
# doubles. 512 covers common embedding dims at ~4k literals; pass dim=
# explicitly for wider vectors (a too-small dim would null out projections).
_SRP_MAX_DIM = 512


def _srp_component_py(plane: int, dim_idx: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    md5(plane:dim) hex → [0,1) — seedless, reproducible on any engine
    (the DuckDB oracle evaluates the identical formula in SQL)."""
    import hashlib

    h = hashlib.md5(f"{plane}:{dim_idx}".encode()).hexdigest()
    return int(h[:6], 16) / 16777216.0 - 0.5


def srp_bucket(
    vec: Column,
    n_planes: int = N_LSH_PLANES,
    dim: int = _SRP_MAX_DIM,
    plane_offset: int = 0,
) -> Column:
    """Sign-random-projection bucket id: bit_p = [Σ_d vec[d]·plane_p[d] > 0].

    Plane components are md5-derived but FOLDED AT PLAN TIME into literal
    arrays (evaluating the md5 per row — 512 hashes/vector — was the
    bucketing hot spot; the folded form is pure multiply-add inside
    codegen). Computable at write time for bucketing a 100 TB corpus and
    identically at query time for probes. ``plane_offset`` selects an
    independent plane family (band b of an LSH band structure uses planes
    [b·r, (b+1)·r))."""
    bits = []
    for p in range(n_planes):
        comps = F.array(*[F.lit(_srp_component_py(plane_offset + p, d)) for d in range(dim)])
        # Null-safety + overflow-safety: a NULL element (or a vector wider
        # than `dim`, which would pad the plane side with NULLs) must not
        # null the whole projection — that silently sent EVERY vector to
        # bucket 0. Truncate the VECTOR to the plane width (projecting on
        # the first `dim` components is still a valid hyperplane, with
        # reduced discrimination for wider vectors) and treat NULL elements
        # as 0.
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.slice(comps, 1, F.least(F.size(vec), F.lit(dim))),
                lambda x, c: F.coalesce(x.cast("double"), F.lit(0.0))
                * F.coalesce(c, F.lit(0.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


RP_OUT_DIM = 8


def _rp_sign_py(out_idx: int, dim_idx: int) -> float:
    """Deterministic Rademacher ±1 component (Achlioptas 2003 sparse-JL
    family, density 1): md5 parity, reproducible in any engine — the DuckDB
    oracle evaluates the identical formula in SQL."""
    import hashlib

    h = hashlib.md5(f"rp{out_idx}:{dim_idx}".encode()).hexdigest()
    return 1.0 if int(h[:6], 16) % 2 == 0 else -1.0


def rp_project(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = RP_OUT_DIM,
    dim: int = 64,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: embed ``vec_col`` (dim d)
    into ``out_dim`` components, out_j = Σ_d v[d]·s[j,d] / sqrt(out_dim)
    with deterministic ±1 signs. Distances are preserved in expectation
    (JL lemma), so the reduced vectors feed cheap pre-filters in front of
    exact reranking.

    Scale: the sign matrix folds into out_dim × dim plan literals — the
    whole transform is row-local multiply-add, computable at WRITE time for
    a 100 TB corpus (no shuffle, pipelines into the scan like srp_bucket).
    Adds columns rp0..rp{out_dim-1}; the fold is a sequential left-to-right
    sum so the float result is reproducible across engines.
    """
    inv_sqrt = 1.0 / (out_dim**0.5)
    vec = F.col(vec_col)
    cols = list(df.columns)
    for j in range(out_dim):
        signs = F.array(*[F.lit(_rp_sign_py(j, d)) for d in range(dim)])
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.slice(signs, 1, F.least(F.size(vec), F.lit(dim))),
                lambda x, s: F.coalesce(x.cast("double"), F.lit(0.0))
                * F.coalesce(s, F.lit(0.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append((proj * F.lit(inv_sqrt)).alias(f"rp{j}"))
    return df.select(*cols)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = N_LSH_PLANES,
    n_probes: int = 1,
    rank_round: int | None = None,
) -> DataFrame:
    """Approximate top-k: search only corpus buckets within Hamming distance
    < n_probes of the query's bucket (n_probes=1 → exact bucket only).
    ``n_probes = n_planes + 1`` probes the ENTIRE Hamming cube: every
    corpus vector is then a candidate exactly once (one bucket per vector,
    one probe per mask), so the result is EXACTLY the brute-force top-k —
    the completeness property the contract oracle checks. ``rank_round``
    ranks on the rounded similarity (cross-engine tie-break parity, same
    knob as cosine_topk).

    Probing enumerates the Hamming ball on the QUERY side (explode over the
    Σ C(n_planes, d<n_probes) flip masks) so the corpus side stays a plain
    equi-join on bucket — at 100 TB the corpus is hash-partitioned (or
    partition-pruned) by bucket and is never crossed with the query set.
    Same output schema as cosine_topk; recall < 1 by design."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        srp_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    masks = [m for m in range(1 << n_planes) if bin(m).count("1") < n_probes]
    q = (
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("q_vec"),
            srp_bucket(F.col(vec_col), n_planes).alias("q_bucket"),
        )
        .withColumn("mask", F.explode(F.array(*[F.lit(m) for m in masks])))
        .withColumn("bucket", F.col("q_bucket").bitwiseXOR(F.col("mask")).cast("int"))
        .drop("q_bucket", "mask")
    )
    joined = c.join(F.broadcast(q), "bucket")
    sim = joined.filter(F.col("neighbor_id") != F.col(query_id_col)).select(
        query_id_col,
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim"),
    )
    order_col = (
        F.round("cosine_sim", rank_round) if rank_round is not None else F.col("cosine_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(order_col.desc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine_sim", "rank")
    )


def ivf_centroids(corpus: DataFrame, n_centroids: int = 16, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic IVF 'training': the n lowest-id vectors serve as
    centroids (documented simplification of k-means — deterministic,
    engine-independent, and adequate for partition pruning; production would
    run k-means once at index-build time)."""
    rows = corpus.orderBy(F.col(id_col)).limit(n_centroids).select(vec_col).collect()
    return [[float(x) for x in r[0]] for r in rows]


def _centroid_sims(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of (negated cosine, centroid_id) structs — expression-only, so
    assignment is a narrow projection with zero shuffle."""
    entries = []
    for cid, c in enumerate(centroids):
        c_lit = F.array(*[F.lit(x) for x in c])
        entries.append(F.struct((-cosine(vec, c_lit)).alias("negsim"), F.lit(cid).alias("cid")))
    return F.array_sort(F.array(*entries))  # ascending negsim = descending sim


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Assign each vector to its nearest centroid (computable at write time
    → corpus partitioned/bucketed by cluster at 100 TB)."""
    return corpus.withColumn(
        cluster_col, _centroid_sims(F.col(vec_col), centroids)[0]["cid"]
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: list[list[float]],
    n_iter: int = 5,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's refinement of the IVF centroids (spherical flavor: cosine
    assignment, mean recompute — cosine is scale-invariant so the mean
    needn't be renormalized). Each iteration is one narrow expression-only
    assignment (zero shuffle, see ivf_assign) plus ONE shuffle keyed
    (cluster, dim) whose partial-agg output is k × dim rows — the driver
    collects only the k × dim centroid matrix per round, never vectors.

    Deterministic: argmax ties resolve to the lowest centroid id in both
    the expression (array_sort on (negsim, cid)) and the numpy golden the
    tests compare against. Empty clusters keep their previous centroid."""
    dim = len(centroids[0])
    cents = [list(map(float, c)) for c in centroids]
    for _ in range(n_iter):
        assigned = ivf_assign(corpus, cents, vec_col)
        means = (
            assigned.select("cluster", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = {r["cluster"]: [0.0] * dim for r in means}
        for r in means:
            new[r["cluster"]][r["dim"]] = float(r["m"])
        cents = [new.get(cid, cents[cid]) for cid in range(len(cents))]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rank_round: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: each query searches only its n_probe nearest
    centroid clusters. With the corpus pre-partitioned by cluster, the scan
    prunes to n_probe/n_centroids of the data. Same output schema as
    cosine_topk; recall rises with n_probe. When ``n_probe ==
    len(centroids)`` every cluster is probed, and because cluster
    assignment is a partition of the corpus the result is EXACTLY the
    brute-force top-k — the index-completeness property the contract
    oracle checks. ``rank_round`` ranks on the rounded similarity for
    cross-engine-reproducible tie-breaks (same knob as cosine_topk)."""
    assigned = ivf_assign(corpus, centroids, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "cluster"
    )
    probes = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            F.slice(
                F.transform(_centroid_sims(F.col(vec_col), centroids), lambda s: s["cid"]),
                1,
                n_probe,
            )
        ).alias("cluster"),
    )
    sim = (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col, "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim")
        )
    )
    order_col = (
        F.round("cosine_sim", rank_round) if rank_round is not None else F.col("cosine_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(order_col.desc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine_sim", "rank")
    )


N_SRP_BANDS = 6
SRP_BAND_BITS = 16


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = N_SRP_BANDS,
    band_bits: int = SRP_BAND_BITS,
    dim: int = _SRP_MAX_DIM,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold),
    candidate-pruned with a banded SRP structure: ``n_bands`` independent
    bucket tables of ``band_bits`` bits each (band b projects on plane
    family [b·r, (b+1)·r)); a pair is a candidate iff it collides in ANY
    band. Per-band collision probability for angle θ is (1 - θ/π)^r, overall
    recall 1 - (1 - p)^b — 6 bands × 16 bits gives ~0.98 recall at cosine
    0.99 while each band has 2^16 buckets, so in-bucket pair enumeration
    stays near-linear (the single 8-bit table it replaces had 256 buckets →
    (N/256)² in-bucket pairs at corpus scale).
    Output: (id_a, id_b, cosine_sim)."""
    base = corpus.select(F.col(id_col), F.col(vec_col))
    bucketed = base.select(
        F.col(id_col),
        *[
            srp_bucket(
                F.col(vec_col), band_bits, dim, plane_offset=b * band_bits
            ).alias(f"bucket_{b}")
            for b in range(n_bands)
        ],
    )
    bands = bucketed.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"bucket_{b}").alias("bucket")
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = bands.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "bucket")
    # candidates are id pairs only — vectors are NOT carried through the
    # band join or the dedup shuffle; they re-attach by id afterwards
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = base.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = base.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine(F.col("vec_a"), F.col("vec_b")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = N_SRP_BANDS,
    band_bits: int = SRP_BAND_BITS,
    dim: int = _SRP_MAX_DIM,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication: embedding-cosine near-dup
    pairs (banded SRP candidates, exact cosine verify) → connected
    components → keep the minimum-id vector per semantic cluster.
    Output: (id, cluster_id, is_canonical) for EVERY corpus vector
    (singletons are their own canonical cluster).

    Composition of two already-scale-shaped stages: the pair stage never
    leaves its LSH buckets, and the clustering rounds shuffle only
    (node, label) pairs over a near-dup graph whose components are tiny.
    The reassembly is one left join on the corpus id — embeddings
    themselves never move."""
    from .cluster import connected_components

    pairs = embedding_near_dups(
        corpus, threshold, id_col, vec_col, n_bands, band_bits, dim
    )
    comps = connected_components(pairs.select("id_a", "id_b"), "id_a", "id_b")
    ids = corpus.select(F.col(id_col))
    lbl = F.coalesce(F.col("cluster_id"), F.col(id_col))
    return (
        ids.join(comps, ids[id_col] == comps["node"], "left")
        .select(
            F.col(id_col),
            lbl.alias("cluster_id"),
            (lbl == F.col(id_col)).alias("is_canonical"),
        )
    )


def _l2_lit(vec: Column, c: list[float]) -> Column:
    """Exact squared L2 between a vector column and a literal center —
    flat multiply-add codegen sum (dim-sequential, matching the oracle's
    grouped sum; d*d not POWER())."""
    out = None
    for j, cj in enumerate(c):
        d = F.element_at(vec, j + 1).cast("double") - F.lit(float(cj))
        t = d * d
        out = t if out is None else out + t
    return out


def kcenter_coreset(
    corpus: DataFrame,
    k: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center (farthest-point) coreset selection + assignment —
    the diversity-sampling/data-pruning operator (Sener & Savarese 2018
    use it for active learning; the same geometry prunes redundant
    training examples): pick the lowest-id vector, then k-1 times the
    vector farthest from every selected center, then assign each corpus
    row to its nearest center.

    Fully deterministic (lowest-id seed, argmax ties to lowest id,
    assignment ties to lowest center index), so the whole loop carries a
    DuckDB oracle of unrolled CTEs.

    Scale: each of the k rounds is ONE narrow projection over the corpus
    (running min-distance folded with ``least`` against the new center
    literal, pinned with localCheckpoint so the plan stays constant-size)
    plus a TakeOrdered(1) argmax — no shuffles at all beyond the 1-row
    collect; the assignment pass is one more narrow projection. Total:
    k+1 corpus scans, zero exchanges."""
    sel_rows = (
        corpus.orderBy(F.col(id_col)).limit(1).select(id_col, vec_col).collect()
    )
    centers = [[float(x) for x in sel_rows[0][1]]]
    center_ids = [sel_rows[0][0]]
    cur = corpus.select(
        F.col(id_col), F.col(vec_col), _l2_lit(F.col(vec_col), centers[0]).alias("_mind")
    ).localCheckpoint()
    for _ in range(k - 1):
        far = (
            cur.orderBy(F.col("_mind").desc(), F.col(id_col))
            .limit(1)
            .select(id_col, vec_col)
            .collect()[0]
        )
        centers.append([float(x) for x in far[1]])
        center_ids.append(far[0])
        cur = cur.withColumn(
            "_mind", F.least(F.col("_mind"), _l2_lit(F.col(vec_col), centers[-1]))
        ).localCheckpoint()
    entries = [
        F.struct(
            _l2_lit(F.col(vec_col), c).alias("dist"), F.lit(cid).alias("cid")
        )
        for cid, c in enumerate(centers)
    ]
    best = F.array_sort(F.array(*entries))[0]
    id_to_center = F.create_map(
        *[x for cid, i in enumerate(center_ids) for x in (F.lit(cid), F.lit(i))]
    )
    return corpus.select(
        F.col(id_col),
        id_to_center[best["cid"]].alias("center_id"),
        F.round(best["dist"], 6).alias("center_dist"),
    )


def ivf_nprobe_sweep(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    probes: tuple[int, ...] = (1, 2, 4, 8, 16),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rank_round: int = 6,
    scale: int = 10_000,
) -> DataFrame:
    """IVF tuning advisor: measured recall@k AND scan cost for every
    ``n_probe`` in one pass — the ANN twin of dedup.lsh_band_sweep (LSH
    sweeps banding, this sweeps probe depth; both turn a rule of thumb
    into a measured curve before committing a 100 TB index config).

    Key identity that makes the sweep one pass: with exact scoring inside
    probed cells, the retrieved top-k ∩ true top-k equals the true top-k
    members whose cell IS probed (any truth member among the candidates
    outranks every non-truth candidate). So recall@k needs only each
    truth neighbor's cell probe-rank — no per-config top-k reranking.

    Determinism: centroid assignment and probe order rank on
    ROUND(sim, rank_round) with centroid-id tie-break, the cosine_topk
    discipline — replayable by a SQL oracle.

    Scale shape: assignment is expression-only (write-time at 100 TB);
    the probe-rank relation is |queries|×|centroids| rows; truth comes
    from the brute-force pass (the thing being benchmarked against);
    per-config counts are ONE conditional aggregate over the
    |queries|·k-row truth relation.

    Output per probe depth: (n_probe, n_queries, n_truth_pairs, n_hit,
    recall_e4, n_scanned_rows) — all exact integers."""
    n_cents = len(centroids)
    ranked_cids = F.transform(
        F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.round(
                            -cosine(F.col(vec_col), F.array(*[F.lit(x) for x in c])),
                            rank_round,
                        ).alias("negsim"),
                        F.lit(cid).alias("cid"),
                    )
                    for cid, c in enumerate(centroids)
                ]
            )
        ),
        lambda s: s["cid"],
    )
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"), ranked_cids[0].alias("cluster")
    )
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("c_size"))
    probe_ranks = queries.select(
        F.col(query_id_col),
        F.posexplode(ranked_cids).alias("_pos", "cluster"),
    ).select(query_id_col, (F.col("_pos") + 1).alias("probe_rank"), "cluster")
    truth = cosine_topk(
        corpus,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        rank_round=rank_round,
    ).select(query_id_col, "neighbor_id")
    # each truth neighbor's cell probe-rank for its query
    truth_ranked = (
        truth.join(assigned, "neighbor_id")
        .join(probe_ranks, [query_id_col, "cluster"])
    )
    nq = queries.select(query_id_col).distinct().count()  # bounded: query batch
    hit_aggs = [
        F.sum((F.col("probe_rank") <= p).cast("long")).alias(f"h{p}")
        for p in probes
    ]
    hits = truth_ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_truth"), *hit_aggs
    )
    scan_aggs = [
        F.sum(
            F.when(F.col("probe_rank") <= p, F.col("c_size")).otherwise(0)
        ).cast("long").alias(f"s{p}")
        for p in probes
    ]
    scans = probe_ranks.join(F.broadcast(sizes), "cluster").agg(*scan_aggs)
    per_probe = F.array(
        *[
            F.struct(
                F.lit(int(p)).alias("n_probe"),
                F.col(f"h{p}").alias("n_hit"),
                F.col(f"s{p}").alias("n_scanned_rows"),
            )
            for p in probes
        ]
    )
    return (
        hits.crossJoin(F.broadcast(scans))
        .select(F.col("n_truth"), F.explode(per_probe).alias("p"))
        .select(
            F.col("p.n_probe").cast("int").alias("n_probe"),
            F.lit(nq).cast("long").alias("n_queries"),
            F.col("n_truth").alias("n_truth_pairs"),
            F.col("p.n_hit").alias("n_hit"),
            F.when(
                F.col("n_truth") > 0,
                F.expr(f"p.n_hit * {scale} div n_truth"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("recall_e4"),
            F.col("p.n_scanned_rows").alias("n_scanned_rows"),
        )
    )
