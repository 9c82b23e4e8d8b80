"""Distributed linear algebra over embedding columns: one-pass covariance
matrix and PCA projection — the dimensionality-reduction step (whitening,
drift monitoring, visualization) of an embedding-heavy data pipeline.

Scale shape: the covariance of N vectors of dimension d needs the Gram
matrix XᵀX, the column-sum vector, and the count. All three are computed
in ONE pass with a vectorized Arrow kernel (`mapInPandas`): each partition
accumulates its d×d partial in numpy (one `X.T @ X` per Arrow batch — BLAS,
not Python loops) and emits d(d+1)/2 + d + 1 rows. The only exchange is
those partials: #partitions × O(d²) rows, independent of N. At 100 TB and
d=1024 that is ~4 MB per partition — the corpus itself is never shuffled.

The eigendecomposition runs on the driver over the d×d matrix (d²
doubles — bounded, the same argument as k-means centroids in
similarity.py); components are then broadcast back as plan literals and
the projection is a JVM-side `aggregate(zip_with(...))` dot product per
row — zero shuffle, zero Python in the projection pass.

Determinism: eigenvector sign is fixed by making the largest-|loading|
coordinate positive, so projections are reproducible across runs.

Reference anchor: no equivalent exists in the reference (its arrays stay
in xarray on one node, etl.py:414-446); this is the Spark-native path for
the same "reduce a wide numeric field" need at cluster scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["embed_covariance", "pca_components", "pca_project", "power_iteration"]

_PARTIAL_SCHEMA = "i int, j int, v double"


def _partial_kernel(dim: int, vec_col: str):
    """Per-partition accumulator: yields the flattened (count, sums, Gram)
    partial as (i, j, v) rows. Encoding: (-1,-1)=n, (i,-1)=Σx_i,
    (i,j) i<=j = Σ x_i x_j. Indices are 1-based to match SQL
    generate_subscripts."""

    def _k(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if x.size == 0:
                continue
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x  # one BLAS call per Arrow batch
        iu, ju = np.triu_indices(dim)
        out = pd.DataFrame(
            {
                "i": np.concatenate(([-1], iu + 1, np.arange(1, dim + 1))),
                "j": np.concatenate(([-1], ju + 1, np.full(dim, -1))),
                "v": np.concatenate(([float(n)], g[iu, ju], s)),
            }
        )
        yield out

    return _k


def _partials(emb: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Aggregated one-pass partials: one (i, j, v) relation of
    d(d+1)/2 + d + 1 rows, summed across partitions."""
    parts = emb.select(vec_col).mapInPandas(
        _partial_kernel(dim, vec_col), schema=_PARTIAL_SCHEMA
    )
    return parts.groupBy("i", "j").agg(F.sum("v").alias("v"))


def embed_covariance(
    emb: DataFrame, vec_col: str = "embedding", dim: int = 64, ndigits: int = 6
) -> DataFrame:
    """Population covariance matrix of an embedding column as (i, j, cov)
    rows with i <= j, 1-based — cov = E[x_i x_j] − E[x_i]E[x_j].

    The join fan-in below is over the partials relation (O(d²) rows):
    count is a 1-row broadcast, the mean vector a d-row broadcast."""
    agg = _partials(emb, vec_col, dim)
    # n > 0 guard: an empty input relation yields an empty covariance
    # (instead of an ANSI divide-by-zero) because the count row is dropped
    # and the crossJoin below produces nothing
    cnt = agg.where(
        (F.col("i") == -1) & (F.col("j") == -1) & (F.col("v") > 0)
    ).select(F.col("v").alias("n"))
    means = agg.where((F.col("j") == -1) & (F.col("i") > 0)).select(
        F.col("i").alias("mi"), F.col("v").alias("ms")
    )
    gram = agg.where(F.col("j") > 0)
    return (
        gram.crossJoin(F.broadcast(cnt))
        .join(F.broadcast(means).withColumnRenamed("mi", "i_"), F.col("i") == F.col("i_"))
        .drop("i_")
        .withColumnRenamed("ms", "si")
        .join(F.broadcast(means).withColumnRenamed("mi", "j_"), F.col("j") == F.col("j_"))
        .drop("j_")
        .withColumnRenamed("ms", "sj")
        .select(
            "i",
            "j",
            # + 0.0 normalizes IEEE −0.0 from rounding tiny negatives (the
            # oracle does the same) so canonical text forms agree
            (
                F.round(
                    F.col("v") / F.col("n")
                    - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n")),
                    ndigits,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def pca_components(
    emb: DataFrame, vec_col: str = "embedding", dim: int = 64, k: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k principal components (eigenvectors of the covariance matrix)
    and the mean vector. Driver work is the d×d `eigh` — bounded by the
    embedding dimension, never by N. Sign convention: the largest-|loading|
    coordinate of each component is positive."""
    rows = _partials(emb, vec_col, dim).collect()  # O(d²) rows — bounded
    if not any(r["i"] == -1 and r["v"] > 0 for r in rows):
        raise ValueError("pca_components: empty embedding relation")
    n = 0.0
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for r in rows:
        if r["i"] == -1:
            n = r["v"]
        elif r["j"] == -1:
            s[r["i"] - 1] = r["v"]
        else:
            g[r["i"] - 1, r["j"] - 1] = r["v"]
            g[r["j"] - 1, r["i"] - 1] = r["v"]
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    comps = v[:, np.argsort(w)[::-1][:k]].T  # (k, dim)
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return comps, mean

def pca_project(
    emb: DataFrame,
    comps: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    prefix: str = "pc",
) -> DataFrame:
    """Project every vector onto the given components: JVM-side
    `aggregate(zip_with(vec − mean, comp, *), +)` dot products — the
    components ride into the plan as literals, the pass is narrow
    whole-stage codegen with zero Python and zero shuffle."""
    mean_lit = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), mean_lit, lambda x, m: x - m
    )
    out = emb
    for ci, comp in enumerate(comps):
        comp_lit = F.array(*[F.lit(float(c)) for c in comp])
        dot = F.aggregate(
            F.zip_with(centered, comp_lit, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(f"{prefix}{ci + 1}", dot)
    return out


def power_iteration(
    cov: DataFrame, dim: int = 64, rounds: int = 3, ndigits: int = 6
) -> DataFrame:
    """Top principal component by fixed-round power iteration over a
    covariance relation (i, j, cov) with i <= j (the `embed_covariance`
    output — its values are already rounded, which PINS the iteration's
    inputs so the unrolled SQL oracle sees bit-identical starting data).

    v₀ = 1⃗; each round is v ← C·v expressed relationally: mirror the
    upper triangle to the full matrix, join on j, partial-agg sum by i.
    Every relation in the loop is d²-bounded — after the one data-sized
    covariance pass (upstream), the iteration costs O(d²) per round
    regardless of N, the same boundedness argument as k-means centroids.
    Unlike `pca_components` (driver-side eigh, not SQL-expressible), every
    step here is relational algebra, so a DuckDB oracle can replay it
    round for round.

    Output: one row per dimension (i, loading, eig) — loading is the
    L2-normalized component with the sign fixed so the largest-|loading|
    coordinate (lowest i on ties) is positive; eig is the Rayleigh
    quotient (vᵣ₋₁·vᵣ)/(vᵣ₋₁·vᵣ₋₁) from the final round. Floats round at
    ``ndigits`` (−0.0 normalized) for cross-engine canonical equality.
    """
    full = cov.unionByName(
        cov.where(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), F.col("cov")
        )
    )
    spark = cov.sparkSession
    v = spark.range(1, dim + 1).select(
        F.col("id").cast("int").alias("j"), F.lit(1.0).alias("x")
    )
    # the iterative-plan rule (see graph.pagerank): cut lineage every few
    # rounds or Catalyst analysis time grows multiplicatively; pin the
    # (tiny, d²-bounded) covariance once so each round reuses it
    if rounds > 4:
        full = full.localCheckpoint()
    prev = v
    for r in range(rounds):
        prev = v
        v = (
            full.join(v, "j")
            .groupBy("i")
            .agg(F.sum(F.col("cov") * F.col("x")).alias("x"))
            .select(F.col("i").alias("j"), "x")
        )
        if (r + 1) % 4 == 0 and r + 1 < rounds:
            prev = prev.localCheckpoint()
            v = v.localCheckpoint()
    # Rayleigh quotient from the final (prev, v) pair — both d-row relations
    dots = (
        prev.select(F.col("j"), F.col("x").alias("xp"))
        .join(v, "j")
        .agg(
            F.sum(F.col("xp") * F.col("x")).alias("num"),
            F.sum(F.col("xp") * F.col("xp")).alias("den"),
        )
    )
    nrm = v.agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm"))
    # sign pin: coordinate with max |x| (lowest j on ties) must be positive
    sgn = (
        v.select(
            "x",
            F.row_number()
            .over(Window.orderBy(F.abs(F.col("x")).desc(), F.col("j")))
            .alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(F.when(F.col("x") < 0, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("s"))
    )
    return (
        v.crossJoin(F.broadcast(nrm))
        .crossJoin(F.broadcast(sgn))
        .crossJoin(F.broadcast(dots))
        .select(
            F.col("j").alias("i"),
            (F.round(F.col("s") * F.col("x") / F.col("nrm"), ndigits) + F.lit(0.0)).alias(
                "loading"
            ),
            (F.round(F.col("num") / F.col("den"), ndigits) + F.lit(0.0)).alias("eig"),
        )
    )


def jl_project(
    emb: DataFrame,
    out_dim: int = 8,
    in_dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "jl",
    ndigits: int = 4,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection to ``out_dim`` dims with a
    DETERMINISTIC ±1/√m sign matrix (sign(i,j) from an md5 parity bit, the
    simhash trick) — pairwise distances preserved within (1±ε) whp, and a
    SQL engine can replay the exact matrix, so the projection itself is
    oracle-checkable (random-matrix implementations never are).

    The cheap dimensionality-reduction front end for ANN/clustering: at
    100 TB the projection is ROW-LOCAL codegen'd arithmetic (m×d
    multiply-adds per row, no shuffle, no model state); downstream LSH/IVF
    then operates on m-dim vectors.

    Output long form: (id, j, value) with j in [0, out_dim) and values
    rounded at ``ndigits`` (the d-term dot products are float-sum-order
    sensitive; 4 digits gives ~5 orders of slack over reorder jitter).
    """
    sqrt_m = float(out_dim) ** 0.5

    def _component(j: int):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(in_dim - 1)),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(F.col(vec_col), i + 1)
            * F.when(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}:"),
                            i.cast("string"),
                            F.lit(f":{j}"),
                        )
                    ),
                    1,
                    1,
                )
                >= "8",
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )

    comps = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (F.round(_component(j) / F.lit(sqrt_m), ndigits) + F.lit(0.0)).alias(
                    "value"
                ),
            )
            for j in range(out_dim)
        ]
    )
    return emb.select(F.col(id_col), F.explode(comps).alias("_c")).select(
        id_col, F.col("_c.j").alias("j"), F.col("_c.value").alias("value")
    )
