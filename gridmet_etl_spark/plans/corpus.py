"""Corpus ETL pipeline — the training-data twin of plans/gridmet.py: one
lazy DataFrame DAG composing the hygiene/export operators end-to-end:

    clean → exact-dedup (keep lowest id per fingerprint) →
    decontaminate vs a benchmark set → leakage-safe split →
    token-budget shard packing (train split)

Every stage is a narrow projection or an output-sized shuffle (see each
operator's docstring); the whole pipeline is one Catalyst plan and fully
DuckDB-oracle-expressible (contract query ``corpus_pipeline``).

Scale shape at 100 TB: clean/fingerprint/split are scan-speed map work;
dedup is one digest-keyed shuffle (32 B + id per row); decontamination is
a broadcast anti join (benchmarks are MBs); shard packing shuffles ids +
token counts only. The document bodies are read once and never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.sampling import deterministic_split, pack_shards
from ..operators.textops import clean_text, token_count


def corpus_pipeline(
    docs: DataFrame,
    eval_docs: DataFrame,
    budget: int = 2000,
    weights: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_width: int = 1_000_000,
) -> DataFrame:
    """Returns (doc_id, split, n_tokens, shard): the export manifest of the
    cleaned, deduped, decontaminated corpus. ``shard`` is the token-budget
    shard index within the train split (null for val/test — evaluation
    splits are not packed)."""
    cleaned = docs.select(
        F.col(id_col),
        clean_text(F.col(text_col)).alias("clean"),
    ).select(
        F.col(id_col),
        F.md5(F.lower(F.col("clean"))).alias("fp"),
        token_count(F.col("clean")).cast("long").alias("n_tokens"),
    )
    # exact dedup: keep the lowest id per fingerprint (one digest shuffle)
    w = Window.partitionBy("fp").orderBy(F.col(id_col))
    kept = cleaned.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    # decontaminate: drop anything whose fingerprint appears in the
    # benchmark set (broadcast anti join — the corpus never shuffles)
    eval_fps = (
        eval_docs.select(clean_text(F.col(text_col)).alias("clean"))
        .select(F.md5(F.lower(F.col("clean"))).alias("fp"))
        .distinct()
    )
    survivors = kept.join(F.broadcast(eval_fps), "fp", "left_anti")
    # leakage-safe split, then pack the train split into token shards
    split_df = deterministic_split(survivors, weights, id_col=id_col).select(
        id_col, "n_tokens", "split"
    )
    train = split_df.filter(F.col("split") == "train")
    shards = pack_shards(
        train, budget, size_col="n_tokens", id_col=id_col, group_width=group_width
    ).select(F.col(id_col), F.col("shard"))
    return split_df.join(shards, id_col, "left").select(
        F.col(id_col), "split", "n_tokens", "shard"
    )


def pack_sequences(
    docs: DataFrame,
    manifest: DataFrame,
    sep: str = "\n\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the training sequences: for each train shard, the
    cleaned documents concatenated in id order with ``sep`` — the actual
    "write N-token sequences for the trainer" step downstream of the
    manifest. Output: (shard, seq_text, n_docs, n_tokens).

    One shuffle keyed by shard; each group is budget-bounded by
    construction (pack_shards), so the concat is O(budget) chars per group
    and no group can blow an executor. Ordered concat is the portable
    sorted-struct array_join (≡ DuckDB string_agg ORDER BY)."""
    train = manifest.filter(F.col("split") == "train").select(id_col, "shard", "n_tokens")
    joined = train.join(
        docs.select(F.col(id_col), clean_text(F.col(text_col)).alias("clean")), id_col
    )
    return (
        joined.groupBy("shard")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col(id_col), F.col("clean")))),
                    lambda x: x["clean"],
                ),
                sep,
            ).alias("seq_text"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def corpus_pipeline_v2(
    docs: DataFrame,
    eval_docs: DataFrame,
    budget: int = 2000,
    source_budget: int = 20_000,
    nll_cutoff: float = 3.45,
    min_tokens: int = 5,
    weights: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    group_width: int = 1_000_000,
) -> DataFrame:
    """The modern pretraining recipe, one lazy DAG:

        LM quality scoring (corpus-trained bigram perplexity, lm.py)
          + clean → exact-dedup → decontaminate        (as corpus_pipeline)
          → quality gate (nll ≤ cutoff, n_tokens ≥ min)
          → per-source token-budget quota (FCFS prefix sum, quota.py twin)
          → leakage-safe split → token-budget shard packing

    Output manifest: (doc_id, source, split, n_tokens, nll, shard).

    Scale composition: every stage keeps the corpus-sized relation in
    digest/manifest form — the LM join is the one bigram-keyed exchange
    (lm.py), dedup is the digest shuffle, quota is a source-partitioned
    prefix sum, packing shuffles ids + token counts. Document bodies are
    read once (fingerprint + score derivation) and never shuffled."""
    from ..operators.lm import bigram_lm_scores
    from ..streaming.quota import quota_filter

    nll = bigram_lm_scores(docs, text_col=text_col, id_col=id_col).select(
        id_col, "nll"
    )
    cleaned = docs.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        clean_text(F.col(text_col)).alias("clean"),
    ).select(
        F.col(id_col),
        "source",
        F.md5(F.lower(F.col("clean"))).alias("fp"),
        token_count(F.col("clean")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("fp").orderBy(F.col(id_col))
    kept = (
        cleaned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    eval_fps = (
        eval_docs.select(clean_text(F.col(text_col)).alias("clean"))
        .select(F.md5(F.lower(F.col("clean"))).alias("fp"))
        .distinct()
    )
    decontaminated = kept.join(F.broadcast(eval_fps), "fp", "left_anti")
    quality = decontaminated.join(nll, id_col).where(
        (F.col("nll") <= F.lit(nll_cutoff)) & (F.col("n_tokens") >= min_tokens)
    )
    quota = quota_filter(
        quality, budget=source_budget, source_col="source", id_col=id_col
    ).where(F.col("kept"))
    admitted = quality.join(
        quota.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    )
    split_df = deterministic_split(admitted, weights, id_col=id_col).select(
        id_col, "source", "n_tokens", "nll", "split"
    )
    train = split_df.filter(F.col("split") == "train")
    shards = pack_shards(
        train, budget, size_col="n_tokens", id_col=id_col, group_width=group_width
    ).select(F.col(id_col), F.col("shard"))
    return split_df.join(shards, id_col, "left").select(
        F.col(id_col), "source", "split", "n_tokens", "nll", "shard"
    )


def corpus_pipeline_v3(
    docs: DataFrame,
    lines: DataFrame | None = None,
    delim: str = "\n",
    keep_num: int = 1,
    keep_den: int = 4,
    weights: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    hash_fn: str = "md5",
    ndigits: int = 6,
) -> DataFrame:
    """The round-5 curation recipe, one lazy DAG:

        corpus-wide LINE dedup (C4/RefinedWeb boilerplate removal)
          → boilerplate gate (survivor-line ratio ≥ keep_num/keep_den,
            integer-exact comparison)
          → exact dedup of the REASSEMBLED text (digest shuffle)
          → star-LSH near-dup components → canonical doc per cluster
          → leakage-safe split + temperature-α mixture shares

    Output manifest: (doc_id, source, n_lines, n_kept, n_tokens,
    n_members, split, share_temp) — canonical survivors only; n_members =
    near-dup cluster size (observability: how much each kept doc stands
    in for). The per-source quota DRAW stays a separate step
    (mixture_weights → collect the |sources|-row relation → mixture_sample
    dict), the documented driver-side boundary for dimension-sized plans.

    Scale composition: the line decision shuffles digests; exact dedup
    shuffles digests; LSH shuffles band keys (star join — bucket-LINEAR,
    hub-bucket-proof); components iterate on candidate-edge frontiers;
    split is a row-local hash; mixture is a |sources|-row aggregate.
    Document text is read once (line split), reassembled output-sized,
    and never joins anything bigger than its own id."""
    from ..operators.cluster import connected_components
    from ..operators.dedup import line_dedup, minhash_lsh_star, split_lines
    from ..operators.sampling import mixture_weights

    if lines is None:
        lines = split_lines(docs, text_col, id_col, delim)
    ld = line_dedup(lines, id_col, join_delim=delim)
    gated = ld.filter(
        (F.col("n_kept") > 0)
        & (F.col("n_kept") * keep_den >= F.col("n_lines") * keep_num)
    )
    fp = gated.withColumn("_fp", F.md5(F.lower(F.col("text"))))
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    uniq = (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_fp")
    )
    star = minhash_lsh_star(uniq, text_col="text", id_col=id_col, hash_fn=hash_fn)
    comp = connected_components(star).withColumnRenamed("node", id_col)
    labeled = uniq.join(comp, id_col, "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    canon = labeled.filter(F.col("cluster_id") == F.col(id_col)).join(
        sizes, "cluster_id"
    )
    toks = canon.withColumn(
        "n_tokens",
        F.size(F.split(F.translate(F.col("text"), delim, " "), " ")).cast("long"),
    )
    src = docs.select(F.col(id_col), F.col(source_col).alias("source"))
    manifest = deterministic_split(
        toks.join(src, id_col), weights, id_col=id_col
    )
    mix = mixture_weights(
        manifest, source_col="source", size_col="n_tokens", ndigits=ndigits
    ).select("source", "share_temp")
    return manifest.join(F.broadcast(mix), "source").select(
        id_col,
        "source",
        "n_lines",
        "n_kept",
        "n_tokens",
        "n_members",
        "split",
        "share_temp",
    )
