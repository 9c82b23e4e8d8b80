"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set — the step every LLM training pipeline runs so
held-out benchmarks stay held out.

Two detection tiers, both join-based and shuffle-minimal:

- EXACT: normalized-text fingerprint (md5) equality — a semi join on a
  32-byte digest. At 100 TB the eval set is tiny (benchmarks are MBs), so
  this is a broadcast semi join: zero shuffle of the corpus.
- FUZZY: shared winnowing fingerprints (Schleimer/Wilkerson/Aiken) — any
  eval substring of length ≥ k+window-1 appearing verbatim in a training
  doc contributes a shared fingerprint; flag when the count of distinct
  shared fingerprints ≥ ``min_shared``. The eval fingerprint set is again
  broadcast-sized; the train side's fingerprints are computed map-side and
  the only aggregation is per (train doc, matched) counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import fingerprint, winnow_fingerprints


def decontaminate_exact(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag exact-duplicate contamination. Output: (doc_id, contaminated).
    The eval fingerprint set is distinct + broadcast → the corpus-side scan
    never shuffles."""
    eval_fps = eval_docs.select(fingerprint(F.col(text_col)).alias("fp")).distinct()
    fps = train.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    hit = (
        fps.join(F.broadcast(eval_fps), "fp", "left_semi")
        .select(F.col(id_col))
        .withColumn("contaminated", F.lit(True))
    )
    return (
        train.select(F.col(id_col))
        .join(hit, id_col, "left")
        .select(F.col(id_col), F.coalesce(F.col("contaminated"), F.lit(False)).alias("contaminated"))
    )


def decontaminate_fuzzy(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 3,
) -> DataFrame:
    """Flag fuzzy contamination: training docs sharing ≥ ``min_shared``
    distinct winnowing fingerprints with ANY eval doc. Catches paraphrase-
    light copying that exact hashing misses (winnowing guarantees shared
    substrings of length ≥ k+window-1 surface at least one common
    fingerprint). Output: (doc_id, n_shared_fps, contaminated)."""
    eval_fps = (
        winnow_fingerprints(eval_docs, text_col, id_col, k, window)
        .select("fp")
        .distinct()
    )
    train_fps = winnow_fingerprints(train, text_col, id_col, k, window)
    shared = (
        train_fps.join(F.broadcast(eval_fps), "fp", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_fps"))
    )
    return (
        train.select(F.col(id_col))
        .join(shared, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_shared_fps"), F.lit(0)).alias("n_shared_fps"),
            (F.coalesce(F.col("n_shared_fps"), F.lit(0)) >= min_shared).alias("contaminated"),
        )
    )


BLOOM_M_BITS = 1 << 16
BLOOM_K_HASHES = 4


def bloom_bitmap(
    eval_docs: DataFrame,
    text_col: str = "text",
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K_HASHES,
) -> list[int]:
    """Distributed Bloom-filter build over the eval set's normalized-text
    fingerprints: k xxhash64 positions per member, OR'd into a packed
    64-bit-word bitmap. The shuffle is the (word_idx → bit_or) aggregation
    — m_bits/64 rows regardless of eval size — and the driver collect is
    the constant-size bitmap itself (m_bits/8 bytes, 8 KiB at the default),
    bounded by the filter geometry rather than by data volume."""
    fp = fingerprint(F.col(text_col))
    positions = eval_docs.select(
        F.explode(
            F.array(
                *[F.pmod(F.xxhash64(F.lit(s), fp), F.lit(m_bits)) for s in range(k_hashes)]
            )
        ).alias("pos")
    )
    words = (
        positions.select(
            (F.col("pos") / F.lit(64)).cast("long").alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    bitmap = [0] * (m_bits // 64)
    for r in words.collect():
        bitmap[r["word_idx"]] = r["word"]
    return bitmap


def bloom_hit(
    text: Column | str,
    bitmap: list[int],
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K_HASHES,
) -> Column:
    """Membership probe against a built bitmap: true iff ALL k hash
    positions of the doc fingerprint are set. Pure row-local bit
    arithmetic over an array literal — the corpus-side scan never
    shuffles and carries no join at all (vs the broadcast semi join of
    the exact path). False positives possible (rate set by m/n and k);
    false negatives impossible."""
    c = F.col(text) if isinstance(text, str) else text
    fp = fingerprint(c)
    bm = F.lit(bitmap)
    hit = F.lit(True)
    for s in range(k_hashes):
        pos = F.pmod(F.xxhash64(F.lit(s), fp), F.lit(m_bits))
        word = F.element_at(bm, ((pos / F.lit(64)).cast("long") + F.lit(1)).cast("int"))
        bit_set = (
            F.call_function("shiftright", word, (pos % 64).cast("int")).bitwiseAND(F.lit(1))
            == 1
        )
        hit = hit & bit_set
    return hit


def decontaminate_bloom(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = BLOOM_M_BITS,
    k_hashes: int = BLOOM_K_HASHES,
) -> DataFrame:
    """Bloom-filter contamination pre-screen: the 100 TB-scale variant of
    ``decontaminate_exact`` — instead of a semi join against the eval
    fingerprint set, the corpus scan probes a constant-size bitmap, so the
    plan is join-free on the corpus side. Output: (doc_id, bloom_hit);
    every truly contaminated doc is flagged (no false negatives), plus a
    tunable false-positive tail that a second exact pass over the
    (tiny) flagged subset removes."""
    bitmap = bloom_bitmap(eval_docs, text_col, m_bits, k_hashes)
    return train.select(
        F.col(id_col),
        bloom_hit(F.col(text_col), bitmap, m_bits, k_hashes).alias("bloom_hit"),
    )


def cross_split_leakage(
    digests: DataFrame,
    train_split: str = "train",
    split_col: str = "split",
    id_col: str = "doc_id",
    digest_col: str = "d",
    scale: int = 10_000,
) -> DataFrame:
    """Train→eval contamination audit over content digests: for every
    non-train split, how many of its documents share at least one digest
    (e.g. an 8-token line fingerprint) with ANY train document, and how
    many of its distinct digests appear in train. The QA readout a
    decontamination pass is graded by — benchmark answers leaking through
    shared boilerplate lines are exactly what this catches.

    Scale shape: everything runs on (split, doc, digest) relations —
    document bodies never move. The train digest set joins as a LEFT SEMI
    on the digest key (Bloom/broadcast-prunable); rollups are
    output-sized partial aggs per split.

    Output per eval split: (split, n_docs, n_contaminated_docs,
    contaminated_docs_e4, n_digests, n_shared_digests, shared_digests_e4)
    — the _e4 rates are exact scaled integers (x·scale // total), so the
    report is hash-stable cross-engine."""
    base = digests.select(
        F.col(split_col).alias("split"),
        F.col(id_col).alias("_id"),
        F.col(digest_col).alias("_d"),
    ).distinct()
    train_d = base.filter(F.col("split") == train_split).select("_d").distinct()
    ev = base.filter(F.col("split") != train_split)
    hits = ev.join(train_d, "_d", "left_semi")
    docs_per = ev.groupBy("split").agg(
        F.countDistinct("_id").alias("n_docs"),
        F.countDistinct("_d").alias("n_digests"),
    )
    hit_per = hits.groupBy("split").agg(
        F.countDistinct("_id").alias("n_contaminated_docs"),
        F.countDistinct("_d").alias("n_shared_digests"),
    )
    return (
        docs_per.join(hit_per, "split", "left")
        .na.fill({"n_contaminated_docs": 0, "n_shared_digests": 0})
        .select(
            "split",
            "n_docs",
            "n_contaminated_docs",
            F.expr(f"n_contaminated_docs * {scale} div n_docs").alias(
                "contaminated_docs_e4"
            ),
            "n_digests",
            "n_shared_digests",
            F.expr(f"n_shared_digests * {scale} div n_digests").alias(
                "shared_digests_e4"
            ),
        )
    )


def bloom_fpr_sweep(
    members: DataFrame,
    probes: DataFrame,
    configs: Sequence[tuple[int, int]] = ((1 << 14, 3), (1 << 16, 5), (1 << 18, 7)),
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Bloom-filter geometry advisor (the decontam twin of lsh_band_sweep
    / ivf_nprobe_sweep): for each (m_bits, k_hashes) config, the MEASURED
    false-positive rate of a filter built from ``members`` probed with the
    non-member rows of ``probes``, next to the analytic
    (1 − (1−1/m)^{kn})^k — pick the geometry from data, not folklore.

    Determinism: positions come from Kirsch–Mitzenmacher double hashing
    pos_i = (h1 + i·(2·h2+1)) mod m over two 48-bit md5 halves of the
    normalized-text fingerprint — pure integer arithmetic, identical in
    any engine (the production bloom_bitmap path uses xxhash64; this
    sweep uses the oracle-parity hash family, same geometry math).

    Scale shape: the member position SET is ≤ min(n·k, m) rows per config
    (m-bounded — a 2^20-bit config caps at ~4 MB of distinct positions
    regardless of corpus size) and broadcasts to the probe side; member
    and probe corpora are each scanned once, k·|configs| positions
    emitted map-side. Every config emits a row even at zero false
    positives (group-report discipline).

    Output per config: (m_bits, k_hashes, n_members, n_probes,
    n_false_pos, fpr_measured, fpr_analytic)."""
    spark = members.sparkSession
    cfg = spark.createDataFrame(
        [(int(m), int(k)) for m, k in configs], "m_bits long, k_hashes int"
    )
    max_k = max(k for _, k in configs)

    def fps(df):
        return df.select(fingerprint(F.col(text_col)).alias("_fp")).distinct()

    mem = fps(members)
    # true negatives only: probes whose fingerprint is NOT a member
    prb = fps(probes).join(mem, "_fp", "left_anti")

    def positions(side):
        h1 = F.conv(F.substring(F.col("_fp"), 1, 12), 16, 10).cast("long")
        h2 = F.conv(F.substring(F.col("_fp"), 13, 12), 16, 10).cast("long")
        return (
            side.crossJoin(F.broadcast(cfg))
            .crossJoin(
                F.broadcast(
                    spark.range(max_k).select(F.col("id").cast("int").alias("_i"))
                )
            )
            .filter(F.col("_i") < F.col("k_hashes"))
            .select(
                "m_bits",
                "k_hashes",
                "_fp",
                F.pmod(h1 + F.col("_i") * (2 * h2 + 1), F.col("m_bits")).alias(
                    "_pos"
                ),
            )
        )

    member_set = positions(mem).select("m_bits", "k_hashes", "_pos").distinct()
    probe_pos = positions(prb)
    hitcnt = (
        probe_pos.join(
            member_set.withColumn("_set", F.lit(1)),
            ["m_bits", "k_hashes", "_pos"],
            "left",
        )
        .groupBy("m_bits", "k_hashes", "_fp")
        .agg(
            F.count(F.lit(1)).alias("_k"),
            F.sum(F.coalesce(F.col("_set"), F.lit(0))).alias("_hits"),
        )
    )
    fp_counts = hitcnt.groupBy("m_bits", "k_hashes").agg(
        F.sum((F.col("_hits") == F.col("_k")).cast("long"))
        .cast("long")
        .alias("n_false_pos")
    )
    nm = mem.agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    np_ = prb.agg(F.count(F.lit(1)).cast("long").alias("n_probes"))
    out = (
        cfg.join(fp_counts, ["m_bits", "k_hashes"], "left")
        .na.fill({"n_false_pos": 0})
        .crossJoin(F.broadcast(nm))
        .crossJoin(F.broadcast(np_))
    )
    analytic = (
        1.0
        - F.pow(
            1.0 - 1.0 / F.col("m_bits").cast("double"),
            F.col("k_hashes").cast("double") * F.col("n_members"),
        )
    ) ** F.col("k_hashes").cast("double")
    measured = F.when(F.col("n_probes") > 0,
                      F.col("n_false_pos").cast("double") / F.col("n_probes")
                      ).otherwise(F.lit(0.0))
    return out.select(
        "m_bits",
        "k_hashes",
        "n_members",
        "n_probes",
        "n_false_pos",
        (F.round(measured, ndigits) + F.lit(0.0)).alias("fpr_measured"),
        # pow-chain: round at 4 (the exp∘ln cross-engine discipline)
        (F.round(analytic, 4) + F.lit(0.0)).alias("fpr_analytic"),
    )
