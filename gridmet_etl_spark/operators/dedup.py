"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (the whole point at 100 TB):
- Exact dedup: hash-groupBy on a 32-byte digest — one shuffle of (digest,
  doc_id), never the document bodies.
- MinHash+LSH: shingle → per-seed min-hash signature → band keys →
  candidate pairs ONLY within equal band buckets (the classic
  shingle→minhash→band→bucket-join pipeline). Cost is |docs|·|shingles|
  map-side plus a shuffle keyed by band signature; no all-pairs stage.
- n-gram Jaccard: exact pairwise verification, meant to run on LSH
  candidates or bounded subsets, not the full corpus.

Determinism/parity: hashing is md5-on-strings and MIN over hex strings —
bit-identical in Spark and DuckDB, so even the LSH stages are
oracle-checkable (a rare property for dedup pipelines; xxhash64 variants
would be faster but engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import fingerprint

N_MINHASH_SEEDS = 16
ROWS_PER_BAND = 4  # 16 seeds / 4 rows → 4 bands; LSH threshold ≈ (1/4)^(1/4) ≈ 0.71


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest-id document per normalized-text digest.
    Output: (doc_id, fingerprint, n_dupes) for kept docs only.

    Window-over-digest rather than groupBy+join: one shuffle, and the
    digest (32 bytes) is the only wide thing shuffled alongside ids.
    """
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col))
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_dupes", F.count("*").over(Window.partitionBy("fingerprint")))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), "fingerprint", "n_dupes")
    )


def shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """K-character shingles per document (rolling window over the
    normalized text), distinct by default. Row-local explode — no shuffle
    until the consumer aggregates (none at all with ``distinct=False``,
    which duplicate-insensitive consumers like MinHash use). Output:
    (doc_id, sh). Single source of the normalization + k-gram derivation —
    Jaccard, MinHash, and the SQL oracles must all agree on it."""
    normalized = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    sh = (
        docs.select(F.col(id_col), normalized.alias("t"))
        .select(
            F.col(id_col),
            F.explode(F.expr(f"sequence(1, greatest(length(t) - {k - 1}, 1))")).alias("pos"),
            F.col("t"),
        )
        .select(F.col(id_col), F.substring(F.col("t"), F.col("pos"), k).alias("sh"))
    )
    return sh.distinct() if distinct else sh


def _seed_hash(seed: int, hash_fn: str):
    """Per-seed element hasher: shingle string → portable hash value.

    xxhash64 stays LONG: min over a fixed-width type keeps the signature
    aggregation in HashAggregate (mutable buffer, map-side partials inside
    codegen). The old ``.cast("string")`` silently forced SortAggregate —
    min(string) has no mutable buffer — which SORTED the full exploded
    shingle relation per partition; at the ×10 corpus (1M docs) that sort
    spilled >80 GB of local disk and killed the run (r9 sf1 bench). The
    md5 path keeps hex STRINGS for DuckDB oracle bit-parity (its sort-agg
    cost is confined to the 300-doc oracle scope)."""
    if hash_fn == "xxhash64":
        return lambda s: F.xxhash64(F.lit(seed), s)
    if hash_fn == "md5":
        return lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s))
    raise ValueError(f"unknown hash_fn {hash_fn!r}; use 'md5' or 'xxhash64'")


def _minhash_wide(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    n_seeds: int,
    hash_fn: str,
) -> DataFrame:
    """Wide per-doc signature (doc_id, "0".."n_seeds-1"): explode k-gram
    positions map-locally, hash each shingle under the n_seeds seeds as
    COLUMNS of one whole-stage-codegen'd projection, min-aggregate per doc.

    Scale shape: the explode amplification (~|text| rows/doc) is pipelined
    inside one stage and never materialized; partial aggregation collapses
    it map-side, so the ONE shuffle carries only per-partition minima
    (n_seeds strings per doc per partition). No distinct is needed — MIN is
    duplicate-insensitive — which removes the full shingle-row shuffle a
    naive shingle-set pipeline pays. (A fully row-local array_min(transform)
    variant benches ~2× slower: higher-order lambdas are interpreted, while
    explode + projection + hash-agg all stay in codegen.)"""
    sh = shingles(docs, text_col, id_col, k, distinct=False)
    hashed = sh.select(
        F.col(id_col),
        *[_seed_hash(s, hash_fn)(F.col("sh")).alias(f"_h{s}") for s in range(n_seeds)],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"_h{s}").alias(f"{s}") for s in range(n_seeds)]
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_seeds: int = N_MINHASH_SEEDS,
    hash_fn: str = "md5",
) -> DataFrame:
    """Long-form per-seed min-hash: (doc_id, seed, mh) with
    signature[seed] = MIN(hash(seed, shingle)) over the doc's k-gram set.

    hash_fn="md5": MIN over hex strings — portable across engines (DuckDB
    oracle bit-parity). hash_fn="xxhash64": JVM-native 64-bit hashing, ~5×
    faster per hash — the production path (same structure, engine-specific
    values). Fully row-local (see _minhash_wide) + a row-local unpivot."""
    wide = _minhash_wide(docs, text_col, id_col, k, n_seeds, hash_fn)
    long = wide.unpivot(
        ids=[id_col],
        values=[f"{s}" for s in range(n_seeds)],
        variableColumnName="seed",
        valueColumnName="mh",
    )
    return long.select(F.col(id_col), F.col("seed").cast("int").alias("seed"), "mh")


def minhash_bands(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_seeds: int = N_MINHASH_SEEDS,
    rows_per_band: int = ROWS_PER_BAND,
    hash_fn: str = "md5",
) -> DataFrame:
    """Band signatures (doc_id, band, band_key): seeds grouped into bands,
    key = md5 of the seed-ordered minhash concat — computed straight from
    the wide row-local signature (no long-form groupBy/collect_list)."""
    wide = _minhash_wide(docs, text_col, id_col, k, n_seeds, hash_fn)
    return _bands_from_wide(wide, id_col, n_seeds, rows_per_band)


def _bands_from_wide(
    wide: DataFrame, id_col: str, n_seeds: int, rows_per_band: int
) -> DataFrame:
    """Band keys from an ALREADY-computed wide signature — lets callers
    that band the same signature matrix several ways (lsh_band_sweep)
    compute the shingle/minhash pipeline ONCE."""
    # ceil-div: a non-divisible n_seeds forms a PARTIAL final band from the
    # trailing seeds rather than silently dropping them (recall, and parity
    # with the long-form (seed // rows_per_band) banding)
    n_bands = -(-n_seeds // rows_per_band)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bk).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            # explicit cast: long xxhash64 minima stringify
                            # to the same text the old string-typed hashes
                            # carried, so band keys are representation-
                            # independent
                            F.col(f"{s}").cast("string")
                            for s in range(
                                bk * rows_per_band, min((bk + 1) * rows_per_band, n_seeds)
                            )
                        ],
                    )
                ).alias("band_key"),
            )
            for bk in range(n_bands)
        ]
    )
    return wide.select(F.col(id_col), F.explode(band_structs).alias("b")).select(
        F.col(id_col), F.col("b.band").alias("band"), F.col("b.band_key").alias("band_key")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_seeds: int = N_MINHASH_SEEDS,
    rows_per_band: int = ROWS_PER_BAND,
    hash_fn: str = "md5",
) -> DataFrame:
    """Full MinHash-LSH pipeline → candidate near-dup pairs (a < b) that
    collide in ≥1 band. The pair join is keyed by band_key — only documents
    in the same bucket ever meet, so cost tracks bucket sizes, not |docs|².

    The map side is one narrow projection per doc (shingle array → 16
    array_min hashes → 4 band keys); the ONLY shuffles are the band-key
    self-join and the final pair distinct."""
    bands = minhash_bands(docs, text_col, id_col, k, n_seeds, rows_per_band, hash_fn)
    a = bands.select(F.col(id_col).alias("doc_a"), "band", "band_key")
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_star(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_seeds: int = N_MINHASH_SEEDS,
    rows_per_band: int = ROWS_PER_BAND,
    hash_fn: str = "md5",
) -> DataFrame:
    """Star-expanded LSH candidates: each document pairs ONLY with its
    bucket's min-id representative — (doc_a=bucket_min, doc_b=member).

    This is the corpus-scale form of ``minhash_lsh_candidates``: the
    all-pairs bucket join is QUADRATIC in bucket size, and real corpora
    have hub buckets (boilerplate/templates — the sf0.1 synthetic corpus
    itself has a 1673-doc bucket, which at a ×20 replication already means
    ~10⁹ pre-distinct pairs and a ~10-minute local run). The star edges
    are LINEAR in bucket size and span the same connected components
    (every bucket is a clique in the candidate graph; a star is a spanning
    tree of a clique), so dedup clustering over them yields identical
    components — verify-then-cluster pipelines score member↔representative
    instead of all pairs, the standard large-corpus discipline.

    Shuffles: ONE band-keyed exchange. The bucket representative and size
    come from a whole-partition window over that single exchange instead
    of a reps-aggregate joined back — the join form evaluated the ENTIRE
    shingle→signature→band pipeline twice (the agg subtree and the join
    probe side canonicalize differently, so ReuseExchange never fires),
    which doubled the dominant cost at the 1M-doc scale (r9 sf1 bench).
    Output: (doc_a, doc_b), doc_a < doc_b, distinct."""
    from pyspark.sql import Window

    bands = minhash_bands(docs, text_col, id_col, k, n_seeds, rows_per_band, hash_fn)
    w = Window.partitionBy("band", "band_key")
    return (
        bands.withColumn("doc_a", F.min(id_col).over(w))
        .withColumn("_n", F.count(F.lit(1)).over(w))
        .filter((F.col("_n") > 1) & (F.col(id_col) != F.col("doc_a")))
        .select("doc_a", F.col(id_col).alias("doc_b"))
        .distinct()
    )


def split_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
) -> DataFrame:
    """(id, line_no, line) from delimiter-split text — row-local posexplode,
    no shuffle. The line relation both ``line_dedup`` and line-frequency
    boilerplate analysis consume."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delim)).alias("line_no", "line"),
    )


def line_dedup(
    lines: DataFrame,
    id_col: str = "doc_id",
    join_delim: str = "\n",
) -> DataFrame:
    """Corpus-wide duplicate-LINE removal, C4/RefinedWeb-style: any line
    whose exact text occurs elsewhere in the corpus survives only at its
    FIRST occurrence (ordered by (id, line_no)); every document is then
    reassembled from its surviving lines. The classic boilerplate killer —
    nav bars, cookie banners, and license headers repeat corpus-wide and
    per-document dedup never sees them.

    Input: (id, line_no, line) — from ``split_lines`` or any segmenter.
    Output: (id, n_lines, n_kept, text) with text = surviving lines joined
    by ``join_delim`` in original order ('' when nothing survives).

    Scale shape: the keep/drop decision shuffles ONLY (digest, id,
    line_no) — 32-byte digests, never line bodies; the verdict joins back
    to the line relation on (id, line_no); reassembly is one id-keyed
    partial agg over surviving lines (output-sized — the corpus's total
    surviving text, which is the result itself). No global sort: the
    first-occurrence rule is a per-digest window over duplicate runs only.
    """
    keyed = lines.select(
        F.col(id_col), "line_no", F.md5(F.col("line")).alias("_d")
    )
    w = Window.partitionBy("_d").orderBy(F.col(id_col), F.col("line_no"))
    verdicts = keyed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    kept = lines.join(verdicts.select(id_col, "line_no"), [id_col, "line_no"])
    per_doc = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("line_no"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
            join_delim,
        ).alias("text"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return totals.join(per_doc, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("text", F.lit("")).alias("text"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.6,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact k-gram Jaccard similarity for document pairs (a < b) above
    ``threshold``. When ``candidates`` (doc_a, doc_b) is given — e.g. LSH
    output — only those pairs are scored; otherwise all shingle-sharing
    pairs (bounded corpora only).

    Output: (doc_a, doc_b, jaccard)."""
    sh = shingles(docs, text_col, id_col, k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "sh")
    b = sh.select(F.col(id_col).alias("doc_b"), "sh")
    if candidates is not None:
        # prune BEFORE the self-join and groupBy, or the candidate set
        # never reduces the dominant all-pairs cost: restrict each side to
        # docs that appear in any candidate pair, and the pair stream to
        # the candidate pairs themselves pre-aggregation
        a = a.join(
            candidates.select(F.col("doc_a")).distinct(), "doc_a", "left_semi"
        )
        b = b.join(
            candidates.select(F.col("doc_b")).distinct(), "doc_b", "left_semi"
        )
    pairs = a.join(b, "sh").filter(F.col("doc_a") < F.col("doc_b"))
    if candidates is not None:
        pairs = pairs.join(candidates, ["doc_a", "doc_b"], "left_semi")
    inter = pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter"))
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


N_SIMHASH_BITS = 16


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_bits: int = N_SIMHASH_BITS
) -> DataFrame:
    """SimHash over the token set: bit_k = sign of Σ_tokens (±1), where the
    ±1 for (k, token) is the high bit of md5(k || ':' || token) (first hex
    char ≥ '8'). Output: (doc_id, simhash) with simhash = Σ bit_k·2^k.

    Portable md5 bit derivation keeps it oracle-checkable; production would
    swap in xxhash64 for ~5× hash throughput with identical structure."""
    toks = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    bits = toks.select(
        F.col(id_col),
        F.explode(F.expr(f"sequence(0, {n_bits - 1})")).alias("bit"),
        F.col("tok"),
    ).select(
        F.col(id_col),
        "bit",
        F.when(
            F.substring(F.md5(F.concat(F.col("bit").cast("string"), F.lit(":"), F.col("tok"))), 1, 1)
            >= "8",
            1,
        )
        .otherwise(-1)
        .alias("pm"),
    )
    return (
        bits.groupBy(id_col, "bit")
        .agg(F.sum("pm").alias("s"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("bit")).cast("long")).otherwise(0)
            ).alias("simhash")
        )
    )


def simhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_bits: int = N_SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming, via
    bucket-join on signature blocks instead of all-pairs: the signature is
    split into max_hamming+1 blocks, and by pigeonhole any pair within
    distance max_hamming shares at least one identical block — so the join
    on (block_id, block_value) is exact, not approximate.
    Output: (doc_a, doc_b, hamming)."""
    sh = simhash(docs, text_col, id_col, n_bits)
    n_blocks = max_hamming + 1
    width = max(n_bits // n_blocks, 1)
    # (doc, block_id, block_val): row-local explode, then equi-join on blocks
    block_vals = F.array(
        *[
            F.struct(
                F.lit(bk).alias("blk"),
                F.shiftright(F.col("simhash"), bk * width)
                .bitwiseAND(F.lit((1 << width) - 1) if bk < n_blocks - 1 else F.lit((1 << n_bits) - 1))
                .alias("val"),
            )
            for bk in range(n_blocks)
        ]
    )
    keyed = sh.select(F.col(id_col), F.col("simhash"), F.explode(block_vals).alias("b")).select(
        F.col(id_col), "simhash", F.col("b.blk").alias("blk"), F.col("b.val").alias("val")
    )
    a = keyed.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "blk", "val")
    b = keyed.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "blk", "val")
    cand = (
        a.join(b, ["blk", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


SPAN_TOKENS = 20


def span_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = SPAN_TOKENS,
) -> DataFrame:
    """Span-level exact dedup (the Lee et al. "Deduplicating Training Data
    Makes Language Models Better" granularity): segment each document into
    fixed-size token windows, keep only the FIRST occurrence of each
    distinct span corpus-wide (ordered by (doc_id, chunk_idx)), and
    reassemble each document from its surviving spans.

    Output: (doc_id, n_chunks, n_kept, n_dup_chunks, dedup_digest) where
    dedup_digest = md5 of the reassembled text ('' when every span was a
    dup of an earlier doc).

    Scale shape — the part that matters at 100 TB: span TEXT never
    shuffles. The digest relation (doc_id, chunk_idx, md5) is computed
    row-locally and is the only thing the first-occurrence window
    shuffles; the keep-set flows back as a per-doc int array joined on
    doc_id (ids + ints), and the surviving text is RECOMPUTED row-locally
    from the original document on the joined row. Corpus bytes move at
    most once (the doc-keyed join), vs twice for the naive
    explode→dedup→regroup plan.
    """
    normalized = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    toks = F.split(F.col("_t"), " ")
    last_idx = F.floor((F.size(toks) - F.lit(1)) / F.lit(span_tokens)).cast("int")

    def chunk_at(i):
        return F.concat_ws(" ", F.slice(toks, i * span_tokens + 1, span_tokens))

    base = docs.select(F.col(id_col), normalized.alias("_t"))
    # explode chunk indices THEN md5 as a plain projection: the digest stays
    # inside whole-stage codegen (an md5 inside transform() is interpreted
    # per element — benched ~20% slower at 100k docs; same lesson as the
    # minhash explode-vs-HOF note in _minhash_wide).
    meta = base.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), last_idx)).alias("chunk_idx"),
        F.col("_t"),
    ).select(
        F.col(id_col),
        "chunk_idx",
        F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    F.split(F.col("_t"), " "),
                    F.col("chunk_idx") * span_tokens + 1,
                    span_tokens,
                ),
            )
        ).alias("h"),
    )
    w = Window.partitionBy("h").orderBy(F.col(id_col), F.col("chunk_idx"))
    keep = (
        meta.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list("chunk_idx")).alias("keep_idx"),
            F.count("*").alias("n_kept"),
        )
    )
    rejoined = base.join(keep, id_col, "left")
    keep_idx = F.coalesce(F.col("keep_idx"), F.array().cast("array<int>"))
    dedup_text = F.concat_ws(" ", F.transform(keep_idx, chunk_at))
    n_chunks = (last_idx + F.lit(1)).cast("long")
    n_kept = F.coalesce(F.col("n_kept"), F.lit(0).cast("long"))
    return rejoined.select(
        F.col(id_col),
        n_chunks.alias("n_chunks"),
        n_kept.alias("n_kept"),
        (n_chunks - n_kept).alias("n_dup_chunks"),
        F.md5(dedup_text).alias("dedup_digest"),
    )


def max_dup_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 8,
) -> DataFrame:
    """Maximal duplicated-substring spans — the suffix-array-style
    ExactSubstr granularity (Lee et al.): every token position opens a
    ``min_tokens``-gram; grams occurring ≥2 times corpus-wide (including
    within one document) mark their positions, and overlapping/adjacent
    marked windows merge into MAXIMAL per-document intervals. Unlike
    ``span_dedup``'s fixed-aligned chunks, this catches duplicated text at
    ANY offset and reports its full extent.

    Output: (doc_id, span_start, span_end, span_len) in token positions,
    one row per maximal duplicated span.

    Scale shape: the gram relation is (digest, doc_id, pos) — token-count-
    sized but NARROW (text never shuffles; the gram digest is md5'd
    row-locally inside codegen, the span_dedup lesson). Three exchanges:
    the dup-key aggregate (partial-agg'd, digest-keyed), the semi join
    back (digest-keyed), and the per-doc island window (doc-keyed). A
    duplicated span of length L marks L - min_tokens + 1 positions — the
    island merge reduces them to ONE output row, so the result is
    span-count-sized.
    """
    normalized = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    base = docs.select(F.col(id_col), normalized.alias("_t"))
    toks = F.split(F.col("_t"), " ")
    n = F.size(toks)
    # sequence() never errors on a negative stop (it emits a descending
    # ramp), but only the guarded empty branch is ever selected for short
    # docs — positions 0 .. n - min_tokens
    starts = F.when(
        n >= min_tokens, F.sequence(F.lit(0), n - F.lit(min_tokens))
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        F.col(id_col),
        F.explode(starts).alias("pos"),
        F.col("_t"),
    ).select(
        F.col(id_col),
        "pos",
        F.md5(
            F.concat_ws(
                " ",
                F.slice(F.split(F.col("_t"), " "), F.col("pos") + 1, min_tokens),
            )
        ).alias("h"),
    )
    # duplicated-gram marking via ONE digest-keyed window count — the
    # aggregate + semi-join formulation evaluates the gram subtree twice
    # (two full explode+md5 scans) and shuffles twice; the window does it
    # in one shuffle of the narrow (digest, doc, pos) relation (measured
    # 14.4 s → 5.4 s on the 20k-doc bench entry)
    wh = Window.partitionBy("h")
    marked = (
        grams.withColumn("c", F.count("*").over(wh))
        .where(F.col("c") >= 2)
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = (
        marked.withColumn(
            "brk",
            F.when(F.col("pos") - F.lag("pos").over(w) > min_tokens, 1).otherwise(0),
        )
        .withColumn("island", F.sum("brk").over(cum))
        .groupBy(id_col, "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + min_tokens - 1).cast("long").alias("span_end"),
        )
    )
    return spans.select(
        id_col,
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.9,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric near-containment: pairs (a < b) whose shingle-set overlap
    covers ≥ ``threshold`` of the SMALLER document — catches quotes,
    excerpts, and boilerplate wrappers that Jaccard misses (a short doc
    fully embedded in a long one has tiny Jaccard but containment 1.0).

    containment = |A∩B| / min(|A|, |B|). Same shuffle shape as
    ``ngram_jaccard_pairs``: shingle-keyed equi-join for the intersection
    (pre-pruned by ``candidates`` when LSH supplies them), then two
    broadcast-joined size lookups. Output: (doc_a, doc_b, containment).
    """
    sh = shingles(docs, text_col, id_col, k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "sh")
    b = sh.select(F.col(id_col).alias("doc_b"), "sh")
    if candidates is not None:
        a = a.join(candidates.select("doc_a").distinct(), "doc_a", "left_semi")
        b = b.join(candidates.select("doc_b").distinct(), "doc_b", "left_semi")
    pairs = a.join(b, "sh").filter(F.col("doc_a") < F.col("doc_b"))
    if candidates is not None:
        pairs = pairs.join(candidates, ["doc_a", "doc_b"], "left_semi")
    inter = pairs.groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter"))
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("containment", F.col("n_inter") / F.least("n_a", "n_b"))
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def minhash_jaccard_estimate(
    docs: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_seeds: int = N_MINHASH_SEEDS,
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash Jaccard ESTIMATE for candidate pairs: the fraction of the
    ``n_seeds`` signature components on which the two documents agree —
    E[estimate] = J(A,B), the MinHash sketch property. This is the cheap
    scoring pass between LSH candidate generation and (optional) exact
    verification: cost is |candidates| × n_seeds signature-row joins,
    never a shingle-set intersection.

    Both signature joins are seed+doc keyed; the signature relation is
    |docs| × n_seeds rows (sketch-sized, corpus-independent per doc).
    With ``hash_fn="md5"`` the estimate is bit-reproducible in any engine
    with md5 (the DuckDB oracle recomputes identical signatures);
    ``xxhash64`` is the faster engine-native twin.

    Output: (doc_a, doc_b, est) with est ∈ {0, 1/n_seeds, ..., 1}.
    """
    sigs = minhash_signatures(docs, text_col, id_col, k, n_seeds, hash_fn)
    sa = sigs.select(
        F.col(id_col).alias("doc_a"), "seed", F.col("mh").alias("mh_a")
    )
    sb = sigs.select(
        F.col(id_col).alias("doc_b"), "seed", F.col("mh").alias("mh_b")
    )
    return (
        candidates.select("doc_a", "doc_b")
        .join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.avg(
                F.when(F.col("mh_a") == F.col("mh_b"), 1.0).otherwise(0.0)
            ).alias("est")
        )
    )


def source_overlap_from_digests(
    units: DataFrame,
    source_col: str = "source",
    digest_col: str = "d",
    ndigits: int = 6,
) -> DataFrame:
    """Cross-source contamination matrix over an arbitrary content-unit
    digest relation ``(source, digest)``: for every source pair (a < b),
    how many distinct digests appear in BOTH — the 'is source B just a
    re-crawl of source A' / 'which sources share boilerplate' check that
    decides which corpus to drop, where ``dedup_report`` only says each
    source has dups internally. The unit is the caller's choice: whole-doc
    fingerprints (``source_overlap``), dedup lines, shingles, media
    digests.

    Shape: one (digest, source)-distinct pass, then a digest-keyed
    self-join whose per-digest fan-out is bounded by |sources|² (sources
    are a handful even at 100 TB; the digest relation, not the corpus, is
    all that shuffles). Output: (source_a, source_b, n_shared, n_a, n_b,
    jaccard) with Jaccard over the two distinct-digest sets; pairs with
    zero shared digests are omitted (at many-source scale the matrix is
    sparse by design)."""
    ds = units.select(
        F.col(source_col).alias("source"), F.col(digest_col).alias("d")
    ).distinct()
    per = ds.groupBy("source").agg(F.count(F.lit(1)).alias("n_digests"))
    left = ds.select(F.col("source").alias("source_a"), "d")
    right = ds.select(F.col("source").alias("source_b"), "d")
    shared = (
        left.join(right, "d")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    pa = per.select(F.col("source").alias("source_a"), F.col("n_digests").alias("n_a"))
    pb = per.select(F.col("source").alias("source_b"), F.col("n_digests").alias("n_b"))
    return (
        shared.join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.round(
                    F.col("n_shared")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double"),
                    ndigits,
                )
                + F.lit(0.0)
            ).alias("jaccard"),
        )
    )


def source_overlap(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    ndigits: int = 6,
) -> DataFrame:
    """Whole-document flavor of ``source_overlap_from_digests``: units are
    the exact-dedup content fingerprints (md5 of normalized text)."""
    from .textops import fingerprint as _fp

    units = docs.select(
        F.col(source_col).alias("source"), _fp(F.col(text_col)).alias("d")
    )
    return source_overlap_from_digests(units, ndigits=ndigits)


def capture_recapture(
    units: DataFrame,
    source_col: str = "source",
    digest_col: str = "d",
    ndigits: int = 6,
) -> DataFrame:
    """Chapman capture–recapture estimate of the UNSEEN population behind
    two overlapping crawls: treating each source as a 'capture' of the
    same underlying corpus, N̂ = (n_a+1)(n_b+1)/(m+1) − 1 with m = shared
    distinct digests — the 'how much corpus exists that NEITHER crawl
    found' answer that overlap counts alone don't give (standard ecology
    estimator; applies to web crawls under the same independence caveat).
    Pairs with m = 0 are reported with a NULL estimate (disjoint captures
    say nothing about the total).

    Rides source_overlap_from_digests' shape: digest-relation shuffles
    only. Output: (source_a, source_b, n_a, n_b, n_shared, n_union,
    est_population, est_unseen)."""
    ds = units.select(
        F.col(source_col).alias("source"), F.col(digest_col).alias("d")
    ).distinct()
    per = ds.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    left = ds.select(F.col("source").alias("source_a"), "d")
    right = ds.select(F.col("source").alias("source_b"), "d")
    shared = (
        left.join(right, "d")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    pa = per.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    pb = per.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    pairs = (
        pa.crossJoin(pb)
        .where(F.col("source_a") < F.col("source_b"))
        .join(shared, ["source_a", "source_b"], "left")
        .na.fill({"n_shared": 0})
    )
    chapman = (
        (F.col("n_a") + 1) * (F.col("n_b") + 1) / (F.col("n_shared") + 1) - 1
    )
    est = F.when(F.col("n_shared") > 0, F.round(chapman, ndigits) + F.lit(0.0))
    union = F.col("n_a") + F.col("n_b") - F.col("n_shared")
    return pairs.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        "n_shared",
        union.alias("n_union"),
        est.alias("est_population"),
        F.when(F.col("n_shared") > 0, F.round(chapman - union, ndigits) + F.lit(0.0)).alias(
            "est_unseen"
        ),
    )


def lsh_band_sweep(
    docs: DataFrame,
    configs: tuple[int, ...] = (1, 2, 4, 8, 16),
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_seeds: int = N_MINHASH_SEEDS,
    scale: int = 10_000,
) -> DataFrame:
    """LSH configuration advisor: measured precision/recall of the
    candidate set for EVERY (bands, rows-per-band) split of the SAME
    n_seeds-hash signature matrix, against the exact ≥ ``threshold``
    Jaccard truth set — the empirical S-curve sweep you run once on a
    bounded sample before committing a banding to a 100 TB dedup pass
    (theory says the collision threshold is (1/b)^(1/r); this measures
    what those knobs actually do on YOUR shingle distribution).

    Scale shape: the truth set is the quadratic piece, so callers pass a
    bounded sample (the shared-shingle join prunes it further); each
    config reuses the same row-local wide signature and costs one
    band-key self-join. All counts/rates are exact integers
    (`x·scale div total`) — hash-stable cross-engine.

    Output per config: (rows_per_band, n_bands, thr_theory_e4, n_true,
    n_cand, n_hit, precision_e4, recall_e4)."""
    truth = ngram_jaccard_pairs(docs, threshold=threshold, k=k).select(
        "doc_a", "doc_b"
    )
    # ONE signature matrix for the whole sweep (the point of the advisor:
    # every (bands, rows) split reuses the same n_seeds hashes). Without
    # the pin, each config's union branch re-derives the shingle/minhash
    # pipeline — 5× the corpus scans (audit: 75 exchanges → ~20).
    wide = _minhash_wide(docs, text_col, id_col, k, n_seeds, "md5")
    wide = wide.localCheckpoint(eager=False)
    per = None
    for r in configs:
        bands = _bands_from_wide(wide, id_col, n_seeds, rows_per_band=r)
        a = bands.select(F.col(id_col).alias("doc_a"), "band", "band_key")
        b = bands.select(F.col(id_col).alias("doc_b"), "band", "band_key")
        cands = (
            a.join(b, ["band", "band_key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
            .select(F.lit(int(r)).alias("rows_per_band"), "doc_a", "doc_b")
        )
        per = cands if per is None else per.unionByName(cands)
    hits = per.join(truth, ["doc_a", "doc_b"], "left_semi")
    n_true_rel = truth.agg(F.count(F.lit(1)).alias("n_true"))
    cand_stats = per.groupBy("rows_per_band").agg(
        F.count(F.lit(1)).alias("n_cand")
    )
    hit_stats = hits.groupBy("rows_per_band").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    # theory threshold per config, computed HERE and injected as literals
    # so both engines carry the identical double. The configs relation is
    # the LITERAL driver of the output shape: a config whose banding
    # yields ZERO candidate pairs (e.g. rows_per_band=16 needs identical
    # 16-hash signatures) must still report its row with n_cand=0 — the
    # oracle's UNION ALL of scalar subqueries always emits every config
    # (ADVICE r6), and the advisor is useless without the "this banding
    # finds nothing" data point.
    n_bands = {r: -(-n_seeds // r) for r in configs}
    thr = {
        r: int(round((1.0 / n_bands[r]) ** (1.0 / r) * scale)) for r in configs
    }
    base = docs.sparkSession.createDataFrame(
        [(int(r), int(n_bands[r]), int(thr[r])) for r in configs],
        "rows_per_band int, n_bands int, thr_theory_e4 long",
    )
    return (
        base.join(cand_stats, "rows_per_band", "left")
        .join(hit_stats, "rows_per_band", "left")
        .na.fill({"n_cand": 0, "n_hit": 0})
        .crossJoin(F.broadcast(n_true_rel))
        .select(
            F.col("rows_per_band").cast("int").alias("rows_per_band"),
            F.col("n_bands"),
            F.col("thr_theory_e4"),
            F.col("n_true").cast("long").alias("n_true"),
            F.col("n_cand").cast("long").alias("n_cand"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.when(
                F.col("n_cand") > 0,
                F.expr(f"n_hit * {scale} div n_cand"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("precision_e4"),
            F.when(
                F.col("n_true") > 0,
                F.expr(f"n_hit * {scale} div n_true"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("recall_e4"),
        )
    )


def novelty_curve(
    docs: DataFrame,
    n_buckets: int = 10,
    line_w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 10_000,
) -> DataFrame:
    """Marginal-novelty curve of a growing corpus: split the corpus into
    ``n_buckets`` id-ordered increments and report, per increment, how
    much of its content (distinct ``line_w``-token line digests) was
    NEVER seen in any earlier increment — the measured answer to "is the
    next crawl batch still adding new data, or re-crawling the old web".
    Novelty decaying toward the duplication floor is the budget signal
    dedup pipelines act on.

    Semantics: a digest is NEW in the first bucket (min over buckets)
    where it appears; new_e4 = new distinct digests / distinct digests in
    the bucket, exact scaled integer.

    Scale shape: one digest-relation distinct + a digest-keyed min agg
    (32 B rows — bodies never shuffle) + an output-sized per-bucket
    rollup; the cumulative window runs over the n_buckets-row result.

    Output: (bucket, n_docs, n_digests, n_new_digests, new_e4,
    cum_new_digests)."""
    from pyspark.sql import Window

    mx = docs.agg(F.max(F.col(id_col)).alias("_mx"))
    based = docs.crossJoin(F.broadcast(mx)).select(
        F.col(id_col).alias("_id"),
        F.expr(f"CAST({id_col} * {n_buckets} div (_mx + 1) AS INT)").alias(
            "bucket"
        ),
        F.split(F.col(text_col), " ").alias("_a"),
    )
    units = based.select(
        "_id",
        "bucket",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(_a), {line_w}),"
                f" st -> md5(array_join(slice(_a, st, {line_w}), ' ')))"
            )
        ).alias("d"),
    )
    per_bucket_d = units.select("bucket", "d").distinct()
    first_b = per_bucket_d.groupBy("d").agg(F.min("bucket").alias("_fb"))
    stats = per_bucket_d.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_digests")
    )
    news = first_b.groupBy(F.col("_fb").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_new_digests")
    )
    docs_per = based.groupBy("bucket").agg(
        F.countDistinct("_id").alias("n_docs")
    )
    w = Window.orderBy("bucket")  # n_buckets rows — bounded
    return (
        docs_per.join(stats, "bucket")
        .join(news, "bucket", "left")
        .na.fill({"n_new_digests": 0})
        .select(
            "bucket",
            "n_docs",
            "n_digests",
            "n_new_digests",
            F.expr(f"n_new_digests * {scale} div n_digests").alias("new_e4"),
            F.sum("n_new_digests").over(w).cast("long").alias("cum_new_digests"),
        )
    )
