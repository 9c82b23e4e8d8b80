"""Text-analysis operators for large-scale training-data pipelines
(BASELINE.json north star): language-ID, quality scoring, token counting,
document fingerprinting.

All are pure ``pyspark.sql.functions`` column expressions — JVM-side,
whole-stage-codegen'd, no UDFs — so they run at full scan speed over a
100 TB documents table and every one is DuckDB-oracle-expressible.

Determinism/parity notes: tokenization is single-space split (the canonical
normalized form; callers pre-normalize whitespace), hashing is md5 (identical
across engines), and all ratios round at the contract edge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword marker sets for the n-gram/marker-word language heuristic.
# Scoring is a deterministic function of the text: count marker-token hits
# per language, argmax with fixed tie-break order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}
LANG_ORDER = ["en", "es", "de", "fr", "zh"]  # tie-break priority

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(text: Column | str) -> Column:
    """Single-space tokenization of normalized text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (the BPE-ish regex variant is
    ``token_count_bpe``)."""
    return F.size(tokens(text))


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish proxy: count of word/number/punctuation units — splits
    letter-runs, digit-runs, and individual punctuation like a byte-level
    BPE pre-tokenizer would."""
    c = F.col(text) if isinstance(text, str) else text
    # one array element per match of: letter-run | digit-run | punctuation char
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def _token_hits(toks: Column, words: list[str]) -> Column:
    """Count of tokens equal to any of ``words`` (multiplicity-preserving —
    array_intersect would dedup). One shared split + a filter per word set;
    Catalyst's subexpression elimination computes the split once per row."""
    wset = set(words)
    return F.size(F.filter(toks, lambda t: t.isin(*wset))).cast("double")


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-token hit count per language over the whitespace token array
    (exact token equality, so 'the' doesn't fire inside 'weather')."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    return {
        lang: _token_hits(toks, markers).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of marker scores, 'und' when all zero.
    Tie-break = LANG_ORDER position (deterministic)."""
    scores = lang_scores(text)
    best = F.lit("und")
    best_score = F.lit(0.0)
    # forward iteration: a later language must STRICTLY exceed the running
    # max to win, so ties resolve to the earliest lang in LANG_ORDER
    for lang in LANG_ORDER:
        s = scores[lang]
        best = F.when(s > best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, s)
    return best


def punctuation_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, r"[^\.,;:!\?]", "")
    return F.length(stripped) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    hits = _token_hits(tokens(c), STOPWORDS)
    return hits / F.greatest(token_count(c).cast("double"), F.lit(1.0))


def mean_word_length(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_tokens = token_count(c)
    total_chars = F.length(F.replace(c, F.lit(" "), F.lit("")))
    return total_chars / F.greatest(n_tokens, F.lit(1)).cast("double")


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1]: rewards mid-range
    length, word lengths near English mean (~4.7), some stopword mass, low
    punctuation noise. Deterministic arithmetic only."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c).cast("double")
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    wl = mean_word_length(c)
    wordlen_term = F.lit(1.0) - F.least(F.abs(wl - F.lit(4.7)) / F.lit(4.7), F.lit(1.0))
    stop_term = F.least(stopword_ratio(c) * F.lit(5.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punctuation_ratio(c) * F.lit(10.0), F.lit(1.0))
    return (
        F.lit(0.3) * length_term
        + F.lit(0.3) * wordlen_term
        + F.lit(0.2) * stop_term
        + F.lit(0.2) * punct_term
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams from a token array. Row-local transform
    over gram start positions; empty array when the doc has < n tokens
    (guarded — an unguarded sequence(1, 0) would run DESCENDING)."""
    cnt = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), cnt), lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )
    return F.when(cnt >= 1, grams).otherwise(F.array().cast("array<string>"))


def _max_run_count(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — i.e. the
    max multiplicity of any element. Row-local aggregate with a
    (prev, run, best) accumulator; 0 for empty arrays.

    Higher-order lambdas are interpreted rather than codegen'd, but this
    keeps the whole repetition computation shuffle-free — the alternative
    (explode grams → groupBy(doc, gram) → max) shuffles every n-gram of a
    100 TB corpus, which loses by far more than interpretation overhead on
    a per-doc statistic."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, g: Column) -> Column:
        run = (
            F.when(acc["prev"].isNotNull() & (g == acc["prev"]), acc["run"])
            .otherwise(F.lit(0).cast("long"))
            + F.lit(1).cast("long")
        )
        return F.struct(
            g.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, zero, step)["best"]


def top_ngram_frac(text: Column | str, n: int) -> Column:
    """Gopher-style repetition signal: fraction of a doc's word n-grams
    accounted for by the single most frequent n-gram (0.0 when the doc has
    no n-grams). Boilerplate/spam pages score high; clean prose low."""
    c = F.col(text) if isinstance(text, str) else text
    grams = word_ngrams(tokens(c), n)
    total = F.size(grams)
    top = _max_run_count(F.array_sort(grams))
    return F.when(
        total > 0, top.cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))


def dup_ngram_frac(text: Column | str, n: int) -> Column:
    """Gopher-style repetition signal: fraction of word n-gram occurrences
    that are duplicates of an earlier occurrence (1 - distinct/total); 0.0
    when the doc has no n-grams. Row-local array arithmetic."""
    c = F.col(text) if isinstance(text, str) else text
    grams = word_ngrams(tokens(c), n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.when(
        total > 0, (total - distinct).cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))


def repetition_stats_cols(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Pure-column-expression twin of ``repetition_stats`` (top_ngram_frac /
    dup_ngram_frac as reusable predicates). Row-local and shuffle-free, but
    the higher-order lambdas are INTERPRETED — ~20× slower than the Arrow
    kernel at corpus scale — so this form is for composing the fractions
    into other column expressions, not for bulk scoring."""
    c = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(word_ngrams(tokens(c), 2)).cast("long").alias("n_bigrams"),
        top_ngram_frac(c, 1).alias("top_word_frac"),
        top_ngram_frac(c, 2).alias("top_bigram_frac"),
        dup_ngram_frac(c, 5).alias("dup_5gram_frac"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition profile (the Gopher repetition filters:
    top-n-gram fraction over words/bigrams, duplicate-5-gram fraction).
    Arrow ``mapInPandas`` kernel: per-doc Counter arithmetic is exact and
    deterministic (identical values to ``repetition_stats_cols`` and the
    DuckDB oracle), stays row-local — zero shuffle, embarrassingly parallel
    at 100 TB — and avoids the interpreted-lambda tax of the column-
    expression form (~20× at sf0.1). Input is pruned to (doc_id, text)
    before the kernel so only those columns cross the Arrow boundary."""
    import pandas as pd

    schema = (
        "doc_id long, n_bigrams long, top_word_frac double, "
        "top_bigram_frac double, dup_5gram_frac double"
    )
    out_cols = ["doc_id", "n_bigrams", "top_word_frac", "top_bigram_frac", "dup_5gram_frac"]

    def kernel(batches):
        from collections import Counter

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                toks = (text or "").split(" ")
                n1 = len(toks)
                top_word = max(Counter(toks).values()) / n1 if n1 else 0.0
                bigs = list(zip(toks, toks[1:]))
                n2 = len(bigs)
                top_big = max(Counter(bigs).values()) / n2 if n2 else 0.0
                g5 = list(zip(toks, toks[1:], toks[2:], toks[3:], toks[4:]))
                n5 = len(g5)
                dup5 = (n5 - len(set(g5))) / n5 if n5 else 0.0
                rows.append((doc_id, n2, top_word, top_big, dup5))
            yield pd.DataFrame(rows, columns=out_cols)

    return docs.select("doc_id", text_col).mapInPandas(kernel, schema)


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (The rolling-hash shingle fingerprint lives in dedup.shingles.)"""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.md5(normalized)


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
    every k-gram (rolling window over normalized text), slide a window of
    ``window`` consecutive k-gram hashes, keep each window's minimum —
    the distinct selected hashes are the document's fingerprint set.

    Guarantees any shared substring of length ≥ k+window-1 contributes at
    least one common fingerprint — the basis of plagiarism/near-dup
    detection with ~1/window of the shingle volume.

    md5-hex hashing + min-over-strings → portable to the DuckDB oracle.
    Row-local explode + one bounded window per doc; output
    (doc_id, fp) distinct.
    """
    from pyspark.sql import Window as W

    normalized = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    grams = (
        docs.select(F.col(id_col), normalized.alias("t"))
        .select(
            F.col(id_col),
            F.explode(F.expr(f"sequence(1, greatest(length(t) - {k - 1}, 1))")).alias("pos"),
            F.col("t"),
        )
        .select(
            F.col(id_col), "pos", F.md5(F.substring(F.col("t"), F.col("pos"), k)).alias("h")
        )
    )
    w = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    return (
        grams.withColumn("wmin", F.min("h").over(w))
        .select(F.col(id_col), F.col("wmin").alias("fp"))
        .distinct()
    )


URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def clean_text(text: Column | str) -> Column:
    """Normalization pass a training corpus gets before anything else:
    strip control characters, scrub URLs / emails to sentinel tokens, and
    collapse runs of whitespace. Pure codegen regexp chain — scan-speed
    over 100 TB, no shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, CTRL_RE, "")
    c = F.regexp_replace(c, URL_RE, "<URL>")
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def vocab_topk(docs: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: top-k tokens by frequency (ties broken by token
    asc). explode → partial-agg count (map-side combine collapses each
    partition to its distinct tokens — the shuffle carries vocabulary, not
    corpus) → global top-k via TakeOrderedAndProject (per-partition top-k,
    merged on the driver — no global sort). Output: (token, n)."""
    toks = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token")).filter(
        F.col("token") != ""
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("token")).limit(k)


def tfidf_topk(
    docs: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    tf = in-document count; df = number of documents containing the term;
    idf = ln((1+N)/(1+df)) + 1 (sklearn's smooth idf). Rank per doc on
    (round(tfidf,6) desc, term asc) so float-sum ordering can't flip ranks
    across engines.

    Scale: explode → partial-agg (doc, term) counts (shuffle carries the
    per-doc distinct terms, not raw tokens); df is a vocabulary-sized
    aggregate reused via a shuffle join on term — at web scale both sides
    of that join are vocabulary-keyed, orders of magnitude below corpus
    size, and AQE picks broadcast when df fits. The final top-k window
    partitions by doc_id — perfectly parallel, no global sort.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((1 + F.col("n_docs")) / (1 + F.col("df"))) + 1),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection over a documents table: adds
    n_tokens, n_tokens_bpe, lang_pred, quality, punct_ratio, stop_ratio,
    mean_word_len, fingerprint. Single narrow select — no shuffle."""
    c = F.col(text_col)
    return docs.select(
        "*",
        token_count(c).alias("n_tokens"),
        token_count_bpe(c).alias("n_tokens_bpe"),
        lang_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
        punctuation_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stop_ratio"),
        mean_word_length(c).alias("mean_word_len"),
        fingerprint(c).alias("fingerprint"),
    )


DOMAIN_RE = r"https?://([^/\s:?#]+)"


def url_domains(text: Column | str) -> Column:
    """Array of URL hostnames appearing in the text (scheme-stripped,
    lowercased). Pure regexp_extract_all — scan-speed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.transform(
        F.regexp_extract_all(c, F.lit(DOMAIN_RE), 1), lambda d: F.lower(d)
    )


def domain_flags(
    docs: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL/domain hygiene pass (the RefinedWeb-style domain filter): per
    doc, the distinct domains it links to, whether any is blocklisted, and
    the link count. The blocklist rides as an array literal (real lists are
    ~10^5 entries — still a broadcast-sized structure; beyond that, switch
    the membership test to a broadcast semi join on the exploded domain
    column). Row-local projection — no shuffle."""
    c = F.col(text_col)
    doms = F.array_distinct(url_domains(c))
    blocked = F.array(*[F.lit(b.lower()) for b in blocklist])
    return docs.select(
        F.col(id_col),
        doms.alias("domains"),
        F.size(url_domains(c)).alias("n_links"),
        (F.size(F.array_intersect(doms, blocked)) > 0).alias("blocklisted"),
    )


def char_entropy(text: Column | str) -> Column:
    """Shannon entropy (nats) of the character distribution — the cheap
    gibberish/boilerplate signal: natural prose sits near 3 nats, repeated
    padding and base64 blobs fall far outside.

    Single left-to-right ``aggregate`` over the SORTED char array with a
    (prev, run, Σ r·ln r) accumulator; H = ln n − (Σ r·ln r)/n. The lambda
    closes over NO outer expression — a lambda that re-references the
    array (e.g. ``F.get(chars, i-1)``) re-evaluates the whole
    split+sort per element, which is O(n²·log n) per row and took one
    sf0.1 partition from milliseconds to minutes. Row-local, shuffle-free,
    scan-speed at any scale."""
    c = F.col(text) if isinstance(text, str) else text
    chars = F.array_sort(F.split(c, ""))
    n = F.size(chars).cast("double")
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0.0).alias("run"),
        F.lit(0.0).alias("s"),
    )

    def step(acc: Column, ch: Column) -> Column:
        same = acc["prev"].isNotNull() & (ch == acc["prev"])
        run = F.when(same, acc["run"] + 1.0).otherwise(F.lit(1.0))
        s = F.when(
            same | acc["prev"].isNull(), acc["s"]
        ).otherwise(acc["s"] + acc["run"] * F.log(acc["run"]))
        return F.struct(ch.alias("prev"), run.alias("run"), s.alias("s"))

    def finish(acc: Column) -> Column:
        return F.when(
            acc["prev"].isNotNull(), acc["s"] + acc["run"] * F.log(acc["run"])
        ).otherwise(acc["s"])

    s_total = F.aggregate(chars, zero, step, finish)
    # + 0.0 canonicalizes IEEE -0.0 (an all-same-char doc) to +0.0 so the
    # value hashes identically across engines
    h = F.log(n) - s_total / n + F.lit(0.0)
    # split('', '') yields [''] (one empty token), so gate on text length
    return F.when(F.length(c) > 0, h)


def token_drift(
    docs: DataFrame,
    split_predicate: Column,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Token-usage drift between two sub-corpora (split by a boolean
    predicate): add-one-smoothed log-odds ratio per token, top-k by
    |delta| (the Monroe-style 'fightin' words' statistic, simplified to a
    flat prior). The monitoring primitive between corpus snapshots /
    domains — tokens with large |delta| mark the distribution shift.

    One explode → (side, token) count shuffle (vocabulary-sized after
    map-side combine), scalar totals broadcast back, top-k via
    TakeOrderedAndProject. delta = ln(p1/(1-p1)) − ln(p2/(1-p2)) with
    p_i = (c_i + 1)/(n_i + 2).

    Output: (token, n_a, n_b, delta) — delta > 0 ⇒ over-represented in
    the predicate=true side; ties break token asc.
    """
    toks = docs.select(
        split_predicate.alias("_side"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).where(F.col("token") != "")
    counts = toks.groupBy("token").agg(
        F.sum(F.col("_side").cast("long")).alias("n_a"),
        F.sum((~F.col("_side")).cast("long")).alias("n_b"),
    )
    totals = toks.groupBy().agg(
        F.sum(F.col("_side").cast("long")).alias("t_a"),
        F.sum((~F.col("_side")).cast("long")).alias("t_b"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    p_a = (F.col("n_a") + 1) / (F.col("t_a") + 2)
    p_b = (F.col("n_b") + 1) / (F.col("t_b") + 2)
    delta = F.round(
        F.log(p_a / (1 - p_a)) - F.log(p_b / (1 - p_b)), 6
    )
    return (
        j.select("token", "n_a", "n_b", delta.alias("delta"))
        .orderBy(F.abs(F.col("delta")).desc(), F.col("token"))
        .limit(k)
    )


def flesch_reading_ease(text: Column | str) -> Column:
    """Flesch reading-ease score from regex proxies: sentences =
    [.!?]+ runs (min 1), words = whitespace tokens, syllables = [aeiouy]+
    vowel groups (min 1/word). Row-local codegen (regexp_count), zero
    shuffle — pairs with quality_score in one projection."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.greatest(token_count(c), F.lit(1)).cast("double")
    sentences = F.greatest(F.regexp_count(c, F.lit(r"[.!?]+")), F.lit(1)).cast("double")
    syllables = F.greatest(
        F.regexp_count(F.lower(c), F.lit(r"[aeiouy]+")), words
    ).cast("double")
    return (
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / words)
    )


def zipf_fit(docs: DataFrame, k: int = 200, text_col: str = "text") -> DataFrame:
    """Zipf's-law fit over the top-k vocabulary: OLS of ln(freq) on
    ln(rank) — slope ≈ −1 for natural language, much flatter for
    templated/synthetic text, so the slope is a cheap corpus-level
    quality/fingerprint signal (alongside per-doc quality_score).

    Determinism discipline: the per-rank (ln rank, ln freq) points are
    quantized to e6 integers BEFORE the regression sums, so Σx, Σy, Σxy,
    Σx², Σy² are EXACT integers (order-independent — a raw double sum over
    the k rows would be shuffle-order dependent); the closed-form
    slope/intercept/R² then divide exact integers in fixed expression
    order. int64 bounds: |x_e6| ≤ ln(k)·1e6, |y_e6| ≤ ln(N)·1e6 → Σx·y
    ≤ k·(13e6)² ≈ 3e16 ≪ 2^63.

    Scale shape: one vocabulary-sized count agg → TakeOrdered top-k → all
    remaining arithmetic on the k-row relation (single-partition by
    construction, bounded by k).

    Output (1 row): (n_types, n_tokens, k_used, slope, intercept, r2)."""
    from pyspark.sql import Window

    toks = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token")).filter(
        F.col("token") != ""
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_types"), F.sum("n").alias("n_tokens")
    )
    topk = counts.orderBy(F.col("n").desc(), F.col("token")).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))  # k rows — bounded
    pts = topk.select(
        F.round(F.log(F.row_number().over(w).cast("double")) * 1e6)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("n").cast("double")) * 1e6).cast("long").alias("y"),
    )
    acc = pts.agg(
        F.count(F.lit(1)).cast("long").alias("kk"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    # exact-integer differences, then fixed-order double arithmetic;
    # degenerate spreads (k = 1 ranks → dx = 0; constant frequencies →
    # dy = 0) report slope/r2 = 0 instead of dividing by zero
    dn = (F.col("kk") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("kk") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("kk") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = F.when(dx == 0.0, F.lit(0.0)).otherwise(dn / dx)
    intercept = (
        F.col("sy").cast("double") / 1e6 - slope * F.col("sx").cast("double") / 1e6
    ) / F.col("kk")
    r2 = F.when((dx == 0.0) | (dy == 0.0), F.lit(0.0)).otherwise(
        dn * dn / (dx * dy)
    )
    rnd = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    return acc.crossJoin(F.broadcast(stats)).select(
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("kk").cast("int").alias("k_used"),
        rnd(slope).alias("slope"),
        rnd(intercept).alias("intercept"),
        rnd(r2).alias("r2"),
    )


def source_jsd(
    docs: DataFrame,
    k: int = 100,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Jensen–Shannon divergence between every pair of sources over the
    global top-k vocabulary — the corpus fingerprint DISTANCE (zipf_fit is
    the per-corpus shape; this says which crawls speak the same
    language/register). JSD is symmetric and bounded by ln 2, so the
    output is comparable across pairs.

    Determinism discipline: per-token contributions p·ln(2p/(p+q)) +
    q·ln(2q/(p+q)) are computed from EXACT integer counts in a fixed
    expression chain and quantized to e12 integers BEFORE the sum over
    the k tokens (a raw double sum would be shuffle-order dependent);
    absent tokens contribute exactly 0 (the p→0 limit). int64 bound:
    k·ln2·1e12 ≈ 7e13 ≪ 2^63.

    Scale shape: one vocabulary-sized (source, token) count agg, a
    TakeOrdered global top-k, then all arithmetic on the
    |sources|²·k-bounded pair relation.

    Output: (source_a, source_b, n_shared_topk, jsd)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(group_col).alias("src"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).filter(F.col("token") != "")
    per_src = toks.groupBy("src", "token").agg(F.count("*").alias("c"))
    topk = (
        per_src.groupBy("token")
        .agg(F.sum("c").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
        .select("token")
    )
    kept = per_src.join(F.broadcast(topk), "token")
    totals = kept.groupBy("src").agg(F.sum("c").alias("t"))
    a = kept.select(
        F.col("src").alias("sa"), "token", F.col("c").alias("ca")
    ).join(F.broadcast(totals.select(F.col("src").alias("sa"), F.col("t").alias("ta"))), "sa")
    b = kept.select(
        F.col("src").alias("sb"), "token", F.col("c").alias("cb")
    ).join(F.broadcast(totals.select(F.col("src").alias("sb"), F.col("t").alias("tb"))), "sb")
    # full (pair, top-k token) frame with left joins so tokens present in
    # only one source of a pair still contribute their one-sided term
    srcs = totals.select(F.col("src"))
    pair_rel = (
        srcs.select(F.col("src").alias("sa"))
        .crossJoin(srcs.select(F.col("src").alias("sb")))
        .filter(F.col("sa") < F.col("sb"))
    )
    frame = pair_rel.crossJoin(F.broadcast(topk))
    joined = (
        frame.join(a, ["sa", "token"], "left")
        .join(b, ["sb", "token"], "left")
        .join(F.broadcast(totals.select(F.col("src").alias("sa"), F.col("t").alias("_ta2"))), "sa")
        .join(F.broadcast(totals.select(F.col("src").alias("sb"), F.col("t").alias("_tb2"))), "sb")
        .select(
            "sa", "sb", "token",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.col("_ta2").alias("ta"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
            F.col("_tb2").alias("tb"),
        )
    )
    p = F.col("ca").cast("double") / F.col("ta")
    q = F.col("cb").cast("double") / F.col("tb")
    m = (p + q) / 2
    term = (
        F.when(F.col("ca") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("cb") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    ) / 2
    quant = F.round(term * 1e12).cast("long")
    out = joined.groupBy(
        F.col("sa").alias("source_a"), F.col("sb").alias("source_b")
    ).agg(
        F.sum(((F.col("ca") > 0) & (F.col("cb") > 0)).cast("long")).alias(
            "n_shared_topk"
        ),
        F.sum(quant).alias("_jsd_e12"),
    )
    return out.select(
        "source_a",
        "source_b",
        "n_shared_topk",
        (F.round(F.col("_jsd_e12").cast("double") / 1e12, 6) + F.lit(0.0)).alias(
            "jsd"
        ),
    )


def source_entropy(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Unigram Shannon entropy per source (nats), with the normalized
    form H/ln(n_types) in [0,1] — the DIVERSITY fingerprint completing
    the corpus trio (zipf_fit: shape; source_jsd: pairwise distance;
    this: per-source spread). Low entropy = templated/boilerplate-heavy
    source; near-1 normalized entropy = uniform token use.

    Determinism discipline: per-TYPE terms −(c/t)·ln(c/t) compute from
    exact integer counts and quantize to e12 integers before the
    vocabulary-sized sum (order-independent); the normalized form divides
    the exact quantized sum by ln(n_types) in fixed order. int64 bound:
    |vocab|·ln(t)·1e12 ≲ 1e17 for vocabularies to ~10⁵ types.

    Scale shape: one (source, token) counting agg (the shuffle carries
    per-source vocabulary, not corpus tokens) + a per-source rollup.

    Output: (source, n_tokens, n_types, entropy, norm_entropy)."""
    toks = docs.select(
        F.col(group_col).alias("source"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy("source", "token").agg(F.count("*").alias("c"))
    totals = counts.groupBy("source").agg(
        F.sum("c").cast("long").alias("_t"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    p = F.col("c").cast("double") / F.col("_t")
    term_e12 = F.round(-p * F.log(p) * 1e12).cast("long")
    per = (
        counts.join(F.broadcast(totals), "source")
        .groupBy("source")
        .agg(F.sum(term_e12).alias("_h_e12"))
    )
    h = F.col("_h_e12").cast("double") / 1e12
    rnd = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    return per.join(totals, "source").select(
        "source",
        F.col("_t").alias("n_tokens"),
        "n_types",
        rnd(h).alias("entropy"),
        rnd(
            F.when(F.col("n_types") > 1, h / F.log(F.col("n_types").cast("double")))
            .otherwise(F.lit(0.0))
        ).alias("norm_entropy"),
    )


def heaps_fit(
    docs: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps'-law fit: vocabulary growth V(n) ≈ K·n^β measured at
    ``n_buckets`` id-ordered corpus increments, with a log-log OLS for
    (β, ln K). Natural corpora show β ≈ 0.4–0.6; templated or heavily
    duplicated text goes flat — the VOCABULARY twin of the zipf_fit
    frequency fingerprint, and (with novelty_curve) the third
    is-more-data-worth-it readout.

    Exactness: cumulative token and distinct-type counts per checkpoint
    are exact integers (a word's vocabulary contribution is attributed to
    its FIRST bucket, then a bounded n_buckets-row cumulative window);
    the (ln n, ln V) points are e6-quantized integers before the
    regression sums (zipf_fit discipline), so every sum is exact and
    order-independent.

    Scale shape: one vocabulary-sized agg (word → first bucket, count) +
    one bucket-sized agg; all regression arithmetic on the n_buckets-row
    relation.

    Output per checkpoint: (bucket, cum_tokens, cum_types) plus shared
    (beta, ln_k, r2) fit columns."""
    from pyspark.sql import Window

    mx = docs.agg(F.max(F.col(id_col)).alias("_mx"))
    toks = (
        docs.crossJoin(F.broadcast(mx))
        .select(
            F.expr(f"CAST({id_col} * {n_buckets} div (_mx + 1) AS INT)").alias(
                "bucket"
            ),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    # ONE corpus-sized aggregation: the (bucket, word) count relation
    # feeds both the token totals and the first-bucket vocabulary
    # attribution (aggregating toks twice would tokenize the corpus twice)
    bw = toks.groupBy("bucket", "w").agg(F.count(F.lit(1)).alias("_c"))
    tok_per = bw.groupBy("bucket").agg(F.sum("_c").alias("n_tok"))
    first_b = bw.groupBy("w").agg(F.min("bucket").alias("bucket"))
    new_types = first_b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("bucket")  # n_buckets rows — bounded
    pts = (
        tok_per.join(new_types, "bucket", "left")
        .na.fill({"n_new": 0})
        .select(
            "bucket",
            F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum_tokens"),
            F.sum("n_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum_types"),
        )
        .withColumn(
            "x", F.round(F.log(F.col("cum_tokens").cast("double")) * 1e6).cast("long")
        )
        .withColumn(
            "y", F.round(F.log(F.col("cum_types").cast("double")) * 1e6).cast("long")
        )
    )
    acc = pts.agg(
        F.count(F.lit(1)).cast("long").alias("kk"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dn = (F.col("kk") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("kk") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("kk") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    beta = F.when(dx == 0.0, F.lit(0.0)).otherwise(dn / dx)
    ln_k = (
        F.col("sy").cast("double") / 1e6 - beta * F.col("sx").cast("double") / 1e6
    ) / F.col("kk")
    r2 = F.when((dx == 0.0) | (dy == 0.0), F.lit(0.0)).otherwise(
        dn * dn / (dx * dy)
    )
    rnd = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    fit = acc.select(
        rnd(beta).alias("beta"), rnd(ln_k).alias("ln_k"), rnd(r2).alias("r2")
    )
    return pts.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("cum_types").cast("long").alias("cum_types"),
    ).crossJoin(F.broadcast(fit))


def dup_ngrams(
    docs: DataFrame,
    k: int = 5,
    top: int = 20,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus's most-duplicated word ``k``-grams: for every k-gram
    appearing in ≥ ``min_docs`` distinct documents, its document
    frequency and total occurrence count, global top-``top`` — the
    boilerplate/template inventory (what span_dedup would cut), readable
    by a human because the N-GRAM TEXT itself is the key.

    Scale shape: row-local shingle explosion → ONE (ngram)-keyed
    aggregate carrying (count, distinct-doc count) → global
    TakeOrdered(top) with a total order (n_docs desc, n_occ desc, ngram
    asc) — never a full sort.

    Output: (ngram, n_docs, n_occurrences), exactly ``top`` rows or fewer."""
    # pre-filter: sequence(1, n) needs n ≥ 1 (Spark's sequence(1, 0) is
    # the DESCENDING [1, 0], which would emit short trailing grams)
    grams = (
        docs.filter(F.size(F.split(F.col(text_col), " ")) >= k)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(split({text_col}, ' ')) - {k} + 1),"
                    f" st -> array_join(slice(split({text_col}, ' '), st, {k}), ' '))"
                )
            ).alias("ngram"),
        )
    )
    agg = grams.groupBy("ngram").agg(
        F.countDistinct("_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    return (
        agg.filter(F.col("n_docs") >= min_docs)
        .orderBy(
            F.col("n_docs").desc(), F.col("n_occurrences").desc(), F.col("ngram")
        )
        .limit(top)
    )


def interdup_report(
    docs: DataFrame,
    k: int = 5,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 10_000,
) -> DataFrame:
    """Inter-document repetition per source: for each document, the share
    of its DISTINCT word k-grams that also appear in at least one OTHER
    document — the corpus-level self-repetition number (dup_ngrams is the
    top offenders list; this is the per-source rate you trend). Documents
    shorter than k words are excluded and counted.

    Exactness: per-doc share is the exact scaled integer
    (dup_grams·scale div grams); the per-source mean divides two exact
    integer sums. Data-sized work = one distinct (doc, gram) projection +
    ONE gram-keyed window (the distinct relation's per-gram count IS the
    document frequency — no second scan, no self-join). Every source in
    the input appears in the output, including sources whose documents
    are all shorter than k words (n_docs = 0, NULL rates).

    Output per source: (source, n_docs, n_short_docs, mean_interdup_e4,
    max_interdup_e4)."""
    from pyspark.sql import Window
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        F.split(F.col(text_col), " ").alias("_a"),
    )
    short = base.filter(F.size("_a") < k).groupBy("_g").agg(
        F.count(F.lit(1)).alias("n_short_docs")
    )
    grams = (
        base.filter(F.size("_a") >= k)
        .select(
            "_id",
            "_g",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(_a) - {k} + 1),"
                    f" st -> array_join(slice(_a, st, {k}), ' '))"
                )
            ).alias("_gram"),
        )
        .distinct()
    )
    # the relation is distinct on (doc, gram), so the per-gram window
    # count IS the document frequency — one gram-keyed shuffle, no
    # df-aggregate + join pair re-running the explode (exact_dedup shape)
    wg = Window.partitionBy("_gram")
    per_doc = (
        grams.withColumn("_df", F.count(F.lit(1)).over(wg))
        .groupBy("_id", "_g")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.when(F.col("_df") >= 2, 1).otherwise(0)).alias("_dup"),
        )
        .select(
            "_g",
            F.expr(f"_dup * {scale} div _n").alias("_share"),
        )
    )
    agg = per_doc.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("sum(_share) div count(*)").cast("long").alias("mean_interdup_e4"),
        F.max("_share").cast("long").alias("max_interdup_e4"),
    )
    sources = base.select(F.col("_g")).distinct()
    return (
        sources.join(agg, "_g", "left")
        .join(short, "_g", "left")
        .na.fill({"n_short_docs": 0, "n_docs": 0})
        .select(
            F.col("_g").alias(group_col),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_short_docs").cast("long").alias("n_short_docs"),
            "mean_interdup_e4",
            "max_interdup_e4",
        )
    )


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    k: int = 100,
    ndigits: int = 4,
) -> DataFrame:
    """Hill estimator of the power-law tail index over a positive value
    column (doc lengths, token counts, user event counts): α̂ =
    k / Σ_{i≤k} ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the k largest values — the number
    that says HOW heavy the tail is, where zipf_fit assumes the whole
    rank curve and heaps_fit tracks vocabulary growth.

    Determinism: the top-(k+1) VALUE multiset is tie-free by definition
    (ties at the threshold contribute exactly-zero terms), selection is
    TakeOrdered (never a global row_number over the data); per-term
    ln-differences are computed in fixed operand order and floor-e6
    quantized before the (k+1)-row sum (order-independent; terms are
    bounded by ln(xmax/threshold) ≈ 30, so e6 is far from int64); the
    closing round is 4 digits (the exp∘ln cross-engine discipline).

    Scale shape: one TakeOrdered(k+1) over the data — no shuffle beyond
    the top-k collection; everything after is (k+1)-row arithmetic.

    Output (1 row): (k, n, threshold, hill_mean, alpha)."""
    vals = df.select(F.col(value_col).cast("double").alias("_v")).filter(
        F.col("_v") > 0
    )
    n = vals.agg(F.count(F.lit(1)).cast("long").alias("n"))
    top = vals.orderBy(F.col("_v").desc()).limit(k + 1)
    thr = top.agg(F.min("_v").alias("_thr"))
    terms = top.crossJoin(F.broadcast(thr)).select(
        F.floor((F.log(F.col("_v")) - F.log(F.col("_thr"))) * 1e6)
        .cast("long")
        .alias("_t_e6"),
        "_thr",
    )
    acc = terms.agg(
        F.sum("_t_e6").cast("long").alias("s_e6"),
        F.first("_thr").alias("threshold"),
        F.count(F.lit(1)).cast("long").alias("_m"),
    ).crossJoin(F.broadcast(n))
    # _m = k+1 when the data has enough rows; use _m-1 as the effective k
    keff = (F.col("_m") - 1).cast("double")
    hill_mean = F.when(
        keff > 0, F.col("s_e6").cast("double") / 1e6 / keff
    ).otherwise(F.lit(0.0))
    alpha = F.when(hill_mean > 0.0, 1.0 / hill_mean).otherwise(F.lit(0.0))
    return acc.select(
        (F.col("_m") - 1).cast("int").alias("k"),
        "n",
        (F.round(F.col("threshold"), ndigits) + F.lit(0.0)).alias("threshold"),
        (F.round(hill_mean, ndigits) + F.lit(0.0)).alias("hill_mean"),
        (F.round(alpha, ndigits) + F.lit(0.0)).alias("alpha"),
    )


def log_odds_words(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    k: int = 20,
    ndigits: int = 4,
) -> DataFrame:
    """Monroe et al. (2008) "Fightin' Words" log-odds with a smoothing
    prior: which words distinguish corpus A from corpus B, with the
    variance correction that tf-idf/PMI lack (raw log-odds over-ranks
    rare words; the z-score divides by ≈√(1/(y_a+α) + 1/(y_b+α))).

    δ_w = ln[(y_aw+α)/(n_a+Vα−y_aw−α)] − ln[(y_bw+α)/(n_b+Vα−y_bw−α)],
    z_w = δ_w/σ_w. Operands are exact integer counts + the α literal, the
    ln/√ chain runs in fixed operand order and rounds at 4 (the exp∘ln
    discipline); ranking is by ROUNDED |z| (desc) with word tie-break, so
    selection is reproducible cross-engine.

    Scale shape: two corpus scans → vocabulary-sized count relations,
    full-outer joined on word; 1-row totals broadcast; top-k via
    TakeOrdered + a k-row rank window. No data-sized shuffle after the
    token counts.

    Output top-k: (word, cnt_a, cnt_b, delta, z, rank)."""
    from pyspark.sql import Window

    def counts(docs, out):
        return (
            docs.select(
                F.explode(F.split(F.col(text_col), " ")).alias("word")
            )
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    ca, cb = counts(docs_a, "cnt_a"), counts(docs_b, "cnt_b")
    vocab = ca.join(cb, "word", "full_outer").na.fill(
        {"cnt_a": 0, "cnt_b": 0}
    )
    tot = vocab.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
    )
    j = vocab.crossJoin(F.broadcast(tot))
    a = F.lit(float(alpha))
    ya, yb = F.col("cnt_a").cast("double"), F.col("cnt_b").cast("double")
    va = F.col("v").cast("double") * a
    delta = (
        F.log((ya + a) / (F.col("n_a").cast("double") + va - ya - a))
        - F.log((yb + a) / (F.col("n_b").cast("double") + va - yb - a))
    )
    sigma2 = 1.0 / (ya + a) + 1.0 / (yb + a)
    z = delta / F.sqrt(sigma2)
    scored = j.select(
        "word", "cnt_a", "cnt_b",
        (F.round(delta, ndigits) + F.lit(0.0)).alias("delta"),
        (F.round(z, ndigits) + F.lit(0.0)).alias("z"),
    )
    order = [F.abs(F.col("z")).desc(), F.col("word")]
    topk = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)  # k rows — bounded
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def vocab_coverage(
    docs: DataFrame,
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Vocabulary-coverage estimators from the frequency-of-frequencies:
    Chao1 richness D̂ = D + f₁(f₁−1)/(2(f₂+1)) (bias-corrected — defined
    at f₂ = 0) and the Good–Turing unseen-probability mass P₀ = f₁/N —
    the "how much of the token distribution has this corpus actually
    seen" numbers next to heaps_fit's growth curve (sampling more data
    is pointless once P₀ flattens; a high Chao1/D ratio says the
    long tail is mostly unobserved).

    Exactness: whitespace tokenization (the corpus-wide convention),
    pure integer counts, two fixed-order divisions at the edge.

    Scale shape: one token-count aggregation (map-side partial) over the
    corpus, then ONE |distinct counts|-sized frequency-of-frequencies
    rollup — the second relation is tiny (counts collapse into few
    distinct multiplicities).

    Output (1 row): (n_tokens, n_types, f1, f2, chao1, unseen_mass,
    coverage)."""
    tokens = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("_t")
    ).filter(F.col("_t") != "")
    counts = tokens.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    fof = counts.groupBy("_c").agg(F.count(F.lit(1)).cast("long").alias("_f"))
    acc = fof.agg(
        F.sum(F.col("_c") * F.col("_f")).cast("long").alias("n_tokens"),
        F.sum("_f").cast("long").alias("n_types"),
        F.sum(F.when(F.col("_c") == 1, F.col("_f")).otherwise(F.lit(0)))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("_c") == 2, F.col("_f")).otherwise(F.lit(0)))
        .cast("long")
        .alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    chao1 = F.col("n_types").cast("double") + f1 * (f1 - 1.0) / (
        2.0 * (F.col("f2").cast("double") + 1.0)
    )
    p0 = F.when(F.col("n_tokens") > 0, f1 / F.col("n_tokens")).otherwise(
        F.lit(0.0)
    )
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return acc.select(
        "n_tokens",
        "n_types",
        "f1",
        "f2",
        rnd(chao1).alias("chao1"),
        rnd(p0).alias("unseen_mass"),
        rnd(1.0 - p0).alias("coverage"),
    )


def source_hellinger(
    docs: DataFrame,
    k: int = 100,
    group_col: str = "source",
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Hellinger distance between every pair of sources over the global
    top-k vocabulary — source_jsd's metric companion (Hellinger is a true
    metric bounded in [0, 1], the form mixture-weight and domain-shift
    bounds are stated in; JSD is the information-theoretic view of the
    same pair relation).

    Determinism: per-token Bhattacharyya terms √((c_a/t_a)·(c_b/t_b)) are
    fixed-operand-order doubles of exact integer counts, e12-quantized
    BEFORE the k-token sum (shuffle-order-proof); tokens absent from
    either side contribute the exact 0 limit (inner join). H = √(1 − BC)
    with the ≥0 guard.

    Scale shape: identical to source_jsd — one (source, token) count agg,
    a TakeOrdered top-k, arithmetic on the |sources|²·k pair relation.
    Output: (source_a, source_b, n_shared_topk, hellinger)."""
    toks = docs.select(
        F.col(group_col).alias("src"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).filter(F.col("token") != "")
    per_src = toks.groupBy("src", "token").agg(F.count("*").alias("c"))
    topk = (
        per_src.groupBy("token")
        .agg(F.sum("c").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
        .select("token")
    )
    kept = per_src.join(F.broadcast(topk), "token")
    totals = kept.groupBy("src").agg(F.sum("c").cast("long").alias("t"))
    a = kept.join(totals, "src").select(
        F.col("src").alias("source_a"),
        "token",
        F.col("c").alias("ca"),
        F.col("t").alias("ta"),
    )
    b = kept.join(totals, "src").select(
        F.col("src").alias("source_b"),
        "token",
        F.col("c").alias("cb"),
        F.col("t").alias("tb"),
    )
    pairs = a.join(b, "token").filter(F.col("source_a") < F.col("source_b"))
    term = F.sqrt(
        (F.col("ca").cast("double") / F.col("ta").cast("double"))
        * (F.col("cb").cast("double") / F.col("tb").cast("double"))
    )
    q = F.round(term * 1e12, 0).cast("long")
    acc = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_topk"),
        F.sum(q).cast("long").alias("_bc"),
    )
    bc = F.col("_bc").cast("double") / 1e12
    h = F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - bc))
    return acc.select(
        "source_a",
        "source_b",
        "n_shared_topk",
        (F.round(h, ndigits) + F.lit(0.0)).alias("hellinger"),
    )
