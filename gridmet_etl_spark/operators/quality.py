"""Document-quality filter rules for LLM training-data curation.

Two published rule sets, re-expressed as single-pass Spark column
expressions (no shuffle, no Python eval — pure codegen + a handful of
interpreted higher-order filters over per-document line/word arrays, which
are tiny relative to the corpus):

- ``gopher_flags``: the Gopher quality heuristics (Rae et al. 2021, §A1.1):
  word-count bounds, mean-word-length bounds, symbol-to-word ratio, bullet
  and ellipsis line ratios, alphabetic-word fraction, and the >=2-stopword
  requirement.
- ``c4_clean``: the C4 cleaning rules (Raffel et al. 2020, §2.2): keep only
  lines ending in terminal punctuation with >=5 words; drop pages with
  fewer than 3 sentences, any ``lorem ipsum``, or a curly bracket.

Scale: both are per-row map transforms — they pipeline into whatever scan
feeds them, shuffle nothing, and parallelize embarrassingly at any corpus
size. The reference repo has no text surface; these extend the engine for
the 100 TB training-data use case (see SURVEY.md extension ops).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's required stop set: a document must contain at least 2 of these.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

WORD_RE = r"\S+"
TERMINAL_RE = r'[.!?"]$'


def _words(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(WORD_RE), 0)


def _lines(text: Column) -> Column:
    return F.split(text, "\n")


def _frac(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))


def gopher_flags(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document Gopher quality flags + overall pass verdict.

    Thresholds follow the paper: 50 <= words <= 100k, 3 <= mean word length
    <= 10, symbol ('#'/'...') to word ratio <= 0.1, <= 90% bullet lines,
    <= 30% ellipsis-ended lines, >= 80% words with an alphabetic char,
    >= 2 stopword hits.
    """
    text = F.col(text_col)
    words = _words(text)
    lines = _lines(text)
    n_words = F.size(words)
    n_lines = F.size(lines)
    # total non-whitespace chars / word count — avoids a per-word aggregate
    mean_word_len = _frac(F.length(F.regexp_replace(text, r"\s+", "")), n_words)
    n_symbols = F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\."), 0))
    n_bullet = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
    n_ellipsis_end = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$")))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    low = F.lower(text)
    stop_hits = F.size(
        F.filter(_words(low), lambda w: w.isin(GOPHER_STOPWORDS))
    )
    out = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        _frac(n_symbols, n_words).alias("symbol_ratio"),
        _frac(n_bullet, n_lines).alias("bullet_ratio"),
        _frac(n_ellipsis_end, n_lines).alias("ellipsis_ratio"),
        _frac(n_alpha, n_words).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    flags = out.select(
        "*",
        ((F.col("n_words") >= 50) & (F.col("n_words") <= 100_000)).alias("word_count_ok"),
        ((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10)).alias("word_len_ok"),
        (F.col("symbol_ratio") <= 0.1).alias("symbol_ok"),
        (F.col("bullet_ratio") <= 0.9).alias("bullet_ok"),
        (F.col("ellipsis_ratio") <= 0.3).alias("ellipsis_ok"),
        (F.col("alpha_frac") >= 0.8).alias("alpha_ok"),
        (F.col("stop_hits") >= 2).alias("stop_ok"),
    )
    return flags.select(
        "*",
        (
            F.col("word_count_ok")
            & F.col("word_len_ok")
            & F.col("symbol_ok")
            & F.col("bullet_ok")
            & F.col("ellipsis_ok")
            & F.col("alpha_ok")
            & F.col("stop_ok")
        ).alias("gopher_pass"),
    )


def c4_clean(docs: DataFrame, text_col: str = "text", id_col: str = "page_id") -> DataFrame:
    """C4 cleaning: line filter + page-level drop rules.

    A line survives iff it ends in terminal punctuation (``. ! ? "``) AND
    has >= 5 words. A page is kept iff its cleaned text has >= 3 sentences
    (terminal ``.!?`` occurrences) and the raw page contains neither
    ``lorem ipsum`` nor ``{``. Returns per-page stats, the keep verdict,
    and the cleaned text (empty string when every line is dropped).
    """
    text = F.col(text_col)
    lines = _lines(text)
    kept = F.filter(
        lines,
        lambda l: l.rlike(TERMINAL_RE)
        & (F.size(F.regexp_extract_all(l, F.lit(WORD_RE), 0)) >= 5),
    )
    cleaned = F.array_join(kept, "\n")
    n_sentences = F.size(F.regexp_extract_all(cleaned, F.lit(r"[.!?]"), 0))
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    return docs.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        ((n_sentences >= 3) & ~has_lorem & ~has_brace).alias("c4_keep"),
        cleaned.alias("clean_body"),
    )


def percentile_cut(
    docs: DataFrame,
    keys: Sequence[str] = ("source",),
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    cut: float = 0.75,
) -> DataFrame:
    """Keep each group's top (1 - cut) fraction by ``value_col`` — the
    per-domain percentile gate curation pipelines apply so one verbose
    domain can't crowd out the rest (absolute thresholds do exactly that).

    Selection is by ``percent_rank`` ≥ cut with ties broken by id: an
    exact rational of two counts, so membership is reproducible across
    engines — a filter against an interpolated percentile VALUE would sit
    a float ulp away from flipping boundary rows. The window partitions by
    group (never global); at 100 TB the equivalent shape is the two-pass
    rank-vs-group-count join, same contract.

    Output: (id, keys…, value, pr) with pr rounded to 6.
    """
    from pyspark.sql import Window

    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(value_col), F.col(id_col))
    return (
        docs.select(
            F.col(id_col), *keys, F.col(value_col),
            F.percent_rank().over(w).alias("pr"),
        )
        .where(F.col("pr") >= cut)
        .withColumn("pr", F.round("pr", 6))
    )


def filter_cascade(
    flags: DataFrame, rule_cols: Sequence[str], id_col: str = "doc_id"
) -> DataFrame:
    """Marginal-value report for a boolean rule set (gopher_flags /
    c4_clean output, or any per-row pass flags): per rule, how many rows
    it fails and how many it UNIQUELY kills (fails this rule, passes all
    others) — the number that says whether a filter is still earning its
    keep or is shadowed by the rest of the cascade.

    One pass: a single aggregate computes every (fail, unique-kill)
    counter; the per-rule rows come from exploding an array of literal
    structs over the 1-row result — no per-rule scans, no shuffle beyond
    the one agg. Rule names appear ONLY as column-object references and
    string literals (never interpolated into SQL text), so names with
    quotes/spaces/backticks can't break or inject into the expression
    (ADVICE r8 fix); internal aliases are INDEX-based for the same reason.

    Output per rule: (rule, n_failed, n_unique_kills) + shared
    (n_docs, n_survivors)."""
    from functools import reduce

    def _ref(name: str):
        # backtick-quoted exact reference: the ONLY metachar inside a
        # quoted name part is the backtick itself, doubled to escape —
        # quotes/spaces/commas pass through literally (Spark 4 parses
        # even df[name] / F.col(name), so quoting is mandatory here)
        return F.col("`" + name.replace("`", "``") + "`")

    aggs = [
        F.count(F.lit(1)).cast("long").alias("_n_docs"),
        F.sum(
            reduce(lambda x, y: x & y, [_ref(c) for c in rule_cols]).cast("long")
        )
        .cast("long")
        .alias("_n_pass"),
    ]
    for i, r in enumerate(rule_cols):
        others = [_ref(c) for c in rule_cols if c != r]
        all_others = reduce(lambda x, y: x & y, others) if others else F.lit(True)
        aggs.append(F.sum((~_ref(r)).cast("long")).cast("long").alias(f"_f_{i}"))
        aggs.append(
            F.sum((~_ref(r) & all_others).cast("long"))
            .cast("long")
            .alias(f"_u_{i}")
        )
    one = flags.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("rule"),
                    F.col(f"_f_{i}").alias("n_failed"),
                    F.col(f"_u_{i}").alias("n_unique_kills"),
                )
                for i, r in enumerate(rule_cols)
            ]
        )
    ).alias("_row")
    return one.select(
        rows,
        F.col("_n_docs").alias("n_docs"),
        F.col("_n_pass").alias("n_survivors"),
    ).select(
        F.col("_row.rule").alias("rule"),
        F.col("_row.n_failed").alias("n_failed"),
        F.col("_row.n_unique_kills").alias("n_unique_kills"),
        "n_docs",
        "n_survivors",
    )
