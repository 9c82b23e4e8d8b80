"""Event-sequence analytics: funnels, retention cohorts, and transition
matrices — the product-analytics surface over an append-only event stream
(reference analogue: the T2 incremental events table; SURVEY §2 T2/W).

Scale design (100 TB of events):

- ``funnel_conversion`` is a chain of per-user min-timestamp aggregations,
  one per funnel step: every stage shuffles on ``user_id`` only, and each
  stage's input is the (already user-deduplicated) survivor set of the
  previous stage, so volume is monotone non-increasing. With the events
  table pre-bucketed by user the whole chain is shuffle-free.
- ``retention_cohorts`` is two user-keyed aggs + one user-keyed join +
  a (cohort, offset)-keyed count: all shuffles are user- or output-sized.
- ``event_transitions`` is a single window (partitioned by user — no
  global window) + a (from, to)-keyed count: the classic Markov
  transition matrix in two map-side-combinable passes.

Every function is pure DataFrame/codegen — no UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel user counts: a user completes step k iff they have a
    step-k event STRICTLY after their earliest completion of step k-1
    (earliest-completion semantics — the standard product-analytics
    definition, deterministic regardless of event order).

    Output: (step, step_name, n_users) — one row per funnel step.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    survivors = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    levels = [survivors]
    for step in steps[1:]:
        survivors = (
            events.filter(F.col(type_col) == step)
            .join(survivors, user_col)
            .filter(F.col(ts_col) > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        levels.append(survivors)
    counts = None
    for i, (name, lvl) in enumerate(zip(steps, levels)):
        row = lvl.agg(F.count("*").alias("n_users")).select(
            F.lit(i + 1).alias("step"), F.lit(name).alias("step_name"), "n_users"
        )
        counts = row if counts is None else counts.unionByName(row)
    return counts


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users cohorted by first-activity week;
    for each (cohort_week, week_offset ≥ 0) the number of distinct cohort
    users active that week.

    Output: (cohort_week, week_offset, n_users).
    """
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    first = events.groupBy(user_col).agg(
        F.min(week).alias("cohort_week")
    )
    active = events.select(F.col(user_col), week.alias("active_week")).distinct()
    return (
        active.join(first, user_col)
        .select(
            "cohort_week",
            F.floor(
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            ).alias("week_offset"),
            user_col,
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Markov transition counts: for each user's time-ordered event stream
    (ties broken by event id for determinism), count (from_type, to_type)
    adjacent pairs and the row-normalized transition probability.

    Output: (from_type, to_type, n, p) with p = n / Σ_to n.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    w_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_from), 6).alias("p"),
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    k: int = 20,
    max_events: int = 20,
    convert_type: str = "purchase",
) -> DataFrame:
    """Top-k navigation paths: gap-sessionize (the sessionize_batch rule —
    a gap must EXCEED ``gap_minutes`` to split), concatenate each
    session's event types in (ts, event_id) order into a path string
    (capped at ``max_events`` per session so path strings stay bounded at
    crawl scale), and rank paths by session count.

    Scale shape: both windows are user-partitioned (never global), the
    path rollup is one output-sized shuffle (distinct paths ≪ sessions),
    and the top-k is TakeOrderedAndProject + a k-row rank window.
    Determinism: collect_list order is pinned by array_sort over
    (ts, event_id, type) structs — no reliance on arrival order.

    Output: (path, n_sessions, n_users, n_events_path, converted, rank).
    ``converted`` is exact membership of ``convert_type`` among the path's
    event types (substring matching would count e.g. 'pre_purchase_view'),
    evaluated on the CAPPED path — a conversion landing beyond the
    ``max_events`` cap reports as unconverted, by design (the path string
    IS the unit of analysis here; use funnel/markov ops for uncapped
    conversion accounting).
    """
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select("user_id", "ts", "event_id", "event_type").withColumn(
        "new_s",
        F.when(
            (F.col("ts") - F.lag("ts", 1).over(wo))
            > F.expr(f"INTERVAL {gap_minutes} MINUTES"),
            1,
        ).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_idx",
        F.sum("new_s").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_idx").orderBy("ts", "event_id")
    capped = sessioned.withColumn("ern", F.row_number().over(ws)).filter(
        F.col("ern") <= max_events
    )
    per_sess = capped.groupBy("user_id", "session_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x.event_type,
            ),
            ">",
        ).alias("path")
    )
    agg = per_sess.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    )
    order = [F.col("n_sessions").desc(), F.col("path")]
    topk = agg.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.select(
        "path",
        "n_sessions",
        "n_users",
        F.size(F.split(F.col("path"), ">")).alias("n_events_path"),
        F.array_contains(F.split(F.col("path"), ">"), convert_type).alias(
            "converted"
        ),
    ).withColumn("rank", F.row_number().over(w))


def markov_transitions(
    events: DataFrame,
    gap_minutes: int = 30,
    convert_type: str = "purchase",
) -> DataFrame:
    """First-order Markov transition counts over gap-sessionized journeys:
    START → first touch, touch → next touch, first ``convert_type`` event
    absorbs to CONV (later same-session events are dropped — the standard
    split-at-conversion rule), sessions without a conversion end
    touch → NULL. Output: (s_from, s_to, n) — a |vocab|²-bounded relation
    from user-partitioned windows + one output-sized count."""
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select("user_id", "ts", "event_id", "event_type").withColumn(
        "new_s",
        F.when(
            (F.col("ts") - F.lag("ts", 1).over(wo))
            > F.expr(f"INTERVAL {gap_minutes} MINUTES"),
            1,
        ).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_idx",
        F.sum("new_s").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_idx").orderBy("ts", "event_id")
    ranked = sessioned.withColumn("ern", F.row_number().over(ws))
    fp = ranked.withColumn(
        "fp_ern",
        F.min(
            F.when(F.col("event_type") == convert_type, F.col("ern"))
        ).over(Window.partitionBy("user_id", "session_idx")),
    )
    kept = fp.filter(
        F.col("fp_ern").isNull() | (F.col("ern") <= F.col("fp_ern"))
    )
    # lead must see the conversion row: materialize it BEFORE the
    # non-purchase filter (a fused filter+window would drop the purchase
    # row from the frame and every journey would end ->NULL)
    with_next = kept.withColumn("_nxt", F.lead("event_type", 1).over(ws))
    mapped_next = (
        F.when(F.col("_nxt") == convert_type, F.lit("CONV"))
        .when(F.col("_nxt").isNull(), F.lit("NULL"))
        .otherwise(F.col("_nxt"))
    )
    body = with_next.filter(F.col("event_type") != convert_type).select(
        F.col("event_type").alias("s_from"), mapped_next.alias("s_to")
    )
    first = kept.filter(F.col("ern") == 1).select(
        F.lit("START").alias("s_from"),
        F.when(F.col("event_type") == convert_type, F.lit("CONV"))
        .otherwise(F.col("event_type"))
        .alias("s_to"),
    )
    return (
        body.unionByName(first)
        .groupBy("s_from", "s_to")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def markov_removal_effects(
    events: DataFrame,
    channels: list[str],
    gap_minutes: int = 30,
    iters: int = 10,
    convert_type: str = "purchase",
    ndigits: int = 6,
) -> DataFrame:
    """Markov-chain attribution (Anderl et al. 2014): conversion
    probability from START via value iteration over the transition matrix,
    and each channel's REMOVAL EFFECT — the relative drop in conversion
    when that channel is knocked out (clamped to absorb at 0, i.e. its
    traffic is lost) — normalized into attribution shares. The principled
    sibling of linear multi-touch credit: a channel that only appears on
    already-doomed paths earns ~0 here.

    Scale shape: ONE data-sized pass builds the transition counts
    (markov_transitions); everything after operates on the
    |vocab|²-bounded probability relation — (1 + |channels|) × iters tiny
    joins, lineage cut by localCheckpoint every 4 rounds (the pagerank
    discipline). Channels are a plan-time parameter (the event-type
    vocabulary), not a collected list.

    Output: (channel, base_cvr, removed_cvr, removal_effect, share)."""
    t = markov_transitions(events, gap_minutes, convert_type)
    row = t.groupBy("s_from").agg(F.sum("n").alias("n_out"))
    probs = (
        t.join(F.broadcast(row), "s_from")
        .select("s_from", "s_to", (F.col("n") / F.col("n_out")).alias("prob"))
        .localCheckpoint(eager=False)
    )

    def absorb(clamp: str | None) -> DataFrame:
        """p(START) after ``iters`` rounds of p(s) = Σ P(s→t)·val(t)."""
        base = probs if clamp is None else probs.filter(F.col("s_from") != clamp)
        p = None  # round 0: p ≡ 0 for transient states
        for it in range(iters):
            val = (
                F.when(F.col("s_to") == "CONV", F.lit(1.0))
                .when(F.col("s_to") == "NULL", F.lit(0.0))
            )
            if clamp is not None:
                val = val.when(F.col("s_to") == clamp, F.lit(0.0))
            if p is None:
                val = val.otherwise(F.lit(0.0))
                cur = base
            else:
                val = val.otherwise(F.coalesce(F.col("_p"), F.lit(0.0)))
                cur = base.join(
                    p.select(F.col("state").alias("_st"), F.col("p").alias("_p")),
                    base["s_to"] == F.col("_st"),
                    "left",
                )
            p = cur.groupBy(F.col("s_from").alias("state")).agg(
                F.sum(F.col("prob") * val).alias("p")
            )
            if (it + 1) % 4 == 0:
                p = p.localCheckpoint(eager=False)
        assert p is not None
        return p.filter(F.col("state") == "START").select("p")

    base_p = absorb(None).select(F.col("p").alias("base_cvr"))
    out = None
    for c in channels:
        removed = absorb(c).select(F.col("p").alias("removed_cvr"))
        one = (
            removed.crossJoin(F.broadcast(base_p))
            .select(
                F.lit(c).alias("channel"),
                "base_cvr",
                "removed_cvr",
                (
                    (F.col("base_cvr") - F.col("removed_cvr")) / F.col("base_cvr")
                ).alias("removal_effect"),
            )
        )
        out = one if out is None else out.unionByName(one)
    assert out is not None
    tot = out.agg(F.sum("removal_effect").alias("_tot"))
    rnd = lambda c: F.round(c, ndigits) + F.lit(0.0)  # noqa: E731
    return out.crossJoin(F.broadcast(tot)).select(
        "channel",
        rnd(F.col("base_cvr")).alias("base_cvr"),
        rnd(F.col("removed_cvr")).alias("removed_cvr"),
        rnd(F.col("removal_effect")).alias("removal_effect"),
        rnd(F.col("removal_effect") / F.col("_tot")).alias("share"),
    )


def window_funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    hub_bucket_seconds: int | None = None,
) -> DataFrame:
    """ClickHouse-windowFunnel-shaped sequence match: per user, the
    deepest step k such that SOME step-1 event starts a chain
    e₁ → e₂ → … → e_k with ts_{i+1} ≥ ts_i (each eᵢ₊₁ the EARLIEST
    matching event at or after eᵢ — greedy-earliest is optimal for a
    window anchored at e₁) and ts_k − ts₁ ≤ ``within_seconds``.

    Spark-first shape: each chain extension is ONE forward as-of join
    (operators/asof.py — union + running-first window, |chains|+|events|
    rows keyed by user), so a k-step funnel is k−1 as-of passes — never
    a per-user quadratic self-join, never a Python UDF; the chain
    frontier is localCheckpoint-pinned per extension so the per-level
    snapshots don't re-execute the earlier joins (k−1 passes total, not
    k(k−1)/2). funnel_conversion counts UNORDERED per-step users; this is
    the strictly-sequenced, time-bounded version.

    ``steps`` must be distinct event types: the ≥-inclusive frontier
    would let one event satisfy two consecutive occurrences of the SAME
    type (a "viewed twice" funnel needs strict event-id progression the
    as-of composition does not carry), so repeats raise instead of
    silently overcounting.

    ``hub_bucket_seconds``: forwarded to each as-of extension's
    segment-and-merge path (operators/asof.py) — with one hub user (bot
    traffic) holding a double-digit share of events, the default plan
    sorts that user's whole stream in one task per extension; bucketing
    bounds per-task state at rows-per-(user, bucket). Identical output
    (asof property tests cover the equivalence).

    Output per level: (level, n_users), level 1..k — n_users = users
    whose deepest completed step is exactly ``level``."""
    from .asof import asof_join

    if len(set(steps)) != len(steps):
        raise ValueError(
            f"steps must be distinct event types, got {steps!r} "
            "(a repeated step would match the same event twice under the "
            "inclusive ts frontier)"
        )

    typed = [
        events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        for s in steps
    ]
    # one row per step-1 event: the chain anchor (t1 drives the window)
    chains = typed[0].select("_u", F.col("_ts").alias("_t1"), F.col("_ts").alias("_cur"))
    levels = [
        chains.select("_u", "_t1").withColumn("_lvl", F.lit(1))
    ]
    for i, nxt in enumerate(typed[1:], start=2):
        # earliest step-i event at/after the chain's current frontier
        right = nxt.groupBy("_u", "_ts").agg(F.count(F.lit(1)).alias("_dummy")).drop(
            "_dummy"
        )
        step = asof_join(
            chains.select(F.col("_u").alias("k"), F.col("_cur").alias("ts"), "_t1"),
            right.select(F.col("_u").alias("k"), F.col("_ts").alias("ts")),
            on="k",
            direction="forward",
            bucket_seconds=hub_bucket_seconds,
        )
        chains = (
            step.filter(
                F.col("ts_right").isNotNull()
                & (
                    F.unix_micros(F.col("ts_right").cast("timestamp"))
                    - F.unix_micros(F.col("_t1").cast("timestamp"))
                    <= within_seconds * 1_000_000
                )
            )
            .select(
                F.col("k").alias("_u"),
                "_t1",
                F.col("ts_right").alias("_cur"),
            )
            # pin: the level snapshot below and the next extension both
            # read this frontier — without the checkpoint each level's
            # branch re-executes every earlier as-of join
            .localCheckpoint(eager=False)
        )
        levels.append(
            chains.select("_u", "_t1").withColumn("_lvl", F.lit(i))
        )
    all_lv = levels[0]
    for lv in levels[1:]:
        all_lv = all_lv.unionByName(lv)
    per_user = all_lv.groupBy("_u").agg(F.max("_lvl").alias("level"))
    out = per_user.groupBy("level").agg(
        F.countDistinct("_u").cast("long").alias("n_users")
    )
    return out.select(F.col("level").cast("int").alias("level"), "n_users")


def inter_event_gaps(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    thresholds: list[int] = [1, 10, 60, 600, 3600, 86400],  # noqa: B006
    ndigits: int = 6,
) -> DataFrame:
    """Inter-arrival-time histogram: per consecutive same-user event pair,
    the gap in exact microseconds, bucketed by integer second thresholds
    (≤1s, ≤10s, … , >last) — the distribution behind every sessionization
    gap_minutes choice; pick the session timeout from the valley in THIS
    histogram instead of folklore.

    Exactness: gaps via unix_micros (exact int64); bucket membership is
    pure integer comparison; pct = n/total over exact counts. Every
    bucket emits its row (zero-count included — group-report discipline).

    Scale shape: one (user)-keyed lag window (hub users bound a task by
    their event count — the sessionizer caveat in SCALE.md applies), one
    |buckets|-row report.

    Output per bucket: (bucket, lo_exclusive_s, hi_inclusive_s, n, pct);
    hi NULL on the open last bucket."""
    spark = events.sparkSession
    # ordering among equal timestamps is irrelevant for the HISTOGRAM
    # (the gap multiset is invariant under permutations within ties), so
    # the window orders by ts alone — the oracle does the same
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        events.select(F.col(user_col).alias("_u"), F.col(ts_col))
        .withColumn("_gap", micros - F.lag(micros).over(
            Window.partitionBy("_u").orderBy(F.col(ts_col))
        ))
        .filter(F.col("_gap").isNotNull())
    )
    edges = [0] + list(thresholds)
    rows = [
        (i, edges[i], thresholds[i] if i < len(thresholds) else None)
        for i in range(len(thresholds) + 1)
    ]
    brel = spark.createDataFrame(
        rows, "bucket int, lo_exclusive_s long, hi_inclusive_s long"
    )
    cond = F.lit(len(thresholds))  # default: open last bucket
    for i in range(len(thresholds) - 1, -1, -1):
        cond = F.when(
            F.col("_gap") <= thresholds[i] * 1_000_000, F.lit(i)
        ).otherwise(cond)
    counted = gaps.select(cond.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = gaps.agg(F.count(F.lit(1)).cast("long").alias("_tot"))
    out = (
        brel.join(counted, "bucket", "left")
        .na.fill({"n": 0})
        .crossJoin(F.broadcast(tot))
    )
    pct = F.when(F.col("_tot") > 0,
                 F.col("n").cast("double") / F.col("_tot")).otherwise(F.lit(0.0))
    return out.select(
        "bucket",
        "lo_exclusive_s",
        "hi_inclusive_s",
        "n",
        (F.round(pct, ndigits) + F.lit(0.0)).alias("pct"),
    )


def event_trigrams(
    events: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    tiebreak_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Frequent 3-event paths: the per-user consecutive event-type
    trigram counts event_transitions (bigrams) can't see — the minimal
    sequence-mining readout ("view→cart→buy vs view→cart→abandon").

    Determinism: per-user ordering is the TOTAL order (time, tiebreak)
    so duplicate timestamps cannot reorder between engines; top-k breaks
    count ties lexicographically on the path.

    Scale shape: one shuffle on the user key, two lead() windows over
    each user's events, a trigram groupBy; the top-k picks from the
    |distinct trigrams|-row relation. Output: (e1, e2, e3, n_paths,
    rank)."""
    w = Window.partitionBy(user_col).orderBy(time_col, tiebreak_col)
    tri = events.select(
        F.col(type_col).alias("e1"),
        F.lead(type_col, 1).over(w).alias("e2"),
        F.lead(type_col, 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    counts = tri.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )
    wr = Window.orderBy(
        F.col("n_paths").desc(), F.col("e1"), F.col("e2"), F.col("e3")
    )
    return (
        counts.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= top_k)
    )
