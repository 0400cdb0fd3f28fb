"""Behavioral event analytics: ordered funnels and cohort retention.

The reference has no event-analytics surface (its scope is exact
vector search, SURVEY.md §2.2 "Streaming: REF none"); this module is
extension surface over the ``events`` table, the batch twin of the
product-analytics queries a timeseries store serves.

Both operators are built from per-user aggregations (map-side
combinable) and user-keyed joins — no windows over the whole event
stream, no driver actions — so they hold at any event volume: state
per task is bounded by one user's events, and every exchange is keyed
by user or by the (tiny) cohort/stage output key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "funnel_stages",
    "funnel_counts",
    "cohort_retention",
    "cohort_ltv",
    "transition_matrix",
    "path_counts",
    "cumulative_distinct",
    "rolling_active",
    "multitouch_attribution",
]


def funnel_stages(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ORDERED funnel timestamps: one row per user who
    completed step 1, with ``t1..tN`` = the earliest time each step
    was reached STRICTLY AFTER the previous step's time (NULL once a
    step is never reached — later columns are then NULL too).

    First-occurrence chaining is the standard funnel semantics: t1 =
    min ts of step1; t_k = min ts of step_k with ts > t_{k-1}. Greedy
    first-occurrence is optimal here: taking the EARLIEST valid time
    for step k can only enlarge the set of valid times for step k+1,
    so if any event assignment completes the funnel, this one does.

    Shape: one filtered min-aggregate per step (partial-aggregated on
    the user key) plus a user-keyed join per step — a fixed number of
    bounded exchanges, nothing proportional to funnel depth × corpus
    in any single task."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    u, t, ty = F.col(user_col), F.col(ts_col), F.col(type_col)
    out = (
        df.filter(ty == steps[0])
        .groupBy(user_col)
        .agg(F.min(t).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        nxt = (
            df.filter(ty == step)
            .select(u.alias("__u"), t.alias("__ts"))
        )
        out = (
            out.join(nxt, out[user_col] == F.col("__u"), "left")
            .withColumn(
                "__hit",
                F.when(F.col("__ts") > F.col(prev), F.col("__ts")),
            )
            .groupBy(*[F.col(c) for c in out.columns])
            .agg(F.min("__hit").alias(f"t{i}"))
        )
    return out


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One-row funnel summary: ``n_stage_k`` = users who reached step
    k (in order), plus ``conv_micros_total`` = summed end-to-end
    conversion time of full completers in MICROseconds — exact int64
    (second-granularity truncation would diverge between engines on
    sub-second timestamps), so the row is bit-reproducible
    cross-engine.

    The loud-overflow contract on ``conv_micros_total`` requires an
    ANSI session (``spark.sql.ansi.enabled=true``, the engine default
    set in ``session.py``): under ANSI an out-of-range
    decimal->long cast errors, while a caller-supplied non-ANSI
    session degrades it to NULL — never a silent 0 either way."""
    stages = funnel_stages(df, steps, user_col, ts_col, type_col)
    n = len(steps)
    aggs = [
        F.count(F.col(f"t{i}")).alias(f"n_stage_{i}") for i in range(1, n + 1)
    ]
    aggs.append(
        # decimal accumulation (cast-before-accumulate): the global
        # sum of per-user conversion times is corpus-scale and long
        # partials wrap past 2^63 while the oracle's hugeint stays
        # exact; the final cast is in-range at any tested SF.
        # coalesce wraps the SUM (the no-converters case), not the
        # cast: an out-of-range decimal->long cast must stay loud —
        # error under ANSI (the engine default, session.py), NULL
        # under a caller-supplied non-ANSI session — never a silent 0.
        F.coalesce(
            F.sum(
                F.when(
                    F.col(f"t{n}").isNotNull(),
                    # cast: parquet NTZ timestamps aren't unix_micros
                    # input; the DIFFERENCE is timezone-shift-invariant
                    F.unix_micros(F.col(f"t{n}").cast("timestamp"))
                    - F.unix_micros(F.col("t1").cast("timestamp")),
                ).cast("decimal(38,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        )
        .cast("long")
        .alias("conv_micros_total")
    )
    return stages.agg(*aggs)


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition table over per-user event
    sequences: one row per observed ``(from_type, to_type)`` pair with
    the transition count, the summed inter-event gap in exact
    MICROseconds, and ``prob`` = count / Σ count over the same
    ``from_type`` (the maximum-likelihood row-stochastic estimate).
    The journey-analysis primitive next to :func:`funnel_stages`:
    funnels test ONE hypothesized path, the transition matrix surfaces
    which paths exist.

    Ordering within a user is (ts, id) — the deterministic tie-break
    every ranked query in the suite uses, so two events on the same
    timestamp order identically on any engine. Gaps are summed as
    int64 micros (``funnel_counts`` precedent: second-granularity
    truncation diverges cross-engine on sub-second data, and float
    accumulation is order-dependent); ``prob`` divides two exact
    int64s once per output row, rounded to 6 dp.

    Scale shape: ONE window pass partitioned by user (state bounded by
    a single user's events — never the stream), then ONE count/sum
    aggregation keyed by the (from, to) pair with map-side combine;
    the per-from totals come from a second tiny aggregation over the
    |types|²-bounded pair table, joined back broadcast. Nothing
    corpus-proportional ever sits in one task."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    steps = df.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
        (
            F.unix_micros(F.lead(ts_col).over(w).cast("timestamp"))
            - F.unix_micros(F.col(ts_col).cast("timestamp"))
        ).alias("__gap"),
    ).filter(F.col("to_type").isNotNull())
    pairs = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_trans"),
        F.sum(F.col("__gap").cast("decimal(38,0)"))
        .cast("long")
        .alias("gap_micros_total"),
    )
    # pin the |types|²-bounded pair table: it feeds BOTH the output and
    # the per-from totals, and Catalyst re-expands shared subtrees per
    # consumer — unpinned, the scan + user window + pair aggregation
    # all run twice (the bigram_logprob lesson; lazy checkpoint so a
    # never-executed plan costs nothing)
    pairs = pairs.localCheckpoint(eager=False)
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_trans").alias("__from_total")
    )
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_trans",
            "gap_micros_total",
            F.round(
                F.col("n_trans").cast("double") / F.col("__from_total"), 6
            ).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


def path_counts(
    df: DataFrame,
    depth: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Frequency of every CONSECUTIVE ``depth``-step event path across
    all users: one row per observed (step_1, …, step_n) sequence with
    its count. :func:`transition_matrix` generalized from pairs to
    n-grams of the event stream — the "what do journeys actually look
    like" query behind funnel design (pick the paths users take, then
    funnel-test the candidates).

    Sliding, not tumbling: a user with events A B C D contributes
    paths (A,B,C) and (B,C,D). Ordering/tie-break is (ts, id), the
    suite convention.

    Scale shape: the ``depth-1`` leads share ONE window (one sort, one
    exchange keyed by user — Spark evaluates same-spec window
    functions in a single Window node), then one count aggregation
    keyed by the path tuple, map-side combined. Output is bounded by
    |types|^depth, not the stream."""
    from pyspark.sql.window import Window

    if depth < 2:
        raise ValueError(f"depth must be >= 2, got {depth}")
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    steps = [F.col(type_col).alias("step_1")] + [
        F.lead(type_col, i).over(w).alias(f"step_{i + 1}")
        for i in range(1, depth)
    ]
    paths = df.select(*steps).filter(
        F.col(f"step_{depth}").isNotNull()
    )
    return paths.groupBy(*[f"step_{i + 1}" for i in range(depth)]).agg(
        F.count(F.lit(1)).alias("n_paths")
    )


def cohort_retention(
    df: DataFrame,
    horizons: Sequence[int] = (1, 3, 7),
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort/retention table: users are grouped by the DAY
    of their first event (their cohort); for each horizon ``k`` the
    count of cohort members active exactly ``k`` days after their
    first day. Returns one row per cohort day:
    ``(cohort_day, n_users, n_day_<k>...)``.

    Shape: per-user first-event day (one min-aggregate), a user-keyed
    join back to the stream, then ONE distinct-user count per
    (cohort, day-offset) — the output is days × horizons rows, so the
    final exchange is tiny however large the stream."""
    if not horizons or any(h <= 0 for h in horizons):
        raise ValueError("horizons must be positive day offsets")
    u, t = F.col(user_col), F.col(ts_col)
    first = df.groupBy(user_col).agg(
        F.to_date(F.min(t)).alias("__cohort")
    )
    joined = df.select(u.alias("__u"), F.to_date(t).alias("__day")).join(
        first, F.col("__u") == F.col(user_col)
    )
    offs = joined.select(
        "__cohort",
        "__u",
        F.datediff(F.col("__day"), F.col("__cohort")).alias("__off"),
    )
    aggs = [F.countDistinct("__u").alias("n_users")]
    for h in horizons:
        aggs.append(
            F.countDistinct(
                F.when(F.col("__off") == h, F.col("__u"))
            ).alias(f"n_day_{h}")
        )
    return offs.groupBy(F.col("__cohort").alias("cohort_day")).agg(*aggs)


def cumulative_distinct(
    df: DataFrame,
    entity_col: str,
    bucket_col: str,
    out_col: str = "cum_distinct",
) -> DataFrame:
    """Cumulative distinct entities per ordered bucket — "users to
    date per day", the growth-accounting curve. The naive form
    (COUNT(DISTINCT user) OVER (ORDER BY day ROWS UNBOUNDED
    PRECEDING)) either isn't supported or re-scans every prior day per
    bucket; the scalable identity is:

        cum_distinct(d) = #{ entities whose FIRST bucket <= d }

    i.e. one entity-keyed min aggregate (map-side combined), one
    bucket-sized histogram of first appearances, and one cumulative
    sum over the BUCKET table (days/hours — bounded), never over
    entities. Buckets with activity but no first-timers still appear
    (the histogram is left-joined onto the distinct bucket list);
    NULL entities/buckets are dropped. Returns (bucket, new_entities,
    cum_distinct)."""
    e = df.select(
        F.col(entity_col).alias("__e"), F.col(bucket_col).alias("__b")
    ).filter(F.col("__e").isNotNull() & F.col("__b").isNotNull())
    firsts = e.groupBy("__e").agg(F.min("__b").alias("__fb"))
    hist = firsts.groupBy("__fb").agg(
        F.count(F.lit(1)).alias("new_entities")
    )
    buckets = e.select("__b").distinct()
    from pyspark.sql.window import Window

    joined = buckets.join(
        hist, buckets["__b"] == hist["__fb"], "left"
    ).select(
        F.col("__b").alias(bucket_col),
        F.coalesce("new_entities", F.lit(0)).alias("new_entities"),
    )
    w = (
        Window.orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the global window runs over the BUCKET table (days) — bounded by
    # the calendar, not the corpus; the suite plan-audit's
    # GLOBAL_WINDOW_OK treatment applies
    return joined.withColumn(out_col, F.sum("new_entities").over(w))


def rolling_active(
    df: DataFrame,
    entity_col: str,
    bucket_col: str,
    window: int = 7,
) -> DataFrame:
    """Rolling distinct actives (DAU / trailing-window WAU/MAU): for
    each bucket, how many distinct entities were active in the
    trailing ``window`` buckets (inclusive). Rolling DISTINCT is not
    algebraic — a per-day sliding COUNT(DISTINCT) window re-scans the
    stream per bucket — so the exact distributed form is the
    WINDOW-CLAIM explode: each distinct (entity, bucket) activity row
    claims the ``window`` buckets it keeps the entity active for,
    then one distinct + one count per claimed bucket. Fan-out is the
    window length (7, 30) — bounded and chosen, never data-driven;
    both shuffles are hash-keyed and map-side combined. (Approximate
    alternative at extreme scale: per-day HLL registers max-merged
    over the trailing window — streaming/sketch.py shape.)

    ``bucket_col`` must be integer-valued (epoch days/hours). Returns
    (bucket, active_now, active_window) for every bucket with any
    activity; claimed buckets beyond the last active one are clipped
    to the observed bucket list."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    act = (
        df.select(
            F.col(entity_col).alias("__e"), F.col(bucket_col).alias("__b")
        )
        .filter(F.col("__e").isNotNull() & F.col("__b").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)  # three consumers below
    )
    cov = (
        act.select(
            "__e",
            F.explode(
                F.sequence(F.col("__b"), F.col("__b") + (window - 1))
            ).alias("__cb"),
        )
        .distinct()
        .groupBy("__cb")
        .agg(F.count(F.lit(1)).alias("active_window"))
    )
    dau = act.groupBy("__b").agg(F.count(F.lit(1)).alias("active_now"))
    return (
        dau.join(cov, dau["__b"] == cov["__cb"])
        .select(
            F.col("__b").alias(bucket_col), "active_now", "active_window"
        )
    )


def multitouch_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    lookback_micros: int,
    model: str = "time_decay",
    half_life_micros: int | None = None,
    cell: int | None = None,
) -> DataFrame:
    """Multi-touch attribution: distribute each conversion's credit
    across the touch events that preceded it within ``lookback``
    — the step beyond the single-credit as-of join
    (operators/asof.py), where "the click gets everything" turns into
    linear / time-decay / position / first / last credit models.

    The touch↔conversion match is a point-in-window join expressed
    through the GRID interval join (operators/intervals.py:
    overlap_join): each conversion opens ``[ts - lookback, ts)``,
    each touch is the degenerate ``[ts, ts+1)``, keys = user — ONE
    hash shuffle on (user, cell), never a per-user all-pairs range
    predicate. Models (exact integer credit — every conversion
    distributes 1,000,000 micro-credits deterministically):

    * ``linear`` — equal split;
    * ``time_decay`` — HARMONIC decay ``w = h/(h + age)`` (one IEEE
      division — cross-engine exact, unlike pow-based exponential
      decay whose libm ulps can flip a rounded weight);
    * ``position`` — 40/40 to first/last touch, 20 split over the
      middle (standard U-shape); single-touch gets everything;
    * ``first_touch`` / ``last_touch`` — all credit to one touch
      (event-time order, event_id tie-break).

    Weights are micro-snapped longs and each touch's credit is
    ``w·1e6 div Σw`` — integer division, so per-channel totals are
    exact sums and the report hashes identically cross-engine.
    Returns per touch channel: ``touches``, ``conversions`` (distinct
    conversions the channel contributed to), ``credit_micro``.

    The reference engine has no join surface at all
    (``/root/reference/src/meta.rs``); events-lane extension."""
    from pyspark.sql.window import Window

    from .intervals import overlap_join

    if model not in ("linear", "time_decay", "position", "first_touch", "last_touch"):
        raise ValueError(f"unknown attribution model {model!r}")
    if model == "time_decay" and not half_life_micros:
        raise ValueError("time_decay needs half_life_micros")
    if lookback_micros <= 0:
        raise ValueError("lookback_micros must be positive")
    base = events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("__m"),
    )
    conv = base.filter(F.col("event_type") == conversion_type).select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        (F.col("__m") - lookback_micros).alias("start"),
        F.col("__m").alias("end"),
    )
    touch = base.filter(F.col("event_type").isin(list(touch_types))).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.col("__m").alias("start"),
        (F.col("__m") + 1).alias("end"),
    )
    grid = cell if cell is not None else max(1, lookback_micros // 4)
    pairs = overlap_join(conv, touch, ["user_id"], cell=grid).select(
        "user_id",
        F.col("conv_id_l").alias("conv_id"),
        F.col("touch_id_r").alias("touch_id"),
        F.col("channel_r").alias("channel"),
        # age = conversion ts - touch ts, in (0, lookback] micros
        (F.col("end_l") - F.col("start_r")).alias("__age"),
    )
    w_conv = Window.partitionBy("conv_id")
    order = Window.partitionBy("conv_id").orderBy(
        F.col("__age").desc(), F.col("touch_id").asc()
    )  # oldest touch first; ties by id
    n = F.count(F.lit(1)).over(w_conv)
    rk = F.row_number().over(order)
    if model == "linear":
        wq = F.lit(1_000_000)
    elif model == "time_decay":
        wq = F.round(
            F.lit(1_000_000.0)
            * F.lit(float(half_life_micros))
            / (F.lit(float(half_life_micros)) + F.col("__age").cast("double"))
        ).cast("long")
    elif model == "position":
        wq = (
            F.when(n == 1, F.lit(1_000_000))
            .when((rk == 1) | (rk == n), F.lit(400_000))
            .otherwise((F.lit(200_000) / (n - 2)).cast("long"))
        )
    elif model == "first_touch":
        wq = F.when(rk == 1, F.lit(1_000_000)).otherwise(F.lit(0))
    else:  # last_touch
        wq = F.when(rk == n, F.lit(1_000_000)).otherwise(F.lit(0))
    # Σw via window (bounded by the conversion's touch count)
    weighted = (
        pairs.withColumn("__wq", wq)
        .withColumn("__sw", F.sum(wq).over(w_conv))
        .withColumn(
            "__credit", F.expr("__wq * 1000000L div __sw").cast("long")
        )
    )
    return (
        weighted.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("touches"),
            F.countDistinct("conv_id").alias("conversions"),
            F.sum(F.col("__credit").cast("decimal(38,0)"))
            .cast("long")
            .alias("credit_micro"),
        )
        .orderBy("channel")
    )

def cohort_ltv(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    max_age_days: int = 7,
) -> DataFrame:
    """Cohort lifetime-value curve — :func:`cohort_retention`'s revenue
    sibling: users cohorted by first-activity day; for each day-offset
    ``age`` within the horizon, that cohort's revenue on the day and
    CUMULATIVE revenue to date (the LTV curve unit economics reads).

    Shape: per-user first-day min-aggregate, a user-keyed join back to
    the stream, one (cohort, age) revenue aggregate in exact integer
    micros, then the running sum over a window partitioned by cohort
    and ordered by age — the window holds at most ``max_age_days + 1``
    rows per cohort, calendar-bounded by construction. Ages with zero
    revenue emit no row (the aggregate never saw them); the cumulative
    curve carries across the gap, and the oracle windows over the same
    present rows, so the two engines agree exactly."""
    from pyspark.sql.window import Window

    base = df.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(user_col).alias("__u"),
        F.to_date(ts_col).alias("__d"),
        F.round(F.col(value_col) * 1_000_000).cast("long").alias("__micros"),
    )
    first = base.groupBy("__u").agg(F.min("__d").alias("__cohort"))
    aged = (
        base.join(first, "__u")
        .withColumn("__age", F.datediff(F.col("__d"), F.col("__cohort")))
        .filter(F.col("__age") <= max_age_days)
    )
    daily = aged.groupBy(
        F.date_format("__cohort", "yyyy-MM-dd").alias("cohort_day"),
        F.col("__age").alias("age"),
    ).agg(
        F.sum("__micros").alias("rev_micros"),
        F.countDistinct("__u").alias("n_active_users"),
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.withColumn(
        "cum_micros", F.sum("rev_micros").over(w)
    ).orderBy("cohort_day", "age")
