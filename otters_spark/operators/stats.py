"""Distribution statistics with an explicit exact/approximate knob.

Exact SQL-standard continuous quantiles (Spark ``percentile``) buffer
the full per-group value multiset in executor memory — fine at test
scale, an OOM hazard when one group holds billions of doubles. The
scale path is ``approx_percentile`` (Greenwald–Khanna sketch,
SIGMOD'01): memory is O(accuracy · log n) per group regardless of
group size, mergeable map-side, error bounded by 1/accuracy of rank.

``group_percentiles`` exposes both behind one call so pipelines can
flip ``exact=False`` when groups outgrow memory without rewriting the
aggregation. SCALE.md ("Percentiles") documents the tradeoff.
"""

from __future__ import annotations

from typing import Sequence

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "acf",
    "chi_square",
    "global_row_number",
    "group_percentiles",
    "group_trend",
    "mann_whitney",
    "robust_outliers",
    "quantile_normalize",
    "woe_iv",
    "ewma_smooth",
    "cusum_scan",
    "forecast_eval",
    "pearson_matrix",
    "weighted_percentiles",
]


def _sort_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_cols: dict[str, Sequence[float]],
    round_to: int | None,
) -> DataFrame:
    """Exact interpolated quantiles via window rank, ALL requested
    columns in one pass: melt to (group, col_name, value) rows, sort
    within each (group, col_name) partition (a SHUFFLE sort —
    spillable, memory-bounded), tag each row with its 0-based rank and
    partition size, and sum the two interpolation neighbors
    ``lo*(1-frac) + hi*frac``. Same numbers as ``percentile`` without
    buffering a per-group multiset; melting also widens the sort
    parallelism to groups × columns and replaces the per-column
    branch-and-join tree with one shuffle + one window + one agg
    (measured ~2× faster at sf0.1 than the per-column form)."""
    from pyspark.sql.window import Window

    cols = list(value_cols)
    melted = _melt(df, group_cols, cols)
    w = Window.partitionBy(*group_cols, "__c").orderBy(F.col("__v"))
    wn = Window.partitionBy(*group_cols, "__c")
    ranked = melted.withColumn("__rn", F.row_number().over(w) - 1).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    aggs = []
    for c in cols:
        for q in value_cols[c]:
            pos = (F.col("__n") - 1) * F.lit(float(q))
            lo = F.floor(pos)
            hi = F.ceil(pos)
            frac = pos - lo
            val = F.when(
                (F.col("__c") == c) & (F.col("__rn") == lo), F.col("__v") * (1 - frac)
            ).when(
                (F.col("__c") == c) & (F.col("__rn") == hi) & (hi != lo),
                F.col("__v") * frac,
            )
            expr = F.sum(val)
            if round_to is not None:
                expr = F.round(expr, round_to)
            aggs.append(expr.alias(f"p{round(q * 100):d}_{c}"))
    return ranked.groupBy(*group_cols).agg(*aggs)


def _melt(df: DataFrame, group_cols: Sequence[str], cols: Sequence[str]) -> DataFrame:
    """(group..., __c, __v) rows, one per non-null value, all value
    columns in one scan."""
    return (
        df.select(
            *group_cols,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("__c"),
                            F.col(c).cast("double").alias("__v"),
                        )
                        for c in cols
                    ]
                )
            ).alias("__p"),
        )
        .select(*group_cols, F.col("__p.__c").alias("__c"), F.col("__p.__v").alias("__v"))
        .filter(F.col("__v").isNotNull() & ~F.isnan(F.col("__v")))
    )


def _binned_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_cols: dict[str, Sequence[float]],
    round_to: int | None,
    n_bins: int = 4096,
    stats_df: DataFrame | None = None,
    return_stats: bool = False,
):
    """Exact interpolated quantiles via two-phase binning — the
    distributed-systems formulation of exact quantiles: histogram the
    values into ``n_bins`` per (group, column), locate which bin holds
    each target rank from the cumulative histogram, then sort ONLY the
    located bins (≈ n/n_bins rows each) to pull the two interpolation
    neighbors. Every stage is a partial-aggregating shuffle or a sort
    of one bin; no task ever sorts a whole group (the window-rank
    path's limit: one task per group) and nothing buffers a multiset
    (the ``percentile`` aggregator's limit). Value-range binning can
    degenerate under extreme outliers — the fallback is sorting a fat
    bin, which is still correct, just slower.

    Group keys ride through the locate/select joins as ONE struct
    column: Spark struct equality compares fields null-safely, so
    groups with NULL keys survive the equi-joins (plain multi-column
    join keys would silently drop them — groupBy keeps NULL groups, but
    ``a.k = b.k`` never matches them).

    Round-12 fusion hooks (``robust_outliers``): ``return_stats=True``
    additionally returns the pinned per-(group, column) stats table
    (``__g?, __c, __mn, __mx, __n``), and ``stats_df`` SUPPLIES that
    table instead of computing it — skipping the stats corpus pass
    entirely when the caller can derive valid stats algebraically. Any
    supplied (mn, mx) need only BOUND the true range (mn <= min(v),
    mx >= max(v), with n exact): binning is a monotone partition of the
    value order, so rank location and the interpolated neighbors — and
    therefore the RESULT — are bit-identical under looser bounds; only
    bin balance degrades (the documented fat-bin fallback)."""
    from pyspark.sql.window import Window

    out_g = list(group_cols)
    cols = list(value_cols)
    m = _melt(df, out_g, cols)
    g: list[str] = []
    if out_g:
        m = m.select(F.struct(*out_g).alias("__g"), "__c", "__v")
        g = ["__g"]
    # stats is (groups × columns) rows but its PLAN is the full melt
    # over the corpus; it feeds BOTH the bucket-assignment join (m2)
    # and the targets derivation, and Catalyst re-expands shared
    # subtrees per consumer (the robust_outliers lesson) — without the
    # pin this query re-ran the melt 8x (round-11 plan audit:
    # rel_percentiles carried 8 parquet scans). Pinning the tiny
    # aggregate collapses that to the 3 passes the algorithm needs
    # (stats, histogram, bin-select).
    if stats_df is not None:
        stats = stats_df
    else:
        stats = m.groupBy(*g, "__c").agg(
            F.min("__v").alias("__mn"),
            F.max("__v").alias("__mx"),
            F.count(F.lit(1)).alias("__n"),
        ).localCheckpoint(eager=False)
    width = F.col("__mx") - F.col("__mn")
    bucket = F.when(width <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor((F.col("__v") - F.col("__mn")) / width * n_bins),
        )
    )
    # stats is now a LogicalRDD leaf (no catalog size estimate), so the
    # planner would default it to a sort-merge join and shuffle the
    # whole melt on (group, column) — a handful of hot keys. Broadcast
    # explicitly: it is groups x columns rows by construction.
    m2 = m.join(F.broadcast(stats), [*g, "__c"]).withColumn("__b", bucket.cast("long"))
    hist = m2.groupBy(*g, "__c", "__b").agg(F.count(F.lit(1)).alias("__bc"))
    wcum = (
        Window.partitionBy(*g, "__c")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.withColumn("__cb", F.coalesce(F.sum("__bc").over(wcum), F.lit(0)))

    # target ranks per (group, column, q): lo gets weight 1-frac (1.0
    # when frac=0), hi gets weight frac and exists only when hi != lo
    def _targets_for(c: str):
        out = []
        for q in value_cols[c]:
            pos = (F.col("__n") - 1) * F.lit(float(q))
            lo = F.floor(pos)
            hi = F.ceil(pos)
            frac = pos - lo
            qn = F.lit(float(q))
            out.append(
                F.struct(qn.alias("__q"), lo.alias("__r"), (1 - frac).alias("__w"), F.lit(True).alias("__e"))
            )
            out.append(
                F.struct(qn.alias("__q"), hi.alias("__r"), frac.alias("__w"), (hi != lo).alias("__e"))
            )
        return F.array(*out)

    tgt_arr = _targets_for(cols[0])
    for c in cols[1:]:
        tgt_arr = F.when(F.col("__c") == c, _targets_for(c)).otherwise(tgt_arr)
    targets = (
        stats.select(*g, "__c", F.explode(tgt_arr).alias("__t"))
        .where(F.col("__t.__e"))
        .select(
            *g,
            "__c",
            F.col("__t.__q").alias("__q"),
            F.col("__t.__r").alias("__r"),
            F.col("__t.__w").alias("__w"),
        )
    )
    # locate the bin holding each rank: equi-join on (group, col) with
    # the cumulative-range predicate as the join filter
    # located is targets-sized (groups × columns × quantiles × ≤2 rows)
    # but its plan contains the whole histogram pass; it is consumed
    # twice (bin-select distinct + interpolation join), so pin it for
    # the same reason as stats above.
    located = targets.join(hist, [*g, "__c"]).where(
        (F.col("__cb") <= F.col("__r")) & (F.col("__r") < F.col("__cb") + F.col("__bc"))
    ).select(
        *g, "__c", "__b", (F.col("__r") - F.col("__cb")).alias("__lr"), "__q", "__w"
    ).localCheckpoint(eager=False)
    # sort only the located bins
    sel = m2.select(*g, "__c", "__b", "__v").join(
        F.broadcast(located.select(*g, "__c", "__b").distinct()),
        [*g, "__c", "__b"],
    )
    wbin = Window.partitionBy(*g, "__c", "__b").orderBy("__v")
    picked = sel.withColumn("__lr", F.row_number().over(wbin) - 1).join(
        F.broadcast(located), [*g, "__c", "__b", "__lr"]
    )
    aggs = []
    names = []
    for c in cols:
        for q in value_cols[c]:
            expr = F.sum(
                F.when(
                    (F.col("__c") == c) & (F.col("__q") == float(q)),
                    F.col("__v") * F.col("__w"),
                )
            )
            if round_to is not None:
                expr = F.round(expr, round_to)
            names.append(f"p{round(q * 100):d}_{c}")
            aggs.append(expr.alias(names[-1]))
    res = picked.groupBy(*g).agg(*aggs)
    if out_g:
        res = res.select(
            *[F.col(f"__g.{c}").alias(c) for c in out_g], *names
        )
    return (res, stats) if return_stats else res


def weighted_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    ps: Sequence[float],
    out_prefix: str = "wp",
) -> DataFrame:
    """Exact WEIGHTED lower-quantiles per group: for each p, the
    smallest value whose cumulative weight reaches ``p * W`` (type-1 /
    lower quantile — no interpolation, so the result is always an
    observed value and the whole computation stays in exact integer /
    decimal arithmetic). The mixture-weighting primitive: "the
    token-weighted median document length", "the byte-weighted p90
    shard size" — questions where every ROW should count by its mass,
    not once.

    Weights must be non-negative integers (token counts, bytes, row
    multiplicities); rows with NULL value/weight or weight <= 0 are
    dropped. Each requested p becomes one output column
    ``{prefix}{round(p*100)}``.

    Scale shape: the corpus-sized work is ONE partial-aggregable
    groupBy (group, value) -> sum(weight); the cumulative window then
    runs over DISTINCT values per group (bounded by value cardinality,
    typically orders of magnitude below row count — the same
    distinct-value compaction mann_whitney rides). The p*W targets are
    computed in decimal (p as an exact decimal literal), so a
    quadrillion-token corpus cannot ulp-flip a threshold the way a
    double multiply could. Pathological per-group value cardinality
    belongs on the binned device (global_row_number) — same ladder as
    group_percentiles, documented not silently swapped.

    Extension surface (the reference has no aggregation,
    /root/reference/src/meta.rs); oracle-checkable as a windowed
    cumulative sum in ANSI SQL."""
    from decimal import Decimal

    from pyspark.sql.window import Window

    gcols = list(group_cols)
    if not ps:
        raise ValueError("weighted_percentiles: ps must be non-empty")
    for p in ps:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"p must be in (0, 1], got {p!r}")
    # cast-before-accumulate discipline (same as mann_whitney/pearson):
    # __w is decimal(38,0) BEFORE any sum, so neither the per-value
    # groupBy sum nor the window cumulative/total sums ever pass
    # through a long that could silently wrap past 2^63 in non-ANSI
    # mode — the docstring's exact-decimal headroom claim holds for
    # the whole accumulation chain, not just the final cast.
    dec = "decimal(38,0)"
    pv = (
        df.filter(
            F.col(value_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
        )
        .groupBy(*gcols, F.col(value_col).alias("__v"))
        .agg(F.sum(F.col(weight_col).cast(dec)).alias("__w"))
    )
    wcum = (
        Window.partitionBy(*gcols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*gcols)
    ranked = pv.select(
        *gcols,
        "__v",
        F.sum("__w").over(wcum).cast(dec).alias("__c"),
        F.sum("__w").over(wall).cast(dec).alias("__W"),
    )
    aggs = []
    for p in ps:
        target = F.col("__W") * F.lit(Decimal(str(p)))
        aggs.append(
            F.min(F.when(F.col("__c") >= target, F.col("__v"))).alias(
                f"{out_prefix}{round(p * 100)}"
            )
        )
    return ranked.groupBy(*gcols).agg(*aggs)


def group_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_cols: dict[str, Sequence[float]],
    exact: bool = True,
    accuracy: int = 10_000,
    round_to: int | None = 4,
    method: str = "bin",
) -> DataFrame:
    """Per-group quantiles for each ``value_cols[col] = [q, ...]``.

    Output columns are named ``p{int(q*100)}_{col}`` (q=0.5 on
    ``price`` → ``p50_price``). ``exact=True`` computes SQL-standard
    interpolated quantiles three ways: ``method='bin'`` (default) is
    the two-phase binned formulation — histogram, locate the target
    bin, sort only that bin — whose parallelism never collapses to one
    task per group and whose memory is bin-sized (the at-scale exact
    path); ``method='sort'`` ranks values with a window over a shuffle
    sort — spillable, but one task per (group, column); ``method='agg'``
    uses Spark's ``percentile`` aggregator (buffers each group's
    multiset — fine for small groups, the memory hazard SCALE.md
    documents, and the fastest at test scale where groups fit easily).
    ``exact=False`` uses ``approx_percentile`` whose rank error is at
    most ``1/accuracy`` with sketch-sized memory — preferred at 100 TB
    when exactness is negotiable."""
    if not value_cols or not any(qs for qs in value_cols.values()):
        raise ValueError("value_cols must request at least one quantile")
    if exact and method == "bin":
        return _binned_percentiles(df, group_cols, value_cols, round_to)
    if exact and method == "sort":
        return _sort_percentiles(df, group_cols, value_cols, round_to)
    aggs: list[Column] = []
    for col, qs in value_cols.items():
        for q in qs:
            name = f"p{round(q * 100):d}_{col}"
            # NaN -> NULL so every method agrees: bin/sort melt away
            # NaN; the percentile aggregators would otherwise sort it
            # last and poison the high quantiles
            v = f"nanvl(cast({col} as double), cast(null as double))"
            if exact:
                expr = F.expr(f"percentile({v}, {q!r})")
            else:
                expr = F.expr(f"approx_percentile({v}, {q!r}, {accuracy})")
            if round_to is not None:
                expr = F.round(expr, round_to)
            aggs.append(expr.alias(name))
    return df.groupBy(*group_cols).agg(*aggs)


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    out_col: str = "pctl",
    n_bins: int = 4096,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-row percent-rank of ``value_col`` within its group — the
    score-calibration step of multi-source curation: a quality score
    of 0.7 means different things from different scorers/sources, but
    "the 93rd percentile of its source" is comparable everywhere, so
    thresholds and mixing ratios transfer across sources. Exact SQL
    ``PERCENT_RANK`` semantics: ``(#strictly-smaller) / (n-1)``, ties
    share their first peer's rank, single-row groups score 0. NULL/NaN
    values pass through with a NULL percentile.

    Scale shape — the two-phase binned rank (the ``shuffle_shards``
    permutation device, per group): a naive
    ``percent_rank().over(partitionBy(group))`` sorts each WHOLE group
    in one task — at web scale one source can be a double-digit corpus
    share. Instead: value-range bins within each group (broadcast
    min/max), cumulative bin offsets over the n_bins-BOUNDED histogram
    window, then a rank window over one (group, bin) — ≈ n/n_bins rows
    — and ``rank = offset + within-bin rank``. Equal values share a
    bin, so tie ranks are exact. Every partition is bin-bounded; no
    task ever holds a whole group."""
    from pyspark.sql.window import Window

    out_g = list(group_cols)
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    v = F.nanvl(F.col(value_col).cast("double"), F.lit(None).cast("double"))
    base = df.withColumn("__v", v)
    good = base.filter(F.col("__v").isNotNull())
    g: list[str] = []
    keyed = good
    if out_g:
        keyed = good.withColumn("__g", F.struct(*out_g))
        g = ["__g"]
    stats = keyed.groupBy(*g).agg(
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
        F.count(F.lit(1)).alias("__n"),
    )
    width = F.col("__mx") - F.col("__mn")
    bucket = F.when(width <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor((F.col("__v") - F.col("__mn")) / width * n_bins),
        )
    )
    m = keyed.join(F.broadcast(stats), g) if g else keyed.crossJoin(
        F.broadcast(stats)
    )
    m = m.withColumn("__b", bucket.cast("long"))
    hist = m.groupBy(*g, "__b").agg(F.count(F.lit(1)).alias("__bc"))
    wcum = (
        Window.partitionBy(*g)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.select(
        *g, "__b", F.coalesce(F.sum("__bc").over(wcum), F.lit(0)).alias("__off")
    )
    wbin = Window.partitionBy(*g, "__b").orderBy("__v")
    ranked = (
        m.join(hist, [*g, "__b"])
        .withColumn("__r", F.col("__off") + F.rank().over(wbin))
    )
    pct = F.when(
        F.col("__n") > 1,
        (F.col("__r") - 1).cast("double") / (F.col("__n") - 1),
    ).otherwise(F.lit(0.0))
    if round_to is not None:
        pct = F.round(pct, round_to)
    ranked = ranked.select(*df.columns, pct.alias(out_col))
    nulls = base.filter(F.col("__v").isNull()).select(
        *df.columns, F.lit(None).cast("double").alias(out_col)
    )
    return ranked.unionByName(nulls)


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: float = 3.0,
    method: str = "bin",
) -> DataFrame:
    """Median/MAD outlier detection per group — the robust alternative
    to z-scores (mean/stddev move with the outliers they are supposed
    to flag; the median absolute deviation does not break until half
    the data is bad). Adds ``group_median``, ``group_mad``,
    ``abs_resid`` and ``is_outlier`` (``|v - median| > k·1.4826·MAD``,
    1.4826 the Gaussian consistency constant) to every input row;
    NULL values are never outliers.

    Two :func:`group_percentiles` passes (medians, then medians of
    absolute residuals) — both ``method='bin'`` by default, so
    per-group parallelism never collapses to one task. Group stats
    join back with null-safe equality (NULL group keys are groups,
    not dropped rows — the eqNullSafe discipline)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    gp = list(group_cols)

    def _nsjoin(left: DataFrame, right: DataFrame) -> DataFrame:
        # right is always a group-stat table (one row per group) whose
        # plan leaf is a checkpointed RDD with no size estimate — left
        # unhinted the planner sort-merges, shuffling the whole corpus
        # on the group key (two SMJs in the round-11 plan audit of
        # events_anomaly_mad). Broadcast what we know is group-sized.
        right = F.broadcast(right)
        cond = None
        for c in gp:
            e = left[c].eqNullSafe(right[c])
            cond = e if cond is None else cond & e
        out = left.join(right, cond)
        for c in gp:
            out = out.drop(right[c])
        return out

    # the group-stat tables are group-count-sized but their PLANS are
    # the whole multi-stage percentile pipeline; every downstream
    # reference would re-execute that pipeline (Catalyst does not
    # dedup subtrees — the bigram/CC lesson), and the MAD pass
    # references the median-joined corpus several times internally.
    # Pinning the tiny tables with lazy localCheckpoints collapses the
    # re-execution to scan+broadcast-join per reference.
    if method == "bin":
        # Round-12 fusion (r11 VERDICT item 4): the MAD pass's own
        # stats scan is a FULL corpus pass whose outputs are derivable
        # algebraically from the median pass's stats — for every group,
        # 0 <= |v - med| <= max(mx - med, med - mn) and the non-null
        # count is unchanged (abs_resid is null/NaN exactly where v
        # is). Loose-but-valid bounds leave the binned result
        # bit-identical (see _binned_percentiles: binning is a monotone
        # partition of the value order; only bin balance changes), so
        # deriving the MAD stats removes one corpus pass and one
        # broadcast-build barrier from every call.
        med_raw, vstats = _binned_percentiles(
            df, gp, {value_col: [0.5]}, round_to=None, return_stats=True
        )
        med = med_raw.withColumnRenamed(
            f"p50_{value_col}", "group_median"
        ).localCheckpoint(eager=False)
        j = _nsjoin(df, med).withColumn(
            "abs_resid", F.abs(F.col(value_col) - F.col("group_median"))
        )
        g = ["__g"] if gp else []
        med_keyed = med.select(
            *([F.struct(*gp).alias("__g")] if gp else []), "group_median"
        )
        rstats = (
            (vstats.join(med_keyed, g) if g else vstats.crossJoin(med_keyed))
            .select(
                *g,
                F.lit("abs_resid").alias("__c"),
                F.lit(0.0).alias("__mn"),
                F.greatest(
                    F.col("__mx") - F.col("group_median"),
                    F.col("group_median") - F.col("__mn"),
                ).alias("__mx"),
                "__n",
            )
            # group-sized; pinned so its two consumers inside the MAD
            # binned pass (bucket-join build + targets) don't re-run
            # the tiny join (and its broadcast stage) twice
            .localCheckpoint(eager=False)
        )
        mad = (
            _binned_percentiles(
                j, gp, {"abs_resid": [0.5]}, round_to=None, stats_df=rstats
            )
            .withColumnRenamed("p50_abs_resid", "group_mad")
            .localCheckpoint(eager=False)
        )
    else:
        med = (
            group_percentiles(df, gp, {value_col: [0.5]}, round_to=None, method=method)
            .withColumnRenamed(f"p50_{value_col}", "group_median")
            .localCheckpoint(eager=False)
        )
        j = _nsjoin(df, med).withColumn(
            "abs_resid", F.abs(F.col(value_col) - F.col("group_median"))
        )
        mad = (
            group_percentiles(j, gp, {"abs_resid": [0.5]}, round_to=None, method=method)
            .withColumnRenamed("p50_abs_resid", "group_mad")
            .localCheckpoint(eager=False)
        )
    out = _nsjoin(j, mad)
    return out.withColumn(
        "is_outlier",
        F.when(
            F.col(value_col).isNull(), F.lit(False)
        ).otherwise(
            F.col("abs_resid") > F.lit(k) * F.lit(1.4826) * F.col("group_mad")
        ),
    )


def ewma_smooth(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str | Sequence[str],
    value_col: str,
    alpha: float = 0.5,
    out_col: str = "ewma",
) -> DataFrame:
    """Adjusted exponentially-weighted moving average per key:
    ``ewma_i = sum_{j<=i} (1-a)^(i-j) x_j / sum_{j<=i} (1-a)^(i-j)``
    (pandas ``ewm(alpha).mean()`` semantics) as ONE keyed window pass.

    The recurrence is made window-expressible by rescaling: with
    ``w = 1-a``, ``ewma_i = sum(x_j w^-j) / sum(w^-j)`` — the common
    ``w^i`` cancels in the ratio, so two cumulative sums over the same
    window suffice.  The default ``alpha=0.5`` makes every weight an
    exact power of two: ``pow(2.0, rn)`` is exactly representable and
    ``x * 2^k`` rescales only the exponent, so the smoothed values
    reproduce bit-for-bit across engines (the oracle-pairing
    discipline) — any other alpha works but inherits libm ``pow``
    ULP noise.

    Scale contract: the rescaled weights span ``w^-n`` for an n-row
    series, overflowing doubles near n ≈ 1000/log2(1/w) — this
    operator is for BOUNDED per-key series (per-day rollups, trailing
    windows), not raw event streams; aggregate first (the suite's
    ``events_ewma_daily`` smooths a 1-row-per-day table), or smooth
    unbounded streams with the O(1)-state streaming recurrence
    (``applyInPandasWithState``) instead.  A guard raises past
    ``max_len`` rows per key rather than silently returning inf.
    """
    from pyspark.sql.window import Window

    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    keys = list(keys)
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = 1.0 - alpha
    # past this rank w^-rn overflows; raise loudly instead of
    # silently returning inf
    max_len = int(900 / -math.log2(w))
    order = Window.partitionBy(*keys).orderBy(*order_cols)
    cum = order.rowsBetween(Window.unboundedPreceding, 0)
    rn = F.row_number().over(order)
    scaled = F.pow(F.lit(w), -rn)
    not_null = F.col(value_col).isNotNull()
    for oc in order_cols:
        not_null = not_null & F.col(oc).isNotNull()
    out = (
        df.filter(not_null)
        .withColumn("__w", scaled)
        .withColumn(
            out_col,
            F.sum(F.col(value_col) * F.col("__w")).over(cum)
            / F.sum("__w").over(cum),
        )
        .withColumn("__rn", rn)
    )
    guard = F.when(
        F.col("__rn") > max_len,
        F.raise_error(
            F.lit(
                f"ewma_smooth: series longer than {max_len} rows per key "
                "overflows the rescaled weights — pre-aggregate or use the "
                "streaming recurrence"
            )
        ).cast("double"),
    ).otherwise(F.col(out_col))
    return out.withColumn(out_col, guard).drop("__w", "__rn")


def cusum_scan(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str | Sequence[str],
    value_col: str,
    target_col: str,
    slack: int | str = 0,
    threshold: int | str | None = None,
) -> DataFrame:
    """Two-sided CUSUM changepoint scan per key (Page 1954): flag the
    point where a series' mean has SHIFTED from ``target_col``, the
    monitoring primitive behind pipeline drift alarms (ingest volume
    drops, quality-score regressions, label-balance shifts).

    The textbook form is a reset recurrence —
    ``S+_i = max(0, S+_{i-1} + (x_i - target - slack))`` — which looks
    stream-only. It is window-expressible through the running-minimum
    identity ``S+_i = C_i - min(0, min_{j<=i} C_j)`` where ``C`` is
    the plain cumulative sum of the deviations: whenever the cumsum
    dips to a new low the recurrence would have clamped at zero, so
    subtracting the running floor replays every reset. Two cumulative
    windows per side over ONE keyed sort — the sessionization plan
    shape — instead of an iterative per-row pass.

    All arithmetic is INTEGER (``value_col``, ``target_col``,
    ``slack``, ``threshold`` must be longs in the caller's micro
    units): the sums are exact, so alarms cannot wobble with partial
    aggregation order and the output hashes identically cross-engine.

    Returns the input rows plus ``s_pos``/``s_neg`` (the upward and
    downward CUSUM statistics) and, when ``threshold`` is given,
    ``alarm_up``/``alarm_down`` flags. Rows with a NULL value, order,
    or target are dropped (they would poison every later cumsum).

    Scale contract: one shuffle on the keys; per-key state inside the
    window is two longs. Series length per key is unbounded (no
    weight-overflow hazard — contrast :func:`ewma_smooth`); for
    unbounded STREAMS the same identity runs as an O(1)-state
    ``applyInPandasWithState`` recurrence.

    The reference engine has no time-series surface
    (``/root/reference/src/meta.rs`` — vector/metadata scans only);
    extension surface for the events lane, oracle-checked against the
    identical window algebra in DuckDB.
    """
    from pyspark.sql.window import Window

    keys = list(keys)
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    not_null = F.col(value_col).isNotNull() & F.col(target_col).isNotNull()
    for oc in order_cols:
        not_null = not_null & F.col(oc).isNotNull()
    order = Window.partitionBy(*keys).orderBy(*order_cols)
    cum = order.rowsBetween(Window.unboundedPreceding, 0)
    # slack/threshold: int -> fixed, str -> per-key column (allowances
    # usually scale with the per-key target level)
    k = F.col(slack) if isinstance(slack, str) else F.lit(slack)
    dev_up = F.col(value_col) - F.col(target_col) - k
    dev_dn = -(F.col(value_col) - F.col(target_col) + k)
    out = (
        df.filter(not_null)
        .withColumn("__cp", F.sum(dev_up).over(cum))
        .withColumn("__cn", F.sum(dev_dn).over(cum))
        .withColumn(
            "s_pos", F.col("__cp") - F.least(F.lit(0), F.min("__cp").over(cum))
        )
        .withColumn(
            "s_neg", F.col("__cn") - F.least(F.lit(0), F.min("__cn").over(cum))
        )
        .drop("__cp", "__cn")
    )
    if threshold is not None:
        h = F.col(threshold) if isinstance(threshold, str) else F.lit(threshold)
        out = out.withColumn(
            "alarm_up", (F.col("s_pos") > h).cast("boolean")
        ).withColumn("alarm_down", (F.col("s_neg") > h).cast("boolean"))
    return out


def pearson_matrix(
    df: DataFrame,
    value_cols: Sequence[str],
    round_to: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlation matrix over INTEGER measure
    columns, melted to ``(col_a, col_b, n, corr)`` rows with
    ``col_a <= col_b`` — the feature-redundancy screen run before
    training a quality classifier or picking mixture-weight signals.

    ONE scan, one reduce-to-a-single-row: every pairwise moment
    (``sum x``, ``sum x^2``, ``sum x*y``) is an exact DECIMAL(38,0)
    aggregate — integer inputs make the sums order-independent, so
    the result is deterministic under any partitioning — then the
    closed form ``(n*sxy - sx*sy) / sqrt((n*sxx - sx^2) *
    (n*syy - sy^2))`` runs on the 1-row result in double. Contrast
    ``df.stat.corr``: one job per pair; and MLlib's Statistics.corr:
    an RDD path that materializes a dense row matrix. A constant
    column (zero variance) yields NULL corr, SQL-style.

    Complete-case semantics: rows with a NULL in ANY measure are
    dropped before aggregation (pairwise-complete would silently give
    each cell a different n — a footgun for downstream use).

    Inputs must already be integral (cents/micro discipline —
    ``round(x*100).cast('long')`` upstream); each factor is cast to
    decimal(38,0) BEFORE the product, so neither the per-row x·y nor
    the sums can silently wrap a long in non-ANSI mode. k columns → k(k+1)/2 moment
    expressions in a single partial-aggregable projection; the shuffle
    is k^2 numbers per task, the cheapest possible shape at 100 TB.

    The reference engine has no aggregation surface at all
    (``/root/reference/src/meta.rs``); extension surface for the
    relational lane, oracle-checked against the identical integer
    closed form in DuckDB (NOT its built-in ``corr()``, whose
    Welford-style accumulation differs in final ulps)."""
    cols = list(value_cols)
    if len(cols) < 2:
        raise ValueError("pearson_matrix needs at least two columns")
    dec = "decimal(38,0)"
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, a in enumerate(cols):
        aggs.append(F.sum(F.col(a).cast(dec)).alias(f"s_{i}"))
        for j in range(i, len(cols)):
            b = cols[j]
            # cast BEFORE multiplying (the acf discipline): a long*long
            # product silently wraps past 2^63 in non-ANSI mode; the
            # decimal product gets full headroom per row as well as in
            # the sum
            aggs.append(
                F.sum(F.col(a).cast(dec) * F.col(b).cast(dec)).alias(
                    f"p_{i}_{j}"
                )
            )
    row = df.filter(cond).agg(*aggs)
    pairs = []
    for i, a in enumerate(cols):
        for j in range(i, len(cols)):
            b = cols[j]
            # num and the two variance terms are EXACT decimal
            # arithmetic on the exact moments — the double closed form
            # (n*sxy - sx*sy after casting to double) cancels
            # catastrophically when variance/mean^2 < ~1e-15 (e.g.
            # surrogate-key-magnitude measures); only the final
            # sqrt/divide runs in double
            n_d = F.col("n").cast(dec)
            sx, sy = F.col(f"s_{i}"), F.col(f"s_{j}")
            num_d = n_d * F.col(f"p_{i}_{j}") - sx * sy
            vx_d = n_d * F.col(f"p_{i}_{i}") - sx * sx
            vy_d = n_d * F.col(f"p_{j}_{j}") - sy * sy
            # decimal(38,0) arithmetic past 38 digits yields NULL in
            # non-ANSI mode — indistinguishable from the zero-variance
            # NULL unless guarded. n*sxx crossing 1e38 needs ~1e10 rows
            # of ~1e14 per-row products; fail LOUDLY there instead of
            # reporting a silent NULL corr (ANSI mode throws on its
            # own; this makes the legacy mode equally honest).
            overflow = (F.col("n") > 0) & (
                num_d.isNull() | vx_d.isNull() | vy_d.isNull()
            )
            num = num_d.cast("double")
            den = F.sqrt(vx_d.cast("double")) * F.sqrt(vy_d.cast("double"))
            corr = F.when(
                overflow,
                F.assert_true(
                    F.lit(False),
                    F.lit(
                        f"pearson_matrix: decimal(38,0) overflow on "
                        f"({a}, {b}) — rescale inputs"
                    ),
                ).cast("double"),
            ).otherwise(F.when(den > 0, F.round(num / den, round_to)))
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col("n").cast("long").alias("n"),
                    corr.alias("corr"),
                )
            )
    return row.select(
        F.explode(F.array(*pairs)).alias("cell")
    ).select("cell.*")


def global_row_number(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    out_col: str = "row_num",
    descending: bool = False,
    n_bins: int = 1024,
) -> DataFrame:
    """Exact corpus-wide ROW_NUMBER over the total order
    ``(value_col [DESC], tiebreak_col ASC)`` — without the
    ``Window.orderBy(...)``-with-no-partition that funnels the whole
    input through ONE task (forbidden suite-wide by the plan audit).

    Two-phase binned rank, the ``quantile_normalize`` device with a
    total order: value-range bins from a broadcast (min, max)
    aggregate, cumulative bin offsets over the n_bins-BOUNDED
    histogram window, then ``row_number`` within one (bin) —
    ≈ n/n_bins rows per task — and ``global row = offset + within-bin
    row``. Equal values always share a bin (the bucket is a function
    of the value alone), so the tiebreak never crosses a bin
    boundary and the composite order is exact.

    ``value_col`` must be non-NULL (rank of NULL in a total order is
    a policy, not arithmetic — filter or coalesce upstream; raises at
    plan build if the column is nullable-with-nulls is NOT checked,
    the NULL rows would sort first and silently shift every rank).
    Descending orders negate the value, so ``descending=True`` is
    exact for numeric inputs."""
    from pyspark.sql.window import Window

    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    v = F.col(value_col).cast("double")
    if descending:
        v = -v
    # pin the input (lazy): it feeds the stats aggregate, the binned
    # main branch, and (through it) the histogram — unpinned, Catalyst
    # re-expands the caller's subtree once per consumer, and CHAINED
    # rank calls (rank by several dimensions, the RFM shape) multiply
    # that re-expansion per level (measured: 130 FileScans for three
    # chained calls; pinned: 10)
    base = df.localCheckpoint(eager=False).withColumn("__grn_v", v)
    stats = base.agg(
        F.min("__grn_v").alias("__mn"), F.max("__grn_v").alias("__mx")
    )
    width = F.col("__mx") - F.col("__mn")
    bucket = F.when(width <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor((F.col("__grn_v") - F.col("__mn")) / width * n_bins),
        )
    )
    m = base.crossJoin(F.broadcast(stats)).withColumn(
        "__grn_b", bucket.cast("long")
    )
    hist = m.groupBy("__grn_b").agg(F.count(F.lit(1)).alias("__bc"))
    wcum = (
        Window.orderBy("__grn_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the histogram window is n_bins-bounded (<= 1024 rows) — the one
    # sanctioned "global" window shape, same as quantile_normalize
    hist = hist.select(
        "__grn_b",
        F.coalesce(F.sum("__bc").over(wcum), F.lit(0)).alias("__off"),
    )
    wbin = Window.partitionBy("__grn_b").orderBy(
        F.col("__grn_v").asc(), F.col(tiebreak_col).asc()
    )
    ranked = (
        m.join(hist, "__grn_b")
        .withColumn(out_col, F.col("__off") + F.row_number().over(wbin))
    )
    return ranked.select(*df.columns, out_col)

def acf(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    lags: Sequence[int],
    round_to: int = 6,
) -> DataFrame:
    """Per-key autocorrelation function over a REGULAR integer-indexed
    series (day number, hour bucket, ...): Pearson correlation between
    the series and its lag-L shift, for each requested lag — the
    seasonality/momentum screen run before picking an anomaly window
    or an EWMA half-life.

    Plan shape: ONE bounded window per key (ordered by ``order_col``;
    series length per key is calendar-bounded — days/hours — never
    corpus-sized), all lag columns from that single window spec, one
    explode to ``(key, lag, y, y_lag)`` rows, one aggregation. Moments
    are exact DECIMAL(38,0) sums over integer inputs (micros
    discipline), so the correlation is deterministic under any
    partitioning and reproducible cross-engine — the same closed form
    as ``pearson_matrix``; never ``corr()``, whose Welford accumulation
    differs in final ulps between engines.

    Pairs where the lag falls off the front of the series are dropped
    (n shrinks by L per key, standard "short" ACF without circular
    wrap). ``value_col`` must be integral; gaps in ``order_col`` are
    the caller's contract (lag = ROW shift — densify upstream with
    gap_fill if the calendar has holes).

    The reference engine has no aggregation surface
    (``/root/reference/src/meta.rs``); extension surface for the
    time-series lane, oracle-checked against the identical integer
    closed form in DuckDB."""
    from pyspark.sql.window import Window

    keys = list(key_cols)
    lag_list = sorted(set(int(x) for x in lags))
    if not lag_list or lag_list[0] < 1:
        raise ValueError("lags must be positive integers")
    w = Window.partitionBy(*keys).orderBy(order_col)
    # lag columns first (generators can't host window expressions);
    # every lag shares ONE window spec, so this is a single Window node
    lagged = df.select(
        *keys,
        F.col(value_col).cast("long").alias("__y"),
        *[
            F.lag(value_col, lg).over(w).cast("long").alias(f"__yl_{lg}")
            for lg in lag_list
        ],
    )
    structs = [
        F.struct(
            F.lit(lg).alias("lag"),
            F.col("__y"),
            F.col(f"__yl_{lg}").alias("__yl"),
        )
        for lg in lag_list
    ]
    dec = "decimal(38,0)"
    pairs = (
        lagged.select(*keys, F.explode(F.array(*structs)).alias("p"))
        .select(*keys, "p.lag", "p.__y", "p.__yl")
        .filter(F.col("__yl").isNotNull())
    )
    m = pairs.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__y").cast(dec)).alias("sx"),
        F.sum(F.col("__yl").cast(dec)).alias("sy"),
        # cast BEFORE multiplying: long*long overflow wraps silently in
        # non-ANSI mode, and daily/monthly micro sums square past 2^63
        F.sum(F.col("__y").cast(dec) * F.col("__y").cast(dec)).alias("sxx"),
        F.sum(F.col("__yl").cast(dec) * F.col("__yl").cast(dec)).alias("syy"),
        F.sum(F.col("__y").cast(dec) * F.col("__yl").cast(dec)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return m.select(
        *keys,
        "lag",
        F.col("n").cast("long").alias("n"),
        F.when(den > 0, F.round(num / den, round_to)).alias("acf"),
    )


def group_trend(
    df: DataFrame,
    key_cols: Sequence[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line ``y = intercept +
    slope * x`` with goodness-of-fit — slope of daily revenue per
    nation, token-count drift per source, any "is this lane growing"
    question — from ONE algebraic aggregation.

    Exact DECIMAL(38,0) moments over integer inputs (x = day/bucket
    index, y = micros), closed forms on the per-group moment row:
    ``slope = (n*sxy - sx*sy) / (n*sxx - sx^2)``, ``intercept =
    (sy - slope*sx) / n``, ``r2 = (n*sxy - sx*sy)^2 / ((n*sxx - sx^2)
    * (n*syy - sy^2))``. Never MLlib LinearRegression here: that is an
    iterative driver-coordinated fit; a 2-parameter OLS is a
    scan-speed aggregate. Zero-variance x (or a single point) yields
    NULL slope; zero-variance y yields r2 = NULL with slope 0 — the
    SQL-honest answers.

    Shuffle is 6 numbers per group per task (map-side combined) — the
    cheapest shape at 100 TB. NULL x or y drops the row (complete-case,
    same policy as pearson_matrix). Extension surface (reference has
    no aggregation: ``/root/reference/src/meta.rs``), oracle-checked
    against the identical integer closed form in DuckDB."""
    keys = list(key_cols)
    dec = "decimal(38,0)"
    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    m = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),
        # decimal BEFORE the product — see acf's overflow note
        F.sum(x.cast(dec) * x.cast(dec)).alias("sxx"),
        F.sum(y.cast(dec) * y.cast(dec)).alias("syy"),
        F.sum(x.cast(dec) * y.cast(dec)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    slope = F.when(denx > 0, num / denx)
    return m.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        F.round(slope, round_to).alias("slope"),
        F.when(denx > 0, F.round((sy - slope * sx) / n, round_to)).alias(
            "intercept"
        ),
        F.when(
            (denx > 0) & (deny > 0),
            F.round((num * num) / (denx * deny), round_to),
        ).alias("r2"),
    )


def mann_whitney(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    n_bins: int = 1024,
    round_to: int = 6,
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two groups — the
    distribution-free A/B comparison (did the treatment shift session
    values?) that doesn't assume normality the way a t-test does.

    The classic formulation needs every row's tie-averaged rank over
    the pooled values — a corpus-wide total order. A naive
    ``Window.orderBy`` with no partition funnels 100 TB through ONE
    task (forbidden suite-wide by the plan audit), so ranks come from
    the two-phase binned device (``global_row_number``'s shape) run on
    the VALUE-LEVEL table: aggregate to one row per distinct value
    (count + per-group count), bin by value range, cumulative bin
    offsets over the n_bins-BOUNDED histogram window, within-bin
    running sums ordered by value. Ranks stay tie-exact because a
    value's rows never straddle bins (bucket is a function of the
    value alone).

    Integer-exact core: doubled average rank ``rank2(v) = 2*cum_before
    + cnt + 1`` is always an integer; ``R2_a = sum(n_a(v) * rank2(v))``
    and ``U2_a = R2_a - n_a*(n_a+1)`` are exact longs, so the U
    statistic is bit-identical cross-engine. The normal approximation
    ``z = (U_a - n_a*n_b/2) / sigma`` uses the tie-corrected variance
    ``n_a*n_b/12 * ((n+1) - sum(t^3 - t)/(n*(n-1)))`` (no continuity
    correction — documented, matched in the oracle) and is rounded;
    ``auc = U_a / (n_a*n_b)`` is the common-language effect size (the
    probability a random A value exceeds a random B value, ties at
    half weight).

    Returns ONE row: ``n_a, n_b, u2_a, auc, z``. Extension surface
    (reference has no aggregation: ``/root/reference/src/meta.rs``)."""
    from pyspark.sql.window import Window

    two = df.filter(
        F.col(group_col).isin(group_a, group_b)
        & F.col(value_col).isNotNull()
    )
    per_value = two.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(
            F.when(F.col(group_col) == group_a, 1).otherwise(0)
        ).alias("__na"),
    )
    # two-phase binned cumulative count over the distinct-value table
    # (same device as global_row_number; the histogram window is
    # n_bins-bounded, the within-bin window holds ~distinct/n_bins rows)
    per_value = per_value.localCheckpoint(eager=False)
    stats = per_value.agg(
        F.min("__v").alias("__mn"), F.max("__v").alias("__mx")
    )
    width = F.col("__mx") - F.col("__mn")
    bucket = F.when(width <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor((F.col("__v") - F.col("__mn")) / width * n_bins),
        )
    )
    m = per_value.crossJoin(F.broadcast(stats)).withColumn(
        "__b", bucket.cast("long")
    )
    hist = m.groupBy("__b").agg(F.sum("__cnt").alias("__bc"))
    wcum = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    hist = hist.select(
        "__b", F.coalesce(F.sum("__bc").over(wcum), F.lit(0)).alias("__off")
    )
    wbin = (
        Window.partitionBy("__b")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        m.join(hist, "__b")
        .withColumn(
            "__before",
            F.col("__off") + F.coalesce(F.sum("__cnt").over(wbin), F.lit(0)),
        )
        .withColumn("__rank2", 2 * F.col("__before") + F.col("__cnt") + 1)
    )
    dec = "decimal(38,0)"
    row = ranked.agg(
        F.sum("__na").alias("__n_a"),
        F.sum(F.col("__cnt") - F.col("__na")).alias("__n_b"),
        # R2_a is O(n_a * n): cast to decimal BEFORE multiplying so a
        # pooled n around 2e9 can't silently wrap a long product in
        # non-ANSI mode (same discipline as the ties sum below)
        F.sum(
            F.col("__na").cast(dec) * F.col("__rank2").cast(dec)
        ).alias("__r2a"),
        F.sum(
            (
                F.col("__cnt").cast(dec)
                * F.col("__cnt").cast(dec)
                * F.col("__cnt").cast(dec)
                - F.col("__cnt").cast(dec)
            )
        ).alias("__ties"),
    )
    n_a = F.col("__n_a").cast("double")
    n_b = F.col("__n_b").cast("double")
    nn = n_a + n_b
    u2 = F.col("__r2a") - F.col("__n_a").cast(dec) * (
        F.col("__n_a").cast(dec) + 1
    )
    u = u2.cast("double") / 2.0
    mu = n_a * n_b / 2.0
    var = (
        n_a
        * n_b
        / 12.0
        * ((nn + 1) - F.col("__ties").cast("double") / (nn * (nn - 1)))
    )
    both = (n_a > 0) & (n_b > 0)
    return row.select(
        F.col("__n_a").cast("long").alias("n_a"),
        F.col("__n_b").cast("long").alias("n_b"),
        u2.cast("long").alias("u2_a"),
        # guard the empty-group case: 0/0 is NaN, not NULL — a lane
        # filtering to a mistyped label should read as "no test ran"
        F.when(both, F.round(u / (n_a * n_b), round_to)).alias("auc"),
        F.when(both & (var > 0), F.round((u - mu) / F.sqrt(var), round_to))
        .alias("z"),
    )

def chi_square(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Chi-squared test of independence between two categorical
    columns, plus Cramér's V effect size — the categorical sibling of
    :func:`mann_whitney` (is event type independent of weekday? is
    source correlated with language?).

    One corpus scan builds the contingency cells; margins and the
    total derive from the CELL table (|A| x |B| rows — never a second
    corpus pass). Zero cells still contribute their expected count, so
    the observed table is completed by cross-joining the two margin
    vectors (bounded by the category cardinalities) and left-joining
    the cells. Counts are exact longs; the statistic mirrors its
    double arithmetic op-for-op in the oracle:
    ``chi2 = sum((obs - exp)^2 / exp)`` with
    ``exp = row_total * col_total / n``, ``dof = (|A|-1)(|B|-1)``,
    ``V = sqrt(chi2 / (n * min(|A|-1, |B|-1)))``.

    High-cardinality columns are the caller's contract (the cell table
    is |A| x |B|): bucket first — a chi-squared test over million-way
    categories is statistically meaningless anyway. Returns ONE row:
    ``n, n_a, n_b, dof, chi2, cramers_v``. Extension surface
    (reference has no aggregation: ``/root/reference/src/meta.rs``)."""
    base = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    cells = (
        base.groupBy(
            F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
        )
        .agg(F.count(F.lit(1)).alias("__obs"))
        # feeds margins AND the completed table — pin it (lazy)
        .localCheckpoint(eager=False)
    )
    row_m = cells.groupBy("__a").agg(F.sum("__obs").alias("__ra"))
    col_m = cells.groupBy("__b").agg(F.sum("__obs").alias("__cb"))
    grid = row_m.crossJoin(col_m).join(cells, ["__a", "__b"], "left")
    total = cells.agg(
        F.sum("__obs").alias("__n"),
        F.countDistinct("__a").alias("__ka"),
        F.countDistinct("__b").alias("__kb"),
    )
    exp = (
        F.col("__ra").cast("double")
        * F.col("__cb").cast("double")
        / F.col("__n").cast("double")
    )
    obs = F.coalesce(F.col("__obs"), F.lit(0)).cast("double")
    term = (obs - exp) * (obs - exp) / exp
    stat = (
        grid.crossJoin(F.broadcast(total))
        .agg(
            F.sum(term).alias("__chi2"),
            F.first("__n").alias("n"),
            F.first("__ka").alias("n_a"),
            F.first("__kb").alias("n_b"),
        )
    )
    mindim = F.least(F.col("n_a") - 1, F.col("n_b") - 1)
    return stat.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        ((F.col("n_a") - 1) * (F.col("n_b") - 1)).cast("long").alias("dof"),
        F.round("__chi2", round_to).alias("chi2"),
        F.when(
            mindim > 0,
            F.round(
                F.sqrt(
                    F.col("__chi2")
                    / (F.col("n").cast("double") * mindim.cast("double"))
                ),
                round_to,
            ),
        ).alias("cramers_v"),
    )

def woe_iv(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Weight-of-evidence / information-value screen of a categorical
    (or pre-bucketed) feature against a binary label — the classic
    "does this feature separate the classes, and how monotonically"
    audit run before adding a signal to a quality classifier or a
    mixture-weight model.

    One scan to the (bucket, label) cells; positives/negatives totals
    derive from the BUCKET table (never a second pass). Per bucket:
    ``woe = ln((pos_b/pos) / (neg_b/neg))`` and the IV contribution
    ``iv_term = (pos_b/pos - neg_b/neg) * woe``. Buckets with zero
    positives OR zero negatives get NULL woe/iv_term (the honest
    answer — infinite evidence is a data problem, and Laplace
    smoothing silently changes everyone else's denominators;
    pre-bucket rare categories instead). Total IV = sum of non-NULL
    iv_terms, the caller's one-line aggregate.

    Counts are exact longs; the ratios/ln run in double, mirrored
    op-for-op in the oracle. High-cardinality features are the
    caller's contract (bucket first) — same posture as
    :func:`chi_square`. Extension surface (reference has no
    aggregation: ``/root/reference/src/meta.rs``)."""
    base = df.filter(
        F.col(feature_col).isNotNull() & F.col(label_col).isNotNull()
    )
    cells = (
        base.groupBy(F.col(feature_col).alias("bucket"))
        .agg(
            F.sum(
                F.when(F.col(label_col).cast("int") == 1, 1).otherwise(0)
            ).alias("n_pos"),
            F.sum(
                F.when(F.col(label_col).cast("int") == 1, 0).otherwise(1)
            ).alias("n_neg"),
        )
        # feeds the totals AND the per-bucket output — pin it (lazy)
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(
        F.sum("n_pos").alias("__pos"), F.sum("n_neg").alias("__neg")
    )
    pr = F.col("n_pos").cast("double") / F.col("__pos").cast("double")
    nr = F.col("n_neg").cast("double") / F.col("__neg").cast("double")
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    woe = F.log(pr / nr)
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (F.col("n_pos") + F.col("n_neg")).cast("long").alias("n"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            F.when(ok, F.round(woe, round_to)).alias("woe"),
            F.when(ok, F.round((pr - nr) * woe, round_to)).alias("iv_term"),
        )
        .orderBy("bucket")
    )

def forecast_eval(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    season: int,
    round_to: int = 6,
    round_to_abs: int = 2,
) -> DataFrame:
    """Seasonal-naive forecast evaluation per key — the baseline every
    fancier forecaster must beat, and the standard scale for judging
    one: forecast ``y_hat[t] = y[t - season]`` (row lag over the
    ordered series), scored with MAE, RMSE, sMAPE, and MASE (MAE over
    the mean absolute one-step naive difference — Hyndman's
    scale-free form, so keys with different volumes compare).

    ONE per-key window produces both lags (season and 1), one
    aggregate produces every metric; the window is calendar-bounded
    (the series is daily/hourly buckets, never corpus rows). Values
    must be integral (micros discipline): errors are exact longs,
    squared errors exact decimals, and only the final means/ratios run
    in double — mirrored op-for-op in the oracle. sMAPE uses the
    2|e|/(|y|+|yhat|) form with both-zero rows contributing 0 (the
    convention that keeps a flat-zero series at sMAPE 0, not NULL).
    MASE is NULL for a constant series (zero naive scale).

    Returns one row per key: ``n_eval, mae, rmse, smape, mase``.
    The VALUE-SCALE metrics (mae, rmse — micros magnitude) round to
    ``round_to_abs`` (default 2): rounding a ~1e9 double to 6 dp needs
    a x1e6 scaling past exact-double territory, and the two engines'
    rounding kernels then disagree in the last ulp (observed at
    sf0.1). The RATIO metrics (smape, mase — O(1)) keep ``round_to``.
    Extension surface (reference has no aggregation:
    ``/root/reference/src/meta.rs``)."""
    from pyspark.sql.window import Window

    if season < 1:
        raise ValueError("season must be >= 1")
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(order_col)
    y = F.col(value_col).cast("long")
    lagged = df.select(
        *keys,
        y.alias("__y"),
        F.lag(value_col, season).over(w).cast("long").alias("__yhat"),
        F.lag(value_col, 1).over(w).cast("long").alias("__yprev"),
    )
    dec = "decimal(38,0)"
    e = F.col("__y") - F.col("__yhat")
    both_zero = (F.col("__y") == 0) & (F.col("__yhat") == 0)
    smape_term = F.when(both_zero, F.lit(0.0)).otherwise(
        2.0
        * F.abs(e).cast("double")
        / (F.abs(F.col("__y")) + F.abs(F.col("__yhat"))).cast("double")
    )
    agg = lagged.groupBy(*keys).agg(
        F.count("__yhat").alias("n_eval"),
        F.sum(F.when(F.col("__yhat").isNotNull(), F.abs(e))).alias("__sae"),
        F.sum(
            F.when(
                F.col("__yhat").isNotNull(),
                e.cast(dec) * e.cast(dec),
            )
        ).alias("__sse"),
        F.sum(
            F.when(F.col("__yhat").isNotNull(), smape_term)
        ).alias("__ssmape"),
        F.count("__yprev").alias("__n1"),
        F.sum(
            F.when(
                F.col("__yprev").isNotNull(),
                F.abs(F.col("__y") - F.col("__yprev")),
            )
        ).alias("__sad1"),
    )
    n = F.col("n_eval").cast("double")
    mae = F.col("__sae").cast("double") / n
    scale = F.col("__sad1").cast("double") / F.col("__n1").cast("double")
    return agg.select(
        *keys,
        F.col("n_eval").cast("long").alias("n_eval"),
        F.when(F.col("n_eval") > 0, F.round(mae, round_to_abs)).alias(
            "mae"
        ),
        F.when(
            F.col("n_eval") > 0,
            F.round(
                F.sqrt(F.col("__sse").cast("double") / n), round_to_abs
            ),
        ).alias("rmse"),
        F.when(
            F.col("n_eval") > 0,
            F.round(F.col("__ssmape") / n, round_to),
        ).alias("smape"),
        F.when(
            (F.col("n_eval") > 0) & (F.col("__n1") > 0) & (F.col("__sad1") > 0),
            F.round(mae / scale, round_to),
        ).alias("mase"),
    )
