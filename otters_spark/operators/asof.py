"""As-of join — the classic time-series operator Spark's DataFrame API
lacks (DuckDB/kdb/Pandas have it natively; Spark users usually fall
back to range joins that explode, or per-key mapGroups).

Implemented Spark-first as the union + window trick:

1. tag LEFT (probe) and RIGHT (reference) rows, union them;
2. one window per key ordered by (ts, side-tag):
   ``last_value(right_payload, ignorenulls=True)`` carries the most
   recent reference row forward;
3. keep probe rows.

Cost: ONE shuffle on the key + a sort within partitions — no range
explosion, no per-pair work, state is a single carried value per
window frame. This is the plan you want at 100 TB: identical shape to
a sessionization window, AQE-coalescible, skew-splittable.

Semantics: for each left row, the right row with the greatest
``right.ts <= left.ts`` on the same key (ties on equal ts: the right
row IS visible to the left row, matching DuckDB ``ASOF JOIN ... ON
l.ts >= r.ts``). Left rows with no prior right row get NULLs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_count_join", "gap_fill"]


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    lookback_sec: int,
    ts_col: str = "ts",
    out_col: str = "n_in_range",
) -> DataFrame:
    """Range join, aggregated: for each left row, COUNT of right rows
    with ``left.ts - lookback <= right.ts <= left.ts`` on the same key.

    Same union trick as :func:`asof_join`, but the window frame is a
    RANGE over epoch-microseconds — one shuffle + one sorted pass,
    versus the naive range join whose output explodes with the window
    width. (A raw pair-producing range join stays expressible as
    ``left.join(right, on + [right.ts.between(...)])`` when the pairs
    themselves are wanted.)
    """
    on = list(on)
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
    )
    rhs = right.select(*[F.col(c) for c in on], F.col(ts_col), F.lit(0).alias("__side"))
    for c in left.columns:
        if c not in on and c != ts_col:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    rhs = rhs.select(*[F.col(c) for c in lhs.columns])
    unioned = lhs.unionByName(rhs).withColumn("__ts_us", F.unix_micros(F.col(ts_col)))
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts_us"))
        .rangeBetween(-lookback_sec * 1_000_000, 0)
    )
    counted = unioned.withColumn(
        out_col, F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).over(w)
    )
    return counted.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns], F.col(out_col)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    tolerance=None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join ``left`` to the most recent ``right`` row per key
    (``direction="backward"``, the default: right.ts <= left.ts), the
    earliest following one (``"forward"``: right.ts >= left.ts), or
    whichever is closer in time (``"nearest"``, ties to the backward
    match — pandas ``merge_asof`` direction set, complete).

    ``on``: equi-key columns present in both sides. ``right_cols``:
    right-side payload columns to carry (default: all non-key,
    non-ts). Carried columns are renamed with ``suffix``; the matched
    right timestamp arrives as ``{ts_col}{suffix}``.

    ``tolerance``: optional maximum allowed ``left.ts - right.ts``
    (same units/type as the ts column, e.g. an int for epoch-micros
    columns or ``F.expr("INTERVAL 5 MINUTES")`` for timestamps); a
    match older than the tolerance is dropped (whole payload NULL),
    matching pandas ``merge_asof(tolerance=...)`` semantics.

    Determinism caveat: if two RIGHT rows share (key, ts) exactly,
    which one's payload is carried is unspecified (same as DuckDB
    ASOF with duplicate timestamps) — the carried ``ts{suffix}`` is
    still deterministic. Dedupe the right side first if payload
    determinism matters.
    """
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != ts_col]
    payload = [*right_cols, ts_col]

    # the whole payload travels as ONE struct: the struct is non-null
    # for every right row (even when individual payload values are
    # NULL), so last(ignorenulls) carries the matched right row intact.
    # Carrying columns independently would back-fill a NULL payload
    # value from an OLDER right row — a row stitched from two reference
    # rows, diverging from DuckDB ASOF semantics.
    rhs = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("__r"),
    )
    lhs = left.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(dict(rhs.dtypes)["__r"])
    )
    # align schemas: left keeps all its columns; right contributes only
    # key + ts + payload, with left-only columns nulled
    left_only = [c for c in left.columns if c not in on and c != ts_col]
    for c in left_only:
        rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    rhs = rhs.select(*[F.col(c) for c in lhs.columns])

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward, forward or nearest, got {direction!r}"
        )
    unioned = lhs.unionByName(rhs)
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so an
    # exactly-simultaneous reference row is visible to the probe row —
    # DuckDB ASOF `>=` semantics. Forward = the same scan over
    # descending time. Nearest = both scans (one exchange, two sorts —
    # the windows share the partitioning), then pick the closer match
    # per probe row, ties to the backward side (pandas merge_asof).
    def _carry(asc: bool) -> Column:
        order = F.col(ts_col).asc() if asc else F.col(ts_col).desc()
        w = (
            Window.partitionBy(*on)
            .orderBy(order, F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(F.col("__r"), ignorenulls=True).over(w)

    null_payload = F.lit(None).cast(dict(rhs.dtypes)["__r"])
    if direction == "nearest":
        cb, cf = F.col("__cb"), F.col("__cf")
        gap_b = F.col(ts_col) - cb.getField(ts_col)
        gap_f = cf.getField(ts_col) - F.col(ts_col)
        carried = (
            unioned.withColumn("__cb", _carry(asc=True))
            .withColumn("__cf", _carry(asc=False))
            .withColumn(
                "__c",
                F.when(cb.isNull(), cf)
                .when(cf.isNull(), cb)
                .when(gap_b <= gap_f, cb)
                .otherwise(cf),
            )
        )
    else:
        carried = unioned.withColumn("__c", _carry(asc=direction == "backward"))
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        if direction == "nearest":
            # |gap| as greatest of the two signed forms: abs() is not
            # defined on intervals, greatest is
            gap = F.greatest(
                F.col(ts_col) - F.col("__c").getField(ts_col),
                F.col("__c").getField(ts_col) - F.col(ts_col),
            )
        elif direction == "backward":
            gap = F.col(ts_col) - F.col("__c").getField(ts_col)
        else:
            gap = F.col("__c").getField(ts_col) - F.col(ts_col)
        out = out.withColumn(
            "__c", F.when(gap <= tolerance, F.col("__c")).otherwise(null_payload)
        )
    renames: list[Column] = [F.col(c) for c in left.columns]
    renames += [F.col("__c").getField(c).alias(f"{c}{suffix}") for c in payload]
    return out.select(*renames)


def gap_fill(
    bucketed: DataFrame,
    bucket_col: str,
    step: int,
    group_cols: Sequence[str] = (),
    zero_fill: Sequence[str] = (),
    locf: Sequence[str] = (),
) -> DataFrame:
    """Time-series gap filling over an already-bucketed aggregate (the
    TimescaleDB ``time_bucket_gapfill`` shape): densify each group's
    bucket range to every ``step`` and fill the holes — counts to zero
    (``zero_fill``), measures carried forward from the last observed
    bucket (``locf``), anything else left NULL.

    Scale shape: the grid is ``sequence(min, max, step)`` exploded per
    group — grid size is span/step, never row count; the fill join is
    one shuffle on (group, bucket); LOCF is
    ``last(col, ignorenulls=True)`` over the per-group bucket order —
    the same single-carried-value window as the as-of join, spillable
    and skew-splittable. No driver-side range materialization.

    The fill join matches group keys NULL-SAFELY (``eqNullSafe``): a
    plain equality join would leave every observed bucket of a
    NULL-keyed group unmatched, silently zero-filling counts and
    NULL-ing LOCF measures for data that exists. Rows whose BUCKET is
    NULL have no place on a numeric grid and are dropped, as before.
    """
    gcols = list(group_cols)
    groups = [F.col(c) for c in gcols]
    spans = bucketed.groupBy(*groups).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    # grid columns get fresh names so the join condition below can name
    # both sides without tripping derived-frame attribute ambiguity
    grid = spans.select(
        *[F.col(c).alias(f"__g{i}") for i, c in enumerate(gcols)],
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
        ).alias("__gb"),
    )
    cond = F.col("__gb") == F.col(bucket_col)
    for i, c in enumerate(gcols):
        cond = cond & F.col(f"__g{i}").eqNullSafe(F.col(c))
    dense = grid.join(bucketed, cond, "left")
    out_cols = []
    w = (
        Window.partitionBy(*[f"__g{i}" for i in range(len(gcols))])
        .orderBy("__gb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in bucketed.columns:
        if c == bucket_col or c in gcols:
            continue
        if c in zero_fill:
            out_cols.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
        elif c in locf:
            out_cols.append(F.last(F.col(c), ignorenulls=True).over(w).alias(c))
        else:
            out_cols.append(F.col(c))
    return dense.select(
        *[F.col(f"__g{i}").alias(c) for i, c in enumerate(gcols)],
        F.col("__gb").alias(bucket_col),
        *out_cols,
    )
