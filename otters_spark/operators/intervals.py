"""Interval union / coverage — the sweep-line primitive for overlap
analytics (machine-utilization, session coverage, SLA uptime, ad
exposure): given per-key intervals that may overlap, merge them into
disjoint islands and measure covered extent.

Spark-first formulation (no pair join, no explode):

1. one window per key ordered by ``(start, end)``;
2. ``max(end)`` over the PRECEDING frame gives the running sweep
   frontier; a row opens a new island iff its start lies beyond it;
3. a cumulative sum of the open-island flags numbers the islands;
4. ``groupBy(key, island)`` folds each island to ``[min(start),
   max(end)]``.

Cost: ONE shuffle on the key + a sort within partitions — identical
shape to sessionization (``operators/asof.py``), versus the textbook
self-join formulation whose pair count explodes quadratically inside
dense overlap clusters. At 100 TB the window state is a single long
(the frontier), AQE-coalescible and skew-splittable like any keyed
window.

Semantics: intervals are treated as closed-open ``[start, end)`` over
an integer domain (use epoch micros for timestamps — exact long
arithmetic, no float drift). Touching intervals (``start == frontier``)
MERGE; only a strict gap (``start > frontier``) opens a new island.
Zero/negative-length intervals are dropped (``end <= start``), matching
the oracle's ``WHERE e > s`` guard.

The reference engine has no interval algebra (single-table vector
search, ``/root/reference/src/meta.rs``); this is extension surface for
the events lane, oracle-checked against the identical window algebra in
DuckDB SQL.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "merge_intervals",
    "interval_coverage",
    "interval_gaps",
    "overlap_join",
]


def merge_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Merge overlapping-or-touching ``[start, end)`` intervals per key.

    Returns one row per disjoint island: the key columns plus
    ``island_start``, ``island_end``, and ``n_intervals`` (input rows
    folded into the island). Start/end must be integral (cast
    timestamps to epoch micros first); rows with ``end <= start`` or a
    NULL endpoint are dropped.
    """
    keys = list(keys)
    iv = df.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) > F.col(start_col))
    )
    order = Window.partitionBy(*keys).orderBy(start_col, end_col)
    frontier = F.max(end_col).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = (frontier.isNull() | (F.col(start_col) > frontier)).cast("long")
    island = F.sum(opens).over(
        order.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        iv.withColumn("__island", island)
        .groupBy(*keys, "__island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("__island")
    )


def interval_coverage(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Per-key coverage report over merged intervals: ``n_intervals``
    (raw inputs kept), ``n_islands`` (disjoint spans after union), and
    ``covered`` (total union extent, exact integer units — the sum of
    island lengths, so double-counted overlap is excluded)."""
    keys = list(keys)
    islands = merge_intervals(df, keys, start_col, end_col)
    return islands.groupBy(*keys).agg(
        F.sum("n_intervals").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start")).alias("covered"),
    )


def interval_gaps(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str = "start",
    end_col: str = "end",
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """Uncovered ranges per key — the COMPLEMENT of the interval
    union: the data-completeness / SLA-hole report ("which time ranges
    had no coverage at all"). Returns the key columns plus
    ``gap_start``, ``gap_end`` (integral, half-open, same units as the
    inputs), one row per maximal uncovered range.

    Without ``bounds`` only INTERIOR gaps are reported (between
    consecutive islands). With ``bounds=(lo, hi)`` the report also
    includes the head gap ``[lo, first_island_start)`` and tail gap
    ``[last_island_end, hi)``, clipped to the bounds — the audit shape
    ("the feed was contracted to cover [lo, hi); where did it not?").
    Keys whose islands lie entirely outside the bounds still report
    the whole ``[lo, hi)`` as uncovered only for key values PRESENT in
    the input (an absent key has no row to hang a gap on — join the
    expected-key dimension upstream if silence itself must alarm).

    Scale shape: everything downstream of :func:`merge_intervals` runs
    on the ISLAND table (per-key islands, not raw intervals) — one
    keyed lag window + one filter; no self-join, no explosion."""
    keys = list(keys)
    islands = merge_intervals(df, keys, start_col, end_col)
    if bounds is not None:
        lo, hi = bounds
        if hi <= lo:
            raise ValueError(f"bounds must satisfy lo < hi, got {bounds!r}")
        # clip islands to the audit window; islands fully outside drop
        # (their coverage is irrelevant to [lo, hi))
        islands = islands.select(
            *keys,
            F.greatest(F.col("island_start"), F.lit(lo)).alias("island_start"),
            F.least(F.col("island_end"), F.lit(hi)).alias("island_end"),
        ).filter(F.col("island_end") > F.col("island_start"))
    w = Window.partitionBy(*keys).orderBy("island_start")
    prev_end = F.lag("island_end").over(w)
    head_floor = F.lit(bounds[0]) if bounds is not None else F.lit(None)
    inner = (
        islands.select(
            *keys,
            F.coalesce(prev_end, head_floor).alias("gap_start"),
            F.col("island_start").alias("gap_end"),
        )
        .filter(
            F.col("gap_start").isNotNull()
            & (F.col("gap_end") > F.col("gap_start"))
        )
    )
    if bounds is None:
        return inner
    lo, hi = bounds
    tails = (
        islands.groupBy(*keys)
        .agg(F.max("island_end").alias("gap_start"))
        .withColumn("gap_end", F.lit(hi))
        .filter(F.col("gap_end") > F.col("gap_start"))
    )
    # a key clipped to zero islands inside the bounds: merge_intervals
    # dropped it above, so recover full-window gaps from the RAW input
    # keys (present in df, no coverage within [lo, hi))
    covered_keys = islands.select(*keys).distinct()
    all_keys = df.select(*keys).distinct()
    empty = (
        all_keys.join(covered_keys, keys, "left_anti")
        .withColumn("gap_start", F.lit(lo))
        .withColumn("gap_end", F.lit(hi))
    )
    return inner.unionByName(tails).unionByName(empty)


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    cell: int,
    start_cols: tuple[str, str] = ("start", "start"),
    end_cols: tuple[str, str] = ("end", "end"),
    max_cells_per_interval: int = 4096,
) -> DataFrame:
    """Equi-key interval OVERLAP join: every pair (l, r) sharing the
    key columns whose closed-open spans intersect (``l.start < r.end
    AND r.start < l.end``), emitted exactly once with the exact
    integer ``overlap`` extent.

    Spark has no native band/interval join, and the naive formulation
    — an equi-join on the key with the two range predicates in the
    ``on`` clause — degrades to per-key all-pairs (and, keyless, to
    BroadcastNestedLoopJoin): quadratic inside any dense key. The
    scale formulation is the standard GRID BUCKETING device
    (genomics/observability interval joins, Spark RAPIDS and
    GeoSpark's range-join strategy):

    1. each interval is exploded to the grid cells ``floor(start /
       cell) .. floor((end - 1) / cell)`` it touches — output size
       ``n · (avg_len / cell + 1)``, tunable via ``cell``;
    2. the pair candidates come from ONE hash shuffle on ``(keys,
       cell)`` — co-partitioned equi-join, never a theta join;
    3. a pair overlapping several shared cells would duplicate, so
       each pair is CLAIMED by the single cell containing
       ``max(l.start, r.start)`` (the overlap's left edge): one
       deterministic emit per pair, no post-hoc ``distinct`` shuffle.

    Cost: candidates per cell are bounded by the per-cell interval
    density; a skewed-density cell splits under AQE like any hash-join
    partition. Intervals longer than ``max_cells_per_interval`` cells
    raise loudly (scan-fused guard, no extra pass) — pick ``cell``
    near the median interval length so the explode factor stays O(1).

    Endpoints must be integral (epoch micros for timestamps);
    zero/negative-length or NULL-endpoint intervals are dropped, the
    :func:`merge_intervals` guard. Output: key columns, then
    ``start_l/end_l/start_r/end_r`` plus every non-key payload column
    with an ``_l``/``_r`` suffix, and ``overlap = least(end_l, end_r)
    - greatest(start_l, start_r)``.

    The reference engine has no join surface at all
    (``/root/reference/src/meta.rs`` — single-table scans); this is
    extension surface for the events lane, oracle-checked against the
    naive range-predicate join in DuckDB.
    """
    if cell <= 0:
        raise ValueError("cell must be a positive integer grid width")
    keys = list(keys)

    def _gridded(df: DataFrame, start: str, end: str, side: str) -> DataFrame:
        iv = df.filter(
            F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (F.col(end) > F.col(start))
        )
        c0 = F.floor(F.col(start) / cell).cast("long")
        c1 = F.floor((F.col(end) - 1) / cell).cast("long")
        ncells = c1 - c0 + 1
        guard = F.when(
            ncells > max_cells_per_interval,
            F.raise_error(
                F.concat(
                    F.lit(
                        "overlap_join: interval spans more than "
                        f"{max_cells_per_interval} grid cells (cell={cell}); "
                        "raise `cell` or `max_cells_per_interval` (interval "
                        "start="
                    ),
                    F.col(start).cast("string"),
                    F.lit(" end="),
                    F.col(end).cast("string"),
                    F.lit(")"),
                )
            ).cast("long"),
        ).otherwise(c0)
        renamed = iv.select(
            *keys,
            F.col(start).alias(f"start{side}"),
            F.col(end).alias(f"end{side}"),
            *[
                F.col(c).alias(f"{c}{side}")
                for c in iv.columns
                if c not in keys and c not in (start, end)
            ],
            F.explode(F.sequence(guard, c1)).alias("__cell"),
        )
        return renamed

    gl = _gridded(left, start_cols[0], end_cols[0], "_l")
    gr = _gridded(right, start_cols[1], end_cols[1], "_r")
    joined = gl.join(gr, on=[*keys, "__cell"], how="inner")
    lo = F.greatest(F.col("start_l"), F.col("start_r"))
    hi = F.least(F.col("end_l"), F.col("end_r"))
    return (
        joined.filter(
            (F.col("start_l") < F.col("end_r"))
            & (F.col("start_r") < F.col("end_l"))
            # claim rule: only the cell holding the overlap's left edge
            # emits the pair — exactly-once without a distinct shuffle
            & (F.floor(lo / cell).cast("long") == F.col("__cell"))
        )
        .drop("__cell")
        .withColumn("overlap", hi - lo)
    )
