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

__all__ = ["merge_intervals", "interval_coverage"]


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
