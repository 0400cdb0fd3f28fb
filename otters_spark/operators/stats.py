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

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["group_percentiles"]


def group_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_cols: dict[str, Sequence[float]],
    exact: bool = True,
    accuracy: int = 10_000,
    round_to: int | None = 4,
) -> DataFrame:
    """Per-group quantiles for each ``value_cols[col] = [q, ...]``.

    Output columns are named ``p{int(q*100)}_{col}`` (q=0.5 on
    ``price`` → ``p50_price``). ``exact=True`` uses the SQL-standard
    interpolated ``percentile`` (oracle-comparable, memory ∝ group
    size); ``exact=False`` uses ``approx_percentile`` whose rank error
    is at most ``1/accuracy`` and whose memory is bounded — the 100 TB
    path."""
    aggs: list[Column] = []
    for col, qs in value_cols.items():
        for q in qs:
            name = f"p{round(q * 100):d}_{col}"
            if exact:
                expr = F.expr(f"percentile({col}, {q!r})")
            else:
                expr = F.expr(f"approx_percentile({col}, {q!r}, {accuracy})")
            if round_to is not None:
                expr = F.round(expr, round_to)
            aggs.append(expr.alias(name))
    if not aggs:
        raise ValueError("value_cols must request at least one quantile")
    return df.groupBy(*group_cols).agg(*aggs)
