"""Distribution-drift detection between two corpus snapshots (PSI).

When a 100 TB corpus is rebuilt (new crawl, new filters), the question
before retraining is "did the data distribution move?". The standard
detector is the Population Stability Index per feature:

    PSI = Σ_bins (p_b - q_b) · ln(p_b / q_b)

with p = reference share, q = current share (rule of thumb: < 0.1
stable, 0.1–0.25 moderate shift, > 0.25 action). This module computes
it exactly and scalably:

* each side is ONE scan: every profiled column contributes a
  ``(column, bin)`` struct to an array that is exploded in the same
  projection — k profiled columns cost k array entries per row, not k
  passes;
* bin counts are a count-only ``groupBy(column, bin)`` per side (the
  only shuffles — payload is the bin id), then a full-outer join of
  the two tiny count tables;
* all remaining arithmetic (totals, smoothing, the PSI sum) runs over
  the counts table, whose size is Σ bins per column — thousands of
  rows at any corpus scale, so the per-column windows are bounded by
  construction.

Bins must be DECLARED (fixed edges for numeric columns, raw values for
categoricals) — data-dependent edges (quantiles) would make two runs
incomparable, which defeats drift monitoring; derive edges once from
:func:`operators.sketches.hist_quantiles` and freeze them. Numeric
values outside ``[lo, hi)`` clamp into the edge bins; NULL gets its
own ``"null"`` bin on every column (a NULL-rate shift IS drift).
Laplace smoothing ``(n + 1) / (total + n_bins_observed)`` keeps
empty-vs-present bins finite, deterministic, and identical across
engines (the counts stay exact integers until one final division).

The reference engine has no statistics surface (extension lane for
the curation pipeline, like ``operators/quality_checks.py``).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["psi_table", "psi_summary", "profile_bins", "bin_entries"]


def bin_entries(numeric, categorical) -> F.Column:
    """The melt expression: one array of ``(column, bin)`` structs per
    row covering every profiled column — exploded by callers so k
    columns cost k array entries in ONE projection, not k passes.
    Shared by the batch PSI here and the windowed streaming counts
    (``streaming/drift.py``), which keeps the two sides' binning
    bit-identical by construction."""
    entries = []
    for col, (lo, hi, nb) in numeric.items():
        width = (hi - lo) / nb
        # NaN behaves as NULL (module convention, same as
        # group_percentiles' nanvl): floor(NaN) would otherwise cast
        # to 0 and silently inflate the lowest bin
        x = F.nanvl(F.col(col).cast("double"), F.lit(None).cast("double"))
        idx = F.floor((x - F.lit(lo)) / F.lit(width))
        clamped = F.least(F.lit(nb - 1), F.greatest(F.lit(0), idx)).cast("string")
        b = F.when(x.isNull(), F.lit("null")).otherwise(clamped)
        entries.append(F.struct(F.lit(col).alias("column"), b.alias("bin")))
    for col in categorical:
        b = F.coalesce(F.col(col).cast("string"), F.lit("null"))
        entries.append(F.struct(F.lit(col).alias("column"), b.alias("bin")))
    return F.array(*entries)


def profile_bins(df: DataFrame, numeric=None, categorical=()) -> DataFrame:
    """Bin-count profile ``(column, bin, n)`` of one snapshot — the
    persistable reference side for ongoing drift monitoring (compute
    once per release, store, compare many): one scan, one count-only
    shuffle."""
    arr = bin_entries(dict(numeric or {}), categorical)
    return (
        df.select(F.explode(arr).alias("e"))
        .select("e.column", "e.bin")
        .groupBy("column", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_table(
    ref: DataFrame,
    cur: DataFrame,
    numeric: Mapping[str, tuple] = None,
    categorical: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Per-bin drift table ``(column, bin, n_ref, n_cur, contrib)``
    where ``contrib`` is the bin's PSI term (rounded to ``round_dp``);
    ``sum(contrib) per column`` is the PSI. ``numeric`` maps column →
    ``(lo, hi, n_bins)`` fixed edges; ``categorical`` columns bin by
    value. See module doc for scale shape and smoothing."""
    numeric = dict(numeric or {})
    if not numeric and not categorical:
        raise ValueError("profile at least one column")
    for col, spec in numeric.items():
        lo, hi, nb = spec
        if not (hi > lo and nb >= 2):
            raise ValueError(f"bad numeric spec for {col}: {spec}")
    overlap = set(numeric) & set(categorical)
    if overlap:
        raise ValueError(f"columns in both specs: {sorted(overlap)}")
    for side, d in (("ref", ref), ("cur", cur)):
        missing = (set(numeric) | set(categorical)) - set(d.columns)
        if missing:
            raise ValueError(f"{side}: unknown column(s) {sorted(missing)}")

    rc = profile_bins(ref, numeric, categorical).withColumnRenamed("n", "n_ref")
    cc = profile_bins(cur, numeric, categorical).withColumnRenamed("n", "n_cur")
    counts = (
        rc.join(cc, ["column", "bin"], "full_outer")
        .fillna(0, ["n_ref", "n_cur"])
    )
    # per-column totals + observed-bin counts: windows over the counts
    # table, bounded by Σ bins per column (never corpus rows)
    w = Window.partitionBy("column")
    counts = (
        counts.withColumn("__tr", F.sum("n_ref").over(w))
        .withColumn("__tc", F.sum("n_cur").over(w))
        .withColumn("__nb", F.count(F.lit(1)).over(w))
    )
    p = (F.col("n_ref") + 1) / (F.col("__tr") + F.col("__nb"))
    q = (F.col("n_cur") + 1) / (F.col("__tc") + F.col("__nb"))
    return (
        counts.withColumn("contrib", F.round((p - q) * F.log(p / q), round_dp))
        .select("column", "bin", "n_ref", "n_cur", "contrib")
        .orderBy("column", "bin")
    )


def psi_summary(
    ref: DataFrame,
    cur: DataFrame,
    numeric: Mapping[str, tuple] = None,
    categorical: Sequence[str] = (),
    round_dp: int = 6,
) -> DataFrame:
    """One row per profiled column: ``(column, psi)``. The alerting
    surface over :func:`psi_table`."""
    # sum the UNROUNDED terms, round once (per-bin rounding is for the
    # detail table's display stability, not for the statistic)
    detail = psi_table(ref, cur, numeric, categorical, round_dp=12)
    return (
        detail.groupBy("column")
        .agg(F.round(F.sum("contrib"), round_dp).alias("psi"))
        .orderBy("column")
    )
