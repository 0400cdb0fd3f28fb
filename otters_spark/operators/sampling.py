"""Deterministic sampling & splitting for training-data pipelines.

Random sampling is the wrong tool for corpus curation at 100 TB:
re-running the pipeline must assign every document to the same split,
regardless of partitioning, cluster size, or row order. These
operators therefore hash CONTENT-STABLE keys (the md5→60-bit
convention from ``functions.text``, reproducible in ANSI SQL) instead
of using ``rand()``:

* :func:`hash_split` — train/val/test assignment by hashing the id:
  one narrow projection, no shuffle, stable under any re-run.
* :func:`hash_sample` — keep an approximate fraction of rows by hash
  bucket; deterministic, pushdown-friendly (the predicate is a plain
  comparison on a derived column).
* :func:`reservoir_per_group` — exactly-k rows per group, selected by
  hash rank (window over a shuffle sort — spillable, deterministic).

``rand(seed)``-based sampling (``df.sample``) remains the right tool
for one-off statistics; these are for pipeline lineage.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.text import md5_long_expr

__all__ = ["hash_split", "hash_sample", "reservoir_per_group"]

#: bucket space for split/sample fractions (1e4 → 0.01% granularity)
_BUCKETS = 10_000


def _bucket(key_col) -> F.Column:
    return F.pmod(md5_long_expr(key_col), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket of ``key_col``.

    ``weights`` maps split name → fraction (must sum to ≤ 1; remainder
    falls into the LAST split). Assignment depends only on the key, so
    a document keeps its split across pipeline re-runs and dataset
    versions — the property that prevents train/test leakage when the
    corpus grows."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    expr = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name]
        cond = _bucket(F.col(key_col)) < F.lit(int(round(edge * _BUCKETS)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by hash bucket of ``key_col``
    — deterministic and stable under re-runs (a kept row stays kept).
    The filter is a plain comparison, so it fuses into the scan stage."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_bucket(F.col(key_col)) < F.lit(int(round(fraction * _BUCKETS))))


def reservoir_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    k: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(k, group size) rows per group, selected by hash rank
    of ``key_col`` (ties broken by the key itself). The distributed
    analog of per-group reservoir sampling, made deterministic: the
    same k representatives come back on every run. One shuffle sort,
    spillable, no driver involvement."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = Window.partitionBy(*group_cols).orderBy(
        md5_long_expr(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )
