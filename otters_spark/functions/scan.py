"""Scan-parallelism helper (round 11).

The test parquet ships ONE row group per table, so Spark cannot split
the scan and everything fused above it — tokenize, n-gram explode,
hash, score — runs on a single core at ``local[32]`` (guide §2.5:
"one huge unsplittable file ... repartition immediately after the
read"). :func:`spread_small_scan` widens such inputs to the session's
default parallelism, deriving the decision from the input's OWN
partitioning (scale-adaptive, never a constant): at 100 TB inputs
arrive with far more splits than cores and the helper is a structural
no-op.

Applied inside the per-row-HEAVY operators (shingle/minhash/simhash/
tf-idf tokenization chains), not at the generic table loader: for
cheap-codegen consumers the repartition's local sort + exchange cost
more than the parallelism returns (measured round 11:
rel_percentiles 2.0 -> 3.1 s when lineitem was widened globally,
while shingle pair generation went 2.5 -> 0.9 s when widened at the
operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_small_scan"]


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to ``defaultParallelism`` —
    only when its current plan partitioning is narrower. Returns the
    input unchanged (same rows, same schema) otherwise; results are
    partitioning-invariant by the suite's rounding discipline."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if n < target else df
