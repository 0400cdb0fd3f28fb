#!/usr/bin/env python
"""Round-12 in-session A/B for the robust_outliers median+MAD fusion
(VERDICT item 4): run events_anomaly_mad with the fused (current) and
the round-11 unfused robust_outliers in ONE session, mirrored order,
min-of-N — box drift cancels — and record the deterministic job count
per variant via the status tracker (the fusion removes one corpus
aggregation job/stage regardless of the clock).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def old_robust_outliers(df, value_col, group_cols, k=3.0, method="bin"):
    """The round-11 robust_outliers, verbatim (two group_percentiles
    passes, each with its own stats scan)."""
    from otters_spark.operators.stats import group_percentiles

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    gp = list(group_cols)

    def _nsjoin(left, right):
        right = F.broadcast(right)
        cond = None
        for c in gp:
            e = left[c].eqNullSafe(right[c])
            cond = e if cond is None else cond & e
        out = left.join(right, cond)
        for c in gp:
            out = out.drop(right[c])
        return out

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


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import otters_spark.operators.stats as stats_mod
    from otters_spark.session import get_spark
    from otters_spark.suite import QUERIES

    new_fn = stats_mod.robust_outliers
    spark = get_spark(app_name="r12-ab-mad", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    q = QUERIES["events_anomaly_mad"]

    def run():
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def jobs_of(run_fn) -> int:
        st = spark.sparkContext.statusTracker()
        import uuid
        gid = uuid.uuid4().hex
        spark.sparkContext.setJobGroup(gid, "count")
        try:
            run_fn()
        finally:
            spark.sparkContext.setJobGroup(None, None)
        return len(st.getJobIdsForGroup(gid))

    run()  # warm

    import gc
    variants = {"new": None, "old": None}
    jobs = {}
    for r in range(reps):
        order = ["new", "old"] if r % 2 == 0 else ["old", "new"]
        for v in order:
            stats_mod.robust_outliers = new_fn if v == "new" else old_robust_outliers
            spark.sparkContext.setJobDescription(f"mad {v} rep{r}")
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            variants[v] = dt if variants[v] is None else min(variants[v], dt)
            gc.collect()
    stats_mod.robust_outliers = new_fn
    for v in ("new", "old"):
        stats_mod.robust_outliers = new_fn if v == "new" else old_robust_outliers
        jobs[v] = jobs_of(run)
    stats_mod.robust_outliers = new_fn
    spark.sparkContext.setJobDescription(None)
    print(f"wall min-of-{reps}: new={variants['new']:.3f} old={variants['old']:.3f}")
    print(f"jobs per run:      new={jobs['new']} old={jobs['old']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
