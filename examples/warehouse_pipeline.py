#!/usr/bin/env python
"""Warehouse-maintenance demo over the testdata tables — the
"keep yesterday's answers fresh without re-reading the corpus" lane:

    snapshot v1 -> signed change feed -> incrementally maintained
    aggregate (proved equal to a rebuild) -> AMS join-size estimate
    read BEFORE paying the key shuffle -> exposure-interval coverage
    and EWMA-smoothed daily trends off the events stream.

Run:  python examples/warehouse_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import otters_spark as ot
from otters_spark.operators.intervals import interval_coverage
from otters_spark.operators.sketches import ams_f2_estimate, ams_sketch
from otters_spark.operators.stats import ewma_smooth
from otters_spark.sources.merge import apply_agg_delta, change_feed
from otters_spark.suite import load, load_events


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = ot.get_spark(app_name="warehouse-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1. two order snapshots and the change feed between them -----
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        # money in integer cents: incremental == rebuild EXACTLY
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    v1 = base.filter(F.col("k") % 11 != 3)
    v2 = base.filter(F.col("k") % 11 != 7).withColumn(
        "cents",
        F.when(F.col("k") % 5 == 0, F.col("cents") + 10000).otherwise(
            F.col("cents")
        ),
    )
    feed = change_feed(v1, v2, ["k"], ["pri", "cents"])
    n_feed = feed.count()
    n_v2 = v2.count()
    print(f"change feed: {n_feed} signed rows vs {n_v2} rows in v2 "
          f"({100.0 * n_feed / n_v2:.1f}% touched)")

    # -- 2. maintain the aggregate from the feed, prove == rebuild ---
    agg1 = v1.groupBy("pri").agg(
        F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n")
    )
    maintained = apply_agg_delta(agg1, feed, ["pri"], ["cents"])
    rebuilt = v2.groupBy("pri").agg(
        F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n")
    )
    m = {r["pri"]: (r["cents"], r["n"]) for r in maintained.collect()}
    r_ = {r["pri"]: (r["cents"], r["n"]) for r in rebuilt.collect()}
    assert m == r_, "maintained aggregate diverged from rebuild"
    print(f"maintained == rebuilt across {len(m)} groups (exact, integer cents)")

    # -- 3. join-size statistics without the key shuffle -------------
    sk = ams_sketch(
        load(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k")),
        "k",
    )
    est = ams_f2_estimate(sk).collect()[0]["f2_est"]
    print(f"AMS self-join-size estimate for l_partkey: {est:,.0f} "
          "(one algebraic pass, no key shuffle)")

    # -- 4. events lane: exposure coverage + smoothed daily trend ----
    ev = load_events(spark, sf_dir)
    iv = ev.filter(F.col("value").isNotNull() & (F.col("value") > 0)).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (
            F.unix_micros(F.col("ts"))
            + F.floor(F.col("value") * F.lit(60000000.0)).cast("long")
        ).alias("e"),
    )
    cov = interval_coverage(iv, ["user_id"], "s", "e")
    top = cov.orderBy(F.desc("covered")).limit(3).collect()
    for row in top:
        print(f"user {row['user_id']}: {row['covered'] / 3.6e9:.1f} h covered "
              f"across {row['n_islands']} disjoint spans "
              f"({row['n_intervals']} raw intervals)")

    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("day_avg"))
    )
    sm = ewma_smooth(daily, ["event_type"], "day", "day_avg", alpha=0.5)
    sm.filter(F.col("event_type") == "click").orderBy(F.desc("day")).select(
        "day", F.round("day_avg", 2).alias("raw"), F.round("ewma", 2).alias("smooth")
    ).show(5)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
