#!/usr/bin/env python
"""Warehouse-maintenance demo over the testdata tables — the
"keep yesterday's answers fresh without re-reading the corpus" lane:

    snapshot v1 -> signed change feed -> incrementally maintained
    aggregate (proved equal to a rebuild) -> maintained JOIN view
    under both-side churn (delta-join identity) -> AMS join-size
    estimate read BEFORE paying the key shuffle -> exposure-interval
    coverage and EWMA-smoothed daily trends -> OLS revenue trend and
    Benford first-digit audit as the closing health report.

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
from otters_spark.operators.quality_checks import benford_audit
from otters_spark.operators.stats import group_trend
from otters_spark.sources.merge import (
    apply_agg_delta,
    change_feed,
    join_change_feed,
)
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

    # maintained JOIN view: per-segment revenue under simultaneous
    # order churn (re-price) and customer churn (segment move) — the
    # delta feed touches only changed rows, never the corpus
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), F.col("c_mktsegment").alias("seg")
    )
    ob = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    o2 = ob.withColumn(
        "cents",
        F.when(F.col("ok") % 5 == 0, F.col("cents") + 10000).otherwise(
            F.col("cents")
        ),
    )
    c2 = cust.withColumn(
        "seg",
        F.when(F.col("ck") % 17 == 0, F.lit("MACHINERY")).otherwise(
            F.col("seg")
        ),
    )
    agg1 = ob.join(cust, "ck").groupBy("seg").agg(
        F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n")
    )
    feed = join_change_feed(
        change_feed(ob, o2, ["ok"], ["ck", "cents"]),
        change_feed(cust, c2, ["ck"], ["seg"]),
        r_old=ob,
        s_new=c2,
        on=["ck"],
    )
    maintained = apply_agg_delta(agg1, feed, ["seg"], ["cents"], count_col="n")
    print("maintained join view (per-segment revenue after churn):")
    maintained.orderBy("seg").show()

    # closing health report: monthly revenue trend per return flag +
    # Benford first-digit audit of order totals
    li = load(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_returnflag",
        ((F.year("l_shipdate") - 1995) * 12 + F.month("l_shipdate") - 1).alias("m"),
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
        ).alias("rev")
    )
    print("revenue trend per return flag (slope in cents/month):")
    group_trend(monthly, ["l_returnflag"], "m", "rev").orderBy(
        "l_returnflag"
    ).show()
    print("Benford first-digit audit of order totals:")
    benford_audit(
        load(spark, sf_dir, "orders").select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
        ),
        "cents",
    ).show()

    # hierarchy rollup (round 5): subtree account-balance totals over
    # the synthetic customer forest (parent = key div 10) — the
    # RECURSIVE-CTE aggregation, done in log(depth) doubling joins
    from otters_spark.operators.graph import subtree_rollup

    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node"),
        F.when(F.col("c_custkey") < 10, F.col("c_custkey"))
        .otherwise(F.expr("c_custkey div 10"))
        .alias("parent"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    print("top-of-hierarchy subtree balance totals (keys < 10):")
    subtree_rollup(
        cust.select("node", "parent"),
        cust.select("node", "bal_c"),
        value_col="bal_c",
        max_depth=8,
    ).filter(F.col("node") < 10).orderBy("node").show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
