"""Bucketed tables must join without a shuffle — the co-located join
layout that matters at fact-table scale."""

import pytest
from pyspark.sql import functions as F

from otters_spark.sources import write_bucketed_table


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed_table(li, "b_lineitem", ["o_orderkey"], n_buckets=8)
    try:
        # force a sort-merge join so the test exercises the bucketed
        # path (broadcast would trivially avoid the exchange)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan[:2000]}"
        # and it's correct
        expect = orders.join(li, "o_orderkey").count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
