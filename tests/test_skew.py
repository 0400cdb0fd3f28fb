"""Salted aggregation/join must be result-identical to the plain ops."""

import pytest

from otters_spark.operators.skew import salted_agg, salted_join
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_salted_agg_matches_plain(li):
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.count(F.lit(1)).alias("n"),
            F.max("l_extendedprice").alias("mx"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    salted = (
        salted_agg(
            li,
            ["l_returnflag"],
            {"qty": "sum(l_quantity)", "n": "count(*)", "mx": "max(l_extendedprice)"},
            salt=8,
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [tuple(r) for r in plain] == pytest.approx([tuple(r) for r in salted])


def test_salted_join_matches_plain(spark, sf_dir, li):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    li2 = li.withColumnRenamed("l_partkey", "p_partkey")
    plain = li2.join(part, "p_partkey").count()
    salted = salted_join(li2, part, "p_partkey", salt=8).count()
    assert plain == salted


def test_salted_agg_rejects_avg(li):
    with pytest.raises(ValueError):
        salted_agg(li, ["l_returnflag"], {"a": "avg(l_quantity)"})


def test_salted_join_rejects_outer(spark, sf_dir, li):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    li2 = li.withColumnRenamed("l_partkey", "p_partkey")
    # replicating the small side would emit unmatched rows salt times
    with pytest.raises(ValueError):
        salted_join(li2, part, "p_partkey", how="full_outer")
    with pytest.raises(ValueError):
        salted_join(li2, part, "p_partkey", how="right")
