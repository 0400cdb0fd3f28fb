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


def test_skew_report_matches_hand_computation(spark):
    import math

    from otters_spark.operators.skew import skew_report

    # key 'hot' owns 16 of 24 rows; 4 cold keys own 2 each
    rows = [("hot",)] * 16 + [(k,) for k in "abcd" for _ in range(2)]
    df = spark.createDataFrame(rows, "k string")
    got = skew_report(df, ["k"], top_k=3).collect()[0]
    counts = [16, 2, 2, 2, 2]
    n = sum(counts)
    ent = math.log(n) - sum(c * math.log(c) for c in counts) / n
    assert got["n_rows"] == n and got["n_keys"] == 5
    assert got["max_count"] == 16
    assert got["p_top1"] == round(16 / n, 6)
    assert got["p_topk"] == round(20 / n, 6)  # 16 + 2 + 2
    assert got["entropy"] == pytest.approx(round(ent, 6), abs=1e-6)
    assert got["norm_entropy"] == pytest.approx(
        round(ent / math.log(5), 6), abs=1e-6
    )


def test_skew_report_uniform_and_degenerate(spark):
    from otters_spark.operators.skew import skew_report

    uni = spark.createDataFrame([(i % 8,) for i in range(64)], "k int")
    got = skew_report(uni, ["k"]).collect()[0]
    assert got["norm_entropy"] == 1.0  # uniform keys
    one = spark.createDataFrame([(1,)] * 5, "k int")
    got1 = skew_report(one, ["k"]).collect()[0]
    assert got1["n_keys"] == 1 and got1["p_top1"] == 1.0
    assert got1["norm_entropy"] is None  # ln(1) division guarded
    with pytest.raises(ValueError):
        skew_report(uni, [])
