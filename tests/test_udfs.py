"""UDF / UDAF / UDTF surface (SURVEY §2.2: the reference's expression
DSL is closed; user functions come free with Spark — demonstrated and
pinned here across all four flavors)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_row_udf(spark):
    # row-at-a-time Python UDF — works, documented slow path
    @F.udf(returnType=T.IntegerType())
    def str_weight(s):
        return sum(ord(c) for c in s) % 1000

    df = spark.createDataFrame([("ab",), ("cd",)], ["s"]).select(str_weight("s").alias("w"))
    rows = [r["w"] for r in df.collect()]
    assert rows == [(97 + 98) % 1000, (99 + 100) % 1000]


def test_pandas_scalar_udf(spark):
    # Arrow-vectorized scalar UDF — the sanctioned Python fast path
    @F.pandas_udf(T.DoubleType())
    def zscore(v: pd.Series) -> pd.Series:
        return (v - 3.0) / 2.0

    df = spark.createDataFrame([(1.0,), (5.0,)], ["x"]).select(zscore("x").alias("z"))
    assert [r["z"] for r in df.collect()] == [-1.0, 1.0]


def test_pandas_grouped_agg_udaf(spark):
    @F.pandas_udf(T.DoubleType())
    def midrange(v: pd.Series) -> float:
        return float((v.min() + v.max()) / 2.0)

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("b", 2.0)], ["k", "x"]
    )
    got = {
        r["k"]: r["m"]
        for r in df.groupBy("k").agg(midrange("x").alias("m")).collect()
    }
    assert got == {"a": 3.0, "b": 2.0}


def test_grouped_map_apply_in_pandas(spark):
    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["x"] = pdf["x"] - pdf["x"].mean()
        return pdf

    df = spark.createDataFrame([("a", 1.0), ("a", 3.0), ("b", 7.0)], ["k", "x"])
    out = df.groupBy("k").applyInPandas(demean, df.schema)
    got = sorted((r["k"], r["x"]) for r in out.collect())
    assert got == [("a", -1.0), ("a", 1.0), ("b", 0.0)]


def test_python_udtf(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate(text.split(" ")):
                yield t, i

    Tokenize_reg = Tokenize  # keep flake quiet
    spark.udtf.register("tokenize_udtf", Tokenize_reg)
    rows = spark.sql("SELECT * FROM tokenize_udtf('a b c')").collect()
    assert [(r["tok"], r["pos"]) for r in rows] == [("a", 0), ("b", 1), ("c", 2)]
