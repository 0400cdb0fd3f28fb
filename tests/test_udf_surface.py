"""User-function surface (SURVEY §2.2 "UDF/UDAF/UDTF"): the engine
inherits all three Spark user-function forms. Each is pinned against
its native-expression equivalent — and each docstring states why the
native form wins in the hot path (the repo's UDFs-are-the-slow-path
policy: nothing in otters_spark's own operators uses these except
Arrow mapInPandas kernels where JVM expressions genuinely cannot
express the math)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    )


def test_scalar_pandas_udf_matches_native(li):
    # Arrow-vectorized scalar UDF: revenue = price * (1 - discount).
    # Native wins: whole-stage codegen, no Arrow serialization hop.
    @F.pandas_udf("double")
    def revenue(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    out = li.select(
        revenue("l_extendedprice", "l_discount").alias("udf"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("native"),
    ).filter(F.abs(F.col("udf") - F.col("native")) > 1e-9)
    assert out.count() == 0


def test_grouped_agg_pandas_udf_matches_native(li):
    # UDAF form: a GROUPED_AGG pandas UDF (discount-weighted mean
    # quantity). Native wins: partial aggregation (map-side combine);
    # the pandas UDAF ships whole groups through Arrow.
    @F.pandas_udf("double")
    def wmean(q: pd.Series, w: pd.Series) -> float:
        return float((q * w).sum() / w.sum())

    udaf = li.groupBy("l_returnflag").agg(
        wmean("l_quantity", "l_extendedprice").alias("wm")
    )
    native = li.groupBy("l_returnflag").agg(
        (
            F.sum(F.col("l_quantity") * F.col("l_extendedprice"))
            / F.sum("l_extendedprice")
        ).alias("wm_native")
    )
    j = udaf.join(native, "l_returnflag")
    bad = j.filter(F.abs(F.col("wm") - F.col("wm_native")) > 1e-6).count()
    assert bad == 0


def test_python_udtf_matches_explode(spark, sf_dir):
    # UDTF form (Spark 4 table function): tokenize a document into
    # (pos, token) rows. Native wins: posexplode(split()) stays in
    # codegen and composes with pushdown; a Python UDTF is a
    # row-by-row Python boundary.
    udtf_mod = pytest.importorskip("pyspark.sql.functions")
    if not hasattr(udtf_mod, "udtf"):
        pytest.skip("pyspark.sql.functions.udtf not available")

    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos: int, token: string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, t in enumerate(text.split(" ")):
                if t:
                    yield i, t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    spark.udtf.register("tokenize_udtf", Tokenize)
    docs.createOrReplaceTempView("t_udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, tok.pos, tok.token "
        "FROM t_udtf_docs d, LATERAL tokenize_udtf(d.text) tok"
    )
    native = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).filter(F.col("token") != "")
    assert via_udtf.exceptAll(native).count() == 0
    assert native.exceptAll(via_udtf).count() == 0
