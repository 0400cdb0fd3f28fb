"""Differential fuzz of the vector metrics: 200 random vector pairs
(incl. zeros, negatives, tiny/huge magnitudes) scored by the engine's
codegen expressions vs NumPy float64 reference, one Spark action."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from otters_spark.functions.vector import (
    cosine_expr,
    dot_expr,
    euclidean_sq_expr,
    inv_norm_expr,
)


def make_pairs():
    rng = np.random.default_rng(2024)
    pairs = []
    for i in range(200):
        d = int(rng.integers(1, 33))
        a = rng.standard_normal(d) * (10.0 ** rng.integers(-3, 4))
        b = rng.standard_normal(d) * (10.0 ** rng.integers(-3, 4))
        if i % 17 == 0:
            a = np.zeros(d)  # zero-vector convention
        if i % 23 == 0:
            b = -a  # antiparallel
        pairs.append((i, [float(x) for x in a], [float(x) for x in b]))
    return pairs


def np_scores(a, b):
    a, b = np.asarray(a), np.asarray(b)
    dot = float(a @ b)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    cos = 0.0 if na == 0 or nb == 0 else dot / (na * nb)
    euc = float(((a - b) ** 2).sum())
    return dot, cos, euc


def test_metrics_match_numpy(spark):
    pairs = make_pairs()
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("a", T.ArrayType(T.DoubleType())),
            T.StructField("b", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(pairs, schema)
    got = {
        r["i"]: (r["dot"], r["cos"], r["euc"])
        for r in df.select(
            "i",
            dot_expr("a", "b").alias("dot"),
            cosine_expr("a", "b", inv_norm_expr("a"), inv_norm_expr("b")).alias("cos"),
            euclidean_sq_expr("a", "b").alias("euc"),
        ).collect()
    }
    for i, a, b in pairs:
        dot, cos, euc = np_scores(a, b)
        gd, gc, ge = got[i]
        assert gd == pytest.approx(dot, rel=1e-12, abs=1e-12), f"dot pair {i}"
        assert gc == pytest.approx(cos, rel=1e-9, abs=1e-12), f"cos pair {i}"
        assert ge == pytest.approx(euc, rel=1e-12, abs=1e-12), f"euc pair {i}"
