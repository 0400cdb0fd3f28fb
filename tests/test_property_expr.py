"""Property-based differential test of the expression layer: random
predicate trees evaluated by Spark (via compile_expr) must agree with a
pure-Python reference evaluator implementing the documented semantics
(SQL 3VL: NULL never matches). All predicates for a batch of examples
are evaluated in ONE Spark action to keep runtime sane."""

import datetime as dt
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from otters_spark.expr import col, compile_expr

SCHEMA = T.StructType(
    [
        T.StructField("rid", T.IntegerType(), False),
        T.StructField("i", T.IntegerType(), True),
        T.StructField("f", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("d", T.TimestampType(), True),
    ]
)

ROWS = [
    (0, 5, 1.5, "a", dt.datetime(2023, 1, 1)),
    (1, -3, -0.5, "b", dt.datetime(2023, 6, 1)),
    (2, None, 2.5, "a", None),
    (3, 0, None, None, dt.datetime(2024, 1, 1)),
    (4, 7, 0.0, "", dt.datetime(2022, 12, 31)),
    (5, 2147, 1e9, "zz", dt.datetime(2023, 1, 1)),
]

_OPS = {
    "eq": lambda a, b: a == b,
    "neq": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
}


def py_eval(node, row) -> bool:
    """Reference evaluator: 3VL collapsed to match-or-not (NULL -> no)."""
    if node.kind == "cmp":
        v = row[node.left.name]
        if v is None:
            return False
        litv = node.right.value
        if node.left.name == "d" and isinstance(litv, str):
            from otters_spark.expr import parse_datetime_literal

            litv = parse_datetime_literal(litv)
        if node.left.name == "f":
            litv = float(litv)
        return _OPS[node.op](v, litv)
    if node.kind == "and":
        return py_eval(node.left, row) and py_eval(node.right, row)
    if node.kind == "or":
        return py_eval(node.left, row) or py_eval(node.right, row)
    raise AssertionError(node.kind)


def _random_leaf(rng: random.Random):
    c = rng.choice(["i", "f", "s", "d"])
    if c == "i":
        op = rng.choice(list(_OPS))
        return col("i")._cmp(op, rng.choice([-3, 0, 5, 7, 2147]))
    if c == "f":
        op = rng.choice(list(_OPS))
        return col("f")._cmp(op, rng.choice([-0.5, 0.0, 1.5, 2.5, 2]))
    if c == "s":
        op = rng.choice(["eq", "neq"])
        return col("s")._cmp(op, rng.choice(["a", "b", "", "zz", "nope"]))
    op = rng.choice(list(_OPS))
    return col("d")._cmp(
        op, rng.choice(["2023-01-01", "2023-06-01", "2024-01-01 00:00:00"])
    )


def _random_tree(rng: random.Random, depth: int):
    if depth <= 0 or rng.random() < 0.4:
        return _random_leaf(rng)
    l, r = _random_tree(rng, depth - 1), _random_tree(rng, depth - 1)
    return (l & r) if rng.random() < 0.5 else (l | r)


def test_random_predicates_match_reference(spark):
    rng = random.Random(1234)
    trees = [_random_tree(rng, 3) for _ in range(60)]
    compiled = [compile_expr(t, SCHEMA) for t in trees]
    df = spark.createDataFrame(ROWS, SCHEMA)
    # one action: each predicate becomes a boolean column
    sel = [F.coalesce(c.condition, F.lit(False)).alias(f"p{i}") for i, c in enumerate(compiled)]
    got_rows = {r["rid"]: r for r in df.select("rid", *sel).collect()}
    rowdicts = [dict(zip([f.name for f in SCHEMA.fields], r)) for r in ROWS]
    mismatches = []
    for i, t in enumerate(trees):
        for row in rowdicts:
            want = py_eval(t, row)
            got = bool(got_rows[row["rid"]][f"p{i}"])
            if want != got:
                mismatches.append((i, row["rid"], repr(t), want, got))
    assert not mismatches, mismatches[:5]
