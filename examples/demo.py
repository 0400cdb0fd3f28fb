#!/usr/bin/env python
"""End-to-end demo mirroring the reference's examples/demo.rs
(/root/reference/examples/demo.rs:29-113): build a 1000-item store with
per-chunk-clustered metadata, run the canonical query — cosine top-5
with `price <= 50 & version >= 2 & exp >= date` plus a score
threshold — and print results + query stats.

Run:  python examples/demo.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

import otters_spark as ot
from otters_spark import col

DIM = 100
N = 1000

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("mfg", T.TimestampType(), True),
        T.StructField("exp", T.TimestampType(), True),
        T.StructField("version", T.IntegerType(), True),
    ]
)


def make_rows():
    """Deterministic item catalog, price clustered in blocks of 128 so
    zonemap-style pruning is observable (demo.rs alternates cheap /
    expensive blocks)."""
    rng = np.random.default_rng(42)
    rows = []
    for i in range(N):
        vec = rng.standard_normal(DIM).astype("float32")
        block = i // 128
        price = float(80 + i % 20) if block % 2 == 0 else float(10 + i % 20)
        rows.append(
            (
                i,
                [float(x) for x in vec],
                f"item_{i}",
                price,
                dt.datetime(2024, 1 + (i % 6), 1),
                dt.datetime(2024, 6 + (i % 6), 1),
                1 + i % 3,
            )
        )
    return rows


def main() -> int:
    spark = ot.get_spark(app_name="otters-spark-demo", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    store = ot.MetaStore.from_df(
        spark.createDataFrame(make_rows(), SCHEMA), vec_col="embedding", id_col="vec_id"
    )
    print(f"store: {store.count()} items, dim={store.dim}")
    print("schema:", store.schema)
    print("\nhead():")
    print(store.head(3).drop(columns=["embedding", "__inv_norm"]))

    query = [float(x) for x in np.random.default_rng(7).standard_normal(DIM)]
    plan = (
        store.query(query, metric="cosine")
        .meta_filter(
            (col("price").lte(50.0))
            & (col("version").gte(2))
            & (col("exp").gte("2024-08-01"))
        )
        .vec_filter(0.1, "gt")
        .take(5)
    )
    rows, stats = plan.collect_with_stats()

    print("\ncosine top-5 with price<=50 & version>=2 & exp>='2024-08-01' & score>0.1:")
    from otters_spark.display import format_result

    print(format_result(rows, store.id_col))
    store.print_last_query_stats()

    # string roadmap predicates (reference README.md:210) push to the scan
    named = (
        store.query(query, "cosine")
        .meta_filter(col("name").starts_with("item_1") & col("name").ends_with("9"))
        .take(3)
    )
    print("\nname starts_with 'item_1' & ends_with '9':")
    named.show()

    # strict typing demo: float literal vs int column is an error, not a cast
    try:
        store.query(query, "cosine").meta_filter(col("version").gt(1.5)).collect()
    except ot.TypeMismatchError as e:
        print(f"\nstrict typing: {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
