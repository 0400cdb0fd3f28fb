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

    # --- the training-data pipeline lane, end to end on one corpus ---
    from pyspark.sql import functions as F

    from otters_spark.operators.pii import pii_scrub
    from otters_spark.operators.sampling import (
        select_to_token_budget,
        stratified_sample,
    )
    from otters_spark.operators.text_analysis import (
        quality_features,
        repetition_features,
    )

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and then the cat sat again", "web"),
            (1, "spam spam spam spam spam spam spam spam", "web"),
            (2, "mail me at a@b.com or call 555-123-4567 today", "forum"),
            (3, "a careful essay with varied vocabulary and structure", "books"),
        ],
        ["doc_id", "text", "source"],
    )
    print("\npipeline: scrub -> repetition gate -> quality -> mix -> budget")
    clean = pii_scrub(docs).join(docs.select("doc_id", "source"), "doc_id")
    # thresholds loosened for short demo docs (defaults are calibrated
    # for long-form corpora where unique bigrams dominate)
    gated = repetition_features(
        clean.withColumnRenamed("clean_text", "text"),
        dup_token_max=0.5, top_bigram_max=0.3, dup_bigram_max=0.3,
    )
    print("repetition verdicts:")
    gated.select("doc_id", "dup_token_frac", "keep").show()
    mixed = stratified_sample(docs, "source", {"web": 1.0, "books": 1.0}, default=0.5)
    q = quality_features(docs).join(docs.select("doc_id"), "doc_id")
    budgeted = select_to_token_budget(q, 20, "quality_score", "n_tokens")
    print("kept under a 20-token budget (best quality first):")
    budgeted.select("doc_id", "n_tokens", "quality_score").show()
    del mixed
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
