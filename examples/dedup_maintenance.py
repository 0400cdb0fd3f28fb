#!/usr/bin/env python
"""Continuous-dedup maintenance demo: the life of a living corpus —

    cluster the standing corpus once (near-dup pairs ->
    connected_components) -> a new batch arrives -> gate it against
    the corpus (incremental_dedup_matches) -> merge its match pairs
    into the standing component table WITHOUT re-clustering
    (incremental_components, contracted-graph CC) -> verify the
    incremental table equals a from-scratch re-cluster.

The point at 100 TB: the re-cluster never reruns — per-batch cost
tracks the batch. The streaming twin
(streaming.streaming_component_maintenance) runs the same merge per
micro-batch from a match-pair stream.

Run:  python examples/dedup_maintenance.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import otters_spark as ot
from otters_spark.operators.dedup import (
    connected_components,
    incremental_components,
    incremental_dedup_matches,
    jaccard_pairs_exploded,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = ot.get_spark(app_name="otters-dedup-maintenance")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 7 != 3)
    batch = docs.filter(F.col("doc_id") % 7 == 3)

    # 1. standing component table: cluster the corpus once
    corpus_pairs = jaccard_pairs_exploded(
        corpus, 0.8, block_cols=["lang", "source"]
    ).select("id_a", "id_b")
    components = connected_components(corpus_pairs).localCheckpoint()
    print(f"standing table: {components.count()} clustered corpus docs")

    # 2. gate the new batch: (new_id, corpus_id, jaccard) matches
    matches = incremental_dedup_matches(
        batch, corpus, 0.8, bands=2, block_cols=["lang", "source"]
    ).select(
        F.col("new_id").alias("id_a"), F.col("corpus_id").alias("id_b")
    )
    # batch-internal near-dups join the same merge (both-new pairs)
    batch_pairs = jaccard_pairs_exploded(
        batch, 0.8, block_cols=["lang", "source"]
    ).select("id_a", "id_b")
    new_pairs = matches.unionByName(batch_pairs)
    print(f"gate matches + batch-internal pairs: {new_pairs.count()}")

    # 3. merge incrementally — corpus table touched by ONE keyed join
    updated = incremental_components(components, new_pairs)
    print(f"updated table: {updated.count()} docs in components")

    # 4. prove it: equal to re-clustering everything from scratch.
    # The gate's banded candidates can MISS pairs the exact generator
    # finds (banding recall < 1 by design), so the from-scratch
    # reference uses the same pair set the incremental path saw.
    all_pairs = corpus_pairs.unionByName(new_pairs)
    full = connected_components(all_pairs)
    diff = (
        updated.withColumnRenamed("component", "c_inc")
        .join(full.withColumnRenamed("component", "c_full"), "id", "full")
        .filter(
            F.col("c_inc").isNull()
            | F.col("c_full").isNull()
            | (F.col("c_inc") != F.col("c_full"))
        )
        .count()
    )
    print(f"incremental vs full recompute: {diff} disagreements")
    assert diff == 0
    print("OK: incremental maintenance == from-scratch re-cluster")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
