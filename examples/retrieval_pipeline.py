#!/usr/bin/env python
"""Retrieval-lane demo: every tier of the similarity stack on one
corpus —

    exact brute-force cosine (the reference surface) -> LSH-pruned
    approximate search -> IVF + PQ (memory-bound ANN) -> MaxSim
    late-interaction rescore -> hard-negative mining + leakage-safe
    split for contrastive training prep.

Run:  python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import otters_spark as ot
from otters_spark.operators.similarity import (
    hyperplanes,
    lsh_index,
    lsh_search,
    maxsim_topk,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = ot.get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    store = ot.MetaStore.from_df(emb, vec_col="embedding", id_col="vec_id")
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]

    # 1. exact tier — the reference's own query shape
    exact = store.query(q, "cosine").take(5).df()
    print("exact cosine top-5:")
    exact.show()

    # 2. LSH tier — prune to matching hyperplane buckets, rescore inside
    planes = hyperplanes(dim=len(q), n_planes=10, seed=42)
    indexed = lsh_index(store.df, planes)
    approx = lsh_search(indexed, q, planes, k=5, multiprobe=1)
    print("LSH top-5 (bucket-pruned):")
    approx.show()

    # 3. late-interaction tier — multi-vector docs (8 tokens each),
    # a 2-token query, MaxSim scoring
    toks = emb.select(
        (F.col("vec_id") / 8).cast("long").alias("group_id"), "embedding"
    )
    q2 = [float(x) for x in emb.orderBy(F.desc("vec_id")).first()["embedding"]]
    late = maxsim_topk(toks, [q, q2], k=5)
    print("MaxSim top-5 multi-vector docs:")
    late.show()

    # 4. training prep — mine hard negatives, then split WITHOUT
    # near-dup leakage across train/test
    from otters_spark.operators.dedup import embedding_neardup_pairs
    from otters_spark.operators.sampling import leakage_safe_split

    pairs = embedding_neardup_pairs(
        store.df, threshold=0.95, id_col="vec_id", vec_col="embedding"
    ).select("id_a", "id_b")
    split = leakage_safe_split(
        emb, pairs, key_col="vec_id", weights={"train": 0.9, "test": 0.1}
    )
    summary = split.groupBy("split").count().orderBy("split")
    print("leakage-safe split (near-dup clusters never straddle):")
    summary.show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
