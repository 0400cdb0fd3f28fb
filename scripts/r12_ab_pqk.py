#!/usr/bin/env python
"""Round-12 A/B (VERDICT item 3): per_query_topk JVM WindowGroupLimit
shape (current) vs the round-11 mapInPandas partial, interleaved in ONE
session so box drift cancels. Measures:

* the batch path (vs_per_query_topk's plan) at sf0.1
* the same plan over a 10x-replicated store (the scale probe)
* one serving micro-batch worth of scoring (the foreachBatch plan body)

Usage: python scripts/r12_ab_pqk.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def pqk_pandas(scored, k, query_col="query_id", score_col="score",
               id_col="vec_id", ascending=False):
    """The round-11 mapInPandas partial + bounded window (verbatim)."""
    out_schema = scored.schema
    cols = scored.columns
    na_pos = "last" if ascending else "first"

    def partial(batches):
        import pandas as pd

        best = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cur = pdf if best is None else pd.concat([best, pdf], ignore_index=True)
            cur = cur.sort_values(
                [score_col, id_col],
                ascending=[ascending, True],
                na_position=na_pos,
                kind="mergesort",
            )
            best = cur.groupby(query_col, sort=False).head(k)
        if best is not None and len(best):
            yield best[cols]

    from pyspark.sql.window import Window

    partial_topk = scored.mapInPandas(partial, out_schema)
    direction = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    w = Window.partitionBy(query_col).orderBy(direction, F.col(id_col).asc())
    return (
        partial_topk.withColumn("__pqk_rn", F.row_number().over(w))
        .filter(F.col("__pqk_rn") <= k)
        .drop("__pqk_rn")
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from otters_spark.operators.similarity import per_query_topk
    from otters_spark.session import get_spark
    from otters_spark.functions.vector import queries_df, score_expr
    from otters_spark.store import INV_NORM_COL
    from otters_spark.suite import Q7, Q11, Q13, emb_store

    spark = get_spark(app_name="r12-ab-pqk", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    store = emb_store(spark, sf_dir)
    qdf = queries_df(spark, [Q7, Q11, Q13])

    def scored_of(df):
        return df.crossJoin(F.broadcast(qdf)).withColumn(
            "score",
            score_expr("embedding", "qvec", "cosine", INV_NORM_COL,
                       F.col("q_inv_norm")),
        ).select("query_id", "vec_id", "score", "label")

    base = store.df
    # 10x store: replicate with distinct ids (same data distribution)
    big = base
    for i in range(1, 10):
        big = big.unionByName(
            base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        )
    big = big.localCheckpoint()  # materialize once; both variants read it

    cases = {
        "sf01": scored_of(base),
        "10x": scored_of(big),
    }

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # warm
    run(per_query_topk(cases["sf01"], 5))
    run(pqk_pandas(cases["sf01"], 5))

    out = {}
    for case, scored in cases.items():
        for variant, fn in (("jvm", per_query_topk), ("pandas", pqk_pandas)):
            out[f"{case}:{variant}"] = None
    for r in range(reps):
        for case, scored in cases.items():
            # mirrored order A/B/B/A across reps so drift cancels
            order = (("jvm", per_query_topk), ("pandas", pqk_pandas))
            if r % 2:
                order = order[::-1]
            for variant, fn in order:
                key = f"{case}:{variant}"
                spark.sparkContext.setJobDescription(f"pqk {key} rep{r}")
                t0 = time.perf_counter()
                run(fn(scored, 5))
                dt = time.perf_counter() - t0
                out[key] = dt if out[key] is None else min(out[key], dt)
    spark.sparkContext.setJobDescription(None)
    for k in sorted(out):
        print(f"{out[k]:8.3f}  {k}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
