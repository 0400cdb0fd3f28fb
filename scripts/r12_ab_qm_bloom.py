#!/usr/bin/env python
"""Round-12 in-session A/Bs (VERDICT item 5):

* pipeline_quality_model — feats pin (current) vs unpinned (r11): the
  old variant is reproduced by stripping the localCheckpoint via a
  monkeypatched quality_feature_table wrapper? No — the pin lives in
  the suite function, so the old variant is an inline copy of the r11
  suite body.
* pipeline_bloom_decontam — chained-broadcast bloom_probe (current) vs
  the r11 explode+groupBy probe (inline copy).

Both variants per query run in ONE session, mirrored order, min-of-N;
job counts recorded per variant.
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def old_quality_model(spark, sf_dir):
    """r11 pipeline_quality_model body (no feats pin)."""
    from otters_spark.operators.quality_model import (
        quality_feature_table, score_nb, train_nb_quality,
    )
    from otters_spark.operators.sampling import hash_split
    from otters_spark.suite import load

    docs = load(spark, sf_dir, "documents")
    spam = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.col("lang"),
        F.concat_ws(
            " ",
            F.array_repeat(F.element_at(F.split(F.col("text"), " "), 1), 80),
        ).alias("text"),
    )
    labeled = docs.select(
        "doc_id", "lang", "text", F.lit(1.0).alias("label")
    ).unionByName(
        spam.select("doc_id", "lang", "text", F.lit(0.0).alias("label"))
    )
    feats = quality_feature_table(labeled, keep_cols=["lang", "label"])
    train = hash_split(feats, weights={"train": 0.8, "held": 0.2})
    stats = train_nb_quality(train.filter(F.col("split") == "train").drop("split"))
    scored = score_nb(feats.filter(F.col("label") == 1.0), stats)
    return (
        scored.groupBy("lang")
        .agg(
            F.round(F.avg("quality_prob"), 4).alias("avg_prob"),
            F.sum((F.col("quality_prob") > 0.5).cast("long")).alias("n_keep"),
        )
        .orderBy("lang")
    )


def old_bloom_probe(df, value_col, bloom, m_bits, k=4, hashed=False,
                    out_col="maybe_member"):
    """r11 bloom_probe (explode + broadcast join + groupBy row id)."""
    from otters_spark.functions.text import md5_long_expr
    from otters_spark.operators.bloom import _bit_positions, _word_mask

    h = F.col(value_col) if hashed else md5_long_expr(F.col(value_col))
    rowed = df.select(
        F.struct(*df.columns).alias("__payload"),
        h.alias("__hv"),
        F.monotonically_increasing_id().alias("__row"),
    )
    pairs = rowed.select(
        "__payload", "__row",
        F.explode(_bit_positions(F.col("__hv"), m_bits, k)).alias("__b"),
    )
    word_idx, mask = _word_mask(F.col("__b"))
    pairs = pairs.select(
        "__payload", "__row", word_idx.alias("word_idx"), mask.alias("__mask")
    )
    verdicts = (
        pairs.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "__payload", "__row",
            (
                F.col("word").isNotNull()
                & (F.col("word").bitwiseAND(F.col("__mask")) == F.col("__mask"))
            ).alias("__hit"),
        )
        .groupBy("__row")
        .agg(
            F.first("__payload").alias("__payload"),
            F.coalesce(F.bool_and("__hit"), F.lit(False)).alias(out_col),
        )
    )
    return verdicts.select("__payload.*", out_col)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import otters_spark.operators.bloom as bloom_mod
    from otters_spark.session import get_spark
    from otters_spark.suite import QUERIES

    new_probe = bloom_mod.bloom_probe
    spark = get_spark(app_name="r12-ab-qmbloom", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    cases = {
        "quality_model": {
            "new": lambda: QUERIES["pipeline_quality_model"](spark, sf_dir),
            "old": lambda: old_quality_model(spark, sf_dir),
            "patch": None,
        },
        "bloom_decontam": {
            "new": lambda: QUERIES["pipeline_bloom_decontam"](spark, sf_dir),
            "old": lambda: QUERIES["pipeline_bloom_decontam"](spark, sf_dir),
            "patch": old_bloom_probe,
        },
    }

    def run(case, variant):
        if cases[case]["patch"] is not None:
            bloom_mod.bloom_probe = (
                new_probe if variant == "new" else cases[case]["patch"]
            )
        try:
            cases[case][variant]().write.format("noop").mode("overwrite").save()
        finally:
            bloom_mod.bloom_probe = new_probe

    import gc
    for case in cases:
        run(case, "new")  # warm
        best = {"new": None, "old": None}
        for r in range(reps):
            order = ["new", "old"] if r % 2 == 0 else ["old", "new"]
            for v in order:
                spark.sparkContext.setJobDescription(f"{case} {v} rep{r}")
                t0 = time.perf_counter()
                run(case, v)
                dt = time.perf_counter() - t0
                best[v] = dt if best[v] is None else min(best[v], dt)
                gc.collect()
        jobs = {}
        for v in ("new", "old"):
            st = spark.sparkContext.statusTracker()
            gid = uuid.uuid4().hex
            spark.sparkContext.setJobGroup(gid, "count")
            try:
                run(case, v)
            finally:
                spark.sparkContext.setJobGroup(None, None)
            jobs[v] = len(st.getJobIdsForGroup(gid))
        spark.sparkContext.setJobDescription(None)
        print(f"{case}: wall new={best['new']:.3f} old={best['old']:.3f}  "
              f"jobs new={jobs['new']} old={jobs['old']}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
