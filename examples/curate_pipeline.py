#!/usr/bin/env python
"""End-to-end training-data curation demo over the testdata corpus —
the extension surface beyond the reference's vector-search core:

    gates -> PII scrub -> boilerplate removal -> near-dup clustering
    (keep best quality) -> benchmark decontamination -> temperature
    mixing -> incremental ingest gate for a late-arriving batch.

Run:  python examples/curate_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import otters_spark as ot
from otters_spark.operators.dedup import (
    incremental_dedup,
    jaccard_pairs_exploded,
    keep_representatives,
    remove_frequent_segments,
)
from otters_spark.operators.decontam import contamination_report
from otters_spark.operators.pii import pii_scrub
from otters_spark.operators.sampling import temperature_mix
from otters_spark.operators.text_analysis import quality_features


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = ot.get_spark(app_name="otters-curate-demo")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. quality gates (scan-fused, zero shuffle)
    feats = quality_features(docs, keep_cols=["lang", "source", "text"])
    gated = feats.filter(
        (F.col("n_tokens") >= 10) & (F.col("quality_score") >= 0.3)
    )

    # 2. PII scrub (regex projection)
    clean = pii_scrub(
        gated.select("doc_id", "lang", "source", "text"),
        keep_cols=("lang", "source"),
    ).withColumnRenamed("clean_text", "text")

    # 3. corpus-frequency boilerplate removal (CCNet line-dedup shape)
    seg = remove_frequent_segments(clean, width=3, min_docs=2)
    clean = (
        clean.drop("text")
        .join(seg.select("doc_id", F.col("cleaned").alias("text")), "doc_id")
        .filter(F.length("text") > 0)
    )

    # 4. near-dup clustering, keep the best-quality member per cluster
    pairs = jaccard_pairs_exploded(clean, 0.8, block_cols=["lang", "source"])
    scored = clean.join(
        quality_features(clean).select("doc_id", "quality_score"), "doc_id"
    )
    kept = keep_representatives(scored, pairs, quality_col="quality_score")

    # 5. benchmark decontamination (n-gram collision vs a tiny "eval set")
    bench = docs.orderBy("doc_id").limit(5).select("doc_id", "text")
    hits = contamination_report(kept, bench, n=8)
    kept = kept.join(
        hits.select(F.col("train_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )

    # 6. temperature mixing toward a flatter language mixture
    mixed = temperature_mix(kept, "lang", alpha=0.5)

    # 7. late batch arrives: admit only genuinely new documents
    late = docs.filter(F.col("doc_id") % 7 == 3)
    admitted = incremental_dedup(
        late, mixed, 0.8, bands=2, block_cols=["lang", "source"]
    )

    print(f"corpus {n0} -> gated {gated.count()} -> deduped {kept.count()} "
          f"-> mixed {mixed.count()}; late batch {late.count()} "
          f"-> admitted {admitted.count()}")
    mixed.groupBy("lang").count().orderBy("lang").show()

    # 8. novelty scoring + quality-weighted subsample (round-4 lanes):
    # rank what survived by how much of it is its own, then draw a
    # diversity-preserving sample proportional to novelty instead of
    # deterministically clipping to the top
    from otters_spark.operators.sampling import weighted_sample
    from otters_spark.operators.text_analysis import ngram_novelty

    nov = ngram_novelty(mixed, n=8)
    pool = mixed.join(nov.select("doc_id", "novelty"), "doc_id").filter(
        F.col("novelty") > 0
    )
    sample = weighted_sample(pool, "novelty", 10, group_cols=["lang"])
    print("-- novelty-weighted sample (10 per language) --")
    sample.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("novelty"), 3).alias("avg_novelty"),
    ).orderBy("lang").show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
