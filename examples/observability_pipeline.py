"""Corpus observability at scale: sketches + bloom + layout.

Demonstrates the session-6 lanes end to end on the test corpus:

1. per-source distinct-token KMV sketches, merged into a corpus
   rollup WITHOUT re-scanning (the day->month rollup shape);
2. HLL register tables as persistable sketch state + estimates;
3. a Bloom filter over benchmark n-grams probed by the corpus
   (the decontamination prefilter that outlives broadcast limits);
4. a Z-order store write and the row-group spans that make
   two-column pruning work;
5. the pre-shuffle key-skew diagnosis and the seasonal-naive
   forecast scorecard over the event stream (the round-4 lanes).

Run: python examples/observability_pipeline.py [sf_dir]
"""

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

import otters_spark as ot  # noqa: E402
from otters_spark.functions.zorder import zorder_sort  # noqa: E402
from otters_spark.operators.bloom import bloom_build, bloom_probe  # noqa: E402
from otters_spark.operators.decontam import ngram_hashes  # noqa: E402
from otters_spark.operators.sketches import (  # noqa: E402
    hll_estimate,
    hll_registers,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = ot.get_spark(master="local[8]", shuffle_partitions=16)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )

    # 1. per-source sketches, then a corpus rollup from the sketches
    per_source = kmv_sketch(tokens, "token", ["source"], k=64)
    print("-- distinct tokens per source (KMV, k=64) --")
    kmv_estimate(per_source, k=64).select(
        "source", "n_sketch", F.round("est_distinct", 1).alias("est")
    ).orderBy("source").show()
    rollup = kmv_merge(per_source.drop("source"), k=64)
    print("-- corpus rollup merged from the per-source sketches --")
    kmv_estimate(rollup, k=64).select(
        "n_sketch", F.round("est_distinct", 1).alias("est")
    ).show()

    # 2. HLL register state + estimate
    regs = hll_registers(tokens, "token", ["source"], p=8)
    print("-- HLL estimates from the register table --")
    hll_estimate(regs, ["source"], p=8).orderBy("source").show()

    # 3. bloom-prefiltered benchmark probe
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    grams = ngram_hashes(bench, 8).select("__h").distinct()
    filt = bloom_build(grams, "__h", m_bits=63 * 256, k=4, hashed=True)
    corpus_grams = ngram_hashes(docs, 8, out_id="train_id")
    flagged = (
        bloom_probe(corpus_grams, "__h", filt, m_bits=63 * 256, k=4, hashed=True)
        .filter("maybe_member")
        .select("train_id")
        .distinct()
    )
    print(f"-- bloom flags {flagged.count()} docs for exact decontam review --")

    # 4. Z-order layout: both columns get narrow row-group spans
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    out = tempfile.mkdtemp(prefix="zorder_store_")
    zorder_sort(li, ["l_partkey", "l_suppkey"], bits=10, num_partitions=8).write.mode(
        "overwrite"
    ).parquet(out)
    print(f"-- z-ordered store written to {out} --")

    # 5. shuffle-skew diagnosis + forecast scorecard over events
    from otters_spark.operators.skew import skew_report
    from otters_spark.operators.stats import forecast_eval
    from otters_spark.suite import load_events

    ev = load_events(spark, sf_dir)
    print("-- user_id key-skew report (read BEFORE shuffling on it) --")
    skew_report(ev, ["user_id"], top_k=10).show(truncate=False)
    daily = ev.filter(F.col("value").isNotNull()).groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "t"
        ),
    ).agg(F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("y"))
    print("-- season=7 naive forecast scorecard (beat this or go home) --")
    forecast_eval(daily, ["event_type"], "t", "y", season=7).show()

    # 6. SLA-hole report: per event type, the time ranges inside the
    # first audit day with NO active exposure interval at all —
    # the interval-union complement (round 5)
    from otters_spark.operators.intervals import interval_gaps

    iv = ev.filter(F.col("value").isNotNull() & (F.col("value") > 0)).select(
        "event_type",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * 60_000_000.0).cast("long")
        ).alias("e"),
    )
    day0 = 1704067200000000  # 2024-01-01T00:00:00Z
    print("-- coverage holes on day 1 (gap seconds per event type) --")
    interval_gaps(
        iv, ["event_type"], "s", "e", bounds=(day0, day0 + 86_400_000_000)
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (F.sum(F.col("gap_end") - F.col("gap_start")) / 1e6).alias(
            "gap_seconds"
        ),
    ).orderBy("event_type").show()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
