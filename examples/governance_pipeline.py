#!/usr/bin/env python
"""Corpus-governance demo: the run-over-run control loop around a
training-data pipeline —

    contract gate (constraint validation) -> distribution drift vs
    the previous release (PSI) -> robust anomaly scan -> deterministic
    global shuffle into balanced training shards.

Run:  python examples/governance_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import otters_spark as ot
from otters_spark.operators.drift import profile_bins, psi_summary
from otters_spark.operators.quality_checks import (
    AcceptedValues,
    InRange,
    NotNull,
    Unique,
    validate,
)
from otters_spark.operators.sampling import write_training_shards
from otters_spark.operators.stats import robust_outliers


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = ot.get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. contract gate: fail the run before training sees bad data
    report = validate(
        docs,
        [
            NotNull("doc_id"),
            NotNull("text"),
            Unique(("doc_id",)),
            InRange("n_chars", 1, 100_000),
            AcceptedValues("lang", ("en", "de", "fr", "es", "zh")),
        ],
    )
    print("== data contract ==")
    report.show(truncate=False)
    gate = {r["constraint"]: r["passed"] for r in report.collect()}

    # 2. drift vs the previous release (here: the src0-9 half)
    prev = docs.filter(F.length("source") == 4)
    cur = docs.filter(F.length("source") == 5)
    print("== drift vs previous release (PSI) ==")
    psi_summary(prev, cur, numeric={"n_chars": (0, 600, 12)},
                categorical=["lang"]).show()
    # production: persist profile_bins(prev, ...) once and reuse
    _ = profile_bins(prev, {"n_chars": (0, 600, 12)}, ["lang"])

    # 3. robust anomaly scan on document lengths per source
    flagged = robust_outliers(docs, "n_chars", ["source"], k=3.0)
    print("== MAD outliers per source ==")
    flagged.filter("is_outlier").groupBy("source").count().orderBy(
        "source"
    ).show(5)

    # 4. all green -> permute and shard for the trainer
    if all(gate.values()):
        out = tempfile.mkdtemp(prefix="shards_")
        write_training_shards(docs, out, n_shards=8)
        print(f"== wrote 8 balanced shards to {out} ==")
        spark.read.parquet(out).groupBy("shard_id").count().orderBy(
            "shard_id"
        ).show()
    else:
        print("== contract violations above: NOT sharding ==")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
