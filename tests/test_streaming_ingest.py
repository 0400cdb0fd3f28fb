"""The streaming ingest gate must admit exactly the rows the batch
incremental_dedup admits, regardless of micro-batch partitioning
(the gate is row-wise independent vs the static corpus)."""

import os
import tempfile

from pyspark.sql import functions as F

from otters_spark.operators.dedup import incremental_dedup
from otters_spark.streaming.corpus import DOCUMENTS_SCHEMA
from otters_spark.streaming.ingest import streaming_ingest_gate


def test_streaming_gate_matches_batch(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 7 == 3)
    corpus = docs.filter(F.col("doc_id") % 7 != 3)

    # land the new batch as TWO files -> two micro-batches
    landing = tempfile.mkdtemp(prefix="otters_ingest_landing_")
    new.filter(F.col("doc_id") < 250).coalesce(1).write.parquet(f"{landing}/b0")
    new.filter(F.col("doc_id") >= 250).coalesce(1).write.parquet(f"{landing}/b1")

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{landing}/b*")
    )
    admitted_ids: set[int] = set()
    batch_ids: list[int] = []

    def admit(df, batch_id):
        batch_ids.append(batch_id)
        admitted_ids.update(r.doc_id for r in df.collect())

    ckpt = tempfile.mkdtemp(prefix="otters_ingest_ckpt_")
    q = (
        streaming_ingest_gate(
            stream, corpus, admit, 0.8, bands=2, block_cols=["lang", "source"]
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want = {
        r.doc_id
        for r in incremental_dedup(
            new, corpus, 0.8, bands=2, block_cols=["lang", "source"]
        ).collect()
    }
    assert len(batch_ids) >= 2  # really ran as multiple micro-batches
    assert admitted_ids == want
    assert 0 < len(admitted_ids) < new.count()  # gate actually rejected some
