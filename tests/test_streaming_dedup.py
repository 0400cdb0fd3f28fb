"""Online exact dedup over a document stream must keep exactly the
rows the batch dedup keeps."""

import os
import tempfile

from pyspark.sql import types as T

from otters_spark.operators.dedup import exact_dedup_keep_first
from otters_spark.streaming.stateful import streaming_exact_dedup

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def test_streaming_dedup_matches_batch(spark, sf_dir):
    landing = tempfile.mkdtemp(prefix="otters_docs_landing_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/documents.parquet"),
        os.path.join(landing, "documents.parquet"),
    )
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(landing)
    kept_stream = streaming_exact_dedup(stream)
    q = (
        kept_stream.writeStream.format("memory")
        .queryName("t_sdedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"] for r in spark.table("t_sdedup").collect()}
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {r["doc_id"] for r in exact_dedup_keep_first(batch).collect()}
    assert got == want
    assert len(got) > 0
