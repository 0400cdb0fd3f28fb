"""Streaming corpus cleaning: the per-doc gates (PII scrub, repetition
filter, quality score) must produce exactly their batch results when
run over a document stream — guaranteed because they are stateless
narrow transformations, checked here end to end."""

from otters_spark.operators.pii import pii_scrub
from otters_spark.operators.text_analysis import repetition_features
from otters_spark.streaming.corpus import stream_documents


def _run_to_memory(df, name):
    q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_pii_scrub_matches_batch(spark, sf_dir):
    stream = pii_scrub(stream_documents(spark, sf_dir))
    _run_to_memory(stream, "t_pii_stream")
    got = {
        r["doc_id"]: (r["n_email"], r["clean_text"])
        for r in spark.table("t_pii_stream").collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        r["doc_id"]: (r["n_email"], r["clean_text"])
        for r in pii_scrub(docs).collect()
    }
    assert got == want


def test_streaming_repetition_gate_matches_batch(spark, sf_dir):
    stream = repetition_features(stream_documents(spark, sf_dir))
    _run_to_memory(stream, "t_rep_stream")
    got = {
        r["doc_id"]: (r["dup_token_frac"], r["keep"])
        for r in spark.table("t_rep_stream").collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        r["doc_id"]: (r["dup_token_frac"], r["keep"])
        for r in repetition_features(docs).collect()
    }
    assert got == want
