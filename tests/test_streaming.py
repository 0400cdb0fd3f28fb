"""Structured Streaming: the streaming pipeline must produce exactly
the batch result of the same transformation (batch-as-oracle)."""

import pytest

from otters_spark.streaming.events import (
    run_windowed_stream,
    sessionize,
    windowed_agg,
)
from otters_spark.suite import load_events


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_stream_matches_batch(spark, sf_dir):
    batch = windowed_agg(load_events(spark, sf_dir), "5 minutes")
    streamed = run_windowed_stream(spark, sf_dir, "5 minutes", query_name="t_win")
    cols = ["bucket_start", "event_type"]
    assert _sorted_rows(streamed, cols) == _sorted_rows(batch, cols)


def test_sliding_window_batch(spark, sf_dir):
    df = windowed_agg(load_events(spark, sf_dir), "10 minutes", slide="5 minutes")
    rows = df.collect()
    # sliding: every event lands in exactly 2 windows
    total = sum(r["n_events"] for r in rows)
    n = load_events(spark, sf_dir).count()
    assert total == 2 * n


def test_sessionize_batch(spark, sf_dir):
    sess = sessionize(load_events(spark, sf_dir), gap="30 minutes")
    rows = sess.collect()
    assert len(rows) > 0
    n = load_events(spark, sf_dir).count()
    assert sum(r["n_events"] for r in rows) == n  # partition of all events


def test_streaming_sessionize_runs(spark, sf_dir):
    from otters_spark.streaming.events import stream_events

    agg = sessionize(stream_events(spark, sf_dir), gap="30 minutes", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_sess")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("t_sess").count()
    want = sessionize(load_events(spark, sf_dir), gap="30 minutes").count()
    assert got == want
