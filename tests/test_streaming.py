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


def test_windowed_agg_update_mode_converges(spark, sf_dir):
    """Update-mode emissions: a key may be emitted several times as
    late data refines its window, but the LAST emission per
    (bucket, event_type) must equal the batch answer — the contract a
    downstream upsert sink (foreachBatch merge) relies on."""
    from otters_spark.streaming.events import stream_events, windowed_agg

    agg = windowed_agg(
        stream_events(spark, sf_dir), window="6 hours", watermark="1 hour"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_update")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = spark.table("t_update").toPandas()
    assert len(emitted) > 0
    # last emission per key wins (emissions arrive in batch order; one
    # file source batch here, but keep the groupby-last form the
    # upsert sink would use)
    last = emitted.groupby(["bucket_start", "event_type"]).tail(1)
    want = windowed_agg(load_events(spark, sf_dir), window="6 hours").toPandas()
    key = ["bucket_start", "event_type"]
    merged = last.sort_values(key).reset_index(drop=True).merge(
        want.sort_values(key).reset_index(drop=True), on=key, suffixes=("_s", "_b")
    )
    assert len(merged) == len(want)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (abs(merged["sum_value_s"] - merged["sum_value_b"]) < 1e-6).all()
