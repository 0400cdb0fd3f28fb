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


def test_exposure_sessions_equal_merge_intervals(spark, sf_dir):
    """Dynamic-gap session windows ARE interval union: batch-mode
    exposure_sessions must equal operators.intervals.merge_intervals
    row-for-row on the same exposure set."""
    from pyspark.sql import functions as F

    from otters_spark.operators.intervals import merge_intervals
    from otters_spark.streaming.events import exposure_sessions

    ev = load_events(spark, sf_dir)
    got = {
        (r["user_id"], r["s"], r["e"], r["n_intervals"])
        for r in exposure_sessions(ev).collect()
    }
    iv = ev.filter(F.col("value").isNotNull() & (F.col("value") > 0)).select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * F.lit(60000000.0)).cast("long")
        ).alias("e"),
    )
    want = {
        (r["user_id"], r["island_start"], r["island_end"], r["n_intervals"])
        for r in merge_intervals(iv, ["user_id"], "s", "e").collect()
    }
    assert got == want and len(got) > 0


def test_exposure_sessions_streams(spark, sf_dir, tmp_path):
    """The same operator must run as a real stream (session-window
    state + watermark) and produce the batch islands once the stream
    is drained."""
    from pyspark.sql import functions as F

    from otters_spark.streaming.events import exposure_sessions

    ev = load_events(spark, sf_dir)
    src = tmp_path / "src"
    src.mkdir()
    ev.coalesce(1).write.parquet(str(src / "all.parquet"))
    import glob
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    shutil.copy(
        glob.glob(str(src / "all.parquet" / "part-*.parquet"))[0],
        flat / "00.parquet",
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        exposure_sessions(stream)
        .writeStream.format("memory")
        .queryName("t_exposure")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["s"], r["e"], r["n_intervals"])
        for r in spark.table("t_exposure").collect()
    }
    want = {
        (r["user_id"], r["s"], r["e"], r["n_intervals"])
        for r in exposure_sessions(ev).collect()
    }
    assert got == want
