"""Stream-stream interval join: streaming result must equal the batch
join of the same inputs (watermarked state-bounded join)."""

from pyspark.sql import functions as F

from otters_spark.streaming.events import _with_ts, stream_events, view_purchase_join
from otters_spark.suite import load_events


def test_stream_stream_join_matches_batch(spark, sf_dir):
    # streaming side: two watermarked streams from the same file source
    s = stream_events(spark, sf_dir)
    sv = _with_ts(s.filter(F.col("event_type") == "view")).withWatermark("ts", "1 hour")
    sp = _with_ts(s.filter(F.col("event_type") == "purchase")).withWatermark("ts", "1 hour")
    joined = view_purchase_join(sv, sp, within="10 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("t_ssjoin").collect()))

    b = load_events(spark, sf_dir)
    bv = b.filter(F.col("event_type") == "view")
    bp = b.filter(F.col("event_type") == "purchase")
    want = sorted(map(tuple, view_purchase_join(bv, bp, within="10 minutes").collect()))
    assert got == want
    assert len(got) > 0


def test_stream_stream_left_outer_join(spark, sf_dir):
    """Left-outer keeps unconverted purchases with NULL view columns.
    On the stream, NULL rows emit only after the watermark passes a
    purchase's join window; the file source replays everything and
    processAllAvailable advances the watermark to max(ts) - delay, so
    purchases older than that are fully resolved. Compare those
    resolved rows against the batch twin restricted to the same
    closed region."""
    s = stream_events(spark, sf_dir)
    sv = _with_ts(s.filter(F.col("event_type") == "view")).withWatermark("ts", "1 hour")
    sp = _with_ts(s.filter(F.col("event_type") == "purchase")).withWatermark("ts", "1 hour")
    joined = view_purchase_join(sv, sp, within="10 minutes", how="left_outer")
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssjoin_lo")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("t_ssjoin_lo")

    b = load_events(spark, sf_dir)
    bv = b.filter(F.col("event_type") == "view")
    bp = b.filter(F.col("event_type") == "purchase")
    want = view_purchase_join(bv, bp, within="10 minutes", how="left_outer")
    # closed region: purchases whose join window the final watermark
    # has passed (watermark = max event ts - 1h delay; window needs a
    # further `within` + the join's own eviction slack, so stay well
    # inside it)
    hi = _with_ts(b).agg(F.max("ts").alias("m")).collect()[0]["m"]
    import datetime as dt

    cutoff_us = int(
        (hi - dt.timedelta(hours=2)).replace(tzinfo=dt.timezone.utc).timestamp()
        * 1_000_000
    )
    got_closed = sorted(
        map(tuple, got.filter(F.col("purchase_ts_us") < cutoff_us).collect())
    )
    want_closed = sorted(
        map(tuple, want.filter(F.col("purchase_ts_us") < cutoff_us).collect())
    )
    assert got_closed == want_closed
    # the outer join genuinely added NULL-view rows
    assert any(r[2] is None for r in want_closed)
    assert len(got_closed) > 0
    with __import__("pytest").raises(ValueError):
        view_purchase_join(bv, bp, how="full")
