"""Checkpoint recovery: a windowed streaming aggregation stopped
mid-stream and RESTARTED from its checkpoint must produce exactly the
batch answer on the watermark-closed region — no lost windows, no
duplicated emissions across the restart (the file-source offsets and
the window state both live in the checkpoint)."""

import datetime as dt

from pyspark.sql import functions as F

from otters_spark.streaming.events import _with_ts, windowed_agg
from otters_spark.suite import load_events


def test_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    events = _with_ts(load_events(spark, sf_dir))
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    events.filter(F.col("ts") < mid).coalesce(1).write.parquet(
        f"{landing}/b0"
    )

    def run_once():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{landing}/b*")
        )
        agg = windowed_agg(stream, window="1 hour", watermark="30 minutes")
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()  # phase 1: first half only, then a hard stop
    # phase 2: second half lands, query restarts FROM THE CHECKPOINT
    events.filter(F.col("ts") >= mid).coalesce(1).write.parquet(
        f"{landing}/b1"
    )
    run_once()

    got = spark.read.parquet(sink)
    # closed region: windows whose end the final watermark has passed
    cutoff = int(
        (hi - dt.timedelta(minutes=30) - dt.timedelta(hours=1))
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
    )
    got_closed = sorted(
        map(tuple, got.filter(F.col("bucket_start") < cutoff - 3600).collect())
    )
    want = windowed_agg(events, window="1 hour")
    want_closed = sorted(
        map(tuple, want.filter(F.col("bucket_start") < cutoff - 3600).collect())
    )
    assert len(got_closed) > 0
    # exact equality = nothing lost AND nothing emitted twice across
    # the restart (a duplicate would appear as an extra tuple)
    assert got_closed == want_closed
