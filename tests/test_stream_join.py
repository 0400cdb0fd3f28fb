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
