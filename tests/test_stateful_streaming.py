"""Custom stateful operator (applyInPandasWithState): final per-user
totals from the stream must equal the batch groupBy."""

from pyspark.sql import functions as F

from otters_spark.streaming.events import stream_events
from otters_spark.streaming.stateful import running_user_totals
from otters_spark.suite import load_events


def test_running_totals_match_batch(spark, sf_dir):
    stream = stream_events(spark, sf_dir).select("user_id", "value")
    totals = running_user_totals(stream)
    q = (
        totals.writeStream.format("memory")
        .queryName("t_totals")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode appends one row per (user, micro-batch); the LAST row
    # per user is the final running total
    from pyspark.sql.window import Window

    sink = spark.table("t_totals").withColumn(
        "__rn", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("user_id").orderBy(F.col("__rn").desc())
    final = (
        sink.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("user_id", "n_events", "sum_value")
    )
    batch = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    got = sorted(map(tuple, final.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want
