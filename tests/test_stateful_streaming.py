"""Custom stateful operator (applyInPandasWithState): final per-user
totals from the stream must equal the batch groupBy."""

import pytest
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


def test_streaming_transitions_equal_batch_across_batches(spark, sf_dir, tmp_path):
    """Transitions from a 3-micro-batch time-split replay must equal
    the batch transition_matrix exactly — including the pair counts
    that BRIDGE micro-batch boundaries (the stored per-user state)."""
    from otters_spark.operators.behavior import transition_matrix
    from otters_spark.streaming.stateful import streaming_transitions

    ev = load_events(spark, sf_dir)
    # split by event time into 3 files -> 3 in-order micro-batches
    # (quantiles over the micros encoding; TimestampType itself is not
    # approxQuantile-able)
    evm = ev.withColumn("__m", F.unix_micros(F.col("ts").cast("timestamp")))
    qs = evm.approxQuantile("__m", [0.33, 0.66], 0.001)
    landing = tmp_path / "landing"
    landing.mkdir()
    parts = [
        evm.filter(F.col("__m") <= qs[0]).drop("__m"),
        evm.filter((F.col("__m") > qs[0]) & (F.col("__m") <= qs[1])).drop("__m"),
        evm.filter(F.col("__m") > qs[1]).drop("__m"),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(landing / f"b{i}.parquet"))
        # nest each batch as its own file set; file source treats each
        # new file as a micro-batch under maxFilesPerTrigger=1
    import glob
    import os
    import shutil
    import time

    flat = tmp_path / "flat"
    flat.mkdir()
    now = time.time()
    for i in range(3):
        src = glob.glob(str(landing / f"b{i}.parquet" / "part-*.parquet"))[0]
        dst = flat / f"{i:02d}.parquet"
        shutil.copy(src, dst)
        # the file source picks up files in MODIFICATION-TIME order and
        # fast copies can tie on mtime — pin strictly increasing times
        # so batch order (and thus per-user event-time order) is fixed
        os.utime(dst, (now + i, now + i))

    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
    )
    q = (
        streaming_transitions(stream)
        .writeStream.format("memory")
        .queryName("t_transitions")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.table("t_transitions")
        .groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            F.sum("gap_micros").alias("gap_micros_total"),
        )
    )
    got_rows = {
        (r["from_type"], r["to_type"]): (r["n_trans"], r["gap_micros_total"])
        for r in got.collect()
    }
    want_rows = {
        (r["from_type"], r["to_type"]): (r["n_trans"], r["gap_micros_total"])
        for r in transition_matrix(ev).collect()
    }
    assert got_rows == want_rows
    # sanity: the replay really was multi-batch (bridged pairs exist)
    assert len(got_rows) > 0


def test_streaming_transitions_multi_chunk_group(spark, tmp_path):
    """A user whose micro-batch spans multiple Arrow chunks must still
    process in (ts, id) order: chunks arrive as an iterator in
    arbitrary order, and per-chunk sorting would emit wrong pairs."""
    from otters_spark.operators.behavior import transition_matrix
    from otters_spark.streaming.stateful import streaming_transitions

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        import random as _random
        from datetime import datetime, timedelta

        rng = _random.Random(5)
        rows = []
        for eid in range(60):  # one user, 60 events >> 7-row chunks
            rows.append(
                (eid, 1, datetime(2024, 1, 1) + timedelta(seconds=eid * 10),
                 rng.choice(["a", "b", "c"]))
            )
        rng.shuffle(rows)  # physical order != event-time order
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        src = tmp_path / "one"
        ev.coalesce(1).write.parquet(str(src))
        stream = (
            spark.readStream.schema(ev.schema).format("parquet").load(str(src))
        )
        q = (
            streaming_transitions(stream)
            .writeStream.format("memory")
            .queryName("t_chunked")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["from_type"], r["to_type"]): (r["n_trans"], r["gap_micros_total"])
            for r in spark.table("t_chunked")
            .groupBy("from_type", "to_type")
            .agg(
                F.count(F.lit(1)).alias("n_trans"),
                F.sum("gap_micros").alias("gap_micros_total"),
            )
            .collect()
        }
        want = {
            (r["from_type"], r["to_type"]): (r["n_trans"], r["gap_micros_total"])
            for r in transition_matrix(ev).collect()
        }
        assert got == want
        # every gap is the fixed 10 s grid -> no negative/wrong gaps
        assert all(g % 10_000_000 == 0 and g > 0 for _, g in got.values())
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_streaming_ewma_equal_batch_across_batches(spark, sf_dir, tmp_path):
    """Per-event EWMAs from a 3-micro-batch time-split replay must
    match the batch ewma_smooth row-for-row (float tolerance: same
    recurrence, different but fixed summation order) — including rows
    whose smoothing history crosses micro-batch boundaries (the
    two-double stored state)."""
    import glob
    import os
    import shutil
    import time

    from otters_spark.operators.stats import ewma_smooth
    from otters_spark.streaming.stateful import streaming_ewma

    ev = load_events(spark, sf_dir)
    evm = ev.withColumn("__m", F.unix_micros(F.col("ts").cast("timestamp")))
    qs = evm.approxQuantile("__m", [0.33, 0.66], 0.001)
    landing = tmp_path / "landing"
    landing.mkdir()
    parts = [
        evm.filter(F.col("__m") <= qs[0]).drop("__m"),
        evm.filter((F.col("__m") > qs[0]) & (F.col("__m") <= qs[1])).drop("__m"),
        evm.filter(F.col("__m") > qs[1]).drop("__m"),
    ]
    flat = tmp_path / "flat"
    flat.mkdir()
    now = time.time()
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(landing / f"b{i}.parquet"))
        src = glob.glob(str(landing / f"b{i}.parquet" / "part-*.parquet"))[0]
        dst = flat / f"{i:02d}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (now + i, now + i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
    )
    q = (
        streaming_ewma(stream)
        .writeStream.format("memory")
        .queryName("t_ewma")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["event_id"]: r["ewma"] for r in spark.table("t_ewma").collect()
    }
    want_df = ewma_smooth(
        ev.withColumn("__m", F.unix_micros(F.col("ts").cast("timestamp"))),
        ["user_id"],
        ["__m", "event_id"],
        "value",
        alpha=0.5,
    )
    want = {r["event_id"]: r["ewma"] for r in want_df.collect()}
    assert got.keys() == want.keys()
    for eid in want:
        assert got[eid] == pytest.approx(want[eid], abs=1e-9), eid


def test_streaming_cusum_equal_batch_across_batches(spark, sf_dir, tmp_path):
    """Per-event CUSUM statistics from a 3-micro-batch time-split
    replay must land EXACTLY on the batch window identity (integer
    micros — no tolerance), including events whose reset history
    crosses micro-batch boundaries (the two-long stored state)."""
    import glob
    import os
    import shutil
    import time

    from otters_spark.operators.stats import cusum_scan
    from otters_spark.streaming.stateful import streaming_cusum

    target, slack = 50_000_000, 5_000_000  # value units: micros
    ev = load_events(spark, sf_dir)
    evm = ev.withColumn("__m", F.unix_micros(F.col("ts").cast("timestamp")))
    qs = evm.approxQuantile("__m", [0.33, 0.66], 0.001)
    landing = tmp_path / "landing"
    landing.mkdir()
    parts = [
        evm.filter(F.col("__m") <= qs[0]).drop("__m"),
        evm.filter((F.col("__m") > qs[0]) & (F.col("__m") <= qs[1])).drop("__m"),
        evm.filter(F.col("__m") > qs[1]).drop("__m"),
    ]
    flat = tmp_path / "flat"
    flat.mkdir()
    now = time.time()
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(landing / f"b{i}.parquet"))
        src = glob.glob(str(landing / f"b{i}.parquet" / "part-*.parquet"))[0]
        dst = flat / f"{i:02d}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (now + i, now + i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
    )
    q = (
        streaming_cusum(stream, target_micro=target, slack_micro=slack)
        .writeStream.format("memory")
        .queryName("t_cusum")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["event_id"]: (r["s_pos"], r["s_neg"])
        for r in spark.table("t_cusum").collect()
    }
    batch_in = (
        ev.withColumn("__m", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn(
            "__x", F.round(F.col("value").cast("double") * 1_000_000).cast("long")
        )
        .withColumn("__t", F.lit(target))
        .filter(F.col("__m").isNotNull() & F.col("__x").isNotNull())
    )
    want_df = cusum_scan(
        batch_in, ["user_id"], ["__m", "event_id"], "__x", "__t", slack=slack
    )
    want = {
        r["event_id"]: (r["s_pos"], r["s_neg"]) for r in want_df.collect()
    }
    assert got == want and len(got) > 100
