"""The streaming ingest gate must admit exactly the rows the batch
incremental_dedup admits, regardless of micro-batch partitioning
(the gate is row-wise independent vs the static corpus)."""

import os
import tempfile

from pyspark.sql import functions as F

from otters_spark.operators.dedup import incremental_dedup
from otters_spark.streaming.corpus import DOCUMENTS_SCHEMA
from otters_spark.streaming.ingest import streaming_ingest_gate


def test_streaming_gate_matches_batch(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 7 == 3)
    corpus = docs.filter(F.col("doc_id") % 7 != 3)

    # land the new batch as TWO files -> two micro-batches
    landing = tempfile.mkdtemp(prefix="otters_ingest_landing_")
    new.filter(F.col("doc_id") < 250).coalesce(1).write.parquet(f"{landing}/b0")
    new.filter(F.col("doc_id") >= 250).coalesce(1).write.parquet(f"{landing}/b1")

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{landing}/b*")
    )
    admitted_ids: set[int] = set()
    batch_ids: list[int] = []

    def admit(df, batch_id):
        batch_ids.append(batch_id)
        admitted_ids.update(r.doc_id for r in df.collect())

    ckpt = tempfile.mkdtemp(prefix="otters_ingest_ckpt_")
    q = (
        streaming_ingest_gate(
            stream, corpus, admit, 0.8, bands=2, block_cols=["lang", "source"]
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    want = {
        r.doc_id
        for r in incremental_dedup(
            new, corpus, 0.8, bands=2, block_cols=["lang", "source"]
        ).collect()
    }
    assert len(batch_ids) >= 2  # really ran as multiple micro-batches
    assert admitted_ids == want
    assert 0 < len(admitted_ids) < new.count()  # gate actually rejected some


def test_streaming_maintained_aggregate_equals_batch(spark, sf_dir, tmp_path):
    """Replaying events as 3 micro-batches through the maintained-
    aggregate sink must leave the aggregate table equal to one batch
    aggregate over all events — integer cents discipline makes the
    equality exact."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from otters_spark.streaming.ingest import streaming_maintained_aggregate
    from otters_spark.suite import load_events

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        "event_type",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    thirds = ev.randomSplit([1.0, 1.0, 1.0], seed=7)
    flat = tmp_path / "flat"
    flat.mkdir()
    import os
    import time

    now = time.time()
    for i, part in enumerate(thirds):
        d = tmp_path / f"b{i}"
        part.coalesce(1).write.parquet(str(d))
        dst = flat / f"{i:02d}.parquet"
        shutil.copy(glob.glob(str(d / "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
    )
    agg_path = str(tmp_path / "agg")
    q = (
        streaming_maintained_aggregate(
            stream, agg_path, ["event_type"], ["cents"]
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["event_type"]: (r["cents"], r["n"])
        for r in spark.read.parquet(agg_path)
        .drop("__last_batch_id")
        .collect()
    }
    want = {
        r["event_type"]: (r["cents"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_maintained_join_tracks_dim_churn(spark, sf_dir, tmp_path):
    """Facts replay as 3 micro-batches into join-key partials; the dim
    is EDITED after the stream finishes (segment move + customer
    delete). The derived view must equal a batch rebuild over ALL
    facts x the CURRENT dim — proving dimension churn needs no fact
    replay — and integer cents make the equality exact."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    from otters_spark.streaming.ingest import (
        maintained_join_view,
        streaming_maintained_join,
    )
    from otters_spark.suite import load

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    thirds = orders.randomSplit([1.0, 1.0, 1.0], seed=11)
    flat = tmp_path / "flat"
    flat.mkdir()
    now = time.time()
    for i, part in enumerate(thirds):
        d = tmp_path / f"b{i}"
        part.coalesce(1).write.parquet(str(d))
        dst = flat / f"{i:02d}.parquet"
        shutil.copy(glob.glob(str(d / "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))

    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
    )
    ppath = str(tmp_path / "partials")
    q = (
        streaming_maintained_join(stream, ppath, ["ck"], ["cents"])
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # dim churn AFTER the stream: move every 17th customer's segment,
    # delete every 13th
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_mktsegment").alias("seg"),
    )
    dim2 = cust.filter(F.col("ck") % 13 != 0).withColumn(
        "seg",
        F.when(F.col("ck") % 17 == 0, F.lit("MACHINERY")).otherwise(
            F.col("seg")
        ),
    )
    got = {
        r["seg"]: (r["cents"], r["n"])
        for r in maintained_join_view(
            spark, ppath, dim2, ["ck"], ["seg"], ["cents"]
        ).collect()
    }
    want = {
        r["seg"]: (r["cents"], r["n"])
        for r in orders.join(dim2, "ck")
        .groupBy("seg")
        .agg(F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
