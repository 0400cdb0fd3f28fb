"""Streaming component maintenance must land exactly where one
connected_components call over all pairs lands, for any micro-batch
partitioning — including merges that SPAN batches (a pair in batch 2
joining two clusters built in batches 0 and 1)."""

import tempfile

from pyspark.sql import functions as F

from otters_spark.operators.dedup import connected_components
from otters_spark.streaming.ingest import streaming_component_maintenance


def test_streaming_components_equal_batch_cc(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from otters_spark.operators.dedup import jaccard_pairs_exploded

    pairs = (
        jaccard_pairs_exploded(docs, 0.8, block_cols=["lang", "source"])
        .select("id_a", "id_b")
        .cache()
    )
    n_pairs = pairs.count()
    assert n_pairs > 10

    # land the pair feed as THREE files -> three micro-batches, split
    # by a hash so dup clusters straddle batch boundaries
    landing = tempfile.mkdtemp(prefix="otters_cc_landing_")
    b = F.pmod(F.xxhash64("id_a", "id_b"), F.lit(3))
    for i in range(3):
        pairs.filter(b == i).coalesce(1).write.parquet(f"{landing}/b{i}")

    stream = (
        spark.readStream.schema("id_a long, id_b long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{landing}/b*")
    )
    comp_path = str(tmp_path / "components")
    ckpt = tempfile.mkdtemp(prefix="otters_cc_ckpt_")
    q = (
        streaming_component_maintenance(stream, comp_path)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["id"], r["component"])
        for r in spark.read.parquet(comp_path)
        .select("id", "component")
        .collect()
    }
    want = {
        (r["id"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert got == want
    pairs.unpersist()


def test_streaming_components_cross_batch_merge(spark, tmp_path):
    # batch 0 builds {1,5}, batch 1 builds {9,12}, batch 2's single
    # pair (5, 12) must merge them under label 1
    landing = tempfile.mkdtemp(prefix="otters_ccm_landing_")
    batches = [[(1, 5)], [(9, 12)], [(5, 12)]]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "id_a long, id_b long").coalesce(
            1
        ).write.parquet(f"{landing}/b{i}")
    stream = (
        spark.readStream.schema("id_a long, id_b long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{landing}/b*")
    )
    comp_path = str(tmp_path / "components")
    ckpt = tempfile.mkdtemp(prefix="otters_ccm_ckpt_")
    q = (
        streaming_component_maintenance(stream, comp_path)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["id"]: r["component"]
        for r in spark.read.parquet(comp_path).collect()
    }
    assert got == {1: 1, 5: 1, 9: 1, 12: 1}
