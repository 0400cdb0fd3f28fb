"""The ANN scale claim, proven on disk: a bucket-partitioned LSH store
must answer searches via partition pruning (only probed buckets read)."""

from otters_spark.operators.similarity import (
    hyperplanes,
    lsh_index,
    lsh_load,
    lsh_save,
    lsh_search,
)
from otters_spark.suite import Q7


def test_lsh_partition_pruning(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planes = hyperplanes(64, n_planes=4, seed=42)
    path = str(tmp_path / "lsh_store")
    lsh_save(lsh_index(emb, planes), path)
    loaded = lsh_load(spark, path)

    res = lsh_search(loaded, Q7, planes, k=10, multiprobe=3)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the bucket filter must be a partition filter on the scan, not a
    # post-scan row filter
    assert "PartitionFilters" in plan
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "lsh_bucket" in pf

    rows = res.collect()
    assert len(rows) == 10
    # results identical to searching the unpartitioned index
    direct = lsh_search(lsh_index(emb, planes), Q7, planes, k=10, multiprobe=3)
    assert [r["vec_id"] for r in rows] == [r["vec_id"] for r in direct.collect()]
