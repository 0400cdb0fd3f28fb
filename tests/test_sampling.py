"""Deterministic sampling/splitting: stability, exactness, leakage."""

import pytest

from otters_spark.operators.sampling import hash_sample, hash_split, reservoir_per_group


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_split_stable_and_partitioned(docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", w).collect()}
    # repartitioned input must produce the identical assignment
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(7), "doc_id", w).collect()
    }
    assert a == b
    frac = sum(1 for s in a.values() if s == "train") / len(a)
    assert 0.75 < frac < 0.85  # hash buckets track requested fraction


def test_split_growth_no_reassignment(docs):
    # adding documents must not move existing ones across splits —
    # the anti-leakage property rand() splits do not have
    w = {"train": 0.9, "test": 0.1}
    small = docs.limit(100)
    a = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", w).collect()}
    full = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", w).collect()}
    assert all(full[k] == v for k, v in a.items())


def test_split_validation(docs):
    with pytest.raises(ValueError):
        hash_split(docs, weights={"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        hash_split(docs, weights={"a": -0.1, "b": 0.5})


def test_hash_sample_subset_semantics(docs):
    s10 = {r["doc_id"] for r in hash_sample(docs, 0.1).collect()}
    s30 = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
    assert s10 <= s30  # growing the fraction only ADDS rows
    n = docs.count()
    assert abs(len(s10) / n - 0.1) < 0.05
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_reservoir_exact_k(docs):
    out = reservoir_per_group(docs, ["lang", "source"], k=3)
    sizes = {tuple(r[:2]): r["n"] for r in out.groupBy("lang", "source").count()
             .withColumnRenamed("count", "n").collect()}
    group_sizes = {tuple(r[:2]): r["n"] for r in docs.groupBy("lang", "source").count()
                   .withColumnRenamed("count", "n").collect()}
    for g, n in group_sizes.items():
        assert sizes[g] == min(3, n)
    # deterministic: second run picks the same representatives
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in reservoir_per_group(docs, ["lang", "source"], k=3).collect())
    assert a == b
