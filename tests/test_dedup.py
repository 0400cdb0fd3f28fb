"""Dedup operator semantics on crafted data."""

import pytest
from pyspark.sql import functions as F

from otters_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup_keep_first,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_pairs,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s0"),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s0"),  # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog", "en", "s0"),  # near dup
        (3, "completely different text about spark engines", "en", "s0"),
        (4, "The Quick Brown Fox Jumps Over The Lazy Dog", "en", "s0"),  # case dup
        (5, "the quick brown fox jumps over the lazy dog", "en", "s1"),  # other block
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_exact_dedup_normalized(docs):
    kept = exact_dedup_keep_first(docs)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 0,1,4,5 share a normalized key -> keep 0; 2 and 3 unique
    assert ids == [0, 2, 3]


def test_exact_dedup_no_normalize(docs):
    kept = exact_dedup_keep_first(docs, normalize=False)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # case-different 4 survives without normalization
    assert ids == [0, 2, 3, 4]


def test_jaccard_pairs_blocked(docs):
    pairs = jaccard_pairs(docs, 0.5, block_cols=["lang", "source"]).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(0, 1)] == 1.0  # identical
    # 0 vs 2: tokens differ by jumps/leaps: inter=7, union=9
    assert abs(got[(0, 2)] - 7 / 9) < 1e-9
    # 5 is in block s1 -> never paired with 0 despite identical text
    assert not any(5 in p for p in got)


def test_minhash_estimates_track_exact(docs):
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_pairs(docs, 0.0, n_hashes=32, block_cols=["lang", "source"]).collect()
    }
    assert est[(0, 1)] == 1.0  # identical docs -> identical signatures
    assert est[(0, 2)] > 0.5  # near-dups estimate high
    assert est.get((0, 3), 0.0) < 0.5  # unrelated docs estimate low


def test_minhash_lsh_candidates_find_dups(docs):
    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, n_hashes=16, bands=4).collect()
    }
    assert (0, 1) in cand  # identical docs always collide in every band
    assert (0, 5) in cand  # LSH is unblocked here: finds cross-source dup


def test_simhash_identical_zero_hamming(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(docs, 32, block_cols=["lang", "source"]).collect()
    }
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] <= 8  # near-dup: small distance
    assert pairs[(0, 3)] > 8  # unrelated: large distance


def test_embedding_neardup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    pairs = embedding_neardup_pairs(df, 0.95).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["cosine"] > 0.99


def test_jaccard_formulations_agree(docs):
    from otters_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_blocked_matmul,
        jaccard_pairs_exploded,
    )

    def rounded(df):
        return {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
        }

    kw = dict(block_cols=["lang", "source"])
    a = rounded(jaccard_pairs(docs, 0.5, **kw))
    b = rounded(jaccard_pairs_exploded(docs, 0.5, **kw))
    c = rounded(jaccard_pairs_blocked_matmul(docs, 0.5, **kw))
    assert a == b == c


def test_embedding_neardup_lsh_subset(spark):
    import numpy as np

    from otters_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )

    rng = np.random.default_rng(5)
    rows = []
    # 30 base vectors, each with a jittered near-duplicate
    for i in range(30):
        v = rng.standard_normal(16)
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in v + rng.normal(0, 0.01, 16)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(df, 0.99).collect()}
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs_lsh(df, 0.99, n_planes=6).collect()
    }
    assert approx <= exact
    # near-identical vectors collide in almost every bucket
    recall = len(approx) / max(len(exact), 1)
    assert recall >= 0.8, f"LSH near-dup recall too low: {recall}"
