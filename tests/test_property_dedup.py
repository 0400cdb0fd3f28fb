"""Property-based differential tests for the dedup kernels: on random
corpora, the scale-shaped formulations (banded SimHash, salted
incidence-matmul) must agree EXACTLY with their straightforward
all-pairs references. Randomness is seeded per-case and all corpora
for a run are generated up front so runtime stays bounded."""

import random

import pytest

from otters_spark.operators.dedup import (
    jaccard_pairs,
    jaccard_pairs_blocked_matmul,
    simhash_banded_pairs,
    simhash_pairs,
)

WORDS = [f"w{i}" for i in range(40)]


def _corpus(seed: int, n_docs: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        if rng.random() < 0.1:
            text = None  # exercise null paths
        elif rng.random() < 0.3 and rows:
            # near-dup of an earlier doc: copy + mutate one token
            base = rows[rng.randrange(len(rows))][1]
            toks = (base or "w0").split()
            toks[rng.randrange(len(toks))] = rng.choice(WORDS)
            text = " ".join(toks)
        else:
            text = " ".join(rng.choice(WORDS) for _ in range(rng.randint(3, 12)))
        rows.append((i, text, rng.choice(["en", "fr"]), f"s{rng.randrange(2)}"))
    return rows


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_simhash_banded_equals_all_pairs_random(spark, seed):
    docs = spark.createDataFrame(
        _corpus(seed, 60), ["doc_id", "text", "lang", "source"]
    ).filter("text is not null")
    d = [2, 4, 7][seed % 3]
    kw = dict(bits=32, block_cols=["lang", "source"])
    allp = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs(docs, d, **kw).collect()
    }
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_banded_pairs(docs, d, **kw).collect()
    }
    assert banded == allp


@pytest.mark.parametrize("seed,cap", [(11, 5), (12, 16), (13, 100)])
def test_salted_matmul_equals_join_random(spark, seed, cap):
    docs = spark.createDataFrame(
        _corpus(seed, 50), ["doc_id", "text", "lang", "source"]
    )
    kw = dict(block_cols=["lang", "source"])
    exact = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs(docs.filter("text is not null"), 0.4, **kw).collect()
    }
    salted = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs_blocked_matmul(
            docs, 0.4, rows_per_block=cap, **kw
        ).collect()
    }
    assert salted == exact
