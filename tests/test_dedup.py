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


def test_simhash_banded_equals_all_pairs(spark):
    # 40 docs drawn from 4 templates with word-level edits: plenty of
    # pairs at assorted Hamming distances, multiple (lang, source) blocks
    templates = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "spark executes declarative plans with whole stage codegen and aqe",
        "training data pipelines dedup documents before tokenization step",
        "completely unrelated words about cooking pasta with fresh basil",
    ]
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    rows = []
    for i in range(40):
        base = templates[i % 4].split()
        base[i % len(base)] = words[i % len(words)]
        rows.append((i, " ".join(base), "en" if i % 2 else "fr", f"s{i % 3}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])

    from otters_spark.operators.dedup import simhash_banded_pairs, simhash_pairs

    for d in (3, 6):
        kw = dict(bits=32, block_cols=["lang", "source"])
        allp = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_pairs(docs, d, **kw).collect()
        }
        banded = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_banded_pairs(docs, d, **kw).collect()
        }
        # pigeonhole banding has PERFECT recall: identical result sets
        assert banded == allp and allp, f"d={d}: {banded ^ allp}"


def test_simhash64_banded_equals_all_pairs(spark):
    # the loose-threshold regime (d=6) the selectivity rule prescribes
    # 64-bit fingerprints for; exercises the full-64-bit token hash,
    # the sign-bit lane (bit 63), and a max_hamming=0 full-width-chunk
    # edge. Near-identical docs so pairs actually land under d<=6.
    base = "the quick brown fox jumps over the lazy dog near the river bank today".split()
    rows = []
    for i in range(30):
        w = list(base)
        if i % 3:
            w[i % len(w)] = f"tok{i}"
        rows.append((i, " ".join(w), "en", "s0"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])

    from otters_spark.operators.dedup import (
        simhash_banded_pairs,
        simhash_pairs,
        simhash_table,
    )

    # bit 63 must actually occur across the corpus fingerprints —
    # otherwise this test isn't exercising the sign-bit lane
    fps = [r["simhash"] for r in simhash_table(docs, bits=64).collect()]
    assert any(fp < 0 for fp in fps), "no fingerprint uses bit 63"

    for d in (0, 6):
        kw = dict(bits=64, block_cols=["lang", "source"])
        allp = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_pairs(docs, d, **kw).collect()
        }
        banded = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_banded_pairs(docs, d, **kw).collect()
        }
        assert banded == allp, f"d={d}: {banded ^ allp}"
    assert allp, "d=6 should produce pairs on near-identical docs"


def test_matmul_subblock_cap(spark):
    # one giant (lang, source) block, tiny cap: the salted kernel must
    # still return exactly the all-pairs answer, and no packed sub-block
    # may exceed ~2x the cap (hash striping is balanced in expectation)
    rows = []
    vocab = "a b c d e f g h i j k l m n o p".split()
    for i in range(60):
        toks = [vocab[(i + j) % len(vocab)] for j in range(6)]
        rows.append((i, " ".join(toks), "en", "s0"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])

    from otters_spark.operators.dedup import jaccard_pairs, jaccard_pairs_blocked_matmul

    def rounded(df):
        return {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()}

    cap = 8
    exact = rounded(jaccard_pairs(docs, 0.3, block_cols=["lang", "source"]))
    salted = rounded(
        jaccard_pairs_blocked_matmul(
            docs, 0.3, block_cols=["lang", "source"], rows_per_block=cap
        )
    )
    assert salted == exact and exact

    # replicate the salting expressions to bound the largest sub-block
    n = docs.count()
    nsub = -(-n // cap)
    hist = (
        docs.select(F.pmod(F.xxhash64("doc_id"), F.lit(nsub)).alias("sub"))
        .groupBy("sub")
        .count()
        .collect()
    )
    assert max(r["count"] for r in hist) <= 2 * cap
    assert len(hist) >= nsub // 2  # parallelism grows with block size


def test_matmul_null_safety(spark):
    # NULL text (-> NULL token set) and NULL embeddings must be dropped,
    # never misalign ids against payloads (ADVICE r1: collect_list skips
    # NULL elements)
    docs = spark.createDataFrame(
        [
            (0, "a b c d", "en", "s0"),
            (1, None, "en", "s0"),
            (2, "a b c d", "en", "s0"),
            (3, "x y z w", "en", "s0"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    from otters_spark.operators.dedup import (
        embedding_neardup_pairs_matmul,
        jaccard_pairs_blocked_matmul,
    )

    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_pairs_blocked_matmul(
            docs, 0.9, block_cols=["lang", "source"]
        ).collect()
    }
    assert got == {(0, 2, 1.0)}

    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    pairs = embedding_neardup_pairs_matmul(vecs, 0.99, n_blocks=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 2)}


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


def test_connected_components_and_keep(spark):
    from otters_spark.operators.dedup import connected_components, keep_representatives

    # components: {1,2,3,4} (chain), {10,11}, singleton edge-free 99
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    comps = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 4, 10, 11, 99)], ["doc_id", "text"]
    )
    kept = sorted(r["doc_id"] for r in keep_representatives(docs, pairs).collect())
    assert kept == [1, 10, 99]  # one rep per component, untouched rows pass


def test_connected_components_random_vs_unionfind(spark):
    import random

    from otters_spark.operators.dedup import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])

    # python union-find oracle
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    # canonical min-id per component
    want = {x: min(y for y in parent if find(y) == find(x)) for x in parent}

    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == want


def test_tfidf_cosine_pairs(spark):
    """Hand-checked TF-IDF cosine on a 4-doc corpus with a stopword-like
    term that max_df pruning must drop."""
    import math

    from otters_spark.operators.dedup import tfidf_cosine_pairs

    rows = [
        (1, "x x common"),
        (2, "x y common"),
        (3, "y y common"),
        (4, "z z common"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # df: x->2/4, y->2/4, z->1/4, common->4/4 (pruned at max_df 0.5)
    out = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, threshold=0.0, max_df_frac=0.5).collect()
    }
    # only (1,2) and (2,3) share a surviving term
    assert set(out) == {(1, 2), (2, 3)}
    ln2 = math.log(2.0)
    ln4 = math.log(4.0)
    # doc1 = {x: 2*ln2}; doc2 = {x: ln2, y: ln2}; dot = 2*ln2^2
    expect = (2 * ln2 * ln2) / ((2 * ln2) * math.sqrt(2 * ln2 * ln2))
    assert abs(out[(1, 2)] - expect) < 1e-9
    assert abs(out[(2, 3)] - expect) < 1e-9
    del ln4


def test_tfidf_blocking_restricts_pairs(spark):
    from otters_spark.operators.dedup import tfidf_cosine_pairs

    rows = [(1, "a b", "en"), (2, "a b", "en"), (3, "a b", "de")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = tfidf_cosine_pairs(
        df, threshold=0.0, max_df_frac=1.0, block_cols=("lang",)
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


def test_semdedup_planted_duplicates(spark):
    """SemDeDup must drop planted near-identical vectors and keep the
    min-id representative, while distinct vectors all survive."""
    import numpy as np

    from otters_spark.operators.dedup import semdedup

    rng = np.random.default_rng(5)
    base = rng.standard_normal((30, 8)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant: 100-102 near-copies of vec 0; 103 near-copy of vec 7
    for j, src in zip((100, 101, 102, 103), (0, 0, 0, 7)):
        noisy = base[src] + rng.standard_normal(8).astype("float32") * 1e-4
        rows.append((j, [float(x) for x in noisy]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    kept = {r["vec_id"] for r in semdedup(df, threshold=0.999, n_cells=4).collect()}
    assert {100, 101, 102, 103}.isdisjoint(kept)  # copies dropped
    assert {0, 7} <= kept                          # representatives stay
    assert len(kept) == 30


def test_edit_distance_pairs_planted(spark):
    # planted char-level near-dups: b is a 3-edit mutation of a; c is
    # unrelated; d is a transposition-heavy variant token methods
    # mis-rank but edit distance sees as close
    base = "the quick brown fox jumps over the lazy dog near the river"
    rows = [
        (1, base),
        (2, base.replace("quick", "qvick").replace("lazy", "lazzy")),  # 2 edits
        (3, "completely different text about cooking pasta with basil"),
        (4, base[:20] + base[30:]),  # 10-char deletion
        (5, None),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # all-pairs candidates: the generator is not under test here
    ids = docs.select("doc_id")
    cand = (
        ids.withColumnRenamed("doc_id", "id_a")
        .crossJoin(ids.withColumnRenamed("doc_id", "id_b"))
        .filter("id_a < id_b")
    )
    from otters_spark.operators.dedup import edit_distance_pairs

    got = {
        (r["id_a"], r["id_b"]): r["edits"]
        for r in edit_distance_pairs(docs, cand, max_edits=12).collect()
    }
    assert got[(1, 2)] == 2
    assert got[(1, 4)] == 10
    assert (1, 3) not in got and (2, 3) not in got
    assert not any(5 in p for p in got), "NULL text must produce no pairs"
    # the bounded DP agrees with the unbounded metric on kept pairs
    import itertools
    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[-1]
    texts = dict((r[0], r[1]) for r in rows)
    for (ia, ib), e in got.items():
        assert e == lev(texts[ia], texts[ib])

    with pytest.raises(ValueError):
        edit_distance_pairs(docs, cand, max_edits=-1)


def test_incremental_dedup_gates(spark):
    from pyspark.sql import Row
    from otters_spark.operators.dedup import incremental_dedup, incremental_dedup_matches

    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19"
    corpus = spark.createDataFrame(
        [
            Row(doc_id=100, lang="en", text=base),
            Row(doc_id=101, lang="en", text="q0 q1 q2 q3 q4 q5 q6 q7 q8 q9"),
        ],
        "doc_id long, lang string, text string",
    )
    near = base.replace("w19", "zz")  # 19/21 shared tokens -> jaccard ~0.905
    new = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text=base),          # exact, same block
            Row(doc_id=2, lang="de", text=base),          # exact, OTHER block
            Row(doc_id=3, lang="en", text=near),          # near dup, same block
            Row(doc_id=4, lang="de", text=near),          # near dup, other block: blocked gate misses it
            Row(doc_id=5, lang="en", text="a0 a1 a2 a3 a4 a5 a6 a7"),  # novel
            Row(doc_id=6, lang="en", text=None),          # NULL text survives
        ],
        "doc_id long, lang string, text string",
    )
    kept = incremental_dedup(new, corpus, 0.8, block_cols=["lang"])
    assert {r.doc_id for r in kept.collect()} == {4, 5, 6}
    assert set(kept.columns) == {"doc_id", "lang", "text"}

    # unblocked near gate also catches the cross-block near dup
    kept_unblocked = incremental_dedup(new, corpus, 0.8)
    assert {r.doc_id for r in kept_unblocked.collect()} == {5, 6}

    m = incremental_dedup_matches(new, corpus, 0.8).collect()
    assert {(r.new_id, r.corpus_id) for r in m} >= {(3, 100), (4, 100)}
    for r in m:
        assert r.jaccard >= 0.8


def test_keep_representatives_by_quality(spark):
    from pyspark.sql import Row
    from otters_spark.operators.dedup import keep_representatives

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, q=0.2),   # cluster {1,2,3}: best q is doc 2
            Row(doc_id=2, q=0.9),
            Row(doc_id=3, q=0.9),   # ties with 2 -> smaller id (2) wins
            Row(doc_id=10, q=None), # cluster {10,11}: NULL q never beats scored
            Row(doc_id=11, q=0.1),
            Row(doc_id=20, q=0.0),  # untouched singleton passes through
        ],
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=10, id_b=11)],
        "id_a long, id_b long",
    )
    by_q = {r.doc_id for r in keep_representatives(docs, pairs, quality_col="q").collect()}
    assert by_q == {2, 11, 20}
    # default stays min-id
    by_id = {r.doc_id for r in keep_representatives(docs, pairs).collect()}
    assert by_id == {1, 10, 20}
    # all-NULL cluster still keeps exactly one member (min id)
    docs2 = spark.createDataFrame(
        [Row(doc_id=1, q=None), Row(doc_id=2, q=None)], "doc_id long, q double"
    )
    pairs2 = spark.createDataFrame([Row(id_a=1, id_b=2)], "id_a long, id_b long")
    assert {r.doc_id for r in keep_representatives(docs2, pairs2, quality_col="q").collect()} == {1}


def test_incremental_dedup_prepared_corpus_equivalence(spark):
    from pyspark.sql import functions as F
    from otters_spark.operators.dedup import (
        incremental_dedup,
        prepare_ingest_corpus,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.filter(F.col("doc_id") % 7 == 3)
    corpus = docs.filter(F.col("doc_id") % 7 != 3)

    kw = dict(n_hashes=16, bands=2, block_cols=["lang", "source"])
    raw = {r.doc_id for r in incremental_dedup(new, corpus, 0.8, **kw).collect()}
    pc = prepare_ingest_corpus(corpus, **kw)
    try:
        prepped = {r.doc_id for r in incremental_dedup(new, pc, 0.8, **kw).collect()}
        assert prepped == raw and len(raw) > 0
        # parameter mismatch must raise, not silently mismatch buckets
        with pytest.raises(ValueError):
            incremental_dedup(new, pc, 0.8, n_hashes=16, bands=4,
                              block_cols=["lang", "source"])
    finally:
        pc.unpersist()


def _span_docs(spark, rows):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


class TestDuplicatedSpans:
    def test_hand_computed(self, spark):
        from otters_spark.operators.dedup import remove_duplicated_spans

        shared = "s1 s2 s3 s4"  # 4-token span shared verbatim by docs 0/1
        docs = _span_docs(
            spark,
            [
                (0, f"a b {shared} c d"),
                (1, f"x {shared} y z w"),
                (2, "p q r s t u v"),  # untouched
            ],
        )
        out = {
            r.doc_id: r
            for r in remove_duplicated_spans(docs, span_tokens=4, min_docs=2).collect()
        }
        assert (out[0].n_tokens, out[0].n_removed, out[0].cleaned) == (8, 4, "a b c d")
        assert (out[1].n_tokens, out[1].n_removed, out[1].cleaned) == (8, 4, "x y z w")
        assert (out[2].n_tokens, out[2].n_removed, out[2].cleaned) == (
            7, 0, "p q r s t u v",
        )

    def test_overlapping_windows_cover_long_runs(self, spark):
        from otters_spark.operators.dedup import remove_duplicated_spans

        # a 6-token duplicated run with span=4: overlapping windows must
        # cover ALL 6 positions (alignment-free), not just the first 4
        run = "r1 r2 r3 r4 r5 r6"
        docs = _span_docs(spark, [(0, f"a {run} b"), (1, f"{run} q q q")])
        out = {r.doc_id: r for r in remove_duplicated_spans(docs, 4, 2).collect()}
        assert out[0].cleaned == "a b" and out[0].n_removed == 6
        assert out[1].cleaned == "q q q" and out[1].n_removed == 6

    def test_within_doc_repetition_not_flagged(self, spark):
        from otters_spark.operators.dedup import remove_duplicated_spans

        # the same window twice in ONE doc is repetition, not cross-doc
        # duplication: distinct-doc counting leaves it alone
        docs = _span_docs(spark, [(0, "a b c d a b c d"), (1, "x y z w v u t s")])
        out = {r.doc_id: r for r in remove_duplicated_spans(docs, 4, 2).collect()}
        assert out[0].n_removed == 0 and out[1].n_removed == 0

    def test_short_docs_and_validation(self, spark):
        import pytest
        from otters_spark.operators.dedup import remove_duplicated_spans

        docs = _span_docs(spark, [(0, "a b"), (1, "a b")])  # shorter than span
        out = {r.doc_id: r for r in remove_duplicated_spans(docs, 4, 2).collect()}
        assert out[0].n_removed == 0 and out[0].cleaned == "a b"
        with pytest.raises(ValueError):
            remove_duplicated_spans(docs, span_tokens=1)


# ----------------------------------------------------- intra-doc windows


def test_remove_repeated_windows_basic(spark):
    from otters_spark.operators.dedup import remove_repeated_windows

    df = spark.createDataFrame(
        [
            (1, "a b a b c d"),   # "a b" repeats -> dropped once
            (2, "x y z"),          # trailing short window, no repeats
            (3, None),             # no token stream -> no output row
            (4, "a a a a"),        # one distinct window
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in remove_repeated_windows(df, width=2).collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["n_windows"] == 3 and rows[1]["n_kept"] == 2
    assert rows[1]["cleaned"] == "a b c d"
    assert rows[2]["n_windows"] == 2 and rows[2]["n_kept"] == 2
    assert rows[2]["cleaned"] == "x y z"
    assert rows[4]["n_windows"] == 2 and rows[4]["n_kept"] == 1
    assert rows[4]["cleaned"] == "a a"


def test_remove_repeated_windows_keeps_first_occurrence_order(spark):
    from otters_spark.operators.dedup import remove_repeated_windows

    # repeats interleaved: survivors must preserve original positions
    df = spark.createDataFrame(
        [(1, "p q r s p q t u r s")], "doc_id long, text string"
    )
    r = remove_repeated_windows(df, width=2).first()
    assert r["cleaned"] == "p q r s t u"
    assert r["n_windows"] == 5 and r["n_kept"] == 3


def test_remove_repeated_windows_partition_invariant(spark, sf_dir):
    from otters_spark.operators.dedup import remove_repeated_windows

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = remove_repeated_windows(docs, width=2)
    b = remove_repeated_windows(docs.repartition(7), width=2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_banding_threshold_formula():
    import math

    import pytest as _pytest

    from otters_spark.operators.dedup import banding_threshold

    assert banding_threshold(1, 1) == 1.0
    assert banding_threshold(2, 8) == _pytest.approx(0.5 ** 0.125)
    assert banding_threshold(8, 2) == _pytest.approx(math.sqrt(1 / 8))
    # more bands / shorter bands -> lower threshold (higher recall)
    assert banding_threshold(8, 2) < banding_threshold(4, 4) < banding_threshold(2, 8)
    with _pytest.raises(ValueError):
        banding_threshold(0, 4)


def _cc_reference(edges):
    """Plain-Python union-find min-label components."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def test_incremental_components_equals_full_recompute(spark):
    import random

    from otters_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    rng = random.Random(99)
    for trial in range(3):
        all_pairs = list(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(40), rng.randrange(40)) for _ in range(45)
                )
                if a != b
            }
        )
        rng.shuffle(all_pairs)
        cut = len(all_pairs) * 2 // 3
        old_pairs, new_pairs = all_pairs[:cut], all_pairs[cut:]
        old_df = spark.createDataFrame(old_pairs, "id_a long, id_b long")
        new_df = spark.createDataFrame(new_pairs, "id_a long, id_b long")
        base = connected_components(old_df)
        got = {
            r["id"]: r["component"]
            for r in incremental_components(base, new_df).collect()
        }
        exp = _cc_reference(all_pairs)
        assert got == exp, f"trial {trial}"


def test_incremental_components_new_smaller_id_wins(spark):
    from otters_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    # old cluster {5, 9} labeled 5; the batch links brand-new id 2 to 9
    # — the merged label must become 2 everywhere (the contraction must
    # let a NEW minimum beat the old label)
    base = connected_components(
        spark.createDataFrame([(5, 9)], "id_a long, id_b long")
    )
    out = incremental_components(
        base, spark.createDataFrame([(2, 9)], "id_a long, id_b long")
    )
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {2: 2, 5: 2, 9: 2}


def test_incremental_components_intra_cluster_pair_is_noop(spark):
    from otters_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    base = connected_components(
        spark.createDataFrame([(1, 3), (3, 7)], "id_a long, id_b long")
    )
    out = incremental_components(
        base, spark.createDataFrame([(1, 7)], "id_a long, id_b long")
    )
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {1: 1, 3: 1, 7: 1}


def test_prefix_filter_equals_naive_across_thresholds(spark):
    """Prefix filtering is EXACT (the pigeonhole lemma): for several
    thresholds, candidates+verify must equal the all-pairs answer on
    random token sets with planted near-dups and adversarial sizes
    (singletons, identical docs, disjoint docs)."""
    import random

    from otters_spark.operators.dedup import prefix_filter_pairs

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(120)]
    rows = []
    for i in range(50):
        k = rng.randint(1, 25)
        rows.append((i, " ".join(rng.sample(vocab, k))))
    # planted: exact copy, one-token edit, disjoint tail
    rows.append((100, rows[0][1]))
    toks = rows[1][1].split()
    rows.append((101, " ".join(toks[:-1] + ["zzz"]) if len(toks) > 1 else "zzz"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def naive(thr):
        sets = {i: set(t.split()) for i, t in rows}
        out = set()
        for a in sets:
            for b in sets:
                if a < b and sets[a] and sets[b]:
                    j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                    if j >= thr:
                        out.add((a, b, round(j, 9)))
        return out

    for thr in (0.3, 0.6, 0.8, 1.0):
        got = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in prefix_filter_pairs(df, thr).collect()
        }
        assert got == naive(thr), thr


def test_prefix_filter_rejects_bad_threshold(spark):
    import pytest as _pytest

    from otters_spark.operators.dedup import prefix_filter_pairs

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="threshold"):
        prefix_filter_pairs(df, 0.0)


def test_semdedup_srp_planted_duplicates(spark):
    """The deterministic SRP-cell SemDeDup (the oracle-paired suite
    path) drops planted near-identicals and keeps the min-id
    representative. Perturbation avoids the first n_bits dims so the
    clone's cell collision is structural, mirroring the suite query's
    scaled-clone planting."""
    import numpy as np

    from otters_spark.operators.dedup import semdedup_srp

    rng = np.random.default_rng(5)
    base = rng.standard_normal((30, 8)).astype("float32")
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for j, src in zip((100, 101, 102, 103), (0, 0, 0, 7)):
        noisy = base[src].copy()
        noisy[4:] = noisy[4:] + rng.standard_normal(4).astype("float32") * 1e-4
        rows.append((j, [float(x) for x in noisy]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    kept = {r["vec_id"] for r in semdedup_srp(df, threshold=0.999, n_bits=4).collect()}
    assert {100, 101, 102, 103}.isdisjoint(kept)
    assert {0, 7} <= kept
    assert len(kept) == 30


def test_semdedup_srp_scaling_preserves_cells(spark):
    """Positive scaling never flips a sign bit, so a scaled clone is
    always compared against its source (the property the suite's
    planted-clone oracle relies on)."""
    import numpy as np

    from otters_spark.operators.dedup import semdedup_srp

    rng = np.random.default_rng(11)
    base = rng.standard_normal((20, 8))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows += [
        (1000 + i, [float(x * 1.001) for x in v]) for i, v in enumerate(base)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    kept = {r["vec_id"] for r in semdedup_srp(df, threshold=0.99, n_bits=4).collect()}
    assert kept == set(range(20))


def test_semdedup_srp_differential_fuzz(spark):
    """Differential: semdedup_srp against an O(n^2) python reference
    (same sign-bit cells, same cosine threshold, same
    min-id-per-component keep via union-find) over random corpora
    with planted scaled-clone cliques — the round-7 fuzz for the new
    oracle-paired plan. Clones are scale-only (no perturbation) so no
    pair ever sits near the threshold boundary."""
    import itertools

    import numpy as np

    from otters_spark.operators.dedup import semdedup_srp

    for seed in range(4):
        rng = np.random.default_rng(seed)
        n = 40
        base = rng.standard_normal((n, 8))
        rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
        for j in range(6):
            src = int(rng.integers(0, n))
            v = base[src] * float(1.0 + rng.uniform(0.0005, 0.002))
            rows.append((100 + j, [float(x) for x in v]))

        ids = [r[0] for r in rows]
        vecs = {r[0]: np.asarray(r[1]) for r in rows}

        def cell(v):
            return sum((1 << i) for i in range(4) if v[i] > 0)

        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in itertools.combinations(sorted(ids), 2):
            va, vb = vecs[a], vecs[b]
            if cell(va) != cell(vb):
                continue
            na, nb = np.linalg.norm(va), np.linalg.norm(vb)
            cos = float(va @ vb / (na * nb)) if na > 0 and nb > 0 else 0.0
            if cos >= 0.999:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        keep_ref = {i for i in ids if find(i) == i}

        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        kept = {
            r["vec_id"]
            for r in semdedup_srp(df, threshold=0.999, n_bits=4).collect()
        }
        assert kept == keep_ref, f"seed {seed}: {kept ^ keep_ref}"
