"""Fuzzy best-match join (operators/linkage.py) and segment-level
dedup (operators/dedup.py: remove_frequent_segments)."""

import pytest
from pyspark.sql import Row, functions as F

from otters_spark.operators.dedup import frequent_segments, remove_frequent_segments
from otters_spark.operators.linkage import fuzzy_best_match, fuzzy_join_candidates


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


def _trigrams(text):
    w = text.split(" ")
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def _jac(a, b):
    ga, gb = _trigrams(a), _trigrams(b)
    return len(ga & gb) / len(ga | gb) if ga | gb else 0.0


class TestFuzzyJoin:
    def test_candidates_match_bruteforce(self, spark):
        left = _docs(spark, [(0, "a b c d e f"), (1, "x y z w v u")])
        right = _docs(
            spark,
            [
                (10, "a b c d q r"),  # shares 2 of l0's grams
                (11, "a b c d e f g"),  # shares all 4 of l0's grams
                (12, "p q r s t u"),  # nothing shared with l0/l1
            ],
        )
        got = {
            (r.left_id, r.right_id): r.score
            for r in fuzzy_join_candidates(left, right, 0.2).collect()
        }
        lt = {r.doc_id: r.text for r in left.collect()}
        rt = {r.doc_id: r.text for r in right.collect()}
        want = {
            (li, ri): _jac(a, b)
            for li, a in lt.items()
            for ri, b in rt.items()
            if _jac(a, b) >= 0.2
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12)

    def test_best_match_argmax_and_threshold(self, spark):
        left = _docs(spark, [(0, "a b c d e f")])
        right = _docs(
            spark,
            [
                (10, "a b c d q r"),
                (11, "a b c d e f g"),
                (12, "p q r s t u"),
            ],
        )
        out = fuzzy_best_match(left, right, 0.2).collect()
        assert len(out) == 1
        assert (out[0].left_id, out[0].right_id) == (0, 11)
        # threshold above the best score -> left row absent
        assert fuzzy_best_match(left, right, 0.99).count() == 0

    def test_tie_breaks_on_smaller_right_id(self, spark):
        left = _docs(spark, [(0, "a b c d")])
        # identical right docs -> identical scores; min right id wins
        right = _docs(spark, [(20, "a b c z"), (10, "a b c z")])
        out = fuzzy_best_match(left, right, 0.1).collect()
        assert [(r.left_id, r.right_id) for r in out] == [(0, 10)]

    def test_zero_threshold_rejected(self, spark):
        d = _docs(spark, [(0, "a b c")])
        with pytest.raises(ValueError):
            fuzzy_join_candidates(d, d, 0.0)

    def test_short_docs_never_match(self, spark):
        left = _docs(spark, [(0, "a b")])  # < ngram tokens: empty shingle set
        right = _docs(spark, [(10, "a b c")])
        assert fuzzy_best_match(left, right, 0.1).count() == 0


class TestFrequentSegments:
    def test_stats_and_removal_hand_computed(self, spark):
        # width=2 segments: d0 -> ["a b","c d"], d1 -> ["a b","e f"],
        # d2 -> ["c d","x"]; "a b" in 2 docs, "c d" in 2 docs
        docs = _docs(spark, [(0, "a b c d"), (1, "a b e f"), (2, "c d x")])
        freq = {
            r.segment: r.n_docs
            for r in frequent_segments(docs, width=2, min_docs=2).collect()
        }
        assert freq == {"a b": 2, "c d": 2}
        out = {
            r.doc_id: r
            for r in remove_frequent_segments(docs, width=2, min_docs=2).collect()
        }
        assert out[0].n_segments == 2 and out[0].n_dropped == 2
        assert out[0].cleaned == ""
        assert out[1].n_segments == 2 and out[1].n_dropped == 1
        assert out[1].cleaned == "e f"
        assert out[2].n_segments == 2 and out[2].n_dropped == 1
        assert out[2].cleaned == "x"

    def test_within_doc_repetition_not_boilerplate(self, spark):
        # the same segment many times in ONE doc is repetition, not
        # cross-doc boilerplate: distinct-doc counting keeps it
        docs = _docs(spark, [(0, "a b a b a b"), (1, "c d e f")])
        assert frequent_segments(docs, width=2, min_docs=2).count() == 0
        out = {r.doc_id: r for r in remove_frequent_segments(docs, width=2).collect()}
        assert out[0].n_dropped == 0 and out[0].cleaned == "a b a b a b"

    def test_order_preserved_and_trailing_partial(self, spark):
        # width=2 over 5 tokens -> trailing 1-token segment "e"
        docs = _docs(spark, [(0, "a b c d e"), (1, "c d z w")])
        out = {r.doc_id: r for r in remove_frequent_segments(docs, width=2).collect()}
        assert out[0].n_segments == 3
        assert out[0].cleaned == "a b e"  # "c d" dropped, order kept

    def test_null_and_empty_text_absent(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=0, text="a b c d"), Row(doc_id=1, text=None)],
            "doc_id long, text string",
        )
        ids = {r.doc_id for r in remove_frequent_segments(docs, width=2).collect()}
        assert ids == {0}


def test_entity_clusters_transitive_chain(spark):
    from otters_spark.operators.linkage import entity_clusters

    # A~B and B~C above threshold; A~C alone is weaker — transitivity
    # must still land all three in one entity. D is unrelated.
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),
        (3, "beta gamma delta zeta eta"),
        (4, "completely different tokens here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["entity_id"] for r in entity_clusters(df, 0.4).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 4


def test_entity_clusters_singletons_self_entity(spark):
    from otters_spark.operators.linkage import entity_clusters

    df = spark.createDataFrame(
        [(7, "one two three four"), (9, "five six seven eight")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["entity_id"] for r in entity_clusters(df, 0.5).collect()}
    assert got == {7: 7, 9: 9}


def test_entity_clusters_banded_matches_exact_on_near_dups(spark, sf_dir):
    """On a high-similarity threshold the banded candidate generator
    (LSH + exact verify) must find the same entities the exact
    inverted-index path finds on real near-dup documents."""
    from otters_spark.operators.linkage import entity_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        r["id"]: r["entity_id"]
        for r in entity_clusters(docs, 0.8, method="exact").collect()
    }
    banded = {
        r["id"]: r["entity_id"]
        for r in entity_clusters(
            docs, 0.8, method="banded", n_hashes=16, bands=8
        ).collect()
    }
    # same non-singleton clusters (banding at b=8,r=2 has ~1e-4 miss
    # probability per 0.8-pair on this corpus; deterministic hashes
    # make the outcome reproducible, so equality is a stable assert)
    ex_clusters = {k: v for k, v in exact.items() if v != k}
    bd_clusters = {k: v for k, v in banded.items() if v != k}
    assert ex_clusters == bd_clusters
    assert len(ex_clusters) > 0


def test_entity_clusters_banded_blocked_and_margin(spark):
    """Production knobs on the banded path, on data where blocks are
    cluster-safe BY CONSTRUCTION (every planted near-dup group shares
    one lang): (a) blocking must reproduce the exact unblocked
    clusters; (b) the signature-estimate pre-filter at a generous
    margin must not drop verified pairs. (On corpora whose true
    clusters span block values, blocking SPLITS them — that tradeoff
    is the operator's documented contract, not tested as equality.)"""
    from otters_spark.operators.linkage import entity_clusters

    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet cyan magenta",
    ]
    rows = []
    i = 0
    for g, text in enumerate(base):
        lang = f"L{g}"
        words = text.split()
        for v in range(4):  # 4 near-dup variants per group
            variant = " ".join(words + [f"tail{v}"])
            rows.append((i, variant, lang))
            i += 1
    rows.append((i, "completely different singleton words here", "L0"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    exact = {
        r["id"]: r["entity_id"]
        for r in entity_clusters(docs, 0.6, method="exact", ngram=2).collect()
        if r["id"] != r["entity_id"]
    }
    assert len(exact) == 9  # 3 groups x (4-1) merged members
    blocked = {
        r["id"]: r["entity_id"]
        for r in entity_clusters(
            docs, 0.6, method="banded", ngram=2, block_cols=("lang",)
        ).collect()
        if r["id"] != r["entity_id"]
    }
    assert blocked == exact
    with_margin = {
        r["id"]: r["entity_id"]
        for r in entity_clusters(
            docs,
            0.6,
            method="banded",
            ngram=2,
            block_cols=("lang",),
            est_margin=0.3,
        ).collect()
        if r["id"] != r["entity_id"]
    }
    assert with_margin == exact


def test_entity_clusters_rejects_unknown_method(spark):
    from otters_spark.operators.linkage import entity_clusters

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        entity_clusters(df, 0.5, method="fuzzy")


def test_entity_clusters_rejects_misused_banded_knobs(spark):
    """Banded-only knobs on the exact path must fail LOUDLY (silently
    dropping block_cols would run the unblocked quadratic generator
    the caller steered away from); out-of-range est_margin would
    silently drop every candidate."""
    from otters_spark.operators.linkage import entity_clusters

    df = spark.createDataFrame(
        [(1, "a b c", "L")], "doc_id long, text string, lang string"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="banded"):
        entity_clusters(df, 0.5, method="exact", block_cols=("lang",))
    with _pytest.raises(ValueError, match="banded"):
        entity_clusters(df, 0.5, method="exact", est_margin=0.1)
    for bad in (-0.2, 1.5):
        with _pytest.raises(ValueError, match="est_margin"):
            entity_clusters(df, 0.5, method="banded", est_margin=bad)


def test_golden_records_rules_and_tiebreaks(spark):
    """Each survivorship rule against a hand-computed consolidation,
    including the deterministic tie-breaks (mode tie -> smallest
    value; longest tie -> smallest lexicographically) and
    latest/earliest by timestamp."""
    from datetime import datetime

    from otters_spark.operators.linkage import golden_records

    rows = [
        # entity 1: mode tie de/en -> 'de'; longest tie 'bbbb'/'aaaa' -> 'aaaa'
        (1, "aaaa", "en", 10, datetime(2024, 1, 1)),
        (2, "bbbb", "de", 20, datetime(2024, 1, 3)),
        (3, "cc", "de", 15, datetime(2024, 1, 2)),
        (4, "dd", "en", None, datetime(2024, 1, 4)),
        # entity 10: singleton with a NULL text
        (10, None, "fr", 7, datetime(2024, 2, 1)),
    ]
    records = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, score long, ts timestamp"
    )
    entities = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 1), (10, 10)], "id long, entity_id long"
    )
    got = {
        r["entity_id"]: r.asDict()
        for r in golden_records(
            records,
            entities,
            {
                "text": "longest",
                "lang": "most_frequent",
                "score": "max",
                "ts": "latest",
            },
            ts_col="ts",
        ).collect()
    }
    e1 = got[1]
    assert e1["n_members"] == 4
    assert e1["text"] == "aaaa"  # longest tie -> lexicographically smallest
    assert e1["lang"] == "de"  # mode tie 2-2 -> smallest value
    assert e1["score"] == 20
    assert e1["ts"] == datetime(2024, 1, 4)
    e10 = got[10]
    assert e10["text"] is None and e10["lang"] == "fr" and e10["score"] == 7


def test_golden_records_first_non_null_and_errors(spark):
    from otters_spark.operators.linkage import golden_records

    records = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "y")], "doc_id long, v string"
    )
    entities = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, entity_id long"
    )
    out = golden_records(records, entities, {"v": "first_non_null"}).collect()
    assert out[0]["v"] == "x"  # smallest id WITH a value, not id 1's NULL
    with pytest.raises(ValueError, match="unknown rule"):
        golden_records(records, entities, {"v": "nope"})
    with pytest.raises(ValueError, match="needs ts_col"):
        golden_records(records, entities, {"v": "latest"})
    with pytest.raises(ValueError, match="not in records"):
        golden_records(records, entities, {"zz": "max"})


def test_golden_records_id_col_with_rule(spark):
    """The id column may itself carry a survivorship rule (e.g. 'keep
    the max doc_id as the golden id') — the pruned projection must not
    emit the column twice (ambiguous-reference regression, round-6
    advisor item)."""
    from otters_spark.operators.linkage import golden_records

    records = spark.createDataFrame(
        [(1, "x"), (7, "y"), (3, "y")], "doc_id long, v string"
    )
    entities = spark.createDataFrame(
        [(1, 1), (7, 1), (3, 1)], "id long, entity_id long"
    )
    got = golden_records(
        records, entities, {"doc_id": "max", "v": "most_frequent"}
    ).collect()
    assert len(got) == 1
    assert got[0]["doc_id"] == 7 and got[0]["v"] == "y"
    assert got[0]["n_members"] == 3
