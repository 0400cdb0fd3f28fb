"""Decontamination operator semantics on crafted corpora."""

from otters_spark.operators.decontam import contamination_report, ngram_hashes


def test_contamination_report(spark):
    train = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),        # contains eval 100 verbatim
            (2, "x y z a b c d e"),        # shares only a 5-token span
            (3, "p q r s t u v w"),        # clean
            (4, "a b c d e f g h i j"),    # superset: two 8-grams hit? no — one from eval
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "a b c d e f g h")], ["doc_id", "text"]
    )
    rep = {r["train_id"]: r for r in contamination_report(train, ev, n=8).collect()}
    assert set(rep) == {1, 4}
    assert rep[1]["n_shared_ngrams"] == 1 and rep[1]["n_eval_docs"] == 1
    assert rep[4]["n_shared_ngrams"] == 1


def test_ngram_hashes_distinct_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b a b a b"), (2, "too short")], ["doc_id", "text"]
    )
    rows = ngram_hashes(df, 8).collect()
    # doc 1 has 3 8-grams but only 2 distinct ('a b...' and 'b a...');
    # doc 2 (<8 tokens) contributes nothing
    assert len(rows) == 2 and all(r["doc_id"] == 1 for r in rows)
