"""Learned quality classifier: planted-signal correctness and the
native-scoring property."""

import pytest

from otters_spark.operators.quality_model import (
    QUALITY_FEATURES,
    quality_feature_table,
    score_quality,
    train_quality_classifier,
)


@pytest.fixture(scope="module")
def trained(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spam = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.element_at(F.split(F.col("text"), " "), 1), 80)
        ).alias("text"),
    )
    labeled = docs.select("doc_id", "text", F.lit(1.0).alias("label")).unionByName(
        spam.select("doc_id", "text", F.lit(0.0).alias("label"))
    )
    feats = quality_feature_table(labeled, keep_cols=["label"])
    coefs = train_quality_classifier(feats)
    return feats, coefs


def test_feature_table_columns(trained):
    feats, _ = trained
    assert set(QUALITY_FEATURES) <= set(feats.columns)


def test_planted_spam_scores_lower(trained):
    from pyspark.sql import functions as F

    feats, coefs = trained
    scored = score_quality(feats, coefs)
    rows = scored.groupBy("label").agg(F.avg("quality_prob").alias("p")).collect()
    by_label = {r["label"]: r["p"] for r in rows}
    # separation: real docs well above spam mutations
    assert by_label[1.0] > 0.8
    assert by_label[0.0] < 0.2


def test_scoring_is_native(trained, spark):
    feats, coefs = trained
    plan = score_quality(feats, coefs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_holdout_accuracy(trained):
    from pyspark.sql import functions as F

    from otters_spark.operators.sampling import hash_split

    feats, _ = trained
    split = hash_split(feats, weights={"train": 0.7, "held": 0.3})
    coefs = train_quality_classifier(
        split.filter(F.col("split") == "train").drop("split")
    )
    held = score_quality(split.filter(F.col("split") == "held"), coefs)
    acc = held.select(
        F.avg(
            ((F.col("quality_prob") > 0.5) == (F.col("label") == 1.0)).cast("double")
        ).alias("acc")
    ).collect()[0]["acc"]
    assert acc > 0.95  # spam mutations are trivially separable


def test_nb_planted_spam_scores_lower(trained):
    """The closed-form Gaussian NB trainer (the oracle-paired suite
    path) separates the same planted signal the LR trainer does."""
    from pyspark.sql import functions as F

    from otters_spark.operators.quality_model import score_nb, train_nb_quality

    feats, _ = trained
    stats = train_nb_quality(feats)
    scored = score_nb(feats, stats)
    rows = scored.groupBy("label").agg(F.avg("quality_prob").alias("p")).collect()
    by_label = {r["label"]: r["p"] for r in rows}
    assert by_label[1.0] > 0.8
    assert by_label[0.0] < 0.2


def test_nb_scoring_is_native(trained):
    from otters_spark.operators.quality_model import score_nb, train_nb_quality

    feats, _ = trained
    stats = train_nb_quality(feats)
    plan = score_nb(feats, stats)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_nb_requires_both_classes(trained, spark):
    from pyspark.sql import functions as F

    from otters_spark.operators.quality_model import train_nb_quality

    feats, _ = trained
    with pytest.raises(ValueError, match="both classes"):
        train_nb_quality(feats.filter(F.col("label") == 1.0))
