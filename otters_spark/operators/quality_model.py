"""Model-based document quality filtering — the learned complement to
the heuristic gates in ``text_analysis``.

Every production LLM curation stack pairs rule-based gates with a
learned quality classifier (CCNet's fasttext LM filter, the
LLaMA/RefinedWeb "looks like reference text" classifiers): label a
small seed set (reference corpus = positive, raw crawl = negative),
train a cheap linear model over text features, score the whole corpus
distributed-ly, keep by threshold or sample by score.

Spark shape: feature extraction is the same one-pass narrow projection
as the heuristic gates (no Python in the row path); training is MLlib
logistic regression (driver-coordinated L-BFGS over distributed
gradients — the standard batch shape); scoring is a broadcast of the
(tiny) coefficient vector, applied as a NATIVE column expression, so
corpus scoring is scan-speed with no MLlib/UDF involvement at all.

Not SQL-reproducible (iterative fit), so suite coverage is rows-only;
correctness is asserted with planted low-quality documents
(tests/test_quality_model.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from .text_analysis import quality_features, repetition_features

__all__ = [
    "quality_feature_table",
    "train_quality_classifier",
    "score_quality",
    "QUALITY_FEATURES",
]

#: feature columns the classifier consumes, in coefficient order
QUALITY_FEATURES = (
    "type_token_ratio",
    "stopword_ratio",
    "length_factor",
    "dup_token_frac",
    "top_bigram_frac",
)


def quality_feature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """One narrow pass producing every QUALITY_FEATURES column:
    lexical-diversity and stopword features from ``quality_features``
    chained (via keep_cols, no join-back) with the Gopher repetition
    features."""
    q = quality_features(df, text_col, id_col, keep_cols=[*keep_cols, text_col])
    r = repetition_features(
        q,
        text_col=text_col,
        id_col=id_col,
        keep_cols=[
            *keep_cols,
            "type_token_ratio",
            "stopword_ratio",
            "length_factor",
        ],
    )
    return r.select(
        id_col,
        *keep_cols,
        *[F.col(c) for c in QUALITY_FEATURES],
    )


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
    train_partitions: int | None = 8,
) -> dict:
    """Fit logistic regression on a labeled feature table (columns
    QUALITY_FEATURES + ``label_col`` in {0,1}). Returns a plain dict
    {feature: coefficient, "__intercept": b} — deliberately NOT an
    MLlib model object, so scoring needs no MLlib at all (and the
    coefficients serialize into job configs / SQL).

    Seed sets are small by construction (labeling is the expensive
    part), while L-BFGS pays a full task wave per iteration — so the
    train set is coalesced to ``train_partitions`` before the fit
    (pass None to keep the input partitioning for genuinely large
    labeled sets)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    if train_partitions is not None:
        labeled = labeled.coalesce(train_partitions)
    assembled = VectorAssembler(
        inputCols=list(QUALITY_FEATURES), outputCol="__features"
    ).transform(labeled)
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    model = lr.fit(assembled)
    coefs = {f: float(c) for f, c in zip(QUALITY_FEATURES, model.coefficients)}
    coefs["__intercept"] = float(model.intercept)
    return coefs


def score_quality(
    features: DataFrame, coefs: dict, out_col: str = "quality_prob"
) -> DataFrame:
    """Apply a trained classifier as a NATIVE column expression:
    sigmoid(w·x + b). The model is a handful of doubles, so corpus
    scoring is a narrow scan-speed projection — no broadcast join, no
    UDF, no MLlib on the scoring path (the property that makes a
    learned filter viable at 100 TB)."""
    z = F.lit(float(coefs["__intercept"]))
    for f in QUALITY_FEATURES:
        z = z + F.lit(float(coefs[f])) * F.col(f)
    return features.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
