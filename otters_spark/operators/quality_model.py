"""Model-based document quality filtering — the learned complement to
the heuristic gates in ``text_analysis``.

Every production LLM curation stack pairs rule-based gates with a
learned quality classifier (CCNet's fasttext LM filter, the
LLaMA/RefinedWeb "looks like reference text" classifiers): label a
small seed set (reference corpus = positive, raw crawl = negative),
train a cheap linear model over text features, score the whole corpus
distributed-ly, keep by threshold or sample by score.

Spark shape: feature extraction is the same one-pass narrow projection
as the heuristic gates (no Python in the row path); scoring is a
broadcast of the (tiny) model parameters, applied as a NATIVE column
expression, so corpus scoring is scan-speed with no MLlib/UDF
involvement at all. Two trainers share that scoring shape:

* :func:`train_quality_classifier` — MLlib logistic regression
  (driver-coordinated L-BFGS over distributed gradients, the standard
  batch shape). Iterative, so not SQL-reproducible; correctness is
  asserted with planted low-quality documents
  (tests/test_quality_model.py).
* :func:`train_nb_quality` — closed-form Gaussian Naive Bayes: the
  whole fit is ONE distributed aggregation (per-class count + mean +
  variance per feature), which makes it deterministic and
  SQL-expressible end-to-end — the trainer the oracle-paired suite
  query uses (suite.pipeline_quality_model), and the cheaper fit at
  scale (one task wave instead of one per L-BFGS iteration).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from .text_analysis import quality_features, repetition_features

__all__ = [
    "quality_feature_table",
    "train_quality_classifier",
    "train_nb_quality",
    "score_quality",
    "score_nb",
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


def train_nb_quality(
    labeled: DataFrame,
    label_col: str = "label",
    var_floor: float = 1e-6,
) -> dict:
    """Fit a Gaussian Naive Bayes quality classifier in CLOSED FORM:
    per class c ∈ {0, 1}, the per-feature mean and sample variance
    plus the class count — one distributed aggregation, no iteration.
    Returns a plain dict
    ``{feature: (mu0, var0, mu1, var1), "__n0": n0, "__n1": n1}``
    (variances already floored by ``var_floor`` so a constant feature
    cannot divide by zero).

    Why this trainer exists next to the LR one: the fit is a single
    map-side-combinable agg (the cheapest possible shape at 100 TB —
    L-BFGS pays a full task wave per iteration), and it is
    deterministic + SQL-expressible, so the suite query built on it is
    oracle-paired instead of rows-only (round-7 VERDICT item 3)."""
    aggs: list = []
    for cls in (0, 1):
        is_cls = F.col(label_col) == float(cls)
        aggs.append(
            F.count(F.when(is_cls, F.lit(1))).alias(f"__n{cls}")
        )
        for feat in QUALITY_FEATURES:
            v = F.when(is_cls, F.col(feat))
            aggs.append(F.avg(v).alias(f"{feat}__mu{cls}"))
            aggs.append(F.var_samp(v).alias(f"{feat}__var{cls}"))
    row = labeled.agg(*aggs).collect()[0]
    n0, n1 = int(row["__n0"]), int(row["__n1"])
    if n0 < 2 or n1 < 2:
        # n >= 2 per class: var_samp of a single row is NULL, and a
        # clear error beats the TypeError a NULL variance would raise
        raise ValueError(
            "train_nb_quality needs both classes with >= 2 rows each "
            f"(sample variance); got n0={n0} n1={n1}"
        )
    stats: dict = {"__n0": n0, "__n1": n1}
    for feat in QUALITY_FEATURES:
        stats[feat] = (
            float(row[f"{feat}__mu0"]),
            float(row[f"{feat}__var0"]) + var_floor,
            float(row[f"{feat}__mu1"]),
            float(row[f"{feat}__var1"]) + var_floor,
        )
    return stats


def score_nb(
    features: DataFrame, stats: dict, out_col: str = "quality_prob"
) -> DataFrame:
    """Apply a :func:`train_nb_quality` model as a NATIVE column
    expression: ``sigmoid(log-odds)`` where the log-odds is the class
    prior ratio plus the per-feature Gaussian log-density differences.
    Same scale property as :func:`score_quality` — the model is a
    handful of doubles, corpus scoring is a scan-speed projection.

    The per-class normalizing constants (-0.5·ln(2π·var)) are folded
    into literals on the driver; only the data-dependent quadratic
    terms are column arithmetic, keeping the generated code small."""
    import math

    z = F.lit(math.log(stats["__n1"] / stats["__n0"]))
    for feat in QUALITY_FEATURES:
        mu0, v0, mu1, v1 = stats[feat]
        x = F.col(feat)
        z = (
            z
            + F.lit(-0.5 * math.log(2.0 * math.pi * v1))
            - (x - F.lit(mu1)) * (x - F.lit(mu1)) / F.lit(2.0 * v1)
            - F.lit(-0.5 * math.log(2.0 * math.pi * v0))
            + (x - F.lit(mu0)) * (x - F.lit(mu0)) / F.lit(2.0 * v0)
        )
    return features.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    )


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
