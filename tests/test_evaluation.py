"""Retrieval-metric operator: exact hand-computed values, edge cases,
and consistency of the suite's ANN-evaluation row."""

import math

import pytest
from pyspark.sql import functions as F

from otters_spark.operators.evaluation import retrieval_metrics, with_rank


def _ranked(spark, rows):
    """rows: (query_id, vec_id, rank)"""
    return spark.createDataFrame(rows, "query_id int, vec_id int, rank int")


def test_metrics_hand_computed(spark):
    # truth = [1, 2, 3]; approx = [3, 9, 1] -> hits at ranks 1 and 3
    truth = _ranked(spark, [(0, 1, 1), (0, 2, 2), (0, 3, 3)])
    approx = _ranked(spark, [(0, 3, 1), (0, 9, 2), (0, 1, 3)])
    row = retrieval_metrics(approx, truth).collect()[0]
    assert row.n_hits == 2 and row.n_truth == 3
    assert row.recall == pytest.approx(2 / 3, abs=1e-6)
    assert row.mrr == 1.0  # first approx row is relevant
    dcg = 1.0 / math.log2(2) + 1.0 / math.log2(4)
    idcg = sum(1.0 / math.log2(r + 1) for r in (1, 2, 3))
    assert row.ndcg == pytest.approx(dcg / idcg, abs=1e-6)


def test_perfect_and_empty_lanes(spark):
    truth = _ranked(spark, [(0, 1, 1), (0, 2, 2), (1, 7, 1)])
    # query 0: perfect; query 1: no overlap at all
    approx = _ranked(spark, [(0, 1, 1), (0, 2, 2), (1, 8, 1)])
    out = {r.query_id: r for r in retrieval_metrics(approx, truth).collect()}
    assert out[0].recall == 1.0 and out[0].mrr == 1.0 and out[0].ndcg == 1.0
    assert out[1].n_hits == 0
    assert out[1].recall == 0.0 and out[1].mrr == 0.0 and out[1].ndcg == 0.0


def test_query_missing_from_approx_still_scores_zero(spark):
    truth = _ranked(spark, [(0, 1, 1), (1, 2, 1)])
    approx = _ranked(spark, [(0, 1, 1)])  # lane returned nothing for q1
    out = {r.query_id: r for r in retrieval_metrics(approx, truth).collect()}
    assert set(out) == {0, 1}
    assert out[1].recall == 0.0 and out[1].n_hits == 0


def test_approx_only_query_id_raises_in_strict_mode(spark):
    """A lane emitting rows under a query id truth never saw is an
    anomaly, not something to silently drop from a truth-driven report."""
    truth = _ranked(spark, [(0, 1, 1)])
    approx = _ranked(spark, [(0, 1, 1), (9, 2, 1)])  # 9 not in truth
    with pytest.raises(ValueError, match="absent from"):
        retrieval_metrics(approx, truth).collect()
    # strict=False: documented opt-out, truth-driven output unchanged
    out = retrieval_metrics(approx, truth, strict=False).collect()
    assert [r.query_id for r in out] == [0]


def test_with_rank_orders_and_breaks_ties_on_id(spark):
    df = spark.createDataFrame(
        [(0, 5, 0.9), (0, 3, 0.9), (0, 7, 1.1)],
        "query_id int, vec_id int, score double",
    )
    got = {
        r.vec_id: r.rank for r in with_rank(df).collect()
    }
    assert got == {7: 1, 3: 2, 5: 3}


def test_suite_eval_row_bounds(spark, sf_dir):
    """The ANN lane's recall must be within (0, 1]; the exact lane is
    the truth so n_truth == 10 for every query at every SF."""
    from otters_spark.suite import eval_ann_recall

    rows = eval_ann_recall(spark, sf_dir).collect()
    assert [r.query_id for r in rows] == [0, 1, 2]
    for r in rows:
        assert r.n_truth == 10
        assert 0.0 <= r.recall <= 1.0
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        # multiprobe LSH at 4 planes keeps a healthy candidate pool —
        # a zero-recall lane would mean the bucketing broke
        assert r.n_hits >= 1
