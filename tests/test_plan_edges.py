"""Plan edge cases from the reference test suite: take(0), k > n,
duplicate batch queries, store attached late, store missing."""

import pytest
from pyspark.sql import types as T

from otters_spark import PlanError, VecStore
from otters_spark.plan import VecQueryPlan

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
    ]
)


@pytest.fixture(scope="module")
def store(spark):
    rows = [(i, v) for i, v in enumerate([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]])]
    return VecStore.from_df(spark.createDataFrame(rows, VEC_SCHEMA))


def test_take_zero_is_empty(store):
    assert store.query([1.0, 0.0], "cosine").take(0).collect() == []


def test_k_larger_than_store_returns_all(store):
    rows = store.query([1.0, 0.0], "cosine").take(100).collect()
    assert len(rows) == 3


def test_duplicate_batch_queries_duplicate_rows(store):
    # the same query twice scores every row twice; global merge keeps both
    rows = store.query([[1.0, 0.0], [1.0, 0.0]], "dot").collect()
    assert len(rows) == 6
    ids = sorted(r["vec_id"] for r in rows)
    assert ids == [0, 0, 1, 1, 2, 2]


def test_with_vector_store_attaches_late(store):
    plan = VecQueryPlan(None, [1.0, 0.0], "cosine").take(1)
    with pytest.raises(PlanError):
        plan.collect()
    rows = plan.with_vector_store(store).collect()
    assert rows[0]["vec_id"] == 0


def test_with_vector_store_rejects_non_store(store):
    plan = VecQueryPlan(None, [1.0, 0.0], "cosine").with_vector_store("nope")
    with pytest.raises(PlanError):
        plan.collect()


def test_query_batch_alias(store):
    a = store.query([[1.0, 0.0], [0.0, 1.0]], "dot").take(3).collect()
    b = store.query_batch([[1.0, 0.0], [0.0, 1.0]], "dot").take(3).collect()
    assert a == b


def test_mixed_dim_batch_rejected(store):
    # only the SECOND query has a bad dim: whole batch errors at collect
    plan = store.query([[1.0, 0.0], [1.0, 0.0, 9.9]], "dot").take(2)
    import pytest as _pytest

    from otters_spark import DimensionMismatchError

    with _pytest.raises(DimensionMismatchError):
        plan.collect()


def test_lt_score_filter(store):
    rows = store.query([1.0, 0.0], "cosine").filter(0.9, "lt").collect()
    assert all(r["score"] < 0.9 for r in rows)
    ids = sorted(r["vec_id"] for r in rows)
    assert ids == [1, 2]  # row 0 is the exact match, excluded


def test_eq_score_filter(store):
    rows = store.query([1.0, 0.0], "cosine").filter(0.0, "eq").collect()
    assert [r["vec_id"] for r in rows] == [1]  # orthogonal scores exactly 0


def test_repeated_filter_replaces(store):
    # reference semantics: vec.rs:152 ASSIGNS filter_criteria, so the
    # second call replaces the first (not AND)
    rows = store.query([1.0, 0.0], "cosine").filter(0.9, "gt").filter(0.9, "lt").collect()
    ids = sorted(r["vec_id"] for r in rows)
    assert ids == [1, 2]  # only the second (lt) criterion applies


def test_malformed_queries_defer_errors(store):
    from otters_spark import EmptyQueryError, OttersError

    # a bare string, and a mixed scalar/list batch: builder must NOT
    # raise; the error surfaces at collect as an OttersError
    for bad in ("not a vector", [1.0, [2.0, 3.0]], [["a", "b"]]):
        plan = store.query(bad, "cosine").take(1)  # no raise here
        with pytest.raises(OttersError):
            plan.collect()
    with pytest.raises(EmptyQueryError):
        store.query("oops", "cosine").collect()


def test_non_numeric_threshold_defers(store):
    plan = store.query([1.0, 0.0], "cosine").filter("high", "gt")
    with pytest.raises(PlanError):
        plan.collect()
