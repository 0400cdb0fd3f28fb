"""Port of the reference's MetaStore tests
(/root/reference/tests/meta_tests.rs, meta_zonemap_tests.rs): combined
meta+vector filters, datetime windows, NULL semantics, strict-typing
errors deferred to collect, persistence round-trip."""

import datetime as dt

import pytest
from pyspark.sql import types as T

from otters_spark import MetaStore, TypeMismatchError, UnknownColumnError, col

EPS = 1e-5

STUDENTS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
        T.StructField("age", T.IntegerType(), True),
        T.StructField("grade", T.StringType(), True),
    ]
)


@pytest.fixture(scope="module")
def students(spark):
    # meta_tests.rs:5-39 fixture shape: axis-ish vectors + age/grade
    rows = [
        (0, [1.0, 0.0, 0.0], 12, "B"),
        (1, [0.0, 1.0, 0.0], 15, "B+"),
        (2, [0.0, 0.0, 1.0], 20, "A"),
        (3, [1.0, 1.0, 0.0], None, "C"),
        (4, [0.0, 1.0, 1.0], 25, None),
    ]
    return MetaStore.from_df(spark.createDataFrame(rows, STUDENTS_SCHEMA))


def test_meta_and_vector_filter(students):
    # age>15 & grade=="A" -> exactly row 2 (meta_tests.rs:4-39)
    rows = (
        students.query([0.0, 0.0, 1.0], metric="cosine")
        .meta_filter((col("age").gt(15)) & (col("grade").eq("A")))
        .take(5)
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["vec_id"] == 2
    assert abs(rows[0]["score"] - 1.0) < EPS


def test_result_columns_name_sorted(students):
    rows = students.query([1.0, 0.0, 0.0], metric="cosine").take(1).collect()
    # index, score, then name-sorted metadata (src/meta.rs:723-724)
    assert list(rows[0].asDict().keys()) == ["vec_id", "score", "age", "grade"]


def test_null_never_matches(students):
    # NULL age must not match any predicate, even neq
    # (src/type_utils.rs:329-443; SQL 3VL)
    rows = (
        students.query([1.0, 1.0, 1.0], metric="dot")
        .meta_filter(col("age").neq(12))
        .collect()
    )
    ids = sorted(r["vec_id"] for r in rows)
    assert ids == [1, 2, 4]  # row 3 (NULL age) excluded


def test_string_eq_only_matches_nonnull(students):
    rows = (
        students.query([1.0, 1.0, 1.0], metric="dot")
        .meta_filter(col("grade").neq("A"))
        .collect()
    )
    ids = sorted(r["vec_id"] for r in rows)
    assert ids == [0, 1, 3]  # row 4 (NULL grade) excluded


def test_unknown_column_deferred(students):
    plan = students.query([1.0, 0.0, 0.0], metric="cosine").meta_filter(
        col("nope").eq(1)
    )
    with pytest.raises(UnknownColumnError):
        plan.collect()


def test_strict_typing_deferred(students):
    plan = students.query([1.0, 0.0, 0.0], metric="cosine").meta_filter(
        col("age").gt(12.5)
    )
    with pytest.raises(TypeMismatchError):
        plan.collect()


DATED_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
        T.StructField("created", T.TimestampType(), True),
    ]
)


def test_datetime_window(spark):
    # meta_tests.rs:90-119: 2023-only window
    rows_in = [
        (0, [1.0, 0.0], dt.datetime(2022, 6, 1)),
        (1, [1.0, 0.0], dt.datetime(2023, 3, 15)),
        (2, [1.0, 0.0], dt.datetime(2023, 11, 2)),
        (3, [1.0, 0.0], dt.datetime(2024, 2, 9)),
    ]
    store = MetaStore.from_df(spark.createDataFrame(rows_in, DATED_SCHEMA))
    rows = (
        store.query([1.0, 0.0], metric="cosine")
        .meta_filter(
            (col("created").gte("2023-01-01")) & (col("created").lt("2024-01-01"))
        )
        .collect()
    )
    assert sorted(r["vec_id"] for r in rows) == [1, 2]


def test_save_load_roundtrip(spark, tmp_path, students):
    path = str(tmp_path / "store")
    students.save(path, sort_cols=["age"])
    loaded = MetaStore.load(spark, path)
    assert loaded.dim == 3
    assert loaded.vec_col == "embedding"
    rows = (
        loaded.query([0.0, 0.0, 1.0], metric="cosine")
        .meta_filter((col("age").gt(15)) & (col("grade").eq("A")))
        .take(5)
        .collect()
    )
    assert len(rows) == 1 and rows[0]["vec_id"] == 2


def test_vec_filter_and_meta_compose(students):
    rows = (
        students.query([1.0, 1.0, 0.0], metric="cosine")
        .meta_filter(col("age").gte(12))
        .vec_filter(0.5, "gt")
        .take(10)
        .collect()
    )
    assert all(r["score"] > 0.5 for r in rows)
    ids = [r["vec_id"] for r in rows]
    assert 0 in ids and 1 in ids
