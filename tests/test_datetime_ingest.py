"""Strict datetime ingestion: reference errors on unparseable strings
(src/col.rs:524-526); Spark NULLs them — parse_datetime_column restores
the strict contract."""

import datetime as dt

import pytest

from otters_spark import StoreBuildError
from otters_spark.store import parse_datetime_column


def test_strict_parse_ok(spark):
    df = spark.createDataFrame(
        [(0, "2024-01-02"), (1, "2024-01-02 03:04:05"), (2, None)], ["id", "d"]
    )
    out = {r["id"]: r["d"] for r in parse_datetime_column(df, "d").collect()}
    assert out[0] == dt.datetime(2024, 1, 2)
    assert out[1] == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert out[2] is None  # NULL input stays NULL, not an error


def test_strict_parse_fails_hard(spark):
    df = spark.createDataFrame([(0, "2024-01-02"), (1, "not a date")], ["id", "d"])
    with pytest.raises(StoreBuildError) as e:
        parse_datetime_column(df, "d")
    assert "not a date" in str(e.value)


def test_lenient_parse_nulls(spark):
    df = spark.createDataFrame([(0, "2024-01-02"), (1, "nope")], ["id", "d"])
    out = {r["id"]: r["d"] for r in parse_datetime_column(df, "d", strict=False).collect()}
    assert out[0] is not None and out[1] is None


def test_custom_format(spark):
    df = spark.createDataFrame([(0, "02/01/2024")], ["id", "d"])
    out = parse_datetime_column(df, "d", fmt="dd/MM/yyyy").collect()
    assert out[0]["d"] == dt.datetime(2024, 1, 2)
    with pytest.raises(StoreBuildError):
        parse_datetime_column(df, "d", fmt="yyyy-MM-dd")
