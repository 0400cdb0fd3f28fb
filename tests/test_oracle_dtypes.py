"""Dtype parity between every oracle SQL and its Spark query.

The driver's correctness hash is DTYPE-SENSITIVE: DuckDB `sum(BIGINT)`
returns HUGEINT, which pandas renders as float64, while Spark returns
int64 — the row then fails hash_match even though every value is equal
(round-2 lost five rows to exactly this). This test makes the bug class
impossible to reintroduce: for every ORACLE_SQL entry it compares the
DuckDB relation's bound types against the Spark DataFrame schema at the
int/float granularity the hash cares about. Both sides are resolved
LAZILY (DuckDB binds without executing; Spark schemas without an
action), so the whole sweep costs seconds, not a full 73-query run.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from otters_spark.suite import ORACLE_SQL, QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _duck_class(t: str) -> str:
    """Collapse a DuckDB type name to the pandas-dtype class the
    driver's hash sees after ``.df()``."""
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "float"  # pandas converts DECIMAL to float64
    if t in ("HUGEINT", "UHUGEINT"):
        return "float"  # no int128 in pandas -> float64 -> hash poison
    if t in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    ):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "str"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "temporal"
    return f"other:{t}"


def _spark_class(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "float"  # driver sees Decimal objects vs float64 — forbid
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "temporal"
    return f"other:{dt.simpleString()}"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_dtype_parity(name, spark, sf_dir, duck):
    rel = duck.sql(ORACLE_SQL[name])
    duck_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    schema = QUERIES[name](spark, sf_dir).schema
    spark_types = {f.name: f.dataType for f in schema.fields}

    assert sorted(duck_types) == sorted(spark_types), (
        f"{name}: column sets differ: duckdb={sorted(duck_types)} "
        f"spark={sorted(spark_types)}"
    )
    mismatches = {}
    for col, dt in duck_types.items():
        dcls, scls = _duck_class(dt), _spark_class(spark_types[col])
        if dcls != scls:
            mismatches[col] = f"duckdb {dt} ({dcls}) vs spark " \
                f"{spark_types[col].simpleString()} ({scls})"
    assert not mismatches, (
        f"{name}: dtype class mismatch (driver hash would differ even on "
        f"equal values): {mismatches}"
    )
