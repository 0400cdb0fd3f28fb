"""Constraint validation: per-type semantics, NULL policy, one-pass plan."""

import pytest
from pyspark.sql import functions as F

from otters_spark.operators.quality_checks import (
    AcceptedValues,
    ForeignKey,
    InRange,
    Matches,
    NotNull,
    Unique,
    validate,
)


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        (1, "a", 0.05, "AB"),
        (2, "a", 0.05, "CD"),
        (2, "b", 0.50, "ef"),   # dup id, out-of-range, lowercase
        (3, None, 0.08, "GH"),  # null cat
        (4, "z", None, None),   # unaccepted cat, null value & code
    ]
    return spark.createDataFrame(rows, "id long, cat string, disc double, code string")


@pytest.fixture(scope="module")
def dims(spark):
    return spark.createDataFrame([(1,), (2,), (3,)], "ref_id long")


def test_report_values(facts, dims):
    rep = validate(
        facts,
        [
            NotNull("cat"),
            InRange("disc", 0.0, 0.1),
            AcceptedValues("cat", ("a", "b")),
            Matches("code", "^[A-Z]+$"),
            Unique(("id",)),
            ForeignKey("id", dims, "ref_id"),
        ],
    )
    got = {r["constraint"]: (r["violations"], r["total"], r["passed"])
           for r in rep.collect()}
    assert got["not_null(cat)"] == (1, 5, False)
    # NULL disc is not an in_range violation; 0.50 is
    assert got["in_range(disc)"] == (1, 5, False)
    # NULL cat not a violation here; "z" is
    assert got["accepted(cat)"] == (1, 5, False)
    # "ef" violates; NULL code does not
    assert got["matches(code)"] == (1, 5, False)
    # id=2 twice -> one extra row
    assert got["unique(id)"] == (1, 5, False)
    # id=4 has no dim match
    assert got["fk(id)"] == (1, 5, False)


def test_all_green_and_schema(facts, dims):
    rep = validate(facts, [NotNull("id"), Unique(("id", "cat"))])
    rows = rep.collect()
    assert all(r["passed"] for r in rows)
    assert [f.name for f in rep.schema.fields] == [
        "constraint", "violations", "total", "passed"]
    assert {str(f.dataType) for f in rep.schema.fields[1:3]} == {"LongType()"}


def test_row_level_checks_share_one_scan(facts):
    rep = validate(
        facts,
        [NotNull("cat"), InRange("disc", 0, 1), Matches("code", ".*")],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # a single aggregate over a single scan: no join, no extra exchange
    # fan-in beyond the one-row aggregate
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 1
    assert "Join" not in plan


def test_validation_errors(facts):
    with pytest.raises(ValueError):
        validate(facts, [])
    with pytest.raises(ValueError):
        validate(facts, [NotNull("cat"), NotNull("cat")])
    with pytest.raises(TypeError):
        validate(facts, ["not_a_constraint"])


def test_empty_input(spark, dims):
    empty = spark.createDataFrame([], "id long, cat string")
    rep = validate(empty, [NotNull("cat"), Unique(("id",)),
                           ForeignKey("id", dims, "ref_id")])
    got = {r["constraint"]: (r["violations"], r["total"], r["passed"])
           for r in rep.collect()}
    assert got == {
        "not_null(cat)": (0, 0, True),
        "unique(id)": (0, 0, True),
        "fk(id)": (0, 0, True),
    }


def test_unknown_columns_rejected(facts, dims):
    with pytest.raises(ValueError, match="unknown column"):
        validate(facts, [NotNull("nope")])
    with pytest.raises(ValueError, match="unknown column"):
        validate(facts, [Unique(("id", "nope"))])
    with pytest.raises(ValueError, match="reference column"):
        validate(facts, [ForeignKey("id", dims, "nope")])


def test_matches_is_full_match(spark):
    df = spark.createDataFrame([(1, "AB"), (2, "xx1AB"), (3, "ABz")],
                               "id long, code string")
    rep = validate(df, [Matches("code", "[A-Z]+")]).collect()[0]
    # substring rlike would pass all three; full-match flags 2 and 3
    assert rep["violations"] == 2


def test_labels_disambiguate_same_type_same_column(facts):
    rep = validate(
        facts,
        [
            InRange("disc", 0.0, 0.1, label="disc_hard"),
            InRange("disc", 0.0, 0.04, label="disc_warn"),
        ],
    )
    got = {r["constraint"]: r["violations"] for r in rep.collect()}
    assert got["disc_hard"] == 1 and got["disc_warn"] == 4
    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate"):
        validate(facts, [InRange("disc", 0, 1), InRange("disc", 0, 2)])


def test_fk_single_scan(facts, dims):
    rep = validate(facts, [ForeignKey("id", dims, "ref_id")])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one pass over the fact side: the total must NOT add a second
    # fact-side scan beyond the join's
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 2


def test_profile_table_matches_hand_computed(spark):
    from datetime import datetime

    from otters_spark.operators.quality_checks import profile_table

    rows = [
        (1, "a", 10.0, datetime(2024, 1, 1, 12, 0, 0)),
        (2, "b", None, datetime(2024, 1, 3, 0, 0, 0, 500)),
        (None, "a", 30.5, None),
    ]
    df = spark.createDataFrame(rows, "k long, s string, v double, ts timestamp")
    got = {r["column"]: r.asDict() for r in profile_table(df).collect()}
    assert got["k"]["n_rows"] == 3 and got["k"]["n_null"] == 1
    assert got["k"]["n_distinct"] == 2
    assert got["k"]["min_num"] == 1.0 and got["k"]["max_num"] == 2.0
    assert got["k"]["min_str"] is None
    assert got["s"]["n_distinct"] == 2 and got["s"]["min_str"] == "a"
    assert got["s"]["mean"] is None
    assert got["v"]["mean"] == pytest.approx((10.0 + 30.5) / 2, abs=1e-6)
    assert got["v"]["null_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got["ts"]["min_str"] == "2024-01-01 12:00:00.000000"
    assert got["ts"]["max_str"] == "2024-01-03 00:00:00.000500"
    assert got["ts"]["dtype"] == "timestamp"


def test_profile_table_distinct_exact_past_double_precision(spark):
    """64-bit surrogate keys whose values collide when squeezed into a
    double (adjacent longs past 2^53) must still count as DISTINCT:
    integrals ride the melt in an exact long slot, not the double
    slot."""
    from otters_spark.operators.quality_checks import profile_table

    base = 1 << 60
    # base and base+1 are the same double; so are base+2/base+3
    rows = [(base,), (base + 1,), (base + 2,), (base + 3,)]
    df = spark.createDataFrame(rows, "k long")
    got = profile_table(df).collect()[0]
    assert got["n_distinct"] == 4


def test_profile_table_approx_knob_and_errors(spark):
    from otters_spark.operators.quality_checks import profile_table

    df = spark.createDataFrame(
        [(i, [1.0]) for i in range(100)], "k long, arr array<double>"
    )
    approx = {
        r["column"]: r["n_distinct"]
        for r in profile_table(df, ["k"], exact_distinct=False).collect()
    }
    assert abs(approx["k"] - 100) <= 10  # HLL tolerance
    with pytest.raises(ValueError, match="unsupported dtype"):
        profile_table(df)
    with pytest.raises(ValueError, match="unknown column"):
        profile_table(df, ["nope"])


# ---------------------------------------------------------------------
# k_anonymity / benford_audit
# ---------------------------------------------------------------------

def test_k_anonymity_counts_violations(spark):
    from otters_spark.operators.quality_checks import k_anonymity

    rows = (
        [("a", 1)] * 5          # safe cell (size 5)
        + [("a", 2)] * 2        # violating (size 2)
        + [("b", 1)] * 1        # violating (size 1)
        + [(None, 1)] * 3       # NULL quasi forms its own cell (size 3)
    )
    df = spark.createDataFrame(rows, "seg string, nat int")
    got = k_anonymity(df, ["seg", "nat"], k=3).collect()[0]
    assert got["n_rows"] == 11
    assert got["n_groups"] == 4
    assert got["min_group_size"] == 1
    assert got["n_violating_groups"] == 2
    assert got["n_at_risk_rows"] == 3
    assert got["risk_frac"] == round(3 / 11, 6)


def test_k_anonymity_k1_never_violates(spark):
    from otters_spark.operators.quality_checks import k_anonymity

    df = spark.createDataFrame([("a",), ("b",)], "seg string")
    got = k_anonymity(df, ["seg"], k=1).collect()[0]
    assert got["n_violating_groups"] == 0
    with pytest.raises(ValueError):
        k_anonymity(df, [], k=2)
    with pytest.raises(ValueError):
        k_anonymity(df, ["seg"], k=0)


def test_benford_audit_digits_and_spine(spark):
    import math

    from otters_spark.operators.quality_checks import benford_audit

    # amounts with first digits 1,1,1,2,9; zero/negative excluded;
    # digits 3-8 must still appear at count 0
    df = spark.createDataFrame(
        [(100,), (1999,), (12,), (25,), (900,), (0,), (-7,)],
        "cents long",
    )
    out = {r["digit"]: r for r in benford_audit(df, "cents").collect()}
    assert sorted(out) == list(range(1, 10))
    assert out[1]["n_obs"] == 3 and out[2]["n_obs"] == 1 and out[9]["n_obs"] == 1
    assert out[5]["n_obs"] == 0 and out[5]["obs_frac"] == 0.0
    for d in range(1, 10):
        assert out[d]["exp_frac"] == round(math.log10(1 + 1 / d), 6)
    assert out[1]["obs_frac"] == round(3 / 5, 6)
    assert out[1]["abs_dev"] == round(abs(3 / 5 - math.log10(2)), 6)
