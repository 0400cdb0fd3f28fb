"""As-of join semantics on crafted data: nearest prior match,
simultaneous-row visibility, no-match NULLs, key isolation."""

import datetime as dt

import pytest

from otters_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    T = dt.datetime
    left = spark.createDataFrame(
        [
            (1, 100, T(2024, 1, 1, 10, 0, 0)),
            (2, 100, T(2024, 1, 1, 12, 0, 0)),
            (3, 100, T(2024, 1, 1, 9, 0, 0)),   # before any right row
            (4, 200, T(2024, 1, 1, 11, 0, 0)),  # other key
            (5, 300, T(2024, 1, 1, 11, 0, 0)),  # key with no right rows
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, T(2024, 1, 1, 9, 30, 0), "a"),
            (100, T(2024, 1, 1, 10, 0, 0), "b"),   # simultaneous with left #1
            (100, T(2024, 1, 1, 11, 30, 0), "c"),
            (200, T(2024, 1, 1, 10, 59, 0), "d"),
        ],
        ["user_id", "ts", "tag"],
    )
    return left, right


def test_asof_semantics(sides):
    left, right = sides
    out = {
        r["event_id"]: (r["tag_asof"], r["ts_asof"])
        for r in asof_join(left, right, on=["user_id"], right_cols=["tag"]).collect()
    }
    # simultaneous right row IS visible (>= semantics)
    assert out[1][0] == "b"
    # nearest prior among several
    assert out[2][0] == "c"
    # left row before any right row -> NULLs
    assert out[3] == (None, None)
    # keys don't leak
    assert out[4][0] == "d"
    assert out[5] == (None, None)


def test_asof_preserves_left_rowcount(sides):
    left, right = sides
    assert asof_join(left, right, on=["user_id"], right_cols=["tag"]).count() == left.count()


def test_asof_null_payload_not_backfilled(spark):
    # the matched right row carries its OWN NULLs; an older right row's
    # value must never be stitched in (ADVICE r1: per-column
    # last(ignorenulls) back-filled NULL payload fields)
    T = dt.datetime
    left = spark.createDataFrame(
        [(1, 100, T(2024, 1, 1, 12, 0, 0))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            (100, T(2024, 1, 1, 10, 0, 0), "old", 7),
            (100, T(2024, 1, 1, 11, 0, 0), None, None),  # matched row
        ],
        "user_id long, ts timestamp, tag string, weight long",
    )
    out = asof_join(left, right, on=["user_id"], right_cols=["tag", "weight"]).collect()
    assert len(out) == 1
    row = out[0]
    assert row["ts_asof"] == T(2024, 1, 1, 11, 0, 0)
    assert row["tag_asof"] is None and row["weight_asof"] is None


def test_asof_tolerance(spark):
    from pyspark.sql import functions as F

    from otters_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "k"), (2, 205, "k"), (3, 300, "k")], ["id", "ts", "key"]
    )
    right = spark.createDataFrame(
        [(100, "k", "a"), (200, "k", "b")], ["ts", "key", "val"]
    )
    out = {
        r["id"]: (r["val_asof"], r["ts_asof"])
        for r in asof_join(
            left, right, on=["key"], ts_col="ts", tolerance=10
        ).collect()
    }
    assert out[1] == ("a", 100)      # exact match, gap 0
    assert out[2] == ("b", 200)      # gap 5 <= 10
    assert out[3] == (None, None)    # gap 100 > 10 -> whole payload null
    del F


def test_asof_forward(spark):
    from otters_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "k"), (2, 150, "k"), (3, 300, "k")], ["id", "ts", "key"]
    )
    right = spark.createDataFrame(
        [(100, "k", "a"), (200, "k", "b")], ["ts", "key", "val"]
    )
    out = {
        r["id"]: (r["val_asof"], r["ts_asof"])
        for r in asof_join(
            left, right, on=["key"], ts_col="ts", direction="forward"
        ).collect()
    }
    assert out[1] == ("a", 100)      # simultaneous row matches forward too
    assert out[2] == ("b", 200)      # next following
    assert out[3] == (None, None)    # nothing after 300

    # forward + tolerance
    out2 = {
        r["id"]: r["val_asof"]
        for r in asof_join(
            left, right, on=["key"], ts_col="ts", direction="forward",
            tolerance=20,
        ).collect()
    }
    assert out2 == {1: "a", 2: None, 3: None}  # gap 50 > 20 for id 2


def test_asof_bad_direction(spark):
    import pytest

    from otters_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1, 1, "k")], ["id", "ts", "key"])
    with pytest.raises(ValueError):
        asof_join(df, df, on=["key"], direction="sideways").collect()


def test_gap_fill_zero_and_locf(spark):
    from pyspark.sql import functions as F

    from otters_spark.operators.asof import gap_fill

    rows = [
        ("a", 0, 2, 10.0),
        ("a", 30, 1, 7.5),   # gap at 10, 20
        ("b", 10, 4, 1.0),   # single bucket: no densify needed
    ]
    df = spark.createDataFrame(rows, ["g", "bucket", "n", "s"])
    got = {
        (r["g"], r["bucket"]): (r["n"], r["s"])
        for r in gap_fill(
            df, "bucket", 10, group_cols=["g"], zero_fill=["n"], locf=["s"]
        ).collect()
    }
    assert got == {
        ("a", 0): (2, 10.0),
        ("a", 10): (0, 10.0),   # count zero-filled, sum carried
        ("a", 20): (0, 10.0),
        ("a", 30): (1, 7.5),
        ("b", 10): (4, 1.0),
    }


def test_gap_fill_null_group_key(spark):
    from otters_spark.operators.asof import gap_fill

    # a NULL-keyed group's OBSERVED buckets must come back intact — a
    # plain equality join leaves them unmatched, zero-filling counts
    # and NULL-ing LOCF measures for data that exists
    rows = [
        (None, 0, 4, 1.0),
        (None, 20, 1, 9.0),  # gap at 10
        ("a", 0, 2, 5.0),
    ]
    df = spark.createDataFrame(rows, ["g", "bucket", "n", "s"])
    got = {
        (r["g"], r["bucket"]): (r["n"], r["s"])
        for r in gap_fill(
            df, "bucket", 10, group_cols=["g"], zero_fill=["n"], locf=["s"]
        ).collect()
    }
    assert got == {
        (None, 0): (4, 1.0),
        (None, 10): (0, 1.0),
        (None, 20): (1, 9.0),
        ("a", 0): (2, 5.0),
    }


def test_asof_nearest_direction(spark):
    from pyspark.sql import Row, functions as F
    from otters_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [Row(k=1, ts=10, lid=1), Row(k=1, ts=100, lid=2), Row(k=2, ts=5, lid=3)],
        "k long, ts long, lid long",
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=7, v="b"), Row(k=1, ts=12, v="f"), Row(k=1, ts=99, v="n")],
        "k long, ts long, v string",
    )
    out = {
        r.lid: (r.v_asof, r.ts_asof)
        for r in asof_join(left, right, on=["k"], direction="nearest").collect()
    }
    # lid=1 at ts=10: backward 7 (gap 3) vs forward 12 (gap 2) -> forward
    assert out[1] == ("f", 12)
    # lid=2 at ts=100: backward 99 (gap 1) wins
    assert out[2] == ("n", 99)
    # k=2 has no right rows at all -> NULL payload
    assert out[3] == (None, None)

    # exact tie goes to the backward match (pandas semantics)
    tie_r = spark.createDataFrame(
        [Row(k=1, ts=8, v="before"), Row(k=1, ts=12, v="after")],
        "k long, ts long, v string",
    )
    tied = asof_join(
        left.filter(F.col("lid") == 1), tie_r, on=["k"], direction="nearest"
    ).collect()[0]
    assert (tied.v_asof, tied.ts_asof) == ("before", 8)

    # tolerance bounds |gap| on the chosen side
    tol = asof_join(
        left.filter(F.col("lid") == 1), right, on=["k"],
        direction="nearest", tolerance=1,
    ).collect()[0]
    assert tol.v_asof is None and tol.ts_asof is None

    with pytest.raises(ValueError):
        asof_join(left, right, on=["k"], direction="sideways")
