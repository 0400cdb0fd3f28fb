"""Store maintenance merges (sources/merge.py): last-writer-wins
upsert and SCD2 versioning semantics on crafted dimensions."""

from datetime import date

import pytest
from pyspark.sql import functions as F

from otters_spark.sources import merge_upsert, scd2_merge


def test_merge_upsert_semantics(spark):
    cur = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    upd = spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string")
    out = {r["k"]: r["v"] for r in merge_upsert(cur, upd, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "d"}
    with pytest.raises(ValueError, match="schemas differ"):
        merge_upsert(cur, upd.withColumnRenamed("v", "w"), ["k"])
    with pytest.raises(ValueError, match="non-empty"):
        merge_upsert(cur, upd, [])


@pytest.fixture()
def dim(spark):
    rows = [
        # key, seg, valid_from, valid_to (None = current)
        (1, "gold", date(2024, 1, 1), None),
        (2, "silver", date(2024, 1, 1), None),
        (3, "bronze", date(2024, 1, 1), None),
        (5, None, date(2024, 1, 1), None),          # NULL attr current
        (1, "old", date(2023, 1, 1), date(2024, 1, 1)),  # history row
    ]
    return spark.createDataFrame(
        rows, "k long, seg string, valid_from date, valid_to date"
    )


def test_scd2_merge_versions(spark, dim):
    upd = spark.createDataFrame(
        [
            (1, "platinum"),  # changed -> close + open
            (2, "silver"),    # unchanged -> no-op
            (4, "new"),       # new key -> open
            (5, "filled"),    # NULL -> value is a change
        ],
        "k long, seg string",
    )
    out = scd2_merge(dim, upd, ["k"], ["seg"], date(2024, 6, 1))
    rows = sorted(
        [tuple(r) for r in out.collect()],
        key=lambda t: (t[0], str(t[2])),
    )
    assert rows == [
        (1, "old", date(2023, 1, 1), date(2024, 1, 1)),       # history untouched
        (1, "gold", date(2024, 1, 1), date(2024, 6, 1)),      # closed
        (1, "platinum", date(2024, 6, 1), None),              # opened
        (2, "silver", date(2024, 1, 1), None),                # unchanged
        (3, "bronze", date(2024, 1, 1), None),                # not in batch
        (4, "new", date(2024, 6, 1), None),                   # new key
        (5, None, date(2024, 1, 1), date(2024, 6, 1)),        # NULL->value closed
        (5, "filled", date(2024, 6, 1), None),
    ]


def test_scd2_merge_idempotent_on_reapply(spark, dim):
    upd = spark.createDataFrame([(1, "platinum")], "k long, seg string")
    once = scd2_merge(dim, upd, ["k"], ["seg"], date(2024, 6, 1))
    twice = scd2_merge(once, upd, ["k"], ["seg"], date(2024, 7, 1))
    # the second apply sees key 1 already at 'platinum': no new version
    assert once.count() == twice.count()
    assert twice.exceptAll(once).count() == 0


def test_scd2_merge_validation(spark, dim):
    upd = spark.createDataFrame([(1, "x")], "k long, seg string")
    with pytest.raises(ValueError, match="non-empty"):
        scd2_merge(dim, upd, [], ["seg"], date(2024, 6, 1))
    with pytest.raises(ValueError, match="overlap"):
        scd2_merge(dim, upd, ["k"], ["k"], date(2024, 6, 1))


def test_scd2_as_of_time_travel(spark, dim):
    from otters_spark.sources.merge import scd2_as_of

    upd = spark.createDataFrame([(1, "platinum")], "k long, seg string")
    merged = scd2_merge(dim, upd, ["k"], ["seg"], date(2024, 6, 1))
    before = {r["k"]: r["seg"] for r in scd2_as_of(merged, date(2024, 3, 1)).collect()}
    after = {r["k"]: r["seg"] for r in scd2_as_of(merged, date(2024, 6, 1)).collect()}
    ancient = {r["k"]: r["seg"] for r in scd2_as_of(merged, date(2023, 6, 1)).collect()}
    assert before[1] == "gold" and after[1] == "platinum"
    assert ancient == {1: "old"}  # only the 2023 version existed then
    assert before[2] == "silver" and after[2] == "silver"
    # exactly one version visible per key at any date
    assert len(scd2_as_of(merged, date(2024, 6, 1)).groupBy("k").count()
               .filter("count > 1").collect()) == 0


def test_event_time_lookup_half_open_boundary(spark, dim):
    """The suite's events_scd2_lookup join predicate pinned on crafted
    rows: an event exactly AT the change-date midnight attributes to
    the NEW version (half-open [valid_from, valid_to)), a microsecond
    earlier to the old one."""
    from datetime import datetime

    upd = spark.createDataFrame([(1, "platinum")], "k long, seg string")
    merged = scd2_merge(dim, upd, ["k"], ["seg"], date(2024, 6, 1))
    d = merged.select(
        "k",
        "seg",
        F.col("valid_from").cast("timestamp").alias("vf_ts"),
        F.col("valid_to").cast("timestamp").alias("vt_ts"),
    )
    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 6, 1, 0, 0, 0)),          # at the boundary
            (1, datetime(2024, 5, 31, 23, 59, 59, 999999)),  # just before
            (2, datetime(2024, 5, 31, 23, 59, 59, 999999)),  # unchanged key
        ],
        "user_id long, ts timestamp",
    ).withColumnRenamed("user_id", "u")
    rows = ev.join(
        d,
        (F.col("u") == F.col("k"))
        & (F.col("ts") >= F.col("vf_ts"))
        & (F.col("vt_ts").isNull() | (F.col("ts") < F.col("vt_ts"))),
    ).collect()
    # row count first: a dict would silently swallow an event that
    # matched two overlapping versions
    assert len(rows) == 3
    got = {(r["u"], r["ts"].microsecond): r["seg"] for r in rows}
    assert got[(1, 0)] == "platinum"  # boundary event sees the new version
    assert got[(1, 999999)] == "gold"  # a microsecond earlier: the old one
    assert got[(2, 999999)] == "silver"
    # every event resolved to exactly one version
    assert len(got) == 3


def test_snapshot_diff_change_types(spark):
    from otters_spark.sources.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (None, "nk", 1.0)],
        "id long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged
         (2, "b", 25.0),        # changed value
         (4, "d", 40.0),        # added
         (3, "c", 30.0),        # NULL -> value IS a change
         (None, "nk", 1.0)],    # NULL key present both sides, unchanged
        "id long, name string, v double",
    )
    got = {r["id"]: r["change_type"] for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "changed",
                   4: "added", None: "unchanged"}
    # removed side
    got2 = {r["id"]: r["change_type"]
            for r in snapshot_diff(new, old, ["id"]).collect()}
    assert got2[4] == "removed"


def test_snapshot_diff_validation_and_subset_compare(spark):
    import pytest as _pytest

    from otters_spark.sources.merge import snapshot_diff

    old = spark.createDataFrame([(1, "a", 1.0)], "id long, name string, v double")
    new = spark.createDataFrame([(1, "a", 9.0)], "id long, name string, v double")
    # compare only `name` -> the v change is invisible
    r = snapshot_diff(old, new, ["id"], compare_cols=["name"]).collect()[0]
    assert r["change_type"] == "unchanged"
    with _pytest.raises(ValueError):
        snapshot_diff(old, new, [])
    with _pytest.raises(ValueError):
        snapshot_diff(old, new, ["id"], compare_cols=["nope"])


# --------------------------------------------------------------------------
# change feed + incremental aggregate maintenance
# --------------------------------------------------------------------------


def test_change_feed_signs(spark):
    from otters_spark.sources.merge import change_feed

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "k long, g string, x long"
    )
    new = spark.createDataFrame(
        [(2, "a", 25), (3, "b", 30), (4, "c", 40)], "k long, g string, x long"
    )
    rows = {
        (r["k"], r["__sign"]): (r["g"], r["x"])
        for r in change_feed(old, new, ["k"], ["g", "x"]).collect()
    }
    # 1 removed (-1 old values), 2 changed (-1 old / +1 new), 4 added
    assert rows == {
        (1, -1): ("a", 10),
        (2, -1): ("a", 20),
        (2, 1): ("a", 25),
        (4, 1): ("c", 40),
    }


def test_apply_agg_delta_equals_rebuild(spark, sf_dir):
    from pyspark.sql import functions as F

    from otters_spark.sources.merge import apply_agg_delta, change_feed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    v1 = orders.filter(F.col("k") % 7 != 2)
    v2 = orders.filter(F.col("k") % 5 != 1).withColumn(
        "x", F.when(F.col("k") % 3 == 0, F.col("x") + 1).otherwise(F.col("x"))
    )
    agg1 = v1.groupBy("g").agg(F.sum("x").alias("x"), F.count(F.lit(1)).alias("n"))
    feed = change_feed(v1, v2, ["k"], ["g", "x"])
    got = {
        r["g"]: (r["x"], r["n"])
        for r in apply_agg_delta(agg1, feed, ["g"], ["x"]).collect()
    }
    want = {
        r["g"]: (r["x"], r["n"])
        for r in v2.groupBy("g")
        .agg(F.sum("x").alias("x"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_apply_agg_delta_creates_and_drops_groups(spark):
    from otters_spark.sources.merge import apply_agg_delta

    old_agg = spark.createDataFrame([("a", 30, 2)], "g string, x long, n long")
    # feed: both 'a' rows deleted, new group 'b' inserted
    feed = spark.createDataFrame(
        [("a", 10, -1), ("a", 20, -1), ("b", 5, 1)],
        "g string, x long, __sign int",
    )
    got = {(r["g"]): (r["x"], r["n"]) for r in
           apply_agg_delta(old_agg, feed, ["g"], ["x"]).collect()}
    assert got == {"b": (5, 1)}


def test_change_feed_validates_columns(spark):
    import pytest as _pytest

    from otters_spark.sources.merge import change_feed

    old = spark.createDataFrame([(1, 10)], "k long, x long")
    new = spark.createDataFrame([(1, 10)], "k long, x long")
    with _pytest.raises(ValueError, match="absent"):
        change_feed(old, new, ["k"], ["prce"])
    with _pytest.raises(ValueError, match="non-empty"):
        change_feed(old, new, [], ["x"])


# ---------------------------------------------------------------------
# join_change_feed: maintained aggregate over a join == rebuilt
# ---------------------------------------------------------------------

def test_join_change_feed_maintains_join_aggregate(spark):
    from otters_spark.sources.merge import (
        apply_agg_delta,
        change_feed,
        join_change_feed,
    )

    # R = orders (keyed by ok, join col ck), S = customers (keyed ck)
    r1 = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 200), (3, 20, 300), (4, 30, 400),
         (5, 20, 500)],
        "ok long, ck long, cents long",
    )
    # v2: order 2 deleted, 6 added, 5 re-priced, 4 moved to customer 10
    r2 = spark.createDataFrame(
        [(1, 10, 100), (3, 20, 300), (4, 10, 400), (5, 20, 999),
         (6, 30, 600)],
        "ok long, ck long, cents long",
    )
    s1 = spark.createDataFrame(
        [(10, "A"), (20, "B"), (30, "C")], "ck long, seg string"
    )
    # v2: customer 20 moves segment B->A, 40 appears (no orders yet),
    # 30 deleted WITH its order 6 still arriving -> dangling s-side key
    s2 = spark.createDataFrame(
        [(10, "A"), (20, "A"), (40, "D")], "ck long, seg string"
    )

    def rebuilt(r, s):
        return (
            r.join(s, "ck")
            .groupBy("seg")
            .agg(F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n"))
        )

    agg1 = rebuilt(r1, s1)
    feed = join_change_feed(
        change_feed(r1, r2, ["ok"], ["ck", "cents"]),
        change_feed(s1, s2, ["ck"], ["seg"]),
        r_old=r1,
        s_new=s2,
        on=["ck"],
    )
    maintained = {
        (r["seg"]): (r["cents"], r["n"])
        for r in apply_agg_delta(agg1, feed, ["seg"], ["cents"]).collect()
    }
    want = {
        (r["seg"]): (r["cents"], r["n"]) for r in rebuilt(r2, s2).collect()
    }
    assert maintained == want


def test_join_change_feed_rejects_column_clash(spark):
    from otters_spark.sources.merge import change_feed, join_change_feed

    r = spark.createDataFrame([(1, 10, 5)], "ok long, ck long, x long")
    s = spark.createDataFrame([(10, 7)], "ck long, x long")
    with pytest.raises(ValueError, match="collide"):
        join_change_feed(
            change_feed(r, r, ["ok"], ["ck", "x"]),
            change_feed(s, s, ["ck"], ["x"]),
            r_old=r,
            s_new=s,
            on=["ck"],
        )


def test_join_change_feed_rejects_empty_keys(spark):
    from otters_spark.sources.merge import change_feed, join_change_feed

    r = spark.createDataFrame([(1, 10)], "ok long, ck long")
    with pytest.raises(ValueError, match="non-empty"):
        join_change_feed(
            change_feed(r, r, ["ok"], ["ck"]),
            change_feed(r, r, ["ok"], ["ck"]),
            r_old=r,
            s_new=r,
            on=[],
        )


def test_merge_upsert_null_key_is_a_key(spark):
    """A NULL key is a key (the snapshot_diff discipline): the update
    REPLACES the current NULL-key row instead of duplicating it."""
    cur = spark.createDataFrame([(None, "a"), (1, "b")], "k long, v string")
    upd = spark.createDataFrame([(None, "A")], "k long, v string")
    out = {r["k"]: r["v"] for r in merge_upsert(cur, upd, ["k"]).collect()}
    assert out == {None: "A", 1: "b"}


def test_scd2_merge_null_key_rows_survive(spark):
    """Regression: the ==-join + key-nullness presence test made a
    NULL-key current row invisible to its own join row — the generator
    emitted nothing and the row silently vanished; a NULL-key update
    was never inserted. Null-safe keys + presence markers fix both."""
    d = spark.createDataFrame(
        [(None, "gold", date(2024, 1, 1), None),
         (1, "silver", date(2024, 1, 1), None)],
        "k long, seg string, valid_from date, valid_to date",
    )
    # 1) no update touching the NULL key: the row must pass through
    upd = spark.createDataFrame([(1, "silver")], "k long, seg string")
    out = scd2_merge(d, upd, ["k"], ["seg"], date(2024, 6, 1))
    rows = {(r["k"], r["seg"], r["valid_to"]) for r in out.collect()}
    assert (None, "gold", None) in rows
    assert (1, "silver", None) in rows
    # 2) an update ON the NULL key: close + open like any other key
    upd2 = spark.createDataFrame([(None, "plat")], "k long, seg string")
    out2 = scd2_merge(d, upd2, ["k"], ["seg"], date(2024, 6, 1))
    rows2 = {(r["k"], r["seg"], r["valid_to"]) for r in out2.collect()}
    assert (None, "gold", date(2024, 6, 1)) in rows2   # closed
    assert (None, "plat", None) in rows2               # opened
    assert (1, "silver", None) in rows2                # untouched
    # 3) a brand-new NULL key inserts a first version
    d2 = spark.createDataFrame(
        [(1, "silver", date(2024, 1, 1), None)],
        "k long, seg string, valid_from date, valid_to date",
    )
    out3 = scd2_merge(d2, upd2, ["k"], ["seg"], date(2024, 6, 1))
    rows3 = {(r["k"], r["seg"], r["valid_to"]) for r in out3.collect()}
    assert (None, "plat", None) in rows3
