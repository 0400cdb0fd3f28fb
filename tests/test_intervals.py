"""Interval union / coverage (operators/intervals.py): hand-checked
island semantics, pandas-verified coverage on real data, and EWMA
(operators/stats.py:ewma_smooth) against pandas ``ewm``."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from otters_spark.operators.intervals import interval_coverage, merge_intervals
from otters_spark.operators.stats import ewma_smooth


@pytest.fixture(scope="module")
def iv(spark):
    # key a: [0,10) [5,15) touch-merge [15,20) -> one island [0,20)
    #        [30,40) gap -> second island; zero-length [50,50) dropped
    # key b: nested [0,100) contains [10,20) -> one island [0,100)
    #        NULL endpoint dropped
    rows = [
        ("a", 0, 10), ("a", 5, 15), ("a", 15, 20), ("a", 30, 40),
        ("a", 50, 50),
        ("b", 0, 100), ("b", 10, 20), ("b", None, 5),
    ]
    return spark.createDataFrame(rows, "k string, s long, e long")


def test_merge_islands(iv):
    got = {
        (r["k"], r["island_start"]): (r["island_end"], r["n_intervals"])
        for r in merge_intervals(iv, ["k"], "s", "e").collect()
    }
    assert got == {
        ("a", 0): (20, 3),
        ("a", 30): (40, 1),
        ("b", 0): (100, 2),
    }


def test_coverage_counts_overlap_once(iv):
    got = {r["k"]: r for r in interval_coverage(iv, ["k"], "s", "e").collect()}
    assert got["a"]["covered"] == 30 and got["a"]["n_islands"] == 2
    assert got["a"]["n_intervals"] == 4  # zero-length row dropped
    assert got["b"]["covered"] == 100 and got["b"]["n_islands"] == 1


def test_coverage_matches_pandas_sweep(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    iv = ev.filter(F.col("value").isNotNull() & (F.col("value") > 0)).select(
        "user_id",
        F.col("event_id").alias("s"),
        (F.col("event_id") + (F.col("value") * 7).cast("long")).alias("e"),
    )
    got = {
        r["user_id"]: (r["n_islands"], r["covered"])
        for r in interval_coverage(iv, ["user_id"], "s", "e").collect()
    }
    pdf = iv.toPandas()
    for uid, grp in pdf.groupby("user_id"):
        grp = grp[grp.e > grp.s].sort_values(["s", "e"])
        islands, cov, frontier = 0, 0, None
        for s, e in zip(grp.s, grp.e):
            if frontier is None or s > frontier:
                islands += 1
                cov += e - s
                frontier = e
            elif e > frontier:
                cov += e - frontier
                frontier = e
        assert got[uid] == (islands, cov), uid


def test_overlap_join_matches_naive(spark):
    """Grid-bucketed overlap_join == the naive range-predicate join,
    on a deterministic random interval set dense enough that pairs
    span multiple shared cells (the claim rule's duplicate hazard)."""
    import random

    from otters_spark.operators.intervals import overlap_join

    rng = random.Random(42)
    rows = [
        (k, i, s, s + rng.randint(1, 400))
        for k in ("a", "b")
        for i, s in enumerate(rng.randrange(1000) for _ in range(60))
    ]
    df = spark.createDataFrame(rows, "k string, rid long, s long, e long")
    left = df.filter(F.col("rid") % 2 == 0)
    right = df.filter(F.col("rid") % 2 == 1)
    got = {
        (r["k"], r["rid_l"], r["rid_r"]): r["overlap"]
        for r in overlap_join(
            left, right, ["k"], cell=100,
            start_cols=("s", "s"), end_cols=("e", "e"),
        ).collect()
    }
    want = {}
    pdf = df.toPandas()
    lp = pdf[pdf.rid % 2 == 0]
    rp = pdf[pdf.rid % 2 == 1]
    for _, a in lp.iterrows():
        for _, b in rp.iterrows():
            if a.k == b.k and a.s < b.e and b.s < a.e:
                want[(a.k, a.rid, b.rid)] = min(a.e, b.e) - max(a.s, b.s)
    assert got == want and len(got) > 50


def test_overlap_join_touching_is_not_overlap(spark):
    from otters_spark.operators.intervals import overlap_join

    left = spark.createDataFrame([("k", 0, 10)], "k string, s long, e long")
    right = spark.createDataFrame(
        [("k", 10, 20), ("k", 9, 20), ("x", 0, 100)], "k string, s long, e long"
    )
    rows = overlap_join(
        left, right, ["k"], cell=8, start_cols=("s", "s"), end_cols=("e", "e")
    ).collect()
    # closed-open: [0,10) x [10,20) touch -> NOT a pair; [9,20) overlaps 1
    assert len(rows) == 1 and rows[0]["overlap"] == 1


def test_overlap_join_guard_raises_on_monster_interval(spark):
    from otters_spark.operators.intervals import overlap_join

    left = spark.createDataFrame([("k", 0, 10_000)], "k string, s long, e long")
    right = spark.createDataFrame([("k", 5, 6)], "k string, s long, e long")
    with pytest.raises(Exception, match="grid cells"):
        overlap_join(
            left, right, ["k"], cell=10,
            start_cols=("s", "s"), end_cols=("e", "e"),
            max_cells_per_interval=100,
        ).collect()


def test_ewma_matches_pandas(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, t long, x double"
    )
    got = [
        r["ewma"]
        for r in ewma_smooth(df, ["k"], "t", "x", alpha=0.5).orderBy("t").collect()
    ]
    want = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean().tolist()
    assert got == pytest.approx(want, abs=1e-12)


def test_ewma_multi_key_and_null_drop(spark):
    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 1, None), ("a", 2, 20.0), ("b", 0, 7.0)],
        "k string, t long, x double",
    )
    out = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma_smooth(df, ["k"], "t", "x").collect()
    }
    # NULL row dropped; a's second point blends 10 and 20 with 1/3, 2/3
    assert out[("a", 2)] == pytest.approx((10 * 0.5 + 20) / 1.5)
    assert out[("b", 0)] == 7.0
    assert ("a", 1) not in out


def test_ewma_rejects_bad_alpha_and_long_series(spark):
    df = spark.createDataFrame([("k", 0, 1.0)], "k string, t long, x double")
    with pytest.raises(ValueError, match="alpha"):
        ewma_smooth(df, ["k"], "t", "x", alpha=1.0)
    long = spark.range(0, 1200).select(
        F.lit("k").alias("k"), F.col("id").alias("t"), F.rand(7).alias("x")
    )
    with pytest.raises(Exception, match="overflows the rescaled weights"):
        ewma_smooth(long, ["k"], "t", "x", alpha=0.5).collect()


def test_interval_gaps_hand_cases(iv, spark):
    """Interior-only without bounds; head/interior/tail gaps, clipping,
    and empty-key recovery with bounds."""
    from otters_spark.operators.intervals import interval_gaps

    # no bounds: only the interior gap of key a ([20, 30)); key b has
    # one island -> no gaps
    interior = {
        (r["k"], r["gap_start"], r["gap_end"])
        for r in interval_gaps(iv, ["k"], "s", "e").collect()
    }
    assert interior == {("a", 20, 30)}

    # bounds [5, 60): a's islands clip to [5,20) and [30,40) ->
    # interior [20,30) + tail [40,60); b clips to [5,60) -> no gaps;
    # key c (all coverage outside bounds) -> full-window gap
    with_c = iv.unionByName(
        spark.createDataFrame([("c", 100, 200)], "k string, s long, e long")
    )
    got = {
        (r["k"], r["gap_start"], r["gap_end"])
        for r in interval_gaps(with_c, ["k"], "s", "e", bounds=(5, 60)).collect()
    }
    assert got == {("a", 20, 30), ("a", 40, 60), ("c", 5, 60)}

    with pytest.raises(ValueError, match="lo < hi"):
        interval_gaps(iv, ["k"], "s", "e", bounds=(10, 10))


def test_interval_gaps_partition_the_window(spark, sf_dir):
    """Gaps and clipped islands must exactly partition [lo, hi) per
    key: disjoint, non-touching would be a merge bug, and lengths sum
    to the window size minus covered."""
    from otters_spark.operators.intervals import (
        interval_coverage,
        interval_gaps,
        merge_intervals,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":  # nanos-as-long session
        ts = F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    else:  # timestamp or timestamp_ntz (session is UTC: pure cast)
        ts = F.col("ts").cast("timestamp")
    iv = ev.filter(F.col("value").isNotNull() & (F.col("value") > 0)).select(
        "event_type",
        F.unix_micros(ts).alias("s"),
        (F.unix_micros(ts) + (F.col("value") * 60000000).cast("long")).alias("e"),
    )
    lo = 1704067200000000
    hi = lo + 2 * 86400000000  # two days
    gaps = interval_gaps(iv, ["event_type"], "s", "e", bounds=(lo, hi))
    gap_total = {
        r["event_type"]: r["g"]
        for r in gaps.groupBy("event_type")
        .agg(F.sum(F.col("gap_end") - F.col("gap_start")).alias("g"))
        .collect()
    }
    # covered-within-bounds via clipped islands
    isl = merge_intervals(iv, ["event_type"], "s", "e").select(
        "event_type",
        F.greatest("island_start", F.lit(lo)).alias("i0"),
        F.least("island_end", F.lit(hi)).alias("i1"),
    ).filter(F.col("i1") > F.col("i0"))
    cov = {
        r["event_type"]: r["c"]
        for r in isl.groupBy("event_type")
        .agg(F.sum(F.col("i1") - F.col("i0")).alias("c"))
        .collect()
    }
    keys = {r["event_type"] for r in iv.select("event_type").distinct().collect()}
    for k in keys:
        assert gap_total.get(k, 0) + cov.get(k, 0) == hi - lo, k
