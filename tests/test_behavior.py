"""Behavioral analytics (operators/behavior.py): ordered-funnel
chaining semantics and cohort retention counts on crafted streams;
cross-engine parity of the suite rows is covered by
scripts/check_oracle.py."""

from datetime import datetime

import pytest

from otters_spark.operators.behavior import (
    cohort_retention,
    funnel_counts,
    funnel_stages,
)


def _ts(day, h=0, m=0):
    return datetime(2024, 1, day, h, m)


@pytest.fixture(scope="module")
def stream(spark):
    rows = [
        # user 1 completes in order
        (1, _ts(1, 1), "view"),
        (1, _ts(1, 2), "click"),
        (1, _ts(1, 3), "purchase"),
        # user 2: view only
        (2, _ts(1, 1), "view"),
        # user 3: click BEFORE the first view never counts; no purchase
        (3, _ts(1, 1), "click"),
        (3, _ts(1, 2), "view"),
        # user 4: early click ignored, later click chains, completes
        (4, _ts(2, 5), "view"),
        (4, _ts(2, 4), "click"),
        (4, _ts(2, 6), "click"),
        (4, _ts(2, 7), "purchase"),
        # user 5: purchase before click -> stage 3 not reached
        (5, _ts(3, 1), "view"),
        (5, _ts(3, 3), "click"),
        (5, _ts(3, 2), "purchase"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_stages_chaining(stream):
    rows = {r["user_id"]: r for r in funnel_stages(stream, ["view", "click", "purchase"]).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}  # everyone with a view
    assert rows[1]["t3"] == _ts(1, 3)
    assert rows[2]["t2"] is None and rows[2]["t3"] is None
    assert rows[3]["t2"] is None  # click predates the view
    assert rows[4]["t2"] == _ts(2, 6) and rows[4]["t3"] == _ts(2, 7)
    assert rows[5]["t2"] == _ts(3, 3) and rows[5]["t3"] is None


def test_funnel_counts_summary(stream):
    r = funnel_counts(stream, ["view", "click", "purchase"]).first()
    assert r["n_stage_1"] == 5
    assert r["n_stage_2"] == 3  # users 1, 4, 5
    assert r["n_stage_3"] == 2  # users 1, 4
    # user 1: 2h; user 4: 2h -> 4h in micros
    assert r["conv_micros_total"] == 4 * 3600 * 1_000_000


def test_funnel_validation(stream):
    with pytest.raises(ValueError, match="at least 2"):
        funnel_stages(stream, ["view"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_stages(stream, ["view", "view"])


def test_cohort_retention_counts(spark):
    rows = [
        # cohort 2024-01-01: users 1, 2; user 1 returns d1 and d3
        (1, _ts(1)), (1, _ts(2)), (1, _ts(4)),
        (2, _ts(1)),
        # cohort 2024-01-02: user 3 returns d7
        (3, _ts(2)), (3, _ts(9)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["cohort_day"].isoformat(): r for r in cohort_retention(df).collect()}
    assert out["2024-01-01"]["n_users"] == 2
    assert out["2024-01-01"]["n_day_1"] == 1
    assert out["2024-01-01"]["n_day_3"] == 1
    assert out["2024-01-01"]["n_day_7"] == 0
    assert out["2024-01-02"]["n_users"] == 1
    assert out["2024-01-02"]["n_day_7"] == 1
    with pytest.raises(ValueError, match="positive"):
        cohort_retention(df, horizons=(0,))


def test_transition_matrix_hand_computed(spark):
    from otters_spark.operators.behavior import transition_matrix

    rows = [
        # user 1: view -> click -> view (gaps 1h, 2h)
        (10, 1, _ts(1, 1), "view"),
        (11, 1, _ts(1, 2), "click"),
        (12, 1, _ts(1, 4), "view"),
        # user 2: view -> view (gap 30m); same-ts tie orders by id
        (20, 2, _ts(2, 1), "view"),
        (21, 2, _ts(2, 1, 30), "view"),
        # user 3: single event -> contributes no transition
        (30, 3, _ts(3), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {(r["from_type"], r["to_type"]): r
           for r in transition_matrix(df).collect()}
    assert set(out) == {("view", "click"), ("click", "view"), ("view", "view")}
    assert out[("view", "click")]["n_trans"] == 1
    assert out[("view", "view")]["n_trans"] == 1
    # from 'view' there are 2 transitions total -> probs 0.5 each
    assert out[("view", "click")]["prob"] == 0.5
    assert out[("view", "view")]["prob"] == 0.5
    assert out[("click", "view")]["prob"] == 1.0
    assert out[("view", "click")]["gap_micros_total"] == 3600 * 1_000_000
    assert out[("view", "view")]["gap_micros_total"] == 1800 * 1_000_000


def test_transition_matrix_ts_tie_breaks_on_id(spark):
    from otters_spark.operators.behavior import transition_matrix

    # two events at the SAME timestamp: order must follow event_id
    rows = [
        (2, 1, _ts(1), "b"),
        (1, 1, _ts(1), "a"),
        (3, 1, _ts(2), "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {(r["from_type"], r["to_type"]) for r in transition_matrix(df).collect()}
    assert out == {("a", "b"), ("b", "c")}


# --------------------------------------------------------------------------
# association rules (operators/association.py)
# --------------------------------------------------------------------------


def test_frequent_pairs_hand_counts(spark):
    from otters_spark.operators.association import frequent_pairs

    rows = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "y"), (3, "y"),  # dupe counts once
        (4, "z"), (4, None), (None, "x"),  # nulls dropped
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in frequent_pairs(df, "b", "i", min_pair_count=1).collect()
    }
    xy = out[("x", "y")]
    assert (xy["n_ab"], xy["n_a"], xy["n_b"]) == (3, 3, 3)
    assert xy["support"] == 3 / 4 and xy["conf_a_to_b"] == 1.0
    assert xy["lift"] == 3 * 4 / (3 * 3)
    # (x,z) and (y,z) co-occur once -> filtered at min_pair_count=2
    assert ("x", "z") in out
    got2 = frequent_pairs(df, "b", "i", min_pair_count=2).collect()
    assert {(r["item_a"], r["item_b"]) for r in got2} == {("x", "y")}


def test_frequent_pairs_bounded_per_basket(spark):
    from otters_spark.operators.association import frequent_pairs

    # one basket with 6 items emits exactly C(6,2)=15 pairs
    df = spark.createDataFrame([(1, f"i{j}") for j in range(6)], "b long, i string")
    assert frequent_pairs(df, "b", "i", min_pair_count=1).count() == 15


def test_cumulative_distinct_first_appearance(spark):
    from otters_spark.operators.behavior import cumulative_distinct

    rows = [
        (1, 1), (2, 1),          # day 1: users 1,2
        (1, 2),                  # day 2: no new users, still a bucket
        (3, 3), (1, 3), (4, 3),  # day 3: users 3,4 new
        (None, 4), (5, None),    # dropped
    ]
    df = spark.createDataFrame(rows, "u long, d long")
    got = {
        r["d"]: (r["new_entities"], r["cum_distinct"])
        for r in cumulative_distinct(df, "u", "d").collect()
    }
    assert got == {1: (2, 2), 2: (0, 2), 3: (2, 4)}


def test_rolling_active_window_claims(spark):
    from otters_spark.operators.behavior import rolling_active

    # user 1 active days 1 and 5; user 2 active day 2 only (window=3)
    rows = [(1, 1), (1, 5), (2, 2), (2, 2)]
    df = spark.createDataFrame(rows, "u long, d long")
    got = {
        r["d"]: (r["active_now"], r["active_window"])
        for r in rolling_active(df, "u", "d", window=3).collect()
    }
    # day1: u1 now; trailing {u1}. day2: u2 now; trailing {u1,u2}.
    # day5: u1 now; trailing {u1} (u2's day-2 claim ends day 4).
    assert got == {1: (1, 1), 2: (1, 2), 5: (1, 1)}


def test_rolling_active_matches_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from otters_spark.operators.behavior import rolling_active

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
    )
    got = {
        r["d"]: r["active_window"]
        for r in rolling_active(ev, "user_id", "d", window=7).collect()
    }
    pdf = ev.distinct().toPandas()
    days = sorted(pdf.d.unique())
    for d in days:
        want = pdf[(pdf.d <= d) & (pdf.d > d - 7)].user_id.nunique()
        assert got[d] == want, d
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window"):
        rolling_active(ev, "user_id", "d", window=0)


def test_multitouch_attribution_models_vs_hand_walk(spark):
    """All five credit models against a hand-computed journey: user 1
    has touches at t=10, 20, 30 (view, click, view) converting at
    t=35; user 2 has one touch; a touch OUTSIDE the lookback and a
    touch AFTER the conversion must not receive credit."""
    from datetime import datetime, timedelta

    from otters_spark.operators.behavior import multitouch_attribution

    t0 = datetime(2024, 1, 1)

    def ev(eid, uid, etype, sec):
        return (eid, uid, etype, t0 + timedelta(seconds=sec))

    rows = [
        ev(1, 1, "view", 10),
        ev(2, 1, "click", 20),
        ev(3, 1, "view", 30),
        ev(4, 1, "purchase", 35),
        ev(5, 1, "view", 36),        # after conversion: no credit
        ev(6, 2, "click", 100),
        ev(7, 2, "purchase", 101),
        ev(8, 3, "view", 0),
        ev(9, 3, "purchase", 1000),  # touch outside 60s lookback
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    lookback = 60 * 1_000_000
    half = 10 * 1_000_000

    def run(model):
        return {
            r["channel"]: (r["touches"], r["conversions"], r["credit_micro"])
            for r in multitouch_attribution(
                events,
                "purchase",
                ["view", "click"],
                lookback_micros=lookback,
                model=model,
                half_life_micros=half,
            ).collect()
        }

    lin = run("linear")
    # user1: 3 touches get 333333 each; user2: click gets 1000000
    assert lin["view"] == (2, 1, 2 * 333_333)
    assert lin["click"] == (2, 2, 333_333 + 1_000_000)

    first = run("first_touch")
    assert first["view"][2] == 1_000_000  # t=10 view
    assert first["click"][2] == 1_000_000  # user2's only touch

    last = run("last_touch")
    assert last["view"][2] == 1_000_000  # t=30 view
    assert last["click"][2] == 1_000_000

    dec = run("time_decay")
    # ages: 25s, 15s, 5s; w = round(1e6 * 10/(10+age_s))
    w = [round(1e6 * 10 / (10 + a)) for a in (25, 15, 5)]
    s = sum(w)
    exp_view = w[0] * 1_000_000 // s + w[2] * 1_000_000 // s
    exp_click = w[1] * 1_000_000 // s + 1_000_000
    assert dec["view"][2] == exp_view
    assert dec["click"][2] == exp_click

    pos = run("position")
    # U-shape: first 400k, last 400k, middle 200k; user2 single 1e6
    assert pos["view"][2] == 800_000
    assert pos["click"][2] == 200_000 + 1_000_000


def test_multitouch_attribution_rejects_bad_params(spark):
    from otters_spark.operators.behavior import multitouch_attribution

    df = spark.createDataFrame(
        [], "event_id long, user_id long, event_type string, ts timestamp"
    )
    with pytest.raises(ValueError, match="unknown attribution model"):
        multitouch_attribution(df, "p", ["v"], 10, model="quadratic")
    with pytest.raises(ValueError, match="half_life"):
        multitouch_attribution(df, "p", ["v"], 10, model="time_decay")
    with pytest.raises(ValueError, match="lookback"):
        multitouch_attribution(df, "p", ["v"], 0, model="linear")


def test_cohort_ltv_matches_hand_computation(spark):
    from otters_spark.operators.behavior import cohort_ltv

    rows = [
        # user 1: first day 2024-01-01, buys 1.5 on day 0, 2.0 on day 2
        (1, "2024-01-01 10:00:00", 1.5),
        (1, "2024-01-03 09:00:00", 2.0),
        # user 2: same cohort, 0.5 on day 0; beyond horizon on day 9
        (2, "2024-01-01 12:00:00", 0.5),
        (2, "2024-01-10 12:00:00", 99.0),
        # user 3: later cohort 2024-01-02, 4.25 on day 1
        (3, "2024-01-02 08:00:00", 0.0),
        (3, "2024-01-03 08:00:00", 4.25),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double")
    df = df.withColumn("ts", df["ts"].cast("timestamp"))
    got = {
        (r["cohort_day"], r["age"]): (
            r["rev_micros"], r["cum_micros"], r["n_active_users"]
        )
        for r in cohort_ltv(df, max_age_days=7).collect()
    }
    assert got[("2024-01-01", 0)] == (2_000_000, 2_000_000, 2)
    # day-1 gap for cohort 01-01: no row, cumulative carries to age 2
    assert ("2024-01-01", 1) not in got
    assert got[("2024-01-01", 2)] == (2_000_000, 4_000_000, 1)
    assert got[("2024-01-02", 0)] == (0, 0, 1)
    assert got[("2024-01-02", 1)] == (4_250_000, 4_250_000, 1)
    # the day-9 purchase fell outside the horizon
    assert all(age <= 7 for _, age in got)


def test_item_neighbors_cosine_and_rank(spark):
    from otters_spark.operators.association import item_neighbors

    # baskets: {1,2,3} x2, {1,2} x1, {2,3} x1, {4} alone
    baskets = [
        ("b1", 1), ("b1", 2), ("b1", 3),
        ("b2", 1), ("b2", 2), ("b2", 3),
        ("b3", 1), ("b3", 2),
        ("b4", 2), ("b4", 3),
        ("b5", 4),
    ]
    df = spark.createDataFrame(baskets, "basket string, item long")
    got = {
        (r["item"], r["rank"]): (r["neighbor"], r["n_ab"], r["cosine"])
        for r in item_neighbors(df, "basket", "item", k=2).collect()
    }
    # margins: n1=3, n2=4, n3=3; pairs: (1,2)=3, (1,3)=2, (2,3)=3
    import math

    assert got[(1, 1)] == (2, 3, round(3 / math.sqrt(3 * 4), 6))
    assert got[(1, 2)] == (3, 2, round(2 / math.sqrt(3 * 3), 6))
    assert got[(2, 1)][0] in (1, 3)  # cosine ties broken by neighbor id
    c21 = 3 / math.sqrt(4 * 3)
    assert got[(2, 1)] == (1, 3, round(c21, 6))
    # item 4 never co-occurs -> absent entirely
    assert not any(i == 4 for i, _ in got)
    with pytest.raises(ValueError):
        item_neighbors(df, "basket", "item", k=0)


def test_transition_matrix_gap_sum_wrap_is_loud_not_silent(spark):
    """Per-pair gap sums accumulate in decimal (round-6 hardening).
    Gaps are non-negative, so a long sum only wraps when the TRUE
    total passes 2^63 — and before the fix that produced a silently
    NEGATIVE gap_micros_total. With decimal accumulation the exact
    total survives aggregation and the final long cast fails LOUDLY
    when the value genuinely doesn't fit an int64 output. In-range
    totals stay exact."""
    from datetime import datetime

    from otters_spark.operators.behavior import transition_matrix

    t0 = datetime(2000, 1, 1)
    t1 = datetime(2260, 1, 1)
    gap = int((t1 - t0).total_seconds() * 1_000_000)

    def mk(n_users):
        rows = []
        for u in range(n_users):
            rows.append((u, t0, "a", 2 * u))
            rows.append((u, t1, "b", 2 * u + 1))
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string, event_id long"
        )

    # in-range: exact integer total
    n_ok = 1100
    assert n_ok * gap < 2**63
    got = {
        (r["from_type"], r["to_type"]): r["gap_micros_total"]
        for r in transition_matrix(mk(n_ok)).collect()
    }
    assert got[("a", "b")] == n_ok * gap

    # out-of-range: loud overflow, never a silent negative
    n_bad = 1200
    assert n_bad * gap > 2**63
    with pytest.raises(Exception) as ei:
        transition_matrix(mk(n_bad)).collect()
    assert "overflow" in str(ei.value).lower() or "cast" in str(ei.value).lower()
