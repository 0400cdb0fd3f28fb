"""Streaming HLL sketches: the streamed register table must equal the
batch register table row-for-row (batch-as-oracle), estimates must
agree with the batch sketch path, and cross-window rollup via
hll_merge must equal the sketch of the union."""

from pyspark.sql import functions as F

from otters_spark.operators.sketches import hll_estimate, hll_merge
from otters_spark.streaming.sketch import (
    run_windowed_distinct_stream,
    windowed_distinct_counts,
    windowed_distinct_registers,
)
from otters_spark.suite import load_events


def _sorted(df):
    cols = df.columns
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_streamed_registers_match_batch(spark, sf_dir):
    batch = windowed_distinct_registers(load_events(spark, sf_dir), window="1 hour")
    streamed = run_windowed_distinct_stream(
        spark, sf_dir, window="1 hour", query_name="t_sketch"
    )
    assert _sorted(streamed) == _sorted(batch)
    assert len(_sorted(batch)) > 0


def test_estimates_track_exact_distinct(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    regs = windowed_distinct_registers(ev, window="6 hours")
    est = {
        (r["bucket_start"], r["event_type"]): r["est_distinct"]
        for r in windowed_distinct_counts(regs).collect()
    }
    from otters_spark.streaming.events import _with_ts

    exact = {
        (r["bucket_start"], r["event_type"]): r["n"]
        for r in _with_ts(ev)
        .groupBy(
            F.unix_timestamp(F.window("ts", "6 hours").start)
            .cast("long")
            .alias("bucket_start"),
            "event_type",
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        # linear-counting regime at these cardinalities: tight
        assert abs(est[k] - n) / max(n, 1) < 0.15, (k, est[k], n)


def test_cross_window_rollup_equals_union_sketch(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    windowed = windowed_distinct_registers(ev, window="1 hour").drop("bucket_start")
    rolled = hll_merge(windowed, ["event_type"])
    from otters_spark.operators.sketches import hll_registers

    direct = hll_registers(ev, "user_id", ["event_type"], p=8)
    assert rolled.exceptAll(direct).count() == 0
    assert direct.exceptAll(rolled).count() == 0
    # and the rolled-up estimate is usable as-is
    est = hll_estimate(rolled, ["event_type"], p=8).collect()
    assert all(r["est_distinct"] > 0 for r in est)


# ------------------------------------------------------- CMS streaming


def test_streamed_cms_cells_match_batch(spark, sf_dir):
    from otters_spark.streaming.sketch import (
        run_windowed_frequency_stream,
        windowed_frequency_cells,
    )

    batch = windowed_frequency_cells(
        load_events(spark, sf_dir), window="1 hour", depth=3, width=256
    )
    streamed = run_windowed_frequency_stream(
        spark, sf_dir, window="1 hour", depth=3, width=256, query_name="t_cms"
    )
    assert _sorted(streamed) == _sorted(batch)
    assert len(_sorted(batch)) > 0


def test_cms_cross_window_rollup_equals_union_sketch(spark, sf_dir):
    from otters_spark.operators.sketches import cms_merge, cms_table
    from otters_spark.streaming.sketch import windowed_frequency_cells

    ev = load_events(spark, sf_dir)
    windowed = windowed_frequency_cells(ev, window="1 hour", depth=3, width=256)
    rolled = cms_merge(windowed.drop("bucket_start"), ["event_type"])
    direct = cms_table(ev, "user_id", ["event_type"], depth=3, width=256)
    assert rolled.exceptAll(direct).count() == 0
    assert direct.exceptAll(rolled).count() == 0


def test_cms_probe_never_undercounts_per_window(spark, sf_dir):
    from otters_spark.operators.sketches import cms_lookup
    from otters_spark.streaming.events import _with_ts
    from otters_spark.streaming.sketch import windowed_frequency_cells

    ev = load_events(spark, sf_dir)
    cells = windowed_frequency_cells(ev, window="6 hours", depth=3, width=256)
    win = (
        _with_ts(ev)
        .select(
            F.unix_timestamp(F.window("ts", "6 hours").start)
            .cast("long")
            .alias("bucket_start"),
            "event_type",
            "user_id",
        )
    )
    exact = win.groupBy("bucket_start", "event_type", "user_id").agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    est = cms_lookup(
        cells,
        exact,
        "user_id",
        ["bucket_start", "event_type"],
        depth=3,
        width=256,
    )
    bad = est.filter(F.col("est_n") < F.col("exact_n")).count()
    assert bad == 0  # one-sided error, per window and group


def test_streamed_histogram_cells_match_batch(spark, sf_dir):
    from otters_spark.streaming.sketch import (
        run_windowed_histogram_stream,
        windowed_value_histogram,
    )

    batch = windowed_value_histogram(
        load_events(spark, sf_dir), "value", window="6 hours",
        lo=0.0, hi=500.0, bins=64,
    )
    streamed = run_windowed_histogram_stream(
        spark, sf_dir, "value", window="6 hours",
        lo=0.0, hi=500.0, bins=64, query_name="t_vhist",
    )
    assert _sorted(streamed) == _sorted(batch)
    assert len(_sorted(batch)) > 0


def test_windowed_quantiles_track_exact_median(spark, sf_dir):
    from otters_spark.operators.sketches import hist_quantiles
    from otters_spark.streaming.events import _with_ts
    from otters_spark.streaming.sketch import windowed_value_histogram

    cells = windowed_value_histogram(
        load_events(spark, sf_dir), "value", window="7 days",
        lo=0.0, hi=500.0, bins=64,
    )
    q = hist_quantiles(cells, [0.5], ["bucket_start", "event_type"],
                       lo=0.0, hi=500.0, bins=64)
    got = {(r["bucket_start"], r["event_type"]): r["q_0_5"] for r in q.collect()}
    ev = _with_ts(load_events(spark, sf_dir))
    exact = {
        (r["b"], r["event_type"]): r["m"]
        for r in ev.groupBy(
            (F.floor(F.unix_timestamp("ts") / (7 * 86400)) * 7 * 86400)
            .cast("long").alias("b"),
            "event_type",
        ).agg(F.expr("percentile(value, 0.5)").alias("m")).collect()
    }
    # sketch median within one bin width (500/64 ≈ 7.8) of exact
    for k, est in got.items():
        assert abs(est - exact[k]) <= 500.0 / 64 + 1e-9, k


def test_histogram_state_is_bin_bounded(spark, sf_dir):
    from otters_spark.streaming.sketch import windowed_value_histogram

    cells = windowed_value_histogram(
        load_events(spark, sf_dir), "value", window="1 hour",
        lo=0.0, hi=500.0, bins=64,
    )
    worst = cells.groupBy("bucket_start", "event_type").count().agg(
        F.max("count")).collect()[0][0]
    assert worst <= 64
