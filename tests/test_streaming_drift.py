"""Streaming drift: streamed windowed bin counts must equal the batch
counts row-for-row, and per-window PSI must equal the batch detector
applied to the same window slice."""

from pyspark.sql import functions as F

from otters_spark.operators.drift import profile_bins, psi_summary
from otters_spark.streaming.drift import (
    run_windowed_drift_stream,
    windowed_bin_counts,
    windowed_psi,
)
from otters_spark.streaming.events import _with_ts
from otters_spark.suite import load_events

SPEC = {"numeric": {"value": (0, 500, 10)}, "categorical": ["event_type"]}


def _sorted(df):
    cols = df.columns
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_streamed_counts_match_batch(spark, sf_dir):
    batch = windowed_bin_counts(
        load_events(spark, sf_dir), SPEC["numeric"], SPEC["categorical"],
        window="6 hours",
    )
    streamed = run_windowed_drift_stream(
        spark, sf_dir, SPEC["numeric"], SPEC["categorical"],
        window="6 hours", query_name="t_drift",
    )
    rows = _sorted(streamed)
    assert rows == _sorted(batch)
    assert len(rows) > 0


def test_windowed_psi_equals_batch_detector(spark, sf_dir):
    ev = _with_ts(load_events(spark, sf_dir))
    # freeze the first day as the release profile
    day0 = ev.agg(F.min(F.to_date("ts")).alias("d")).collect()[0]["d"]
    ref = ev.filter(F.to_date("ts") == F.lit(day0))
    ref_prof = profile_bins(ref, SPEC["numeric"], SPEC["categorical"])

    counts = windowed_bin_counts(
        ev, SPEC["numeric"], SPEC["categorical"], window="12 hours"
    )
    got = {
        (r["bucket_start"], r["column"]): r["psi"]
        for r in windowed_psi(counts, ref_prof).collect()
    }
    # pick two buckets and check against the batch detector on the slice
    buckets = sorted({b for b, _ in got})[:2]
    for b in buckets:
        lo = F.from_unixtime(F.lit(b)).cast("timestamp")
        hi = F.from_unixtime(F.lit(b + 12 * 3600)).cast("timestamp")
        cur = ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        exp = {
            r["column"]: r["psi"]
            for r in psi_summary(
                ref, cur, SPEC["numeric"], SPEC["categorical"]
            ).collect()
        }
        for col, psi in exp.items():
            assert got[(b, col)] == psi, (b, col)


def test_state_is_bin_bounded(spark, sf_dir):
    # the stream aggregates (window, column, bin) — state rows per open
    # window are bounded by total declared bins, not event volume
    counts = windowed_bin_counts(
        load_events(spark, sf_dir), SPEC["numeric"], SPEC["categorical"],
        window="1 hour",
    )
    per_window = counts.groupBy("bucket_start").count().agg(F.max("count")).collect()[0][0]
    # 10 numeric bins (+null) + observed event_type values: comfortably small
    assert per_window <= 10 + 1 + 50
