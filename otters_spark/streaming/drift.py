"""Streaming drift monitoring: windowed bin counts + PSI vs a frozen
reference profile.

The batch detector (``operators/drift.py``) compares two complete
snapshots; in production the "current" side is a live stream, and the
question becomes "is THIS hour's traffic drifting from the release
profile?". The streaming-friendly decomposition mirrors the sketch
modules: the only thing the stream maintains is a windowed COUNT per
``(window, column, bin)`` — a plain algebraic aggregate with bounded
state (Σ bins per column per open window), natively handled by
Structured Streaming under a watermark. All PSI arithmetic
(smoothing, ln, per-column sums) runs downstream over the tiny count
rows, against a ``profile_bins`` snapshot computed ONCE per corpus
release and persisted — the stream never re-touches the reference
data.

Binning is the shared ``bin_entries`` expression, so the stream and
the batch detector agree bit-for-bit on bin assignment; streamed
count rows equal the batch-computed rows row-for-row (pinned in
tests/test_streaming_drift.py), and per-window PSI equals the batch
:func:`operators.drift.psi_summary` of the same window slice.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.drift import bin_entries
from .events import _with_ts

__all__ = ["windowed_bin_counts", "windowed_psi", "run_windowed_drift_stream"]


def windowed_bin_counts(
    df: DataFrame,
    numeric: Mapping[str, tuple] = None,
    categorical: Sequence[str] = (),
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Per ``(bucket_start, column, bin)`` counts of the profiled
    columns. Identical on batch and streaming input (the equivalence
    oracle); on streams pass ``watermark`` so window state closes."""
    numeric = dict(numeric or {})
    if not numeric and not categorical:
        raise ValueError("profile at least one column")
    df = _with_ts(df)
    if watermark:
        df = df.withWatermark("ts", watermark)
    arr = bin_entries(numeric, categorical)
    return (
        df.select(F.col("ts"), F.explode(arr).alias("e"))
        .groupBy(
            F.window(F.col("ts"), window).alias("win"),
            F.col("e.column").alias("column"),
            F.col("e.bin").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("win.start")).cast("long").alias("bucket_start"),
            "column",
            "bin",
            "n",
        )
    )


def windowed_psi(
    counts: DataFrame,
    ref_profile: DataFrame,
    round_dp: int = 6,
) -> DataFrame:
    """Per ``(bucket_start, column)`` PSI of the windowed counts
    against a frozen ``operators.drift.profile_bins`` snapshot —
    a cheap batch over sketch-sized rows, never the raw stream.

    Per bucket, the observed-bin universe is (reference bins) ∪ (bins
    seen in that bucket) — exactly the batch detector's full-outer
    semantics, so a window's PSI equals ``psi_summary(ref_slice,
    window_slice)``. The reference profile broadcasts (Σ bins per
    column rows); unmatched sides zero-fill."""
    buckets = counts.select("bucket_start").distinct()
    ref = buckets.crossJoin(
        F.broadcast(ref_profile.withColumnRenamed("n", "n_ref"))
    )
    cur = counts.withColumnRenamed("n", "n_cur")
    joined = ref.join(
        cur, ["bucket_start", "column", "bin"], "full_outer"
    ).fillna(0, ["n_ref", "n_cur"])
    w = Window.partitionBy("bucket_start", "column")
    joined = (
        joined.withColumn("__tr", F.sum("n_ref").over(w))
        .withColumn("__tc", F.sum("n_cur").over(w))
        .withColumn("__nb", F.count(F.lit(1)).over(w))
    )
    p = (F.col("n_ref") + 1) / (F.col("__tr") + F.col("__nb"))
    q = (F.col("n_cur") + 1) / (F.col("__tc") + F.col("__nb"))
    return (
        joined.withColumn("__contrib", (p - q) * F.log(p / q))
        .groupBy("bucket_start", "column")
        .agg(F.round(F.sum("__contrib"), round_dp).alias("psi"))
        .orderBy("bucket_start", "column")
    )


def run_windowed_drift_stream(
    spark: SparkSession,
    sf_dir: str,
    numeric: Mapping[str, tuple] = None,
    categorical: Sequence[str] = (),
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "events_drift_counts",
    output_mode: str = "complete",
) -> DataFrame:
    """readStream -> watermark -> windowed bin counts -> memory sink;
    drains available input and returns the count table (feed it to
    :func:`windowed_psi` with a stored reference profile).

    ``output_mode='complete'`` (the drain-and-inspect default here)
    retains every window's aggregate for the sink — fine for a
    bounded replay, but the watermark never evicts state under it. A
    LONG-RUNNING monitor must use ``'update'`` (or ``'append'``) so
    closed windows leave the state store; the bin-bounded-state claim
    in the module doc holds in those modes."""
    from .events import stream_events

    counts = windowed_bin_counts(
        stream_events(spark, sf_dir),
        numeric,
        categorical,
        window=window,
        watermark=watermark,
    )
    q = (
        counts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
