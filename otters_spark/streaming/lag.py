"""Streaming arrival-lag / watermark observability: how late is the
data, and how much would a given watermark drop?

Structured Streaming drops late rows SILENTLY once a watermark passes
— the operational question "is my watermark too tight?" has no
built-in answer. This monitor measures it per micro-batch, BEFORE any
watermark is applied, from the only two facts available at ingest:
the row's event time and the processing wall-clock when the batch was
handed over (``foreachBatch`` is the one place both exist together).

Per micro-batch it appends one row per key to a parquet log:
row count, exact mean lag, exact lag extremes, and — the actionable
column — how many rows each CANDIDATE watermark delay would have
dropped had the stream's max-seen event time already advanced to this
batch's max (the standard watermark formula, computed analytically
rather than by running N parallel watermarked queries).

Scale shape: everything is one algebraic aggregate per batch over the
batch's rows (map-side combined; lag quantiles are deliberately NOT
computed — means/extremes/threshold-counts are algebraic, a quantile
would buffer). State is the log itself, one row per (batch, key).

The batch-side reader :func:`lag_report` aggregates the log into the
per-key posture summary a pipeline owner actually reads.

The reference engine has no streaming surface
(``/root/reference/src/``); extension lane. Replay-tested in
``tests/test_streaming_lag.py`` against driver-side recomputation of
the same batches.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["streaming_lag_monitor", "lag_report"]


def streaming_lag_monitor(
    stream: DataFrame,
    log_path: str,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    candidate_delays_s: Sequence[int] = (60, 600, 3600),
    processing_ts_col: str | None = None,
):
    """Configure (not start) a ``foreachBatch`` writer that appends
    per-(batch, key) lag statistics to ``log_path``.

    ``processing_ts_col`` is for TESTS/replays: name a column carrying
    the simulated arrival time instead of the wall clock, so a replay
    of historical files produces deterministic lag numbers (a live
    stream leaves it None and uses ``current_timestamp()``).

    Candidate-watermark drop counts follow the engine's rule: a row is
    dropped when ``event_time < max_event_time_seen - delay``. The
    monitor evaluates that against the RUNNING max over all batches so
    far (read back from the log — one tiny scan), which is exactly the
    state a real watermark would hold."""
    import os

    keys = list(key_cols)
    delays = sorted(set(int(d) for d in candidate_delays_s))
    if not delays or delays[0] < 0:
        raise ValueError("candidate delays must be non-negative seconds")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        proc = (
            F.col(processing_ts_col)
            if processing_ts_col
            else F.current_timestamp()
        )
        ev = F.col(ts_col)
        base = batch_df.filter(ev.isNotNull()).select(
            *keys,
            F.unix_micros(ev.cast("timestamp")).alias("__evt"),
            F.unix_micros(proc.cast("timestamp")).alias("__proc"),
        )
        prior_max = None
        if os.path.exists(log_path):
            prior = spark.read.parquet(log_path)
            prior_max = prior.agg(F.max("max_event_micros")).collect()[0][0]
        lag = F.col("__proc") - F.col("__evt")
        aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(lag).alias("sum_lag_micros"),
            F.min(lag).alias("min_lag_micros"),
            F.max(lag).alias("max_lag_micros"),
            F.max("__evt").alias("max_event_micros"),
        ]
        # the watermark each delay would hold entering THIS batch: the
        # max event time seen in prior batches minus the delay (None
        # before the first batch -> nothing can be dropped yet)
        for d in delays:
            if prior_max is None:
                dropped = F.lit(0).cast("long")
            else:
                dropped = F.sum(
                    F.when(
                        F.col("__evt") < prior_max - d * 1_000_000, 1
                    ).otherwise(0)
                ).cast("long")
            aggs.append(dropped.alias(f"dropped_at_{d}s"))
        out = base.groupBy(*keys).agg(*aggs).withColumn(
            "batch_id", F.lit(batch_id)
        )
        out.coalesce(1).write.mode("append").parquet(log_path)

    return stream.writeStream.foreachBatch(_apply).outputMode("append")


def lag_report(
    spark: SparkSession,
    log_path: str,
    key_cols: Sequence[str],
    candidate_delays_s: Sequence[int] = (60, 600, 3600),
    round_to: int = 3,
) -> DataFrame:
    """Aggregate the monitor log into the per-key posture summary:
    total rows, mean/max lag in seconds, and per candidate delay the
    fraction of rows that watermark would have dropped — the number
    that decides the delay/completeness tradeoff."""
    delays = sorted(set(int(d) for d in candidate_delays_s))
    log = spark.read.parquet(log_path)
    aggs = [
        F.sum("n_rows").alias("n_rows"),
        F.round(
            F.sum("sum_lag_micros").cast("double")
            / F.sum("n_rows").cast("double")
            / 1e6,
            round_to,
        ).alias("mean_lag_s"),
        F.round(F.max("max_lag_micros").cast("double") / 1e6, round_to).alias(
            "max_lag_s"
        ),
    ]
    for d in delays:
        aggs.append(
            F.round(
                F.sum(f"dropped_at_{d}s").cast("double")
                / F.sum("n_rows").cast("double"),
                6,
            ).alias(f"drop_frac_at_{d}s")
        )
    return log.groupBy(*key_cols).agg(*aggs).orderBy(*key_cols)
