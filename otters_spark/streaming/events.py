"""Structured Streaming over the events stream.

The reference is batch/in-memory only (SURVEY.md §2.2: no watermarks,
windows, or state); this module is the engine's streaming extension,
built so every transformation is ONE function applied to either a batch
DataFrame or a ``readStream`` DataFrame — the classic Structured
Streaming pattern that keeps batch results the oracle for streaming
results (tests/test_streaming.py asserts exactly that equivalence).

At scale: file-source streams read new files per micro-batch;
watermarks bound state for late data; session windows use the built-in
state store (``F.session_window``), and anything fancier drops to
``applyInPandasWithState``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

__all__ = [
    "EVENTS_SCHEMA",
    "with_event_ts",
    "windowed_agg",
    "sessionize",
    "view_purchase_join",
    "stream_events",
    "run_windowed_stream",
    "exposure_sessions",
]

#: schema of the events stream as Spark reads it when the parquet
#: stores TIMESTAMP(NANOS) (read as long nanos under
#: spark.sql.legacy.parquet.nanosAsLong — see session.py). Data
#: generated with TIMESTAMP(MICROS) instead arrives as a real
#: timestamp column; ``stream_events`` infers the actual on-disk
#: schema from a batch read so both encodings stream correctly.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def with_event_ts(df: DataFrame) -> DataFrame:
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":  # TIMESTAMP(NANOS) read as long nanos
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":  # TIMESTAMP(MICROS, no tz): wall clock is
        # UTC by data-gen convention and the session tz is UTC, so the
        # cast is lossless; watermarks/windows require TIMESTAMP proper.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: public name; the underscore alias remains for existing callers
_with_ts = with_event_ts


def windowed_agg(
    df: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) window counts/sums per
    event_type. Works identically on batch and streaming inputs; pass
    ``watermark`` on streams to bound late-data state."""
    df = _with_ts(df)
    if watermark:
        df = df.withWatermark("ts", watermark)
    win = F.window(F.col("ts"), window, slide) if slide else F.window(F.col("ts"), window)
    return (
        df.groupBy(win.alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).cast("long").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    df: DataFrame, gap: str = "30 minutes", watermark: str | None = None
) -> DataFrame:
    """Per-user session windows: a session extends while consecutive
    events arrive within ``gap`` (built-in ``session_window`` state
    merging — the streaming-native gaps-and-islands)."""
    df = _with_ts(df)
    if watermark:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window(F.col("ts"), gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("user_id"),
            F.unix_timestamp(F.col("sw.start")).cast("long").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def view_purchase_join(
    views: DataFrame,
    purchases: DataFrame,
    within: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch-batch) interval join: purchases matched
    to same-user views that happened up to ``within`` before them. On
    streams, the time-range condition + watermarks bound the join state
    (Spark evicts view state older than the range). Works identically
    on batch inputs — the usual batch-as-oracle pattern.

    ``how='left_outer'`` keeps unconverted purchases (view columns
    NULL) — on streams the NULL rows only emit once the watermark
    passes the purchase's join window (Spark must be sure no matching
    view can still arrive), so a left-outer stream lags the inner rows
    by the watermark delay; the batch twin has no such lag."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_event_id"),
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {within}"))
    )
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    # purchases are the preserved (left) side so left_outer reads
    # naturally as "every purchase, with its views when they exist"
    return p.join(v, cond, how).select(
        F.col("p_user").alias("user_id"),
        "purchase_event_id",
        "view_event_id",
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        F.unix_micros("view_ts").alias("view_ts_us"),
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet. Spark's file stream
    source requires a *directory* (each new file = a micro-batch), and
    the testdata ships a single file, so it is staged into a temp
    landing directory via symlink — exactly the landing-dir shape a
    production pipeline would feed."""
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    landing = tempfile.mkdtemp(prefix="otters_events_landing_")
    os.symlink(os.path.abspath(src), os.path.join(landing, "events.parquet"))
    # File streams need an explicit schema; take it from a batch read of
    # the same file so ts arrives exactly as the batch path sees it
    # (long nanos under the legacy flag, or a real timestamp for
    # TIMESTAMP(MICROS) data) and _with_ts stays the single normalizer.
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).format("parquet").load(landing)


def run_windowed_stream(
    spark: SparkSession,
    sf_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    query_name: str = "events_windowed",
) -> DataFrame:
    """End-to-end streaming demo: readStream -> watermark -> windowed
    agg -> complete-mode memory sink; drains all available input and
    returns the sink contents as a DataFrame."""
    agg = windowed_agg(stream_events(spark, sf_dir), window, watermark=watermark)
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def exposure_sessions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    duration_col: str = "value",
    duration_unit_us: int = 60_000_000,
) -> DataFrame:
    """Interval UNION as a built-in session window — the streaming
    form of ``operators.intervals.merge_intervals``: each event opens
    an exposure interval ``[ts, ts + duration)`` (duration =
    ``duration_col`` × ``duration_unit_us`` micros, the dynamic
    per-row session gap), and Spark's session-window state merges
    overlapping exposures into disjoint islands per key.

    Batch-mode output is pinned row-for-row equal to
    ``merge_intervals`` on the same interval set
    (tests/test_streaming.py) — so the streaming lane inherits the
    batch operator's semantics, with watermark-managed state instead
    of a window-function sort. One caveat at the boundary: an event
    starting EXACTLY at a window's end merges here (gap semantics)
    and in merge_intervals too (touch merges) — both sides agree.

    Returns (key, s, e, n_intervals) with epoch-micros longs."""
    gap = F.concat(
        F.floor(F.col(duration_col) * float(duration_unit_us))
        .cast("long")
        .cast("string"),
        F.lit(" microseconds"),
    )
    src = events.filter(
        F.col(duration_col).isNotNull()
        & (F.col(duration_col) > 0)
        & F.col(ts_col).isNotNull()
    )
    return (
        src.groupBy(key_col, F.session_window(ts_col, gap).alias("__w"))
        .agg(F.count(F.lit(1)).alias("n_intervals"))
        .select(
            key_col,
            F.unix_micros("__w.start").alias("s"),
            F.unix_micros("__w.end").alias("e"),
            "n_intervals",
        )
    )
