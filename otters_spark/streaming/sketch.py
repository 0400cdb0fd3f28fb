"""Streaming distinct-count sketches: windowed HLL register tables
over the event stream.

Why sketches are THE streaming-friendly distinct aggregate: exact
``count(distinct user)`` per window needs the full distinct set as
state; the HLL register table (operators/sketches.py) needs 2^p
integers per (window, group) — bounded, mergeable state that
Structured Streaming's partial aggregation maintains natively,
because ``groupBy(window, group, register).max(rank)`` is algebraic.
One function serves batch and stream (batch-as-oracle, the module
convention of streaming/events.py); the emitted register table is
itself persistable and rolls up across windows/days with
``operators.sketches.hll_merge`` — no raw-data re-scan, ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import md5_long_expr
from ..operators.sketches import _HASH_BITS, _hll_rank, hll_estimate
from .events import _with_ts

__all__ = [
    "windowed_distinct_registers",
    "windowed_distinct_counts",
    "run_windowed_distinct_stream",
    "windowed_frequency_cells",
    "run_windowed_frequency_stream",
    "windowed_value_histogram",
    "run_windowed_histogram_stream",
]


def windowed_distinct_registers(
    df: DataFrame,
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str | None = None,
    p: int = 8,
) -> DataFrame:
    """Per (bucket_start, event_type) HLL register table of distinct
    ``value_col``. Identical on batch and streaming input; on streams
    pass ``watermark`` so window state closes."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    wbits = _HASH_BITS - p
    df = _with_ts(df)
    if watermark:
        df = df.withWatermark("ts", watermark)
    h = md5_long_expr(F.col(value_col))
    reg = F.shiftright(h, wbits)
    rank = _hll_rank(h.bitwiseAND(F.lit((1 << wbits) - 1)), wbits)
    return (
        df.groupBy(
            F.window(F.col("ts"), window).alias("win"),
            F.col("event_type"),
            reg.alias("register"),
        )
        .agg(F.max(rank).alias("max_rank"))
        .select(
            F.unix_timestamp(F.col("win.start")).cast("long").alias("bucket_start"),
            "event_type",
            "register",
            "max_rank",
        )
    )


def windowed_distinct_counts(registers: DataFrame, p: int = 8) -> DataFrame:
    """Distinct-count estimates from a (streamed or batch) register
    table — runs as a cheap downstream batch over the sketch rows."""
    return hll_estimate(registers, ["bucket_start", "event_type"], p=p)


def run_windowed_distinct_stream(
    spark: SparkSession,
    sf_dir: str,
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 8,
    query_name: str = "events_distinct_sketch",
) -> DataFrame:
    """readStream -> watermark -> windowed HLL registers -> memory
    sink; drains available input and returns the register table."""
    from .events import stream_events

    regs = windowed_distinct_registers(
        stream_events(spark, sf_dir), value_col, window, watermark=watermark, p=p
    )
    q = (
        regs.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def windowed_frequency_cells(
    df: DataFrame,
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str | None = None,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Per (bucket_start, event_type) Count-Min cell table of
    ``value_col`` occurrences — the frequency twin of the HLL
    registers above, and the streaming form of
    ``operators.sketches.cms_table``. Exact per-window top-talker
    counts would keep every distinct value as state; the CMS cell
    table keeps ≤ depth × width integers per (window, group), and a
    plain windowed COUNT aggregate is algebraic, so Structured
    Streaming maintains it natively under a watermark. Same
    hash-once-then-fan-out discipline as the batch builder (the md5
    re-inline trap); cell tables roll up across windows with
    ``cms_merge`` (counts are linear) and are probed with
    ``cms_lookup``."""
    from ..operators.sketches import _cms_bucket

    if depth < 1:
        raise ValueError("depth must be >= 1")
    if width < 2:
        raise ValueError("width must be >= 2")
    df = _with_ts(df)
    if watermark:
        df = df.withWatermark("ts", watermark)
    hashed = df.select(
        "ts", "event_type", md5_long_expr(F.col(value_col)).alias("__h")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                _cms_bucket(F.col("__h"), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    exploded = hashed.select(
        "ts", "event_type", F.explode(cells).alias("__c")
    ).select("ts", "event_type", "__c.d", "__c.bucket")
    return (
        exploded.groupBy(
            F.window(F.col("ts"), window).alias("win"),
            F.col("event_type"),
            F.col("d"),
            F.col("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("win.start")).cast("long").alias("bucket_start"),
            "event_type",
            "d",
            "bucket",
            "cnt",
        )
    )


def run_windowed_frequency_stream(
    spark: SparkSession,
    sf_dir: str,
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    depth: int = 4,
    width: int = 1024,
    query_name: str = "events_frequency_sketch",
) -> DataFrame:
    """readStream -> watermark -> windowed CMS cells -> memory sink;
    drains available input and returns the cell table."""
    from .events import stream_events

    cells = windowed_frequency_cells(
        stream_events(spark, sf_dir),
        value_col,
        window,
        watermark=watermark,
        depth=depth,
        width=width,
    )
    q = (
        cells.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def windowed_value_histogram(
    df: DataFrame,
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str | None = None,
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 512,
) -> DataFrame:
    """Per (bucket_start, event_type, bin) histogram cells of
    ``value_col`` — the distribution member of the streaming sketch
    trio (HLL = distinct, CMS = frequency, this = quantiles). Exact
    per-window medians would buffer each window's multiset; the cell
    table keeps ≤ ``bins`` integers per (window, group) of algebraic
    COUNT state under a watermark. Bin arithmetic mirrors
    ``operators.sketches.hist_sketch`` (clamp to edge bins, NULL
    skipped), so streamed cells equal the batch sketch row-for-row
    and ``hist_quantiles`` reads quantiles straight off the drained
    table with ``group_cols=['bucket_start', 'event_type']``."""
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    df = _with_ts(df)
    if watermark:
        df = df.withWatermark("ts", watermark)
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) * F.lit(bins / (hi - lo))).cast("long")
    b = F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))
    return (
        df.filter(v.isNotNull())
        .groupBy(
            F.window(F.col("ts"), window).alias("win"),
            F.col("event_type"),
            b.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("win.start")).cast("long").alias("bucket_start"),
            "event_type",
            "bin",
            "cnt",
        )
    )


def run_windowed_histogram_stream(
    spark: SparkSession,
    sf_dir: str,
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 512,
    query_name: str = "events_value_hist",
) -> DataFrame:
    """readStream -> watermark -> windowed histogram cells -> memory
    sink; drains available input and returns the cell table (complete
    mode: bounded replay — long-running monitors use update/append so
    the watermark closes window state)."""
    from .events import stream_events

    cells = windowed_value_histogram(
        stream_events(spark, sf_dir), value_col, window,
        watermark=watermark, lo=lo, hi=hi, bins=bins,
    )
    q = (
        cells.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
