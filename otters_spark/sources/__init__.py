"""Sources & sinks.

The reference has in-memory ingest only; file formats and persistence
are explicit roadmap items (reference README.md:206,213). Here they are
Spark's native readers/writers with engine conventions applied:

* Parquet is the canonical store format (stats + bloom + sorted layout
  via ``MetaStore.save``);
* ORC is the columnar interchange peer (stats-pruned scans like
  parquet; bloom filters via ``orc.bloom.filter.columns``);
* CSV/JSON are interchange formats — schema-explicit reads (inference
  is a full extra scan at 100 TB) and header/timestamp conventions
  pinned so round-trips are lossless where the format allows;
* every reader returns a plain DataFrame, so any table feeds any
  operator in the engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "merge_upsert",
    "scd2_merge",
    "scd2_as_of",
    "read_table",
    "read_csv",
    "read_json",
    "read_orc",
    "write_csv",
    "write_json",
    "write_orc",
    "write_bucketed_table",
    "table_file_stats",
    "compact_table",
    "read_evolved_parquet",
    "read_binary_files",
    "read_binary_files_stream",
    "TABLES",
]

from .merge import merge_upsert, scd2_as_of, scd2_merge  # noqa: E402

#: tables shipped in the driver's testdata directories
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (parquet)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True
) -> DataFrame:
    """Schema-explicit CSV read — no inference scan, strict types."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("timestampFormat", _TS_FMT)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """Schema-explicit JSON-lines read."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", _TS_FMT)
        .option("mode", "FAILFAST")
        .json(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.

    Bucketing is the co-located-join primitive: two tables bucketed the
    same way on the join key join WITHOUT a shuffle — at 100 TB the
    difference between a map-side merge and re-shuffling the fact table
    every query. Pick ``n_buckets`` so one bucket of the largest table
    fits an executor's memory (bucket ≈ table_size / n_buckets).
    Asserted shuffle-free in tests/test_bucketing.py."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def table_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file row counts for a parquet table (file name via the
    ``_metadata`` hidden column — no extra listing job): the health
    check that detects the small-files problem before it detects you.
    Returns (file, n_rows, size_bytes) ordered largest first."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path).select(
        "_metadata.file_path", "_metadata.file_size"
    )
    return (
        df.groupBy(
            df["file_path"].alias("file"), df["file_size"].alias("size_bytes")
        )
        .count()
        .withColumnRenamed("count", "n_rows")
        .select("file", "n_rows", "size_bytes")
        .orderBy(F.col("size_bytes").desc(), "file")
    )


def compact_table(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 512,
    sort_cols: Sequence[str] = (),
) -> int:
    """Rewrite a parquet table into ~``target_file_mb`` files — the
    periodic maintenance pass that keeps scan parallelism healthy after
    many small incremental writes (a 100 TB table of 1 MB files spends
    more time opening files than reading them). Sizing is estimated
    from the current on-disk bytes; ``sort_cols`` optionally restores a
    zonemap-friendly order during the rewrite. Returns the number of
    output files."""
    src = spark.read.parquet(path)
    total_bytes = (
        src.select("_metadata.file_path", "_metadata.file_size")
        .distinct()
        .agg({"file_size": "sum"})
        .collect()[0][0]
        or 0
    )
    n_files = max(1, int(total_bytes / (target_file_mb * 1024 * 1024)) + 1)
    out = src.repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(out_path)
    return n_files


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        df.write.mode(mode)
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("timestampFormat", _TS_FMT).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC read — native vectorized reader; predicate pushdown works
    the same as parquet (min/max stripe stats + optional blooms)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite",
    bloom_cols: Sequence[str] = (),
) -> None:
    w = df.write.mode(mode)
    if bloom_cols:
        w = w.option("orc.bloom.filter.columns", ",".join(bloom_cols))
    w.orc(path)


def read_evolved_parquet(
    spark: SparkSession, path: str, expected: T.StructType | None = None
) -> DataFrame:
    """Read a parquet table whose files were written under EVOLVING
    schemas (columns added over time — the normal life of a 100 TB
    table that ingests daily). ``mergeSchema=true`` makes Spark
    reconcile footers across files (files missing a newer column read
    it as NULL) instead of trusting one random footer and silently
    dropping late-added columns.

    ``expected`` optionally pins the contract: missing columns raise
    (schema drift surfaced loudly), extra columns are pruned, and the
    result is SELECTed into the expected order so downstream
    positional consumers (unions, writers) never skew. Cost note:
    footer merging reads every file's footer at planning time — for
    tables with millions of files, prefer a real table catalog or
    store the canonical schema alongside (this helper's ``expected``)
    and skip the merge."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if expected is None:
        return df
    have = dict((f.name, f.dataType) for f in df.schema.fields)
    missing = [f.name for f in expected.fields if f.name not in have]
    if missing:
        raise ValueError(
            f"schema drift: expected columns absent from {path}: {missing}"
        )
    from pyspark.sql import functions as F

    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in expected.fields]
    )


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
    id_from: str = "hash",
) -> DataFrame:
    """Ingest a directory of raw media files (images, audio, any
    opaque blobs) as the engine's multimodal payload shape:
    ``(media_id long, uri string, mtime timestamp, n_bytes long,
    payload binary)`` — the input contract of ``decode_image`` /
    ``decode_audio`` / ``extract_features`` / ``phash_neardup``
    (operators/multimodal.py). Built on Spark's native ``binaryFile``
    source, so listing/partitioning/pushdown are the JVM reader's:
    a filter on ``n_bytes`` (the source's ``length`` column) prunes
    files BEFORE their content is read, and ``glob`` prunes at
    listing time.

    ``id_from='hash'`` (default) derives a stable 63-bit media_id
    from xxhash64 of the file path — reproducible across runs and
    clusters, safe to join against derived feature tables.
    ``id_from='row'`` uses monotonically_increasing_id (cheaper, NOT
    stable across re-lists; only for one-shot pipelines).

    100 TB notes: one row per FILE — the source materializes a whole
    file per row, so this is for payload-per-row media (photos, clips,
    documents), not for splitting huge archives (unpack tars upstream
    or carry offsets). ``spark.sql.files.maxPartitionBytes`` packs
    many small files per task; millions-of-files listings want a
    catalog/manifest instead of directory walks (same caveat as
    read_evolved_parquet)."""
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    if id_from == "hash":
        media_id = F.abs(F.xxhash64(F.col("path")))
    elif id_from == "row":
        media_id = F.monotonically_increasing_id()
    else:
        raise ValueError(f"id_from must be 'hash' or 'row', got {id_from!r}")
    return raw.select(
        media_id.alias("media_id"),
        F.col("path").alias("uri"),
        F.col("modificationTime").alias("mtime"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
    )


def read_binary_files_stream(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_binary_files`: watch a drop
    directory for raw media files and emit each new file as one row in
    the same payload contract ``(media_id, uri, mtime, n_bytes,
    payload)``. This is the ingestion front of a streaming media
    pipeline — the output feeds ``streaming.ingest.streaming_ingest_gate``
    (dedup vs a prepared corpus per micro-batch) or a ``foreachBatch``
    running the multimodal decode/feature kernels.

    ids are always the stable path hash (the batch reader's
    ``id_from='row'`` is NOT offered here: monotonically_increasing_id
    is not stable across micro-batch replays, so a recovery would
    re-key rows). ``max_files_per_trigger`` bounds micro-batch size —
    at scale, pair it with a small trigger interval so one giant
    backlog drop cannot produce an unbounded batch."""
    from pyspark.sql import functions as F

    schema = (
        "path string, modificationTime timestamp, "
        "length long, content binary"
    )
    reader = spark.readStream.format("binaryFile").schema(schema)
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(path)
    return raw.select(
        F.abs(F.xxhash64(F.col("path"))).alias("media_id"),
        F.col("path").alias("uri"),
        F.col("modificationTime").alias("mtime"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
    )
