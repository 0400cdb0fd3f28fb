"""Sources/sinks: lossless CSV/JSON round-trips with explicit schemas,
and query stats / row-mask / bloom knobs on the store."""

import pytest
from pyspark.sql import functions as F

from otters_spark import MetaStore, col
from otters_spark.sources import read_csv, read_json, write_csv, write_json
from otters_spark.suite import Q7


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_csv")
    write_csv(orders, path)
    back = read_csv(spark, path, orders.schema)
    assert back.count() == orders.count()
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_json_roundtrip(spark, sf_dir, tmp_path):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    path = str(tmp_path / "cust_json")
    write_json(cust, path)
    back = read_json(spark, path, cust.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, cust.collect()))


@pytest.fixture(scope="module")
def store(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return MetaStore.from_df(emb, vec_col="embedding", id_col="vec_id")


def test_collect_with_stats(store):
    rows, stats = (
        store.query(Q7, "cosine")
        .meta_filter(col("label").lte(4))
        .vec_filter(0.0, "gt")
        .take(5)
        .collect_with_stats()
    )
    assert stats.result_rows == len(rows) == 5
    assert stats.candidate_rows > 0
    assert stats.vectors_compared == stats.candidate_rows  # 1 query
    assert stats.rows_after_filters >= stats.result_rows
    assert stats.candidate_rows >= stats.rows_after_filters
    assert stats.elapsed_sec > 0


def test_with_row_mask(store):
    rows = (
        store.query(Q7, "cosine")
        .with_row_mask(F.col("vec_id") % 2 == 0)
        .take(10)
        .collect()
    )
    assert len(rows) == 10
    assert all(r["vec_id"] % 2 == 0 for r in rows)


def test_bloom_knobs_roundtrip(spark, store, tmp_path):
    path = str(tmp_path / "store_bloom")
    store.save(path, sort_cols=["label"], bloom_fpp=0.001, bloom_ndv=1000)
    loaded = MetaStore.load(spark, path)
    assert loaded.count() == store.count()


def test_partitioned_store_prunes(spark, store, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "store_part")
    store.save(path, partition_by=["label"])
    from otters_spark import MetaStore

    loaded = MetaStore.load(spark, path)
    df = loaded.df.filter(F.col("label") == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "label" in pf_line.split("PartitionFilters")[1][:80]
    assert df.count() == store.df.filter(F.col("label") == 3).count()


def test_table_file_stats_and_compact(spark, tmp_path):
    from otters_spark.sources import compact_table, table_file_stats

    src = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    # fragment a small table into many files
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    df.repartition(16).write.parquet(src)

    stats = table_file_stats(spark, src).collect()
    assert len(stats) == 16
    assert sum(r["n_rows"] for r in stats) == 10_000
    assert all(r["size_bytes"] > 0 for r in stats)

    n_files = compact_table(spark, src, out, target_file_mb=512, sort_cols=["k"])
    assert n_files == 1  # tiny table -> single file
    after = table_file_stats(spark, out).collect()
    assert len(after) == 1 and after[0]["n_rows"] == 10_000
    # content preserved
    assert spark.read.parquet(out).count() == 10_000


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from otters_spark.sources import read_orc, write_orc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path, bloom_cols=["lang"])
    back = read_orc(spark, path)
    assert back.count() == docs.count()
    assert dict(back.dtypes) == dict(docs.dtypes)
    a = {r.doc_id for r in docs.select("doc_id").collect()}
    assert {r.doc_id for r in back.select("doc_id").collect()} == a
    # predicate reaches the ORC scan
    plan = (
        back.filter(back.doc_id > 100)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]" in plan


def test_read_evolved_parquet_merges_and_pins_contract(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from otters_spark.sources import read_evolved_parquet

    base = str(tmp_path / "t")
    # v1 files: (id, a); v2 files add column b
    spark.range(0, 5).select("id", F.lit("x").alias("a")).write.parquet(
        base + "/d=1"
    )
    spark.range(5, 8).select(
        "id", F.lit("y").alias("a"), F.lit(7).alias("b")
    ).write.parquet(base + "/d=2")

    got = read_evolved_parquet(spark, base)
    assert set(got.columns) >= {"id", "a", "b"}
    rows = {r["id"]: (r["a"], r["b"]) for r in got.collect()}
    assert rows[0] == ("x", None) and rows[6] == ("y", 7)  # old files: b NULL

    expected = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("b", T.LongType()),
        ]
    )
    pinned = read_evolved_parquet(spark, base, expected)
    assert pinned.columns == ["id", "b"]  # pruned + ordered

    import pytest as _pytest

    bad = T.StructType([T.StructField("nope", T.LongType())])
    with _pytest.raises(ValueError, match="schema drift"):
        read_evolved_parquet(spark, base, bad)


def test_read_binary_files(spark, tmp_path):
    """binaryFile-source ingest: one row per media file, engine payload
    shape, stable hash ids, glob + size pushdown-friendly columns."""
    from otters_spark.sources import read_binary_files

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG-fake-a")
    (d / "b.png").write_bytes(b"\x89PNG-fake-bb")
    (d / "skip.txt").write_bytes(b"not media")
    sub = d / "nested"
    sub.mkdir()
    (sub / "c.png").write_bytes(b"\x89PNG-fake-ccc")

    flat = read_binary_files(spark, str(d), glob="*.png")
    rows = {r["uri"].rsplit("/", 1)[-1]: r for r in flat.collect()}
    assert set(rows) == {"a.png", "b.png"}
    assert rows["a.png"]["n_bytes"] == 11
    assert bytes(rows["a.png"]["payload"]).startswith(b"\x89PNG")
    assert rows["a.png"]["media_id"] >= 0

    rec = read_binary_files(spark, str(d), glob="*.png", recursive=True)
    assert rec.count() == 3
    # hash ids are stable across re-lists (derived from the path)
    again = {
        r["uri"]: r["media_id"]
        for r in read_binary_files(spark, str(d), glob="*.png").collect()
    }
    for r in flat.collect():
        assert again[r["uri"]] == r["media_id"]
    # the payload shape feeds the multimodal operators directly
    from otters_spark.operators.multimodal import extract_features

    feats = extract_features(
        rec.select("media_id", "payload"), n_features=2
    )
    assert feats.count() == 3
    with pytest.raises(ValueError):
        read_binary_files(spark, str(d), id_from="nope")


def test_read_binary_files_stream(spark, tmp_path):
    """Streaming media ingest: files land in a drop directory, each
    arrives as one payload-contract row; ids match the batch reader's
    (stable path hashes), so stream-built feature tables join against
    batch-built ones."""
    from otters_spark.sources import read_binary_files, read_binary_files_stream

    d = tmp_path / "drop"
    d.mkdir()
    (d / "m1.bin").write_bytes(b"\x01" * 8)
    (d / "m2.bin").write_bytes(b"\x02" * 16)

    stream = read_binary_files_stream(
        spark, str(d), glob="*.bin", max_files_per_trigger=1
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("media_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["uri"].rsplit("/", 1)[-1]: r
        for r in spark.sql("select * from media_stream_test").collect()
    }
    assert set(got) == {"m1.bin", "m2.bin"}
    assert got["m2.bin"]["n_bytes"] == 16
    assert bytes(got["m1.bin"]["payload"]) == b"\x01" * 8
    # stream ids == batch ids (both hash the path)
    batch_ids = {
        r["uri"]: r["media_id"]
        for r in read_binary_files(spark, str(d), glob="*.bin").collect()
    }
    for r in got.values():
        assert batch_ids[r["uri"]] == r["media_id"]
