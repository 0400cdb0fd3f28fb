"""Z-order key correctness + layout round-trip."""

import pytest
from pyspark.sql import functions as F

from otters_spark import MetaStore
from otters_spark.functions.layout import zorder_key_expr


def test_morton_known_values(spark):
    df = spark.createDataFrame([(3, 5), (0, 0), (7, 0)], ["a", "b"])
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zorder_key_expr("a", "b", bits=3).alias("z")).collect()
    }
    # a=0b011,b=0b101 -> z bits (b2 a2 b1 a1 b0 a0) = 100111 = 39
    assert got[(3, 5)] == 39
    assert got[(0, 0)] == 0
    assert got[(7, 0)] == 0b010101


def test_bits_bounds():
    with pytest.raises(ValueError):
        zorder_key_expr("a", "b", bits=0)
    with pytest.raises(ValueError):
        zorder_key_expr("a", "b", bits=32)


def test_zorder_n_columns(spark):
    from otters_spark.functions.layout import zorder_key_n_expr

    df = spark.createDataFrame([(1, 1, 1), (0, 0, 2)], ["a", "b", "c"])
    got = {
        (r["a"], r["b"], r["c"]): r["z"]
        for r in df.select(
            "a", "b", "c", zorder_key_n_expr(["a", "b", "c"], bits=2).alias("z")
        ).collect()
    }
    # (1,1,1): bit0 of each -> output bits 0,1,2 -> 0b111 = 7
    assert got[(1, 1, 1)] == 7
    # (0,0,2): c's bit1 -> output bit 1*3+2 = 5 -> 32
    assert got[(0, 0, 2)] == 32
    with pytest.raises(ValueError):
        zorder_key_n_expr(["a"], bits=2)


def test_zorder_layout_roundtrip(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    store = MetaStore.from_df(emb, vec_col="embedding", id_col="vec_id")
    df = store.df.withColumn("zkey", zorder_key_expr("label", "vec_id", bits=12))
    zstore = MetaStore(df, vec_col="embedding", id_col="vec_id", dim=store.dim)
    path = str(tmp_path / "zstore")
    zstore.save(path, sort_cols=["zkey"])
    loaded = MetaStore.load(spark, path)
    assert loaded.count() == store.count()
    # predicate on either interleaved column still pushes to the scan
    plan = (
        loaded.df.filter(F.col("label") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan


def test_pruning_stats_on_saved_store(spark, sf_dir, tmp_path):
    """O19 parity: pruned/evaluated chunk counts (reference
    MetaQueryStats.pruned_chunks, src/meta.rs:832-842). The Spark chunk
    analog is the Parquet ROW GROUP: stats come from evaluating the
    plan's CNF against footer zonemaps, with hive partition values as
    width-zero zonemaps."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    store = MetaStore.from_df(emb, vec_col="embedding", id_col="vec_id")
    path = str(tmp_path / "pstore")
    store.save(path, partition_by=["label"])
    loaded = MetaStore.load(spark, path)
    zm = loaded.row_group_zonemaps()
    total = len(zm)
    assert total >= len(loaded.df.inputFiles()) > 1

    from otters_spark import col

    q = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    _, stats = (
        loaded.query(q, "cosine").meta_filter(col("label").eq(5)).take(5)
        .collect_with_stats()
    )
    assert stats.evaluated_chunks is not None and stats.evaluated_chunks < total
    assert stats.pruned_chunks == total - stats.evaluated_chunks > 0
    # the partition-pruned chunk count equals the row groups under
    # label=5 directories
    expect = sum(1 for s in zm if s.get("label") == ("5", "5"))
    assert stats.evaluated_chunks == expect

    # unfiltered: every chunk is evaluated, nothing pruned
    _, full = loaded.query(q, "cosine").take(5).collect_with_stats()
    assert full.evaluated_chunks == total and full.pruned_chunks == 0

    # truly in-memory store: no files, fields stay None
    mem = MetaStore.from_df(
        spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<float>")
    )
    _, mstats = mem.query([1.0, 0.0], "cosine").take(1).collect_with_stats()
    assert mstats.evaluated_chunks is None and mstats.pruned_chunks is None


def test_row_group_pruning_within_one_file(spark, sf_dir, tmp_path):
    """Row-group granularity beats the r2 file-level metric: a
    single-partition sorted store written with tiny row groups must
    report pruning on a range predicate even though every FILE is
    touched — the case the file-level numFiles fallback scores as
    zero pruned."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    store = MetaStore.from_df(emb, vec_col="embedding", id_col="vec_id")
    path = str(tmp_path / "rgstore")
    store.save(
        path, sort_cols=["label"], partitions=1, row_group_bytes=16 * 1024
    )
    loaded = MetaStore.load(spark, path)
    zm = loaded.row_group_zonemaps()
    n_files = len(loaded.df.inputFiles())
    assert len(zm) > n_files, "fixture must produce multiple row groups per file"

    from otters_spark import col

    q = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    _, stats = (
        loaded.query(q, "cosine").meta_filter(col("label").lt(2)).take(5)
        .collect_with_stats()
    )
    # sorted layout: only the leading row group(s) can hold label < 2
    assert stats.pruned_chunks > 0
    assert stats.evaluated_chunks + stats.pruned_chunks == len(zm)
    assert stats.evaluated_chunks < len(zm)


def test_save_single_action_build_stats(spark, tmp_path):
    """save() must not pay an extra scan for BuildStats: rows come from
    an observed metric riding the write job itself, chunks from the
    written file listing — driver-side metadata only (round-5 verdict
    item 4). Under AQE the one write ACTION may surface as several
    jobs (shuffle-stage materialization + the final parquet job), so
    the assertion is shape-based: the parquet write is the LAST job in
    the group — nothing (no count, no collect, no rdd scan) runs after
    it — and every stage belongs to the write plan."""
    df = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.expr("array(cast(id as float), 1.0f)").alias("embedding"),
        (F.col("id") % 3).cast("string").alias("label"),
    )
    store = MetaStore.from_df(
        df, vec_col="embedding", id_col="vec_id", dim=2, validate=False
    )
    sc = spark.sparkContext
    group = "save-single-action"
    sc.setJobGroup(group, "store.save build-stats job count")
    try:
        stats = store.save(str(tmp_path / "s"), partitions=4)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    tracker = sc.statusTracker()
    job_stages = {}
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        names = []
        for sid in info.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None:
                names.append(si.name)
        job_stages[jid] = names
    assert job_stages, "no jobs recorded for the save group"
    flat = " | ".join(n for ns in job_stages.values() for n in ns)
    assert "count at" not in flat and "collect at" not in flat, flat
    last = job_stages[max(job_stages)]
    assert any("parquet at" in n for n in last), (
        f"last job is not the parquet write: {job_stages}"
    )
    assert stats.rows == 100
    import glob

    parts = glob.glob(str(tmp_path / "s" / "part-*"))
    assert stats.chunks == len(parts) > 0
    assert stats.elapsed_sec > 0
