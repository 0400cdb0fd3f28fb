"""Z-order layout (functions/zorder.py): Morton-key bit math against
a Python reference, argument validation, and the load-bearing claim —
a store written in Z-order gives BOTH filter columns narrow per-file
min/max spans (so row-group/file pruning works on either predicate),
where a single-column sort leaves the second column unprunable."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from otters_spark.functions.zorder import zorder_key, zorder_sort


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference(spark):
    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    got = df.withColumn("z", zorder_key([F.col("x"), F.col("y")], 4)).collect()
    for r in got:
        assert r["z"] == _morton_ref(r["x"], r["y"], 4), (r["x"], r["y"])


def test_zorder_key_three_columns(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    z = df.select(
        zorder_key([F.col("a"), F.col("b"), F.col("c")], 2).alias("z")
    ).first()["z"]
    # a=01 b=10 c=11 -> bit layout (b1c1a1 b0c0a0... positions b*3+i)
    ref = 0
    for i, v in enumerate([1, 2, 3]):
        for b in range(2):
            ref |= ((v >> b) & 1) << (b * 3 + i)
    assert z == ref


def test_zorder_key_validation(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="at least 2"):
        zorder_key([F.col("id")], 8)
    with pytest.raises(ValueError, match="62-bit"):
        zorder_key([F.col("id")] * 4, 16)


def _file_spans(path: str, col: str) -> list[tuple[int, int]]:
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spans.append((lo, hi))
    return spans


def _avg_span(spans: list[tuple[int, int]]) -> float:
    return sum(hi - lo for lo, hi in spans) / len(spans)


def test_zorder_sort_prunes_both_dimensions(spark, tmp_path):
    # two independent uniform dimensions in [0, 1024)
    n = 40_000
    df = spark.range(n).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(1024)).alias("x"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1024)).alias("y"),
    )
    zpath, xpath = str(tmp_path / "zsort"), str(tmp_path / "xsort")
    zorder_sort(df, ["x", "y"], bits=10, num_partitions=16).write.parquet(zpath)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xpath)

    domain = 1024.0
    zx, zy = _avg_span(_file_spans(zpath, "x")), _avg_span(_file_spans(zpath, "y"))
    xx, xy = _avg_span(_file_spans(xpath, "x")), _avg_span(_file_spans(xpath, "y"))
    # x-sort: x razor sharp, y useless (full domain)
    assert xx < 0.15 * domain
    assert xy > 0.8 * domain
    # z-sort: BOTH columns substantially narrower than the domain
    # (16 files ~ 4x4 Morton cells -> ~1/4 domain each, plus slack)
    assert zx < 0.55 * domain, zx
    assert zy < 0.55 * domain, zy


def test_zorder_sort_explicit_ranges_and_nulls(spark):
    df = spark.createDataFrame(
        [(None, 5), (3, None), (10, 10), (1023, 1023)], "x int, y int"
    )
    out = zorder_sort(df, ["x", "y"], bits=8, ranges={"x": (0, 1023), "y": (0, 1023)})
    assert out.count() == 4  # nulls kept, quantized to cell 0
    assert "__zkey" not in out.columns
