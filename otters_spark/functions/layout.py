"""Data-layout expressions.

Z-ordering is on the reference's roadmap (reference README.md:212); at
Parquet scale it is a write-time sort key: interleaving the bits of two
filter columns clusters rows so range predicates on EITHER column skip
row groups, where a plain lexicographic sort only prunes on the leading
column. Usage::

    df = df.withColumn("zkey", zorder_key_expr("label", "vec_id", bits=16))
    store.save(path, sort_cols=["zkey"])

Pure bit-ops, fully codegen; columns must be non-negative ints (hash or
rank-normalize anything else first).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["zorder_key_expr"]


def zorder_key_expr(col_a, col_b, bits: int = 16) -> Column:
    """Morton (Z-order) key interleaving the low ``bits`` bits of two
    non-negative integer columns: bit 2i is a's bit i, bit 2i+1 is
    b's bit i. ``bits`` <= 31 keeps the result in a positive int64."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    a = (col_a if isinstance(col_a, Column) else F.col(col_a)).cast("long")
    b = (col_b if isinstance(col_b, Column) else F.col(col_b)).cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        out = out + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return out
