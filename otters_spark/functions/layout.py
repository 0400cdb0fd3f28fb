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

__all__ = ["zorder_key_expr", "zorder_key_n_expr"]


def zorder_key_expr(col_a, col_b, bits: int = 16) -> Column:
    """Morton (Z-order) key interleaving the low ``bits`` bits of two
    non-negative integer columns: bit 2i is a's bit i, bit 2i+1 is
    b's bit i. ``bits`` <= 31 keeps the result in a positive int64."""
    return zorder_key_n_expr([col_a, col_b], bits)


def zorder_key_n_expr(cols, bits: int | None = None) -> Column:
    """Morton key over N non-negative integer columns: output bit
    ``i*N + j`` is column j's bit i. ``bits`` defaults to the largest
    per-column width that fits an int64 (63 // N)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    max_bits = 63 // n
    bits = max_bits if bits is None else bits
    if not 1 <= bits <= max_bits:
        raise ValueError(f"bits must be in [1, {max_bits}] for {n} columns")
    longs = [
        (c if isinstance(c, Column) else F.col(c)).cast("long") for c in cols
    ]
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(longs):
            out = out + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return out
