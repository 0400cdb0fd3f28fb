"""Z-order (Morton) interleaved sort keys for multi-dimensional
store layout.

The reference's README names Z-ordering as a roadmap item
(/root/reference/README.md:212) next to its "sort by filter columns
to improve pruning" advice (README.md:154,184-186): a single-column
sort makes Parquet row-group min/max stats razor-sharp for THAT
column and useless for every other. Interleaving the bits of two or
three filter columns gives every participating column row-group
spans ~sqrt (resp. cbrt) of the domain — all of them prune, none
perfectly, which is the right trade for stores queried on more than
one predicate column.

At 100 TB this is a write-time layout choice, not a query operator:
``zorder_sort`` computes the key as pure codegen bit math and hands
it to ``repartitionByRange`` + ``sortWithinPartitions`` — the same
shuffle any sorted store build pays, no extra pass. Range bounds for
quantization come from the caller or from ONE build-time aggregate
(an action, acceptable at store build exactly like store.py's
schema/stats work; never called per query).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "zorder_sort"]


def zorder_key(cols: Sequence[Column], bits: int) -> Column:
    """Morton-interleave already-quantized non-negative int columns
    (each in ``[0, 2^bits)``) into one long key.

    Bit ``b`` of column ``i`` lands at position ``b * len(cols) + i``
    — the standard Morton layout. ``len(cols) * bits`` must be <= 62
    so the key stays a positive long. Pure Column bit arithmetic:
    whole-stage codegen, no UDF, and exactly reproducible in any
    engine with ``>>``/``&``/``<<`` (the suite oracle-checks it)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds the 62-bit key budget")
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return reduce(lambda a, x: a + x, terms).cast("long")


def _quantize(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Affine-map [lo, hi] onto the integer grid [0, 2^bits)."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (c.cast("double") - F.lit(float(lo))) * F.lit(top / (hi - lo))
    return F.least(
        F.greatest(F.floor(scaled), F.lit(0)), F.lit(top)
    ).cast("long")


def zorder_sort(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    ranges: dict[str, tuple[float, float]] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` range-partitioned and sorted by the Morton key of
    ``cols``, ready for ``.write.parquet`` (row-group stats then prune
    on EVERY participating column).

    ``ranges`` maps col -> (min, max) for quantization. When omitted
    it is computed with one build-time aggregate — a driver action,
    deliberate and documented: layout happens once at store build
    (exactly like store.py's write path), never inside a query plan.
    NULLs quantize to cell 0 (they sort first; Parquet null counts
    still prune them)."""
    if ranges is None:
        row = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in cols],
            *[F.max(c).alias(f"hi_{c}") for c in cols],
        ).first()
        ranges = {
            c: (
                float(row[f"lo_{c}"] if row[f"lo_{c}"] is not None else 0.0),
                float(row[f"hi_{c}"] if row[f"hi_{c}"] is not None else 0.0),
            )
            for c in cols
        }
    quant = [
        _quantize(F.coalesce(F.col(c), F.lit(ranges[c][0])), *ranges[c], bits)
        for c in cols
    ]
    keyed = df.withColumn("__zkey", zorder_key(quant, bits))
    parted = (
        keyed.repartitionByRange(num_partitions, "__zkey")
        if num_partitions
        else keyed.repartitionByRange("__zkey")
    )
    return parted.sortWithinPartitions("__zkey").drop("__zkey")
