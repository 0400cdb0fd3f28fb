"""Distributed Bloom-filter membership — the compact-set primitive
for corpus-scale "is this in the benchmark/blocklist?" probes.

The existing decontamination join (operators/decontam.py) broadcasts
the eval side's raw 8-byte gram hashes: perfectly fine while the
benchmark fits a broadcast (millions of grams). At the 100 TB /
billion-gram end — decontaminating against EVERY published benchmark
at once, or probing a multi-billion-entry URL blocklist — the raw
hash set stops broadcasting, but its Bloom filter still does:
m = 10 bits/member at k=4 is ~1.2 GB per billion members with < 2%
false positives, and the filter build itself is one ``groupBy(word)
.bit_or()`` aggregation — algebraic, mergeable (union = bit_or of
word tables), incremental (new benchmark batches OR in).

The probe is a broadcast join of each value's k (word, mask) pairs
against the word table — map-side only, corpus-linear, no shuffle of
the corpus. False positives are one-sided (a "maybe" can be
re-verified against the exact set; a "no" is definitive), which is
exactly the right failure mode for a drop-list prefilter.

Determinism/oracle: bits are placed by the repo's 60-bit md5 hash
mixed through the fixed MinHash xor-shift constants
(functions/text.py) — bit-identical in DuckDB, so the whole filter,
word for word, and every probe verdict oracle-check exactly. Words
hold 63 usable bits (positions 0-62): DuckDB's BIGINT ``1 << 63``
raises an overflow error where Spark wraps, so position 63 is
unusable cross-engine; one bit of density traded for an exact twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import MINHASH_PERM_CONSTANTS, _perm_mix, md5_long_expr

__all__ = ["bloom_build", "bloom_probe", "bloom_contamination_report"]

#: usable bit positions per stored word (see module docstring)
WORD_BITS = 63


def _bit_positions(h: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions in [0, m_bits) for one 60-bit hash."""
    if k > len(MINHASH_PERM_CONSTANTS):
        raise ValueError(f"k <= {len(MINHASH_PERM_CONSTANTS)} supported")
    if m_bits < WORD_BITS:
        raise ValueError("m_bits must be at least one word (63)")
    return F.array(
        *[
            F.pmod(_perm_mix(h, MINHASH_PERM_CONSTANTS[i]), F.lit(m_bits))
            for i in range(k)
        ]
    )


def _word_mask(bit: Column) -> tuple[Column, Column]:
    word_idx = (bit / WORD_BITS).cast("long")
    mask = F.expr(f"shiftleft(1L, cast(pmod(__b, {WORD_BITS}) as int))")
    return word_idx, mask


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int,
    k: int = 4,
    hashed: bool = False,
) -> DataFrame:
    """Build the filter as a (word_idx, word) table — at most
    ceil(m_bits/63) rows regardless of member count. One explode of
    k bits per member and one ``bit_or`` aggregation: algebraic, so
    Spark partial-aggregates map-side and the shuffle is bounded by
    the word count. Union two filters (same m_bits/k) by unioning
    the tables and re-running ``groupBy(word_idx).bit_or(word)``.

    ``hashed=True`` means ``value_col`` already holds repo-standard
    60-bit hashes (e.g. decontam's gram hashes) — skips re-hashing."""
    h = F.col(value_col) if hashed else md5_long_expr(F.col(value_col))
    bits = df.select(F.explode(_bit_positions(h, m_bits, k)).alias("__b"))
    word_idx, mask = _word_mask(F.col("__b"))
    return (
        bits.select(word_idx.alias("word_idx"), mask.alias("__mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    value_col: str,
    bloom: DataFrame,
    m_bits: int,
    k: int = 4,
    hashed: bool = False,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Append ``out_col``: true iff ALL k bits for the value are set
    (possible member — FPR per the m/n/k trade), false otherwise
    (definitely absent). The word table broadcasts; the probe is a
    map-side join, corpus-linear. Input rows pass through unchanged
    (NULL values probe to false)."""
    h = F.col(value_col) if hashed else md5_long_expr(F.col(value_col))
    # single lineage: the payload rides the explode->join->groupBy so
    # no row-id self-join is needed (monotonically_increasing_id in
    # two join branches can recompute differently — a known trap).
    # The row id MUST be materialized in its own select BELOW the
    # explode-select: beside the explode it lands in the post-Generate
    # projection and every exploded bit gets a fresh id (verdict
    # degrades to any-bit-hit). Nondeterministic expressions are
    # pinned, so the optimizer cannot hoist it back across the
    # Generate (the projection-placement trap of linkage._shingle_side).
    rowed = df.select(
        F.struct(*df.columns).alias("__payload"),
        h.alias("__hv"),
        F.monotonically_increasing_id().alias("__row"),
    )
    pairs = rowed.select(
        "__payload",
        "__row",
        F.explode(_bit_positions(F.col("__hv"), m_bits, k)).alias("__b"),
    )
    word_idx, mask = _word_mask(F.col("__b"))
    pairs = pairs.select(
        "__payload", "__row", word_idx.alias("word_idx"), mask.alias("__mask")
    )
    verdicts = (
        pairs.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "__payload",
            "__row",
            (
                F.col("word").isNotNull()
                & (F.col("word").bitwiseAND(F.col("__mask")) == F.col("__mask"))
            ).alias("__hit"),
        )
        .groupBy("__row")
        .agg(
            F.first("__payload").alias("__payload"),
            F.coalesce(F.bool_and("__hit"), F.lit(False)).alias(out_col),
        )
    )
    return verdicts.select("__payload.*", out_col)


def bloom_contamination_report(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    m_bits: int = 63 * 1024,
    k: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-prefiltered decontamination: flag train docs whose
    distinct n-grams hit the eval set's gram filter. Output per
    flagged doc: ``n_flagged_ngrams`` (a one-sided overestimate of
    the exact shared-gram count — clean-by-bloom docs are definitively
    clean and absent). Chain with
    ``contamination_report`` on the flagged subset when exact counts
    matter; the filter costs m_bits/63 longs of broadcast where the
    exact probe broadcasts every gram hash."""
    from .decontam import ngram_hashes

    eg = ngram_hashes(eval_df, n, text_col, id_col, out_id="eval_id").select(
        "__h"
    ).distinct()
    filt = bloom_build(eg, "__h", m_bits, k, hashed=True)
    tg = ngram_hashes(train_df, n, text_col, id_col, out_id="train_id")
    probed = bloom_probe(tg, "__h", filt, m_bits, k, hashed=True)
    return (
        probed.filter(F.col("maybe_member"))
        .groupBy("train_id")
        .agg(F.count(F.lit(1)).alias("n_flagged_ngrams"))
    )
