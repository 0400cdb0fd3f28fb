"""Market-basket association mining: pairwise co-occurrence with
support / confidence / lift — the transaction-level counterpart of the
token-level PMI lane (text_analysis.pmi), and the first step of any
recommender / cross-sell / "customers also bought" pipeline.

Spark-first shape: one distinct (basket, item) projection, one
self-join keyed on the basket id, one pair-keyed count aggregate, then
two broadcast-joined item-margin lookups. The self-join is bounded by
construction — a basket with b distinct items emits C(b,2) pairs, so
per-basket cost is quadratic in BASKET size (tens), never in corpus
size; the pair aggregate is map-side combined. A hub ITEM (appearing
in millions of baskets) never concentrates work: pairs are keyed by
basket at emission and by item-pair afterwards, both hash shuffles,
AQE-skew-splittable.

Everything until the final ratios is exact integer counting, so
support/confidence/lift reproduce bit-for-bit cross-engine (same
int->double divisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["frequent_pairs", "item_neighbors"]


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Pairwise association rules over (basket, item) rows.

    Returns one row per unordered item pair seen in at least
    ``min_pair_count`` baskets: ``item_a < item_b``, ``n_ab`` (baskets
    with both), ``n_a``/``n_b`` (item margins), ``support``
    (n_ab / n_baskets), ``conf_a_to_b``/``conf_b_to_a`` (directional
    confidences) and ``lift`` (n_ab * n_baskets / (n_a * n_b); > 1
    means the pair co-occurs more than independence predicts).
    Duplicate (basket, item) rows count once; NULL baskets/items are
    dropped."""
    items = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .filter(F.col("__b").isNotNull() & F.col("__i").isNotNull())
        .distinct()
        # consumed by both self-join arms, the margins and the basket
        # total — pin so the caller's (possibly many-join) derivation
        # runs once
        .localCheckpoint(eager=False)
    )
    a = items.select(F.col("__b"), F.col("__i").alias("item_a"))
    b = items.select(F.col("__b"), F.col("__i").alias("item_b"))
    pairs = (
        a.join(b, "__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    margins = items.groupBy("__i").agg(F.count(F.lit(1)).alias("__n"))
    total = items.agg(
        F.count_distinct(F.col("__b")).alias("__n_baskets")
    )
    ma = margins.select(F.col("__i").alias("item_a"), F.col("__n").alias("n_a"))
    mb = margins.select(F.col("__i").alias("item_b"), F.col("__n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ma), "item_a")
        .join(F.broadcast(mb), "item_b")
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab") / F.col("__n_baskets")).alias("support"),
            (F.col("n_ab") / F.col("n_a")).alias("conf_a_to_b"),
            (F.col("n_ab") / F.col("n_b")).alias("conf_b_to_a"),
            (
                F.col("n_ab")
                * F.col("__n_baskets")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )

def item_neighbors(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 3,
    min_pair_count: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Item-item collaborative-filtering neighbors — the "customers
    also bought" table: for every item, its top-k most-similar items
    by binary-incidence cosine ``n_ab / sqrt(n_a * n_b)`` over shared
    baskets.

    Built on :func:`frequent_pairs` (basket-bounded pair emission,
    broadcast margins), symmetrized so both directions rank, then one
    per-item window over that item's CANDIDATE list — bounded by the
    item's co-occurring items, never the catalog. The ranking uses the
    ROUNDED cosine with the neighbor id as tie-break (the suite's
    k-boundary discipline), so the cut is engine-stable. Counts exact;
    only the final cosine divides."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql.window import Window

    # pin the pair table: the symmetrizing union below references it
    # twice, and unpinned each branch re-runs the whole basket
    # self-join + margin joins (round-11 plan audit: the entire
    # pipeline appeared twice under the Union). Pair-count-bounded, so
    # the checkpoint is small by construction.
    pairs = frequent_pairs(
        df, basket_col, item_col, min_pair_count=min_pair_count
    ).select("item_a", "item_b", "n_ab", "n_a", "n_b").localCheckpoint(
        eager=False
    )
    sym = pairs.unionByName(
        pairs.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "n_ab",
            F.col("n_b").alias("n_a"),
            F.col("n_a").alias("n_b"),
        )
    )
    cos = F.round(
        F.col("n_ab").cast("double")
        / F.sqrt(F.col("n_a").cast("double") * F.col("n_b").cast("double")),
        round_to,
    )
    w = Window.partitionBy("item_a").orderBy(
        F.col("cosine").desc(), F.col("item_b").asc()
    )
    return (
        sym.withColumn("cosine", cos)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .select(
            F.col("item_a").alias("item"),
            F.col("item_b").alias("neighbor"),
            "n_ab",
            "cosine",
            F.col("__r").alias("rank"),
        )
    )
