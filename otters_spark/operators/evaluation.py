"""Retrieval-quality evaluation: recall@k, MRR, and nDCG of a ranked
result table against exact ground truth.

The missing feedback loop for every approximate lane in this engine:
LSH/IVF/PQ similarity search, MinHash/SimHash banding, or any reranker
produces a ranked candidate list per query; this operator measures how
much of the exact answer it recovered. The reference library is exact
by design (``/root/reference/README.md:9`` — "exact vector search"),
so evaluating an approximate tier against the exact tier is precisely
the tool a user needs when deciding whether the 100 TB-scale ANN path
is good enough to replace the reference's brute force.

Scale design: both inputs are already top-k ranked lists, so every
window partition is k-bounded (ranking over a per-query candidate
list, never over the corpus). The metric computation is one equi-join
of two (n_queries x k)-row tables plus two per-query aggregations —
tiny relative to the searches that produced them, and broadcastable
whenever the query batch is.

Metrics (binary relevance; truth = the exact top-k set):

- ``recall``  = |approx ∩ truth| / |truth|
- ``mrr``     = 1 / rank of the first approx row that is in truth
- ``ndcg``    = DCG(approx) / DCG(truth-as-ideal), with the standard
  binary gain 1/log2(rank+1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["with_rank", "retrieval_metrics"]


def with_rank(
    df: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    score_col: str = "score",
    ascending: bool = False,
) -> DataFrame:
    """Attach 1-based ``rank`` per query, ordered by score with the id
    as the deterministic tie-break (the suite-wide ordering convention).
    The window partition is one query's result list — k-bounded by
    construction, never corpus-sized."""
    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc(),
        F.col(id_col).asc(),
    ]
    w = Window.partitionBy(query_col).orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w))


def retrieval_metrics(
    approx: DataFrame,
    truth: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    strict: bool = True,
) -> DataFrame:
    """Per-query recall / MRR / nDCG of ``approx`` against ``truth``.

    Both inputs carry (query_col, id_col, rank) — produce ranks with
    :func:`with_rank`. Queries with no approx hits still emit a row
    (zero metrics): the truth side drives the output, so a lane that
    returns nothing scores 0, not absent.

    ``strict=True`` (default) additionally asserts the approx query-id
    set is a SUBSET of truth's: because the output is truth-driven, a
    lane emitting results under a wrong or extra query id would
    otherwise vanish from the report instead of surfacing as an
    anomaly. The check is one anti-join over two k-bounded ranked
    lists — negligible next to the searches that produced them. Both
    inputs are pinned with a lazy localCheckpoint first: the eager
    assertion would otherwise execute the full search lanes once for
    the id-set check and AGAIN when the returned metrics plan runs —
    the checkpoint makes the check's execution the only one, and the
    pinned lists are k-bounded (tiny). Pass ``strict=False`` when
    evaluating a deliberately wider approx batch against a truth
    subsample (also skips the checkpoint — fully lazy).
    """
    a = approx.select(query_col, id_col, F.col("rank").alias("__ra"))
    t = truth.select(query_col, id_col, F.col("rank").alias("__rt"))

    if strict:
        a = a.localCheckpoint(eager=False)
        t = t.localCheckpoint(eager=False)
        orphans = (
            a.select(query_col)
            .distinct()
            .join(t.select(query_col).distinct(), query_col, "left_anti")
        )
        sample = [r[0] for r in orphans.limit(5).collect()]
        if sample:
            raise ValueError(
                "retrieval_metrics: approx contains query ids absent from "
                f"truth (sample: {sample}) — a truth-driven report would "
                "silently drop them; fix the lane or pass strict=False"
            )

    # discounted gain of a hit at rank r (binary relevance)
    def gain(r):  # noqa: ANN001 - Column in, Column out
        return 1.0 / F.log2(r.cast("double") + F.lit(1.0))

    hits = a.join(t, [query_col, id_col]).select(query_col, "__ra")
    per_q_hits = hits.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("__ra").alias("__first"),
        F.sum(gain(F.col("__ra"))).alias("__dcg"),
    )
    # ideal DCG = every truth row found at its own rank; also carries
    # |truth| so recall handles ragged truth sizes
    per_q_truth = t.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(gain(F.col("__rt"))).alias("__idcg"),
    )
    out = per_q_truth.join(per_q_hits, query_col, "left")
    return out.select(
        query_col,
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        "n_truth",
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_truth"), 6
        ).alias("recall"),
        F.round(
            F.coalesce(1.0 / F.col("__first"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(
            F.coalesce(F.col("__dcg") / F.col("__idcg"), F.lit(0.0)), 6
        ).alias("ndcg"),
    )
