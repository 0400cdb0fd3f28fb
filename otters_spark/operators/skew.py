"""Skew mitigation utilities.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these helpers cover the cases AQE can't re-plan:

* **salted aggregation** — a two-phase groupBy for heavy-hitter keys:
  partial aggregate on (key, salt), then final aggregate on key. Turns
  one hot reducer into ``salt`` parallel ones. Correct for any
  algebraic aggregate (sum/count/min/max); averages must be derived
  from sum+count at the end.
* **salted join** — replicate the small side ``salt`` times and salt
  the big side's key, so a hot join key spreads over ``salt`` tasks.
  Use when the small side is too big to broadcast and one key
  dominates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["salted_agg", "salted_join", "skew_report"]

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name -> "fn(col)" where fn is one of
    sum/count/min/max. Example::

        salted_agg(li, ["l_returnflag"], {"qty": "sum(l_quantity)", "n": "count(*)"})
    """
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        fn = fn.strip().lower()
        arg = arg.rstrip(")").strip()
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1) if arg in ("*", "") else F.col(arg)).alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(F.col(arg)).alias(out))
            final_exprs.append(getattr(F, fn)(F.col(out)).alias(out))
        else:
            raise ValueError(f"unsupported aggregate {fn!r} (algebraic only)")
    salted = df.withColumn(_SALT, F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)))
    partial = salted.groupBy(*keys, _SALT).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salt values, join on (key, salt).

    ``how`` is restricted to joins whose semantics survive small-side
    replication: inner/left/left_semi/left_anti/cross. A right or full
    outer join would emit each UNMATCHED small-side row once per salt
    replica — run it un-salted (AQE skew handling still applies) or
    swap the sides."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicating the "
            "small side would duplicate its unmatched rows"
        )
    big_s = big.withColumn(
        _SALT, F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt))
    )
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("long"))
    out = big_s.join(small_s, [key, _SALT], how)
    return out.drop(_SALT)

def skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top_k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Key-distribution diagnosis run BEFORE a join or aggregation
    shuffles on these keys — the report that tells you whether to
    broadcast, salt (:func:`salted_join` / :func:`salted_agg`), or
    proceed: one row with the shuffle-relevant facts about the key
    histogram.

    One scan to the per-key count table; everything else derives from
    it: max/top-k concentration via ``orderBy(desc).limit(k)`` (a
    TakeOrderedAndProject — never a global sort), Shannon entropy of
    the key distribution as one aggregate over the key table, with
    the normalized form ``entropy / ln(n_keys)`` (1.0 = uniform,
    -> 0 = one key owns everything). ``p_top1`` is the single-task
    share a hash shuffle would assign to the hottest key — the number
    AQE's skew threshold reasons about.

    Counts are exact longs; entropy mirrors its double arithmetic in
    the oracle. Returns ONE row: ``n_rows, n_keys, max_count, p_top1,
    p_topk, entropy, norm_entropy``. Extension surface — observability
    lane (the reference has no aggregation, /root/reference/src/)."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    counts = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__c"))
        # feeds totals, entropy, and the top-k branch — pin it (lazy)
        .localCheckpoint(eager=False)
    )
    topk = (
        counts.orderBy(F.col("__c").desc(), *[F.col(k).asc() for k in keys])
        .limit(top_k)
        .agg(F.sum("__c").alias("__topk"), F.max("__c").alias("__max"))
    )
    n = F.sum("__c").cast("double")
    # entropy = ln(N) - sum(c*ln(c))/N  (algebraic: one pass, no p_i
    # materialization; exact-count inputs)
    ent = F.log(n) - F.sum(
        F.col("__c").cast("double") * F.log(F.col("__c").cast("double"))
    ) / n
    base = counts.agg(
        F.sum("__c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        ent.alias("__ent"),
    )
    j = base.crossJoin(F.broadcast(topk))
    nk = F.col("n_keys").cast("double")
    return j.select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("__max").cast("long").alias("max_count"),
        F.round(
            F.col("__max").cast("double") / F.col("n_rows").cast("double"),
            round_to,
        ).alias("p_top1"),
        F.round(
            F.col("__topk").cast("double") / F.col("n_rows").cast("double"),
            round_to,
        ).alias("p_topk"),
        F.round(F.col("__ent"), round_to).alias("entropy"),
        F.when(
            F.col("n_keys") > 1,
            F.round(F.col("__ent") / F.log(nk), round_to),
        ).alias("norm_entropy"),
    )
