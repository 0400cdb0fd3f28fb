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

__all__ = ["salted_agg", "salted_join"]

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
