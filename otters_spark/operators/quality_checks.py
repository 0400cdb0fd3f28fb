"""Declarative data-quality constraint validation (Deequ-style).

A 100 TB ingest pipeline needs a contract gate in front of training:
"these columns are never null, this key is unique, discounts sit in
[0, 0.1], every lineitem points at a real order". This module takes a
declarative constraint list and produces ONE violations report
DataFrame, engineered for scale:

* every row-level check (not-null / range / accepted values / regex)
  compiles to a conditional sum inside a SINGLE aggregate over ONE
  scan of the table — adding a tenth check costs an expression, not a
  pass;
* uniqueness is one hash-shuffled ``groupBy`` over the key columns
  (violations = rows beyond the first per duplicated key — exactly the
  rows a dedup would drop);
* referential integrity is one anti-join per foreign key, with the
  distinct reference keys on the build side (broadcast when small —
  the planner's call, since dimension tables are exactly the
  broadcastable case).

NULL policy mirrors SQL 3VL deliberately: a NULL value VIOLATES
``not_null`` and nothing else (``in_range``/``accepted``/``matches``
treat NULL as not-a-violation — pair them with ``not_null`` when NULLs
are illegal), and a NULL foreign key has no match, so it counts as an
FK violation; gate it with ``not_null`` first if NULL keys are legal.

The report schema is ``(constraint, violations, total, passed)`` —
small enough to collect, alert on, or append to a run ledger.

The reference engine has no validation surface (single-table,
in-memory — ``/root/reference/src/meta.rs`` ingest errors are the
closest analog, O1's strict typed ingest); this is extension surface
for the curation lane.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "NotNull",
    "InRange",
    "AcceptedValues",
    "Matches",
    "Unique",
    "ForeignKey",
    "validate",
]


@dataclass(frozen=True)
class NotNull:
    col: str
    #: override the report label (needed when two constraints of the
    #: same type target the same column, e.g. a warn and a hard band)
    label: str | None = None

    @property
    def name(self) -> str:
        return self.label or f"not_null({self.col})"


@dataclass(frozen=True)
class InRange:
    """Inclusive bounds; NULL is not a violation (see module doc)."""

    col: str
    lo: float | int
    hi: float | int
    label: str | None = None

    @property
    def name(self) -> str:
        return self.label or f"in_range({self.col})"


@dataclass(frozen=True)
class AcceptedValues:
    col: str
    values: tuple
    label: str | None = None

    @property
    def name(self) -> str:
        return self.label or f"accepted({self.col})"


@dataclass(frozen=True)
class Matches:
    """FULL-match regex — the pattern is wrapped as ``^(?:pat)$``
    before evaluation, because bare ``rlike``/``regexp_matches`` are
    SUBSTRING searches and a contract gate that silently passes
    ``"xx1AB"`` against ``[A-Z]+`` is worse than none. Write substring
    intent explicitly (``.*pat.*``). NULL is not a violation."""

    col: str
    pattern: str
    label: str | None = None

    @property
    def name(self) -> str:
        return self.label or f"matches({self.col})"


@dataclass(frozen=True)
class Unique:
    cols: tuple
    label: str | None = None

    @property
    def name(self) -> str:
        return self.label or f"unique({','.join(self.cols)})"


@dataclass(frozen=True)
class ForeignKey:
    """``col`` must appear in ``ref_col`` of ``ref`` (the dimension
    side). The reference DataFrame rides inside the constraint so one
    ``validate()`` call can span fact→dim relationships."""

    col: str
    ref: DataFrame
    ref_col: str
    label: str | None = None

    @property
    def name(self) -> str:
        return self.label or f"fk({self.col})"


def _not_violated(pred: F.Column) -> F.Column:
    # NULL predicate (NULL input under 3VL) → treated as satisfied
    return F.coalesce(pred, F.lit(True))


def validate(df: DataFrame, constraints: Sequence) -> DataFrame:
    """Run ``constraints`` against ``df``; returns the report
    DataFrame ``(constraint, violations, total, passed)`` with one row
    per constraint, in the declaration order's sort. All row-level
    checks share one aggregate pass; see module doc for the plan
    shapes."""
    if not constraints:
        raise ValueError("constraints must be non-empty")
    known = (NotNull, InRange, AcceptedValues, Matches, Unique, ForeignKey)
    cols = set(df.columns)
    for c in constraints:
        if not isinstance(c, known):
            raise TypeError(f"unknown constraint type: {type(c).__name__}")
        # strict unknown-column errors at declaration time, mirroring
        # the reference DSL's compile behavior
        # (/root/reference/src/expr.rs:396-398)
        wanted = list(c.cols) if isinstance(c, Unique) else [c.col]
        missing = [w for w in wanted if w not in cols]
        if missing:
            raise ValueError(f"{c.name}: unknown column(s) {missing}")
        if isinstance(c, ForeignKey) and c.ref_col not in c.ref.columns:
            raise ValueError(f"{c.name}: unknown reference column {c.ref_col!r}")
    names = [c.name for c in constraints]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate constraint names: {sorted(names)}")

    row_level: list = []
    reports: list[DataFrame] = []
    for c in constraints:
        if isinstance(c, NotNull):
            row_level.append((c.name, F.col(c.col).isNull()))
        elif isinstance(c, InRange):
            pred = F.col(c.col).between(F.lit(c.lo), F.lit(c.hi))
            row_level.append((c.name, ~_not_violated(pred)))
        elif isinstance(c, AcceptedValues):
            pred = F.col(c.col).isin(list(c.values))
            row_level.append((c.name, ~_not_violated(pred)))
        elif isinstance(c, Matches):
            pred = F.col(c.col).rlike(f"^(?:{c.pattern})$")
            row_level.append((c.name, ~_not_violated(pred)))
        elif isinstance(c, Unique):
            # rows beyond the first per duplicated key; one shuffle on
            # the key columns, count-only payload
            per_key = df.groupBy(*c.cols).agg(F.count(F.lit(1)).alias("__n"))
            agg = per_key.agg(
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("violations"),
                F.coalesce(F.sum("__n"), F.lit(0)).alias("total"),
            )
            reports.append(agg.select(F.lit(c.name).alias("constraint"),
                                      "violations", "total"))
        elif isinstance(c, ForeignKey):
            # distinct reference keys, then ONE left join pass that
            # yields both the orphan count (no match, incl. NULL keys
            # — NULL never matches, gate with not_null if legal) and
            # the total; a separate count scan would re-read the fact
            # table once per FK.
            refk = c.ref.select(F.col(c.ref_col).alias("__fk")).distinct()
            joined = df.select(F.col(c.col)).join(
                refk, F.col(c.col) == F.col("__fk"), "left"
            )
            agg = joined.agg(
                F.sum(F.when(F.col("__fk").isNull(), 1).otherwise(0)).alias(
                    "violations"
                ),
                F.count(F.lit(1)).alias("total"),
            )
            reports.append(
                agg.select(F.lit(c.name).alias("constraint"), "violations", "total")
            )
        else:
            raise TypeError(f"unknown constraint type: {type(c).__name__}")

    if row_level:
        aggs = [
            F.sum(F.when(v, 1).otherwise(0)).alias(f"__v{i}")
            for i, (_, v) in enumerate(row_level)
        ] + [F.count(F.lit(1)).alias("__tot")]
        one = df.agg(*aggs)
        # unpivot the one-row aggregate into (constraint, violations, total)
        pairs = ", ".join(
            f"'{name}', __v{i}" for i, (name, _) in enumerate(row_level)
        )
        melted = one.selectExpr(
            f"stack({len(row_level)}, {pairs}) as (constraint, violations)",
            "__tot as total",
        )
        reports.insert(0, melted)

    report = reduce(DataFrame.unionByName, reports)
    return (
        report.withColumn("violations", F.coalesce("violations", F.lit(0)).cast("long"))
        .withColumn("total", F.col("total").cast("long"))
        .withColumn("passed", F.col("violations") == 0)
        .orderBy("constraint")
    )
