"""Snapshot maintenance for saved stores: upsert and SCD2 merges.

The reference is immutable after build, with mutability on its
roadmap (reference README.md:207); at 100 TB the practical form of
mutability is a periodic MERGE of a change batch into the stored
snapshot — last-writer-wins for stateless stores, SCD2 (validity
intervals) where history must survive. Both are expressed as ONE
equi-join keyed on the merge key:

* ``merge_upsert`` — anti-join + union: updates win, everything else
  carries over. One shuffle on the key.
* ``scd2_merge`` — the classic slowly-changing-dimension type 2:
  a changed key CLOSES the current version (valid_to = batch ts) and
  OPENS a new one; unchanged and absent keys pass through. The three
  outcomes are emitted from a single full-outer join via one
  generator (array_compact + explode), NOT three filtered re-reads
  of the join — Catalyst does not dedup repeated subtrees, so the
  branch-per-select form would run the join three times.

Both return plain DataFrames: write them back with the normal store
writers (overwrite-by-partition at scale).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["merge_upsert", "scd2_merge", "scd2_as_of", "snapshot_diff", "change_feed", "apply_agg_delta", "join_change_feed"]


def merge_upsert(
    current: DataFrame, updates: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Last-writer-wins merge: rows of ``updates`` replace same-key
    rows of ``current``; unmatched current rows survive. Columns must
    match. The anti-join and the union both hash on the key — one
    exchange each side, no windows, no driver state. Key equality is
    NULL-SAFE (the :func:`snapshot_diff` discipline: a NULL key is a
    key, not an unknown) — a plain ``==`` anti-join would keep the
    old NULL-key row AND append the update, duplicating the key."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    if set(current.columns) != set(updates.columns):
        raise ValueError(
            f"schemas differ: {sorted(current.columns)} vs {sorted(updates.columns)}"
        )
    survivors = current.alias("c").join(
        updates.select(*keys).alias("u"),
        _key_cond(keys, "c", "u"),
        "left_anti",
    )
    return survivors.unionByName(updates)


def _all_equal(cols: Sequence[str], left: str, right: str) -> Column:
    out = F.lit(True)
    for c in cols:
        out = out & F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
    return out


def _key_cond(keys: Sequence[str], left: str, right: str) -> Column:
    """Null-safe key-equality join condition (NULL keys match NULL
    keys — they are keys, not unknowns, in a version diff)."""
    cond = None
    for k in keys:
        e = F.col(f"{left}.{k}").eqNullSafe(F.col(f"{right}.{k}"))
        cond = e if cond is None else cond & e
    return cond


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    batch_date,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD2 merge of an update batch into a versioned dimension.

    ``dim`` carries ``valid_from``/``valid_to`` (NULL valid_to =
    current version); ``updates`` carries key + compare columns. Per
    key: attrs changed → current version closes at ``batch_date`` and
    a new version opens; unchanged → untouched; new key → first
    version opens. History rows pass through untouched. NULL-safe
    attribute comparison, so NULL→value and value→NULL are changes.

    Scale shape: history splits off with a scan-fused filter; the
    current slice full-outer-joins the batch on the key (ONE
    shuffle); each joined row emits its 1-2 output rows through a
    single generator, so nothing is recomputed per outcome branch.

    Key equality is NULL-SAFE and row presence rides constant markers
    per side, NOT key nullness — the :func:`snapshot_diff` discipline.
    The earlier ``==`` join + ``key IS NOT NULL`` presence test made a
    NULL-key current row look absent on BOTH sides of its own join
    row, so the generator emitted nothing and the row silently
    vanished from the dimension (and a NULL-key update was never
    inserted)."""
    keys = list(key_cols)
    attrs = list(compare_cols)
    if not keys or not attrs:
        raise ValueError("key_cols and compare_cols must be non-empty")
    overlap = set(keys) & set(attrs)
    if overlap:
        raise ValueError(f"key and compare columns overlap: {sorted(overlap)}")
    bd = F.lit(batch_date).cast("date")

    cur = (
        dim.filter(F.col(valid_to).isNull())
        .withColumn("__pc", F.lit(1))
        .alias("c")
    )
    hist = dim.filter(F.col(valid_to).isNotNull())
    upd = (
        updates.select(*keys, *attrs)
        .withColumn("__pu", F.lit(1))
        .alias("u")
    )

    j = cur.join(upd, _key_cond(keys, "c", "u"), "full_outer")

    cur_exists = F.col("c.__pc").isNotNull()
    upd_exists = F.col("u.__pu").isNotNull()
    changed = upd_exists & cur_exists & ~_all_equal(attrs, "c", "u")

    def _row(src: str, vfrom: Column, vto: Column) -> Column:
        fields = [F.col(f"{src}.{k}").alias(k) for k in keys]
        fields += [F.col(f"{src}.{a}").alias(a) for a in attrs]
        fields += [vfrom.alias(valid_from), vto.alias(valid_to)]
        return F.struct(*fields)

    kept = F.when(
        cur_exists & ~changed,
        _row("c", F.col(f"c.{valid_from}"), F.lit(None).cast("date")),
    )
    closed = F.when(changed, _row("c", F.col(f"c.{valid_from}"), bd))
    opened = F.when(
        upd_exists & (changed | ~cur_exists), _row("u", bd, F.lit(None).cast("date"))
    )
    exploded = j.select(
        F.explode(F.array_compact(F.array(kept, closed, opened))).alias("__r")
    ).select("__r.*")
    return hist.select(*keys, *attrs, valid_from, valid_to).unionByName(exploded)


def scd2_as_of(
    dim: DataFrame,
    as_of,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Time travel over an SCD2 dimension: the snapshot that was
    current on ``as_of`` — rows whose validity interval covers the
    date (``valid_from <= as_of < valid_to``, open current versions
    have NULL valid_to). A scan-fused filter, so snapshot reads cost
    one pass and prune on the validity columns' min/max stats; the
    validity columns are dropped (the result IS a plain snapshot).

    Half-open semantics match :func:`scd2_merge`: a version closed AT
    ``as_of`` is no longer visible, its successor (opened at
    ``as_of``) is."""
    d = F.lit(as_of).cast("date")
    return dim.filter(
        (F.col(valid_from) <= d)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > d))
    ).drop(valid_from, valid_to)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff between two dataset versions — the release-notes
    primitive ("this rebuild added X docs, dropped Y, modified Z").
    Returns the key columns + ``change_type`` in
    {'added','removed','changed','unchanged'}.

    One full-outer join hashed on the key (the only exchange);
    ``compare_cols`` (default: all shared non-key columns) decide
    changed-vs-unchanged via null-safe equality, so NULL→value and
    value→NULL transitions count as changes instead of vanishing
    under 3VL. Keys must be unique per side (it is a diff of
    versions, not a multiset compare) — enforce upstream with
    quality_checks.Unique when in doubt."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    missing = [c for c in list(compare_cols) + keys
               if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"columns absent from a side: {missing}")

    # presence via a constant marker per side, NOT key nullness — a
    # legitimately NULL key would otherwise read as "absent"
    o = old.select(*keys, *compare_cols, F.lit(1).alias("__po")).alias("o")
    n = new.select(*keys, *compare_cols, F.lit(1).alias("__pn")).alias("n")
    j = o.join(n, _key_cond(keys, "o", "n"), "full_outer")
    same = _all_equal(compare_cols, "o", "n") if compare_cols else F.lit(True)
    change = (
        F.when(F.col("o.__po").isNull(), F.lit("added"))
        .when(F.col("n.__pn").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    key_out = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys
    ]
    return j.select(*key_out, change.alias("change_type"))


def change_feed(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Signed row-level change feed between two dataset versions: the
    CDC shape incremental maintenance consumes. Returns key columns +
    ``value_cols`` + ``__sign`` — one +1 row per added key (new
    values), one -1 per removed key (old values), and a -1/+1 PAIR per
    changed key. Unchanged keys emit nothing, so the feed is
    change-sized, not corpus-sized. One full-outer join hashed on the
    key, same contract as :func:`snapshot_diff` (unique keys per
    side)."""
    keys = list(key_cols)
    vals = list(value_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    missing = [c for c in keys + vals
               if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"columns absent from a side: {missing}")
    o = old.select(*keys, *vals, F.lit(1).alias("__po")).alias("o")
    n = new.select(*keys, *vals, F.lit(1).alias("__pn")).alias("n")
    j = (
        o.join(n, _key_cond(keys, "o", "n"), "full_outer")
        # both signed arms read this join — pin it or Catalyst re-runs
        # the full-outer per arm
        .localCheckpoint(eager=False)
    )
    same = _all_equal(vals, "o", "n") if vals else F.lit(True)
    is_removed = F.col("n.__pn").isNull()
    is_added = F.col("o.__po").isNull()
    minus = j.filter(~is_added & (is_removed | ~same)).select(
        *[F.col(f"o.{k}").alias(k) for k in keys],
        *[F.col(f"o.{v}").alias(v) for v in vals],
        F.lit(-1).alias("__sign"),
    )
    plus = j.filter(~is_removed & (is_added | ~same)).select(
        *[F.col(f"n.{k}").alias(k) for k in keys],
        *[F.col(f"n.{v}").alias(v) for v in vals],
        F.lit(1).alias("__sign"),
    )
    return minus.unionByName(plus)


def apply_agg_delta(
    old_agg: DataFrame,
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Incremental maintenance of an algebraic aggregate: given the
    previous per-group aggregate (``sum_cols`` sums + ``count_col``
    row count) and a signed :func:`change_feed`, produce the aggregate
    of the NEW version touching only the changes —
    ``new = old + sum(sign * x)`` per group, groups whose count drops
    to zero removed, unseen groups created.

    This is the 100 TB maintenance shape: a daily rebuild re-shuffles
    the corpus; applying the feed shuffles only the changed rows.
    Works for any commutative-group aggregate (sum, count; avg =
    maintained sum/count) — NOT for min/max (deletes break them; keep
    a full rebuild or a heap-per-group for those). Exact when sums are
    integers (cents, micros — the repo's money discipline); float
    sums drift by reassociation exactly as a rebuild's partial sums
    do."""
    g = list(group_cols)
    sums = list(sum_cols)
    delta = changes.groupBy(*g).agg(
        *[F.sum(F.col(c) * F.col("__sign")).alias(f"__d_{c}") for c in sums],
        F.sum("__sign").alias("__dn"),
    )
    o = old_agg.alias("o")
    d = delta.alias("d")
    j = o.join(d, _key_cond(g, "o", "d"), "full_outer")
    out_keys = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"d.{k}")).alias(k) for k in g
    ]
    zero = F.lit(0)
    new_cols = [
        (
            F.coalesce(F.col(f"o.{c}"), zero)
            + F.coalesce(F.col(f"d.__d_{c}"), zero)
        ).alias(c)
        for c in sums
    ]
    new_n = (
        F.coalesce(F.col(f"o.{count_col}"), zero)
        + F.coalesce(F.col("d.__dn"), zero)
    ).alias(count_col)
    return j.select(*out_keys, *new_cols, new_n).filter(
        F.col(count_col) > 0
    )


def join_change_feed(
    r_feed: DataFrame,
    s_feed: DataFrame,
    r_old: DataFrame,
    s_new: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Signed change feed of a JOIN view — the delta-join identity that
    extends :func:`apply_agg_delta`'s maintenance story past single
    tables:  ``Δ(R ⋈ S) = ΔR ⋈ S_new  +  R_old ⋈ ΔS``  (counting
    semiring; signs multiply, and the full-side rows carry +1). Feed
    the result straight into :func:`apply_agg_delta` to maintain an
    aggregate OVER a join without re-joining the corpus.

    Why this 2-term form: expanding ``R_new ⋈ S_new − R_old ⋈ S_old``
    with ``R_new = R_old + ΔR`` gives ``R_old ⋈ (S_new − S_old) +
    ΔR ⋈ S_new`` — exact for adds, deletes, updates on EITHER or BOTH
    sides, including correlated churn (a row changing on both sides at
    once), with no ΔR ⋈ ΔS correction term to forget.

    Scale shape: both terms are change-sized on one side — ΔR hashes
    against S_new, ΔS against R_old; neither re-joins R×S. The feeds
    come from :func:`change_feed` (so they carry ``__sign``); non-key
    columns must be disjoint across sides (standard join hygiene).

    The reference engine has no join surface (`/root/reference/src/`);
    extension lane, oracle-proved by aggregating the rebuilt v2 join."""
    keys = list(on)
    if not keys:
        raise ValueError("on must be non-empty (an empty key list would "
                         "silently cross-join the sides)")
    r_other = [c for c in r_feed.columns if c not in keys + ["__sign"]]
    s_other = [c for c in s_feed.columns if c not in keys + ["__sign"]]
    clash = set(r_other) & set(s_other)
    if clash:
        raise ValueError(f"non-key columns collide across sides: {sorted(clash)}")
    term1 = r_feed.join(
        s_new.select(*keys, *s_other), keys
    ).select(*keys, *r_other, *s_other, F.col("__sign"))
    term2 = (
        r_old.select(*keys, *r_other)
        .join(s_feed, keys)
        .select(*keys, *r_other, *s_other, F.col("__sign"))
    )
    return term1.unionByName(term2)
