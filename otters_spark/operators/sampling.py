"""Deterministic sampling & splitting for training-data pipelines.

Random sampling is the wrong tool for corpus curation at 100 TB:
re-running the pipeline must assign every document to the same split,
regardless of partitioning, cluster size, or row order. These
operators therefore hash CONTENT-STABLE keys (the md5→60-bit
convention from ``functions.text``, reproducible in ANSI SQL) instead
of using ``rand()``:

* :func:`hash_split` — train/val/test assignment by hashing the id:
  one narrow projection, no shuffle, stable under any re-run.
* :func:`hash_sample` — keep an approximate fraction of rows by hash
  bucket; deterministic, pushdown-friendly (the predicate is a plain
  comparison on a derived column).
* :func:`reservoir_per_group` — exactly-k rows per group, selected by
  hash rank (window over a shuffle sort — spillable, deterministic).

``rand(seed)``-based sampling (``df.sample``) remains the right tool
for one-off statistics; these are for pipeline lineage.
"""

from __future__ import annotations

import math

from typing import Sequence

from ..functions.scan import spread_small_scan
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.text import md5_long_expr

__all__ = [
    "hash_split",
    "leakage_safe_split",
    "hash_sample",
    "reservoir_per_group",
    "cap_per_group",
    "stratified_sample",
    "temperature_mix",
    "select_to_token_budget",
    "pack_sequences",
    "dsir_weights",
    "dsir_select",
    "weighted_sample",
    "poisson_bootstrap_ci",
    "POISSON1_CDF",
    "shuffle_shards",
    "epoch_mix",
    "write_training_shards",
]

#: bucket space for split/sample fractions (1e4 → 0.01% granularity)
_BUCKETS = 10_000


def _bucket(key_col) -> F.Column:
    return F.pmod(md5_long_expr(key_col), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket of ``key_col``.

    ``weights`` maps split name → fraction (must sum to ≤ 1; remainder
    falls into the LAST split). Assignment depends only on the key, so
    a document keeps its split across pipeline re-runs and dataset
    versions — the property that prevents train/test leakage when the
    corpus grows."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    expr = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name]
        cond = _bucket(F.col(key_col)) < F.lit(int(round(edge * _BUCKETS)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    out_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Train/val/test split at near-duplicate-CLUSTER granularity.

    :func:`hash_split` alone leaks: two near-duplicate documents hash
    to different buckets, one lands in train and its twin in test, and
    the eval set silently overlaps the training data (the benchmark
    contamination Lee et al. 2022 measure). Fix: cluster the near-dup
    ``pairs`` into connected components and bucket on the COMPONENT
    label instead of the document id — every member of a cluster lands
    in the SAME split by construction. Documents outside any pair are
    their own singleton component (``coalesce(component, id)``), so
    they split exactly as plain :func:`hash_split` would.

    Cost on top of hash_split: the connected-components shuffle over
    the PAIR table (pairs ≪ corpus for any sane threshold) plus one
    left join of corpus against the component labels — the bucket
    predicate itself stays a narrow projection. At 100 TB the join
    side is |docs-in-some-pair| rows, typically a few percent of the
    corpus, and broadcasts when small."""
    from .dedup import connected_components

    comps = connected_components(pairs, id_a, id_b).select(
        F.col("id").alias(key_col), F.col("component").alias("__component")
    )
    keyed = df.join(comps, key_col, "left").withColumn(
        "__skey", F.coalesce(F.col("__component"), F.col(key_col))
    )
    return hash_split(keyed, "__skey", weights, out_col).drop(
        "__skey", "__component"
    )


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by hash bucket of ``key_col``
    — deterministic and stable under re-runs (a kept row stays kept).
    The filter is a plain comparison, so it fuses into the scan stage."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_bucket(F.col(key_col)) < F.lit(int(round(fraction * _BUCKETS))))


def stratified_sample(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-group sampling rates in one narrow filter — the data-mixing
    primitive (DoReMi-style source reweighting): sample each source at
    its own rate to hit a target mixture. Zero shuffles, zero windows:
    the predicate is ``hash_bucket(key) < rate(group) * B``, fused into
    the scan stage, so remixing 100 TB is a map-only pass. Groups
    absent from ``fractions`` get ``default`` (0.0 = drop)."""
    for g, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1], got {frac}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default must be in [0, 1], got {default}")
    cut = None
    for g, frac in fractions.items():
        edge = F.lit(int(round(frac * _BUCKETS)))
        cut = (
            F.when(F.col(group_col) == g, edge)
            if cut is None
            else cut.when(F.col(group_col) == g, edge)
        )
    cut = (
        F.lit(int(round(default * _BUCKETS)))
        if cut is None
        else cut.otherwise(F.lit(int(round(default * _BUCKETS))))
    )
    return df.filter(_bucket(F.col(key_col)) < cut)


def select_to_token_budget(
    df: DataFrame,
    budget: F.Column | int,
    order_col: str,
    tokens_col: str,
    key_col: str = "doc_id",
    bins: int = 1000,
) -> DataFrame:
    """Keep the best rows by ``order_col`` (descending, ties broken by
    the key) until the cumulative ``tokens_col`` reaches ``budget`` —
    the "fill the training run with the highest-quality tokens" step.

    A naive global ``SUM OVER (ORDER BY quality)`` funnels the whole
    corpus through ONE partition. This is the exact two-phase form:

    1. bin rows by ``floor(order_col * bins)`` (order_col in [0, 1]);
       per-bin token sums are a tiny aggregate, and the running total
       across bins is a window over ≤ ``bins`` rows — constant-sized,
       single partition by construction, not by accident.
    2. broadcast the per-bin prior totals back; the within-bin running
       sum is a window PARTITIONED BY BIN (parallel, spillable, bounded
       by the largest bin, never the corpus).

    Equivalent to the global-sort cumsum because the bin id is a
    function of the ordering key, and exact because both frames are
    ROWS-based over the unique (order, key) order."""
    oc, tc = F.col(order_col), F.col(tokens_col)
    binned = df.withColumn("__bin", F.floor(oc * bins).cast("long"))
    per_bin = binned.groupBy("__bin").agg(F.sum(tc).alias("__bin_toks"))
    bin_w = (
        Window.orderBy(F.col("__bin").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    priors = per_bin.withColumn(
        "__prior", F.coalesce(F.sum("__bin_toks").over(bin_w), F.lit(0))
    ).select("__bin", "__prior")
    in_w = (
        Window.partitionBy("__bin")
        .orderBy(oc.desc(), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        binned.join(F.broadcast(priors), "__bin")
        .withColumn("__cum", F.col("__prior") + F.sum(tc).over(in_w))
        .filter(F.col("__cum") <= budget)
        .drop("__bin", "__prior", "__cum")
    )


def reservoir_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    k: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(k, group size) rows per group, selected by hash rank
    of ``key_col`` (ties broken by the key itself). The distributed
    analog of per-group reservoir sampling, made deterministic: the
    same k representatives come back on every run. One shuffle sort,
    spillable, no driver involvement."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = Window.partitionBy(*group_cols).orderBy(
        md5_long_expr(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    n_max: int,
    key_col: str = "doc_id",
    safety: float = 2.0,
) -> DataFrame:
    """At most ``n_max`` rows per group — the per-domain document cap
    of web-corpus curation (C4 / RefinedWeb style: a handful of giant
    domains would otherwise dominate the training mix).

    Same selection rule as :func:`reservoir_per_group` (the rows with
    the smallest content hashes win), but scale-hardened: reservoir's
    window partition is the WHOLE group, and at web scale one domain
    can be a double-digit percentage of the corpus — a single task.
    This form bounds every window partition first:

    1. per-group counts (count-only shuffle, |groups| rows,
       broadcast back — AQE picks the join strategy);
    2. keep rows whose normalized hash ``u = hkey / 2^60`` is below
       ``p = min(1, safety * n_max / count)`` — a scan-fused
       predicate; survivors per group concentrate to ~``safety *
       n_max`` expected rows;
    3. exact hash-rank window over the survivors only.

    With ``safety=2`` the chance a group yields fewer than ``n_max``
    survivors while having ≥ ``n_max`` rows is a Chernoff tail,
    ``P[Binom(c, 2m/c) < m] ≤ exp(-m/4)`` — negligible for any cap a
    curation pipeline uses (m=50 → 4e-6), and the failure mode is a
    slightly-under-full cap, never an over-cap. Groups at or under
    ``safety * n_max`` rows skip the prefilter entirely (p = 1).
    Deterministic given the corpus; NULL group keys are one group
    (null-safe join, window treats NULL as a value). A NULL ``key_col``
    hashes to 0 — it survives the prefilter and ranks first, mirroring
    reservoir_per_group's NULLS-FIRST ordering instead of silently
    dropping the row; like there, multiple NULL keys tie
    nondeterministically, so use a unique non-null id in practice.
    """
    if n_max <= 0:
        raise ValueError(f"n_max must be positive, got {n_max}")
    if safety < 1.0:
        raise ValueError(f"safety must be >= 1.0, got {safety}")
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__gc"))
    d, c = df.alias("__capd"), counts.alias("__capc")
    cond = None
    for g in group_cols:
        eq = F.col(f"__capd.{g}").eqNullSafe(F.col(f"__capc.{g}"))
        cond = eq if cond is None else (cond & eq)
    joined = d.join(c, cond).select("__capd.*", F.col("__capc.__gc"))
    p = F.least(F.lit(1.0), F.lit(float(safety) * n_max) / F.col("__gc"))
    surv = joined.withColumn(
        "__hkey", F.coalesce(md5_long_expr(F.col(key_col)), F.lit(0))
    ).filter(F.col("__hkey") / F.lit(float(1 << 60)) < p)
    w = Window.partitionBy(*group_cols).orderBy("__hkey", key_col)
    return (
        surv.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n_max)
        .drop("__rank", "__hkey", "__gc")
    )


def pack_sequences(
    df: DataFrame,
    ctx_len: int,
    tokens_col: str,
    order_col: str = "doc_id",
    key_col: str = "doc_id",
    bins: int = 1000,
) -> DataFrame:
    """Concat-then-chunk sequence packing: lay documents end to end in
    ``order_col`` order and cut the stream into fixed ``ctx_len``
    windows — the standard pre-training packing (documents may span
    window boundaries). Returns the input plus, per document:
    ``seq_start`` / ``seq_end`` (first/last window index the doc lands
    in), ``start_offset`` (position within the first window) and
    ``n_seqs``.

    The global running token total is computed with the same exact
    two-phase form as :func:`select_to_token_budget` — bin by a
    monotone function of the ordering key, tiny cross-bin prior
    window, parallel within-bin cumsum — so no task ever windows the
    whole corpus. ``order_col`` must be numeric and non-negative
    (document ids); ordering ties break on ``key_col``."""
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    oc, tc = F.col(order_col), F.col(tokens_col)
    mx = df.agg(F.max(oc).cast("double").alias("__mx"))
    binned = df.crossJoin(F.broadcast(mx)).withColumn(
        "__bin",
        F.floor(oc.cast("double") * bins / (F.col("__mx") + 1.0)).cast("long"),
    )
    per_bin = binned.groupBy("__bin").agg(F.sum(tc).alias("__bin_toks"))
    bin_w = Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, -1)
    priors = per_bin.withColumn(
        "__prior", F.coalesce(F.sum("__bin_toks").over(bin_w), F.lit(0))
    ).select("__bin", "__prior")
    in_w = (
        Window.partitionBy("__bin")
        .orderBy(oc, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.col("__prior") + F.coalesce(F.sum(tc).over(in_w), F.lit(0))
    start = F.floor(cum_before / ctx_len)
    end = F.when(
        tc > 0, F.floor((cum_before + tc - 1) / ctx_len)
    ).otherwise(start)
    return (
        binned.join(F.broadcast(priors), "__bin")
        .withColumn("__cb", cum_before)
        .withColumn("seq_start", start.cast("long"))
        .withColumn("seq_end", end.cast("long"))
        .withColumn("start_offset", (F.col("__cb") - F.col("seq_start") * ctx_len).cast("long"))
        .withColumn("n_seqs", (F.col("seq_end") - F.col("seq_start") + 1).cast("long"))
        .drop("__bin", "__prior", "__cb", "__mx")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    total: int | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source re-weighting with rates computed FROM
    the data (the standard pretraining mixture knob): target share of
    group g is n_g^alpha / Σ_h n_h^alpha (alpha < 1 flattens the
    mixture toward uniform, alpha = 1 keeps natural proportions), so
    the sampling rate is min(1, total·w_g / (Σw · n_g)). No
    upsampling: groups whose target exceeds their size cap at rate 1
    (repeat epochs upstream if small sources must be over-represented).

    Unlike :func:`stratified_sample` (caller supplies rates), the
    rates here derive from group counts — one tiny groupBy, a one-row
    broadcast of the weight sum, and a broadcast join back; the kept
    predicate stays the scan-fused deterministic hash bucket.

    Cross-engine determinism is engineered, not hoped for: weights
    snap to integer micro-units (round(n^alpha · 1e6)), so the weight
    SUM is exact integer arithmetic (float sums are
    addition-order-dependent — partial aggregation order would
    otherwise wobble rates by ULPs and flip rows near bucket edges),
    and the final rate is one division of exactly-representable
    integers. alpha = 0.5 uses sqrt (correctly rounded by IEEE 754 in
    every engine, unlike pow)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    n = F.col("__n").cast("double")
    w_expr = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(float(alpha)))
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    weighted = counts.select(
        group_col,
        "__n",
        F.round(w_expr * 1_000_000).cast("long").alias("__w"),
    )
    tot_cols = [F.sum("__w").alias("__sw")]
    if total is None:
        tot_cols.append(F.sum("__n").alias("__t"))
    totals = weighted.agg(*tot_cols)
    if total is not None:
        totals = totals.withColumn("__t", F.lit(int(total)))
    # cast each factor BEFORE multiplying: long*long overflows int64
    # (ANSI crash / silent wrap) once total*weight > 9.2e18 — a
    # single-group corpus of only ~3M rows at alpha=1. Double products
    # are exact below 2^53 and correctly rounded above it, and the
    # oracle multiplies in DOUBLE the same way, so determinism holds
    # at any scale.
    rates = weighted.crossJoin(F.broadcast(totals)).select(
        group_col,
        F.least(
            F.lit(1.0),
            (F.col("__t").cast("double") * F.col("__w").cast("double"))
            / (F.col("__sw").cast("double") * F.col("__n").cast("double")),
        ).alias("__rate"),
    )
    edge = F.round(F.col("__rate") * _BUCKETS).cast("long")
    # null-safe group equality: groupBy keeps a NULL group, so the
    # rates table has a NULL-keyed row — a plain equi-join would
    # silently drop every NULL-group input row (the advisor's
    # gap_fill/percentiles NULL-key class of bug)
    r = rates.withColumnRenamed(group_col, "__g")
    return (
        df.join(F.broadcast(r), F.col(group_col).eqNullSafe(F.col("__g")))
        .filter(_bucket(F.col(key_col)) < edge)
        .drop("__g", "__rate")
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

#: micro-units for log-weights: integer arithmetic makes per-doc sums
#: order-independent (the temperature_mix determinism discipline)
_MICRO = 1_000_000
#: u = (h+1)/2^60+1 lands strictly inside (0,1) for the Gumbel draw
_GUMBEL_DEN = float(2**60 + 1)


def _gumbel_micro(id_col) -> F.Column:
    """Content-keyed Gumbel draw in integer micro-units: ``u =
    (md5(id)+1)/(2^60+1)`` is a uniform strictly inside (0,1) — h spans
    [0, 2^60-1], so u ∈ [1/(2^60+1), 2^60/(2^60+1)] and neither log can
    hit 0 or ∞ — and ``round(-ln(-ln(u))·1e6)`` its micro-snapped Gumbel
    transform. Shared by :func:`dsir_select` (importance resampling) and
    :func:`weighted_sample` (Efraimidis–Spirakis): one definition so the
    hash convention and denominator can never silently diverge between
    the two samplers."""
    u = (md5_long_expr(F.col(id_col)) + 1).cast("double") / F.lit(_GUMBEL_DEN)
    return F.round(-F.log(-F.log(u)) * _MICRO).cast("long")


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document DSIR importance log-weights: how much more likely
    each corpus document is under the TARGET domain's hashed-unigram
    language model than under the raw corpus's.

    The paper's estimator, Spark-shaped: token features hash into
    ``n_buckets`` buckets (so both "models" are fixed-size count
    vectors no matter the corpus size); bucket b gets log-ratio
    ``ln(p_target(b)) - ln(p_raw(b))`` with add-``smoothing`` Laplace
    estimates; a document's weight is the sum of its tokens' bucket
    ratios. Returns one row per corpus doc with tokens:
    ``(id_col, logw_micro)``; docs with NULL/empty text have no token
    stream and thus no row.

    Scale shape: two token-stream aggregations (bounded at
    ``n_buckets`` cells each — algebraic, map-side combined), a
    broadcast of the ≤ n_buckets log-ratio table, and one per-doc sum
    with map-side combine; nothing corpus-wide ever sits in one task.

    Determinism: the log-ratio is computed ONCE per bucket from
    identical integer counts and snapped to integer micro-units, so
    the per-doc sum is exact int64 arithmetic — partial-aggregation
    order cannot wobble a weight (see :func:`temperature_mix`)."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (unsmoothed ratios divide by zero)")

    def _stream(df: DataFrame, with_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if with_id else []
        toks = df.select(
            *cols, F.explode(F.split(F.col(text_col), " ")).alias("__tok")
        ).filter(F.col("__tok") != "")
        return toks.select(
            *cols, F.pmod(md5_long_expr(F.col("__tok")), F.lit(n_buckets)).alias("__b")
        )

    raw = _stream(corpus, with_id=True)
    tgt = _stream(target, with_id=False)
    rc = raw.groupBy("__b").agg(F.count(F.lit(1)).alias("__nr"))
    tc = tgt.groupBy("__b").agg(F.count(F.lit(1)).alias("__nt"))
    nr_tot = raw.agg(F.count(F.lit(1)).alias("__totr"))
    nt_tot = tgt.agg(F.count(F.lit(1)).alias("__tott"))
    a = float(smoothing)
    denom_pad = F.lit(a * n_buckets)
    counts = rc.join(tc, "__b", "full").select(
        "__b",
        F.coalesce("__nr", F.lit(0)).alias("__nr"),
        F.coalesce("__nt", F.lit(0)).alias("__nt"),
    )
    lr = (
        counts.crossJoin(F.broadcast(nr_tot))
        .crossJoin(F.broadcast(nt_tot))
        .select(
            "__b",
            F.round(
                (
                    F.log((F.col("__nt") + F.lit(a)) / (F.col("__tott") + denom_pad))
                    - F.log((F.col("__nr") + F.lit(a)) / (F.col("__totr") + denom_pad))
                )
                * _MICRO
            )
            .cast("long")
            .alias("__lrm"),
        )
    )
    return (
        raw.join(F.broadcast(lr), "__b")
        .groupBy(id_col)
        .agg(F.sum("__lrm").alias("logw_micro"))
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    n_take: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    smoothing: float = 0.5,
) -> DataFrame:
    """Gumbel-top-k importance RESAMPLING over :func:`dsir_weights` —
    the paper's sampling step, not a plain argmax: adding independent
    Gumbel noise to each log-weight and keeping the top ``n_take``
    draws a sample WITHOUT replacement from the softmax of the
    weights, so near-target docs are favored but not deterministically
    cloned from one narrow mode.

    The Gumbel draw is pipeline-stable (re-runs keep the same docs):
    ``u = (md5(id)+1) / (2^60+1)`` is a content-keyed uniform in (0,1)
    and ``g = -ln(-ln(u))`` its Gumbel transform, snapped to
    micro-units; selection key = ``logw_micro + gumbel_micro``, an
    exact int64, tie-broken by id. The top-k is a
    TakeOrderedAndProject, never a global sort. Returns the selected
    corpus rows plus ``logw_micro`` and ``select_key``."""
    if n_take <= 0:
        raise ValueError("n_take must be positive")
    w = dsir_weights(corpus, target, text_col, id_col, n_buckets, smoothing)
    keyed = w.select(
        id_col,
        "logw_micro",
        (F.col("logw_micro") + _gumbel_micro(id_col)).alias("select_key"),
    )
    return (
        corpus.join(keyed, id_col)
        .orderBy(F.desc("select_key"), F.col(id_col))
        .limit(n_take)
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n_take: int,
    id_col: str = "doc_id",
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: ``n_take`` rows drawn
    with probability proportional to ``weight_col`` — globally, or per
    group when ``group_cols`` is given. The quality-weighted
    subsampling step of corpus curation (keep 100k docs favoring high
    quality scores, without deterministically clipping to the top —
    which overfits the scorer and collapses diversity).

    Efraimidis–Spirakis via Gumbel keys, in the suite's deterministic
    discipline: ``g = -ln(-ln(u))`` with the content-keyed uniform
    ``u = (md5(id)+1)/(2^60+1)`` (pipeline-stable: re-runs keep the
    same rows), and selection key ``= round(ln(w)·1e6) + round(g·1e6)``
    — exact int64 so partial-aggregation order cannot wobble a
    boundary, tie-broken by id. Keeping the top-``n_take`` such keys
    draws a Gumbel-top-k sample ∝ softmax(ln w) = w, the same device
    :func:`dsir_select` uses for importance resampling.

    Rows with NULL or non-positive weight are excluded (zero mass —
    they can never be drawn; ln would be undefined).

    Scale shape: the key is one scan-fused projection; the global form
    is a TakeOrderedAndProject (never a full sort), the grouped form
    one rank window per group. A group's window partition is the whole
    group — acceptable for the mixture-weight group counts this is
    for; if a group can be a double-digit corpus share, bound it first
    with the :func:`cap_per_group` prefilter device (threshold on u
    from a broadcast per-group count, then rank survivors)."""
    if n_take <= 0:
        raise ValueError("n_take must be positive")
    w = F.col(weight_col).cast("double")
    lnw = F.round(F.log(w) * _MICRO).cast("long")
    keyed = df.filter(w.isNotNull() & (w > 0)).withColumn(
        "select_key", lnw + _gumbel_micro(id_col)
    )
    if not group_cols:
        return keyed.orderBy(F.desc("select_key"), F.col(id_col)).limit(n_take)
    rank_w = Window.partitionBy(*group_cols).orderBy(
        F.desc("select_key"), F.col(id_col)
    )
    return (
        keyed.withColumn("__rk", F.row_number().over(rank_w))
        .filter(F.col("__rk") <= n_take)
        .drop("__rk")
    )


#: cumulative Poisson(1) CDF, k = 0..7 — the per-row replica counts of
#: the one-pass bootstrap. Full-precision repr literals so the DuckDB
#: twin parses the IDENTICAL doubles (the mmr_rerank literal
#: discipline); tail mass beyond k=8 is ~1.1e-7, folded into k=8.
POISSON1_CDF: tuple[float, ...] = tuple(
    math.fsum(math.exp(-1.0) / math.factorial(i) for i in range(k + 1))
    for k in range(8)
)


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    group_cols: Sequence[str] = (),
    n_boot: int = 40,
    alpha: float = 0.05,
    round_to: int = 6,
) -> DataFrame:
    """One-pass Poisson bootstrap confidence intervals for a per-group
    MEAN of an integer measure — uncertainty quantification that works
    at corpus scale (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012): instead of materializing B
    resamples, each row draws a Poisson(1) replica count per bootstrap
    replicate b — the large-n limit of the multinomial resample — so
    ALL B replicate statistics come from ONE scan: explode b=0..B-1
    (scan-fused, no shuffle), weight by k, and partial-aggregate
    ``(sum(k·x), sum(k))`` per (group, b). The shuffle carries
    |groups|·B rows per task; the CI step sorts B numbers per group.

    Fully deterministic, the suite's sampling discipline: the replica
    count k is driven by the content-keyed uniform ``u = (md5(id ':'
    b)+1)/(2^60+1)`` pushed through the exact Poisson(1) CDF cutoffs
    (:data:`POISSON1_CDF`) — reruns and engines agree bit-for-bit, and
    replicate means are ratios of exact longs. CI bounds are ORDER
    STATISTICS of the replicate means (percentile bootstrap): lo =
    element ``floor(alpha/2·m)+1``, hi = element ``m-floor(alpha/2·m)``
    of the sorted list (m = replicates with any mass; empty replicas —
    possible for tiny groups — are excluded, not imputed as 0).

    ``value_col`` must be integral (cents/chars/count discipline —
    exact sums); a fractional type raises rather than silently losing
    the exactness contract. With the default B=40 and alpha=0.05 the
    bounds are the 2nd and 39th order statistics — bump ``n_boot`` for
    tighter quantile resolution.

    Returns one row per group: ``group_cols..., n, mean, lo, hi``.

    The reference engine has no sampling/statistics surface
    (``/root/reference/src/meta.rs``); extension lane for corpus
    reporting, oracle-checked against the identical algebra in
    DuckDB."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if n_boot < 4:
        raise ValueError(f"n_boot must be >= 4, got {n_boot}")
    dtype = dict(df.dtypes).get(value_col)
    if dtype not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise ValueError(
            f"poisson_bootstrap_ci: {value_col!r} must be integral "
            f"(got {dtype}) — snap to cents/micro units upstream"
        )
    groups = list(group_cols)
    # round 11: the B-way explode + md5-per-(row, replicate) chain is
    # per-row-heavy; widen a narrow scan first (guide §2.5, no-op at
    # scale) — measured 2.3 -> 0.9 s at sf0.1 on one-row-group input
    base = spread_small_scan(df).filter(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    )
    cdf = F.array(*[F.lit(c) for c in POISSON1_CDF])
    u = (
        md5_long_expr(
            F.concat(
                F.col(id_col).cast("string"), F.lit(":"), F.col("__b").cast("string")
            )
        )
        + 1
    ).cast("double") / F.lit(_GUMBEL_DEN)
    reps = (
        base.withColumn(
            "__b", F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1)))
        )
        .withColumn("__k", F.size(F.filter(cdf, lambda c: u > c)))
        .groupBy(*groups, "__b")
        .agg(
            # cast-before-accumulate: k×value products are per-doc
            # bounded but the per-(group, replicate) sum is
            # corpus-scale — long partials wrap past 2^63 while the
            # oracle's hugeint sums stay exact
            F.sum(
                F.col("__k").cast("decimal(38,0)") * F.col(value_col)
            ).alias("__num"),
            # __den stays a plain long sum on purpose: __k is a
            # Poisson(1) draw (max(k) is tiny), so the per-(group,
            # replicate) count sum is bounded by ~n*max(k) << 2^63 —
            # unlike __num, whose k*value products are corpus-scale.
            F.sum("__k").alias("__den"),
        )
        .withColumn(
            "__mean",
            F.when(
                F.col("__den") > 0,
                F.col("__num").cast("double") / F.col("__den"),
            ),
        )
    )
    lo_pos = lambda m: F.floor(F.lit(alpha / 2.0) * m).cast("int") + 1  # noqa: E731
    ci = reps.groupBy(*groups).agg(
        F.array_sort(F.collect_list("__mean")).alias("__arr")
    )
    m = F.size("__arr")
    ci = ci.select(
        *groups,
        F.round(F.element_at("__arr", lo_pos(m)), round_to).alias("lo"),
        F.round(F.element_at("__arr", m - lo_pos(m) + 1), round_to).alias("hi"),
    )
    point = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)),
            round_to,
        ).alias("mean"),
    )
    joined = point.join(ci, groups) if groups else point.crossJoin(ci)
    return joined.select(*groups, "n", "mean", "lo", "hi")


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    bins: int = 1024,
    shard_col: str = "shard_id",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic global shuffle + exactly-balanced shard
    assignment — the terminal stage of a training-data pipeline, where
    the curated corpus is permuted (so each training batch is an i.i.d.
    mix of sources) and cut into a fixed number of shard files.

    The permutation is the md5-hash order of ``key_col`` (content
    stable: the same corpus always shuffles identically, regardless of
    cluster size or input partitioning). The global position in that
    order is computed with the exact two-phase binned form — NEVER a
    global ``ROW_NUMBER`` window, which funnels 100 TB through one
    task:

    1. bin rows by the TOP bits of the 60-bit hash
       (``shiftright(hkey, 60 - log2(bins))`` — exact integer math,
       monotone in the hash, so bin order == hash order); per-bin
       counts are a tiny aggregate and the running prior across bins
       is a window over ≤ ``bins`` rows.
    2. broadcast the priors back; the within-bin rank is a window
       PARTITIONED BY BIN (parallel, spillable, bounded by the largest
       bin ≈ N/bins rows, never the corpus).

    Shards are assigned round-robin over the permuted order
    (``shard = idx mod n_shards``), which is exactly balanced (sizes
    differ by ≤ 1) WITHOUT knowing the corpus size N — a contiguous
    block split (``floor(idx * n_shards / N)``) would need an extra
    count pass for no balance gain. ``pos_col`` is the row's offset
    within its shard, so ``sortWithinPartitions(pos_col)`` after a
    ``repartition(n_shards, shard_col)`` reproduces the exact global
    permutation order shard by shard.

    Hash ties (astronomically unlikely at 60 bits) break on the key
    itself, keeping the permutation a total order. NULL keys hash to
    NULL and drop out of the permutation — the module-wide convention
    (hash_split/hash_sample behave the same way): a NULL id is not a
    content-stable identity; assign real keys upstream."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if bins & (bins - 1) or bins <= 0:
        raise ValueError(f"bins must be a power of two, got {bins}")
    shift = 60 - (bins.bit_length() - 1)
    # NULL keys drop BEFORE binning: md5(NULL) is NULL, and a NULL
    # __sbin would count into the priors while failing the equi-join —
    # offsetting every real row's global index by the NULL count
    binned = (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("__hkey", md5_long_expr(F.col(key_col)))
        .withColumn("__sbin", F.shiftright(F.col("__hkey"), shift))
    )
    per_bin = binned.groupBy("__sbin").agg(F.count(F.lit(1)).alias("__n"))
    bin_w = Window.orderBy("__sbin").rowsBetween(Window.unboundedPreceding, -1)
    priors = per_bin.withColumn(
        "__prior", F.coalesce(F.sum("__n").over(bin_w), F.lit(0))
    ).select("__sbin", "__prior")
    in_w = Window.partitionBy("__sbin").orderBy("__hkey", key_col)
    idx = (F.col("__prior") + F.row_number().over(in_w) - 1).alias("__idx")
    return (
        binned.join(F.broadcast(priors), "__sbin")
        .select("*", idx)
        .withColumn(shard_col, F.pmod(F.col("__idx"), F.lit(n_shards)))
        .withColumn(pos_col, F.floor(F.col("__idx") / n_shards).cast("long"))
        .drop("__hkey", "__sbin", "__prior", "__idx")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    fmt: str = "parquet",
    bins: int = 1024,
) -> None:
    """Materialize :func:`shuffle_shards` as one directory per shard
    (``shard_id=K/``), each file internally sorted by the permutation
    position — the layout a data loader consumes sequentially.
    ``repartition(n_shards, shard_col)`` co-locates each shard in one
    task so every shard writes exactly one file in permutation order;
    at 100 TB raise ``n_shards`` (shards are the parallelism unit) —
    a trainer wants many more shards than executors anyway."""
    sharded = shuffle_shards(df, n_shards, key_col=key_col, bins=bins)
    (
        sharded.repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_pos")
        .write.format(fmt)
        .partitionBy("shard_id")
        .mode("overwrite")
        .save(path)
    )


def epoch_mix(
    df: DataFrame,
    rates: dict,
    group_col: str = "source",
    key_col: str = "doc_id",
    default: float = 1.0,
    copy_col: str = "copy_id",
) -> DataFrame:
    """Fractional epoch replication — the UPSAMPLING half of data
    mixing (stratified_sample/temperature_mix can only keep ≤ 1 copy):
    a source at rate 2.3 contributes every document twice plus a
    content-stable 30% of documents a third time, i.e. the corpus is
    mixed at fractional epochs per source (the Pile/DoReMi recipe).

    ``n_copies = floor(rate) + [hash_bucket(key) < frac·B]`` — the
    fractional tail reuses the module's hash-bucket convention, so
    re-runs replicate exactly the same documents, and a rate below 1
    degrades to deterministic downsampling (0 or 1 copies). Rows
    replicate via ``explode(sequence(...))`` — pure codegen fan-out in
    the scan stage, no shuffle, no Python. ``copy_col`` (1-based)
    distinguishes replicas; include it in downstream shuffle keys
    (e.g. shuffle_shards over ``(key, copy_id)``) so copies spread
    across shards instead of colliding on the same hash."""
    if default < 0 or any(r < 0 for r in rates.values()):
        raise ValueError("rates must be non-negative")

    def _n_copies(rate_col_whole, rate_col_fracb):
        extra = F.when(
            _bucket(F.col(key_col)) < rate_col_fracb, F.lit(1)
        ).otherwise(F.lit(0))
        return rate_col_whole + extra

    whole = None
    fracb = None
    for g, r in rates.items():
        w, fb = int(r), int(round((r - int(r)) * _BUCKETS))
        cond = F.col(group_col) == g
        whole = F.when(cond, w) if whole is None else whole.when(cond, w)
        fracb = F.when(cond, fb) if fracb is None else fracb.when(cond, fb)
    dw, dfb = int(default), int(round((default - int(default)) * _BUCKETS))
    whole = F.lit(dw) if whole is None else whole.otherwise(F.lit(dw))
    fracb = F.lit(dfb) if fracb is None else fracb.otherwise(F.lit(dfb))

    n = _n_copies(whole, fracb)
    copies = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(copy_col, F.explode(copies))
