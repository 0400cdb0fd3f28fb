"""Mergeable distinct-count sketches: KMV (K-minimum-values) and
HyperLogLog.

Why sketches at all: the engine already answers ``count(distinct x)``
exactly (``rel_distinct_aggregates``), but an exact distinct is a
full shuffle of every distinct value. At 100 TB — distinct URLs,
users, tokens per partition/day/source — the exact answer costs a
corpus-wide exchange, while a sketch is an **algebraic aggregate**:
per-partition partial state (k smallest hashes / 256 max-rank
registers) merges associatively, so Spark's map-side partial
aggregation bounds shuffle traffic at O(groups x sketch_size)
regardless of data volume, and daily sketches roll up into monthly
ones without touching the raw data again. That mergeability is the
whole point; both sketches here expose an explicit ``*_merge`` to
prove it (tested: merged == direct in tests/test_sketches.py).

Reference scope note: the reference has no approximate aggregates
(its surface is exact vector search, SURVEY.md §2.2 "Aggregations:
REF none user-facing") — this is extension surface for the
100 TB curation lane, same category as dedup/sampling.

Determinism/oracle story: hashes are the repo-standard 60-bit md5
draw (functions/text.py: bit-identical in DuckDB), and every floating
step either happens in exact integer space (register sums as
decimal(38,0) vs HUGEINT — dyadic 2^-rank terms scaled by 2^RMAX so
partial-aggregation ORDER cannot change the sum) or is a single
final division/log on identical doubles. Spark's builtin
``approx_count_distinct`` (also HLL) stays the production
convenience; this module exists where cross-engine reproducibility
and explicit sketch persistence/merge matter.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import md5_long_expr

__all__ = [
    "kmv_sketch",
    "kmv_merge",
    "kmv_estimate",
    "kmv_pairwise",
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_alpha",
    "cms_table",
    "cms_merge",
    "cms_lookup",
    "hist_sketch",
    "hist_merge",
    "hist_quantiles",
    "ams_sketch",
    "ams_f2_estimate",
    "ams_join_size_estimate",
]

#: the md5 draw is 15 hex nibbles = 60 uniform bits in [0, 2^60)
_HASH_BITS = 60
_HASH_SPACE = float(2**_HASH_BITS)


# --------------------------------------------------------------------------
# KMV — K minimum values (Bar-Yossef et al. 2002, the "bottom-k" sketch)
# --------------------------------------------------------------------------

def _k_smallest(col: str, k: int) -> Column:
    return F.slice(F.array_sort(F.collect_set(col)), 1, k)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    k: int = 64,
) -> DataFrame:
    """Per-group bottom-k sketch: the ``k`` smallest distinct 60-bit
    hashes of ``value_col``, as a sorted ``array<bigint>`` column
    ``kmv``.

    Two-phase by construction: phase 1 keeps the k smallest distinct
    hashes per (group, input partition) — valid because each of the
    global k minima is necessarily among the k minima of its own
    partition — so the final per-group merge sees at most
    (partitions x k) values, never the full distinct set. collect_set
    state in phase 1 is bounded by the distinct hashes of ONE input
    partition (~row count of a 128 MB split), the same bound every
    hash aggregation in this repo lives with."""
    if k < 2:
        raise ValueError("kmv requires k >= 2 (the estimator uses the k-th order statistic)")
    gcols = list(group_cols)
    hashed = df.select(*gcols, md5_long_expr(F.col(value_col)).alias("__h"))
    partial = hashed.groupBy(*gcols, F.spark_partition_id().alias("__p")).agg(
        _k_smallest("__h", k).alias("__mins")
    )
    return (
        partial.select(*gcols, F.explode("__mins").alias("__h"))
        .groupBy(*gcols)
        .agg(_k_smallest("__h", k).alias("kmv"))
    )


def kmv_merge(
    sketches: DataFrame,
    group_cols: Sequence[str] = (),
    k: int = 64,
) -> DataFrame:
    """Merge KMV sketches (column ``kmv``) down to one sketch per
    group: union of the hash sets, keep the k smallest. Exactly the
    rollup operation — day sketches -> month sketch with no re-scan."""
    gcols = list(group_cols)
    return (
        sketches.select(*gcols, F.explode("kmv").alias("__h"))
        .groupBy(*gcols)
        .agg(_k_smallest("__h", k).alias("kmv"))
    )


def kmv_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Add ``n_sketch`` (values retained) and ``est_distinct``: exact
    count while the sketch is unsaturated (< k distinct hashes seen),
    else the order-statistic estimator (k-1) / U_(k) with
    U_(k) = h_(k) / 2^60 — one double division, so the number is
    bit-reproducible in any engine that computed the same hashes."""
    n = F.size("kmv")
    kth = F.element_at("kmv", k).cast("double")
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / kth
    )
    return sketches.withColumn("n_sketch", n).withColumn("est_distinct", est)


def kmv_pairwise(
    sketches: DataFrame,
    group_col: str,
    k: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise SET-OPERATION estimates between per-group KMV sketches
    — the theta-sketch use of bottom-k (Beyer et al. 2007): estimate
    |A∩B|, |A∪B|, and Jaccard between every pair of groups FROM THE
    SKETCHES ALONE, no raw-data re-scan. "How much vocabulary do these
    two sources share" over a 100 TB corpus becomes arithmetic over
    two k-length arrays.

    Estimator: merge the two sketches to the union's bottom-k sample
    S with threshold θ = the k-th smallest union hash. The common
    hashes ≤ θ are exactly A∩B∩S, a uniform k-sample of the union, so
    ``jaccard ≈ |A∩B∩S| / k`` and ``inter ≈ jaccard · union_est``
    with ``union_est`` the usual (k-1)/U_(k) order-statistic. While
    the union is UNSATURATED (< k distinct hashes) the sketches see
    every element, so all three numbers are exact. One double
    division per output row — bit-reproducible in any engine that
    computed the same hashes (DuckDB twin in the suite).

    Scale shape: the sketch table is |groups| rows of k int64s; the
    pair join is |groups|² over that TINY table (broadcast), and all
    array arithmetic is codegen. Output one row per unordered pair
    (g_a < g_b)."""
    a = sketches.select(
        F.col(group_col).alias("g_a"), F.col("kmv").alias("__ka")
    )
    b = sketches.select(
        F.col(group_col).alias("g_b"), F.col("kmv").alias("__kb")
    )
    pairs = a.join(F.broadcast(b), F.col("g_a") < F.col("g_b"))
    merged = F.slice(
        F.array_sort(F.array_union(F.col("__ka"), F.col("__kb"))), 1, k
    )
    common = F.array_sort(F.array_intersect(F.col("__ka"), F.col("__kb")))
    n_m = F.size(merged)
    theta_h = F.element_at(merged, k).cast("double")
    c_sat = F.size(F.filter(common, lambda h: h.cast("double") <= theta_h))
    union_sat = F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / theta_h
    jacc_sat = c_sat.cast("double") / F.lit(float(k))
    out = pairs.select(
        "g_a",
        "g_b",
        F.when(n_m < k, n_m.cast("double"))
        .otherwise(F.round(union_sat, round_to))
        .alias("est_union"),
        F.when(n_m < k, F.size(common).cast("double"))
        .otherwise(F.round(jacc_sat * union_sat, round_to))
        .alias("est_intersect"),
        F.when(n_m < k, F.size(common).cast("double") / n_m)
        .otherwise(jacc_sat)
        .alias("__j"),
    )
    return out.withColumn("est_jaccard", F.round(F.col("__j"), round_to)).drop(
        "__j"
    )


# --------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007), deterministic cross-engine variant
# --------------------------------------------------------------------------

def hll_alpha(p: int) -> float:
    """Bias-correction constant for m = 2^p registers (the paper's
    alpha_m; exact small-m constants below 128)."""
    m = 1 << p
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hll_rank(w: Column, wbits: int) -> Column:
    # position of the leftmost 1-bit in a wbits-wide field, 1-based;
    # w == 0 -> wbits + 1. length(bin(w)) = floor(log2 w) + 1 in both
    # Spark and DuckDB, which makes this expressible without loops.
    return (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
        .cast("int")
    )


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register table: ``register`` (top-p hash bits,
    absent registers simply have no row) and ``max_rank`` (max
    leftmost-1-bit position over the remaining 60-p bits). The
    register table IS the sketch: groupBy(...).max() makes it
    algebraic/mergeable, and as integers it is bit-exact in any
    engine — estimation floats happen only in hll_estimate."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    wbits = _HASH_BITS - p
    gcols = list(group_cols)
    h = md5_long_expr(F.col(value_col))
    reg = F.shiftright(h, wbits).alias("register")
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    return (
        df.select(*gcols, reg, _hll_rank(w, wbits).alias("__rank"))
        .groupBy(*gcols, "register")
        .agg(F.max("__rank").alias("max_rank"))
    )


def hll_merge(registers: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge register tables: per (group, register) max of max_rank."""
    gcols = list(group_cols)
    return registers.groupBy(*gcols, "register").agg(
        F.max("max_rank").alias("max_rank")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Estimate distinct count per group from a register table:
    ``registers_nonzero`` and ``est_distinct``.

    Cross-engine float discipline: sum(2^-rank) is computed as the
    EXACT integer sum(2^(RMAX-rank)) in decimal(38,0) (DuckDB twin:
    HUGEINT) — dyadic terms, so partial-aggregation order can't
    perturb it — plus 2^RMAX per absent register; the estimate is then
    ONE precomputed-literal division. Small-range (linear counting)
    correction applies below 2.5m when empty registers remain, per
    the paper."""
    m = 1 << p
    wbits = _HASH_BITS - p
    rmax = wbits + 1
    alpha = hll_alpha(p)
    # alpha * m^2 * 2^RMAX, precomputed in Python so both engines
    # divide the identical double literal by the identical exact sum
    numer = alpha * float(m) * float(m) * float(2**rmax)
    gcols = list(group_cols)
    agg = registers.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("registers_nonzero"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(rmax) - F.col("max_rank")).cast("decimal(38,0)")
        ).alias("__s_present"),
    )
    zeros = F.lit(m) - F.col("registers_nonzero")
    s_total = (
        F.col("__s_present")
        + zeros.cast("decimal(38,0)") * F.lit(float(2**rmax)).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(numer) / s_total
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)
    return agg.select(
        *gcols, "registers_nonzero", est.alias("est_distinct")
    )


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency estimation
# --------------------------------------------------------------------------

def _cms_bucket(h: Column, depth_idx: int, width: int) -> Column:
    """Bucket of hash ``h`` under depth row ``depth_idx``: the repo's
    xor-shift permutation family (multiplication-free so DuckDB can
    reproduce it — int64 overflow errors there) folded mod width."""
    from ..functions.text import MINHASH_PERM_CONSTANTS, _perm_mix

    return F.pmod(_perm_mix(h, MINHASH_PERM_CONSTANTS[depth_idx]), F.lit(width))


def cms_table(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Per-group Count-Min sketch as a table: one row per
    (group, ``d`` in [0, depth), ``bucket`` in [0, width)) carrying
    ``cnt`` — how many input rows hashed into that cell. Estimates
    overcount (collisions only ever add), never undercount; error is
    bounded by ~2N/width with probability 1 - 2^-depth.

    Frequency semantics: every input ROW counts, so feed exploded
    tokens for term frequencies (don't dedup first).

    Algebraic/mergeable like the HLL register table: the depth-fold
    explode multiplies rows x depth *before* the exchange, but
    map-side partial aggregation collapses each task's contribution
    to at most groups x depth x width cells, so shuffle traffic is
    bounded by sketch size regardless of input volume — the same
    shuffle contract as ``hll_registers``. Cell counts are exact
    integers, so the sketch (and any estimate read off it) is
    bit-identical cross-engine."""
    if depth < 1:
        raise ValueError("depth must be >= 1")
    from ..functions.text import MINHASH_PERM_CONSTANTS

    if depth > len(MINHASH_PERM_CONSTANTS):
        raise ValueError(f"depth max {len(MINHASH_PERM_CONSTANTS)}")
    if width < 2:
        raise ValueError("width must be >= 2")
    gcols = list(group_cols)
    # hash ONCE per row in its own select; only the cheap xor-shift mix
    # fans out across depth rows (the md5 re-inline trap — see
    # functions/text.token_hashes_expr and the plan audit's md5 cap)
    hashed = df.select(*gcols, md5_long_expr(F.col(value_col)).alias("__h"))
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                _cms_bucket(F.col("__h"), d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        hashed.select(*gcols, F.explode(cells).alias("__c"))
        .select(*gcols, "__c.d", "__c.bucket")
        .groupBy(*gcols, "d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketches: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge CMS tables: per (group, d, bucket) sum of cnt — union of
    the underlying streams, exactly (cell counts are linear)."""
    gcols = list(group_cols)
    return sketches.groupBy(*gcols, "d", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for every row of ``items``: adds
    ``est_n`` = min over the depth rows of the item's cell count
    (0 if the item's cells were never touched). ``depth``/``width``
    must match the build.

    The sketch side of the join is at most groups x depth x width
    rows — broadcast it; the probe stays a map-side scan of ``items``
    however large the item set is. Heavy-hitter readout at scale =
    probe the distinct-values table and keep ``est_n >= phi * N``
    (CMS guarantees no false negatives at the gate; the suite query
    demonstrates the false-positive side staying bit-exact too)."""
    gcols = list(group_cols)
    keep = [c for c in items.columns]
    # same hash-once-then-fan-out discipline as cms_table
    hashed = items.select("*", md5_long_expr(F.col(value_col)).alias("__h"))
    probes = hashed.select(
        *keep,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(F.col("__h"), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__c"),
    ).select(*keep, "__c.d", "__c.bucket")
    joined = probes.join(F.broadcast(sketch), gcols + ["d", "bucket"], "left")
    return (
        joined.groupBy(*keep)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_n"))
    )


# --------------------------------------------------------------------------
# Fixed-range histogram sketch — mergeable quantiles
# --------------------------------------------------------------------------

def hist_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 512,
) -> DataFrame:
    """Per-group fixed-range histogram: one row per (group, ``bin``)
    with ``cnt`` — the quantile member of the mergeable-sketch trio
    (KMV/HLL = distinct, CMS = frequency, this = distribution). The
    caller supplies the value range [lo, hi); values outside clamp to
    the edge bins, NULL values are skipped, and the bin id is pure
    codegen arithmetic.

    vs the EXACT binned percentiles in ``operators.stats`` (same
    binning trick, but a second pass ranks within bins): this keeps
    ONLY the bin counts, so day sketches roll up into month sketches
    with ``hist_merge`` and stream state stays at ``bins`` integers
    per group — the algebraic-aggregate contract of every sketch in
    this module. Resolution is the price: quantiles interpolate
    within a bin (error ≤ bin width)."""
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    gcols = list(group_cols)
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) * F.lit(bins / (hi - lo))).cast("long")
    b = F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw))
    return (
        df.filter(v.isNotNull())
        .select(*gcols, b.alias("bin"))
        .groupBy(*gcols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(sketches: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge histogram sketches: per (group, bin) sum — the union of
    the underlying streams, exactly (counts are linear)."""
    gcols = list(group_cols)
    return sketches.groupBy(*gcols, "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    qs: Sequence[float],
    group_cols: Sequence[str] = (),
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 512,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: per group, columns
    ``n`` and ``q_<q>`` for each requested quantile.

    Estimator: find the first bin whose cumulative count reaches
    q·n, then interpolate linearly inside it —
    ``lo + (bin + (q·n - cum_before) / cnt) · width``. Every input to
    the float math is an exact integer (bin ids, counts) or a Python
    literal, computed once per group — no float ever crosses an
    aggregation, so estimates reproduce bit-for-bit cross-engine.
    The cumulative scan is a window over ≤ ``bins`` rows per group
    (constant-sized by construction, like the binned-cumsum lanes in
    ``operators.sampling``)."""
    for q in qs:
        if not 0.0 < q < 1.0:
            raise ValueError(f"quantiles must be in (0, 1), got {q}")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    gcols = list(group_cols)
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*[F.col(c) for c in gcols])
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    width = (hi - lo) / bins
    cum = sketch.select(
        *gcols,
        "bin",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("__before"),
    )
    totals = cum.groupBy(*gcols).agg(F.sum("cnt").alias("n"))
    t = totals.withColumnsRenamed({c: f"__g_{c}" for c in gcols}) if gcols else totals
    if gcols:
        cond = F.lit(True)
        for c in gcols:
            cond = cond & F.col(c).eqNullSafe(F.col(f"__g_{c}"))
        joined = cum.join(F.broadcast(t), cond).drop(*[f"__g_{c}" for c in gcols])
    else:
        joined = cum.crossJoin(F.broadcast(t))
    aggs = [F.first("n").alias("n")]
    for q in qs:
        target = F.lit(float(q)) * F.col("n").cast("double")
        inside = (
            F.col("__before").cast("double") < target
        ) & (target <= (F.col("__before") + F.col("cnt")).cast("double"))
        frac = (target - F.col("__before").cast("double")) / F.col("cnt").cast("double")
        est = F.lit(float(lo)) + (F.col("bin").cast("double") + frac) * F.lit(width)
        name = f"q_{str(q).replace('.', '_')}"
        aggs.append(F.min(F.when(inside, est)).alias(name))
    return joined.groupBy(*gcols).agg(*aggs)


# --------------------------------------------------------------------------
# AMS sign sketch (Alon, Matias & Szegedy 1996) — F2 / join-size estimation
# --------------------------------------------------------------------------


def _ams_sign(h: Column, counter_idx: int) -> Column:
    """±1 sign of hash ``h`` under counter ``counter_idx``: bit ``i``
    of the 60-bit md5 draw. Distinct md5 bits are independent across
    counters AND across keys — which an xor-shift-mixed bit is NOT:
    any XOR-linear mix makes ``sign_i(k) = L(hv_k) XOR f(c_i)``, i.e.
    every counter the same sign pattern up to a global flip, all |z_i|
    equal, and the median-of-means estimate degenerate (observed:
    relative error ~1.0). Heuristic vs the textbook 4-wise family, but
    genuinely decorrelated, and trivially reproduced in DuckDB as
    ``(hv >> i) & 1``."""
    bit = F.shiftright(h, counter_idx).bitwiseAND(F.lit(1))
    return (bit * 2 - 1).cast("long")


def ams_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    n_counters: int = 32,
) -> DataFrame:
    """Per-group AMS sketch: one row per (group, counter ``i`` in
    [0, n_counters)) carrying ``z`` = sum over input rows of
    sign_i(value).

    Why: self-join size / F2 (``sum(count(k)^2)``) and equi-join size
    (``sum(count_R(k) * count_S(k))``) normally cost a full shuffle of
    every key — the statistics a query optimizer wants BEFORE choosing
    a plan. The AMS sketch answers both from an **algebraic aggregate
    with no key shuffle at all**: per-partition partial sign-sums
    merge by addition (map-side combine bounds shuffle traffic at
    groups x n_counters longs), E[z^2] = F2, and
    E[z_R * z_S] = join size. Sketches are LINEAR: the sketch of a
    disjoint union is the elementwise sum (``z_A = z_R + z_S``), so
    per-partition/day sketches roll up for free.

    Estimates are exact integers until the final mean/median, so the
    whole pipeline is oracle-checkable bit-for-bit (md5 once per row,
    the cms_table discipline; per-counter signs are distinct bits of
    that one draw)."""
    from ..functions.text import md5_long_expr

    if not 1 <= n_counters <= _HASH_BITS:
        raise ValueError(f"n_counters must be in [1, {_HASH_BITS}]")
    gcols = list(group_cols)
    hashed = df.select(*gcols, md5_long_expr(F.col(value_col)).alias("__h"))
    # one wide aggregate (n_counters sum expressions over one scan),
    # NOT an explode: the cms_table-style row x counters explode would
    # materialize 32x the corpus before the map-side combine; here the
    # per-row work is 32 bit-ops and the aggregate is a single pass
    wide = hashed.groupBy(*gcols).agg(
        *[
            F.sum(_ams_sign(F.col("__h"), i)).alias(f"__z{i}")
            for i in range(n_counters)
        ]
    )
    # unpivot the groups-sized wide table to the (group, i, z) sketch
    cells = F.array(
        *[
            F.struct(F.lit(i).alias("i"), F.col(f"__z{i}").alias("z"))
            for i in range(n_counters)
        ]
    )
    return wide.select(*gcols, F.explode(cells).alias("__c")).select(
        *gcols, "__c.i", "__c.z"
    )


def ams_f2_estimate(
    sketch: DataFrame,
    group_cols: Sequence[str] = (),
    groups_of: int = 8,
    z_col: str = "z",
    out_col: str = "f2_est",
) -> DataFrame:
    """Median-of-means F2 estimate from an AMS sketch: counters fold
    into ``n/groups_of`` bucket means of z², and the median of those
    means bounds the failure probability (means control variance,
    median controls tails). Exact-integer arithmetic until the final
    mean/median, both of which interpolate identically cross-engine."""
    gcols = list(group_cols)
    means = (
        sketch.withColumn("__grp", F.floor(F.col("i") / groups_of))
        .groupBy(*gcols, "__grp")
        .agg(F.avg(F.col(z_col) * F.col(z_col)).alias("__m"))
    )
    return means.groupBy(*gcols).agg(F.median("__m").alias(out_col))


def ams_join_size_estimate(
    sketch_r: DataFrame,
    sketch_s: DataFrame,
    group_cols: Sequence[str] = (),
    groups_of: int = 8,
    out_col: str = "join_est",
) -> DataFrame:
    """Equi-join-size estimate between two relations sketched WITH THE
    SAME sign family on the join key: median-of-means of
    ``z_R * z_S`` per counter. Negative estimates are possible for
    tiny true sizes (an unbiased estimator straddles zero) — callers
    clamp if they need a cardinality."""
    gcols = list(group_cols)
    r = sketch_r.select(*gcols, "i", F.col("z").alias("__zr"))
    s = sketch_s.select(*gcols, "i", F.col("z").alias("__zs"))
    prods = r.join(s, gcols + ["i"]).withColumn(
        "__grp", F.floor(F.col("i") / groups_of)
    )
    means = prods.groupBy(*gcols, "__grp").agg(
        F.avg(F.col("__zr") * F.col("__zs")).alias("__m")
    )
    return means.groupBy(*gcols).agg(F.median("__m").alias(out_col))
