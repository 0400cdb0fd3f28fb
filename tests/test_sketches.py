"""Mergeable distinct-count sketches (operators/sketches.py): the
merge law (merged partial sketches == one direct sketch — the whole
point of a sketch at 100 TB), the exact-below-saturation path, the
estimator's accuracy, and argument validation. Cross-engine parity
of the suite queries is covered by scripts/check_oracle.py and
tests/test_oracle_dtypes.py."""

import pytest
from pyspark.sql import functions as F

from otters_spark.operators.sketches import (
    cms_lookup,
    cms_merge,
    cms_table,
    hll_estimate,
    hll_merge,
    hll_registers,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


def _values(spark, n, start=0):
    return spark.range(start, start + n).select(F.col("id").alias("v"))


# ---------------------------------------------------------------- KMV


def test_kmv_exact_below_saturation(spark):
    df = _values(spark, 40)
    est = kmv_estimate(kmv_sketch(df, "v", k=64), k=64).first()
    assert est["n_sketch"] == 40
    assert est["est_distinct"] == 40.0


def test_kmv_duplicates_do_not_inflate(spark):
    df = _values(spark, 40).union(_values(spark, 40)).union(_values(spark, 10))
    est = kmv_estimate(kmv_sketch(df, "v", k=64), k=64).first()
    assert est["n_sketch"] == 40
    assert est["est_distinct"] == 40.0


def test_kmv_saturated_estimate_accuracy(spark):
    # deterministic given the md5 hash family: 5000 distinct, k=128
    # (relative error concentrates near 1/sqrt(k-1) ~ 9%)
    est = kmv_estimate(kmv_sketch(_values(spark, 5000), "v", k=128), k=128).first()
    assert est["n_sketch"] == 128
    assert abs(est["est_distinct"] - 5000) / 5000 < 0.25


def test_kmv_merge_equals_direct(spark):
    whole = _values(spark, 3000)
    left = whole.filter(F.col("v") % 3 != 0)
    right = whole.filter(F.col("v") % 2 == 0)  # overlapping halves
    parts = kmv_sketch(left, "v", k=64).union(kmv_sketch(right, "v", k=64))
    merged = kmv_merge(parts, k=64).first()["kmv"]
    direct = kmv_sketch(left.union(right), "v", k=64).first()["kmv"]
    assert merged == direct


def test_kmv_grouped_and_validation(spark):
    df = spark.range(0, 600).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("v")
    )
    rows = {
        r["g"]: r
        for r in kmv_estimate(kmv_sketch(df, "v", ["g"], k=64), k=64).collect()
    }
    assert set(rows) == {"0", "1"}
    for r in rows.values():
        assert r["n_sketch"] == 64
        assert abs(r["est_distinct"] - 300) / 300 < 0.35
    with pytest.raises(ValueError, match="k >= 2"):
        kmv_sketch(df, "v", k=1)


# ---------------------------------------------------------------- HLL


def test_hll_registers_bounded_and_merge_equals_direct(spark):
    whole = _values(spark, 4000)
    left = whole.filter(F.col("v") < 2500)
    right = whole.filter(F.col("v") >= 1500)
    parts = hll_registers(left, "v", p=8).union(hll_registers(right, "v", p=8))
    merged = hll_merge(parts)
    direct = hll_registers(whole, "v", p=8)
    assert merged.count() <= 256
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_estimate_accuracy_raw_branch(spark):
    # 10k distinct >> 2.5 * 256: the bias-corrected raw estimator
    est = hll_estimate(hll_registers(_values(spark, 10000), "v", p=8), p=8).first()
    assert abs(est["est_distinct"] - 10000) / 10000 < 0.2


def test_hll_estimate_small_range_branch(spark):
    # 50 distinct << 2.5 * 256: linear counting, which is near-exact
    # while collisions are rare
    est = hll_estimate(hll_registers(_values(spark, 50), "v", p=8), p=8).first()
    assert est["registers_nonzero"] <= 50
    assert abs(est["est_distinct"] - 50) / 50 < 0.15


def test_hll_grouped_and_validation(spark):
    df = spark.range(0, 6000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    regs = hll_registers(df, "v", ["g"], p=8)
    rows = {r["g"]: r for r in hll_estimate(regs, ["g"], p=8).collect()}
    assert set(rows) == {0, 1, 2}
    for r in rows.values():
        assert abs(r["est_distinct"] - 2000) / 2000 < 0.25
    with pytest.raises(ValueError, match="p must be"):
        hll_registers(df, "v", p=3)


# ---------------------------------------------------------------- CMS


def _stream(spark, spec: dict[str, int]):
    """Value stream with known frequencies: spec maps value -> count."""
    rows = [(v,) for v, n in spec.items() for _ in range(n)]
    return spark.createDataFrame(rows, "v string")


def test_cms_never_undercounts_and_exact_when_wide(spark):
    spec = {"a": 100, "b": 40, "c": 7, "d": 1}
    df = _stream(spark, spec)
    sk = cms_table(df, "v", depth=4, width=2048)
    items = spark.createDataFrame([(v,) for v in spec], "v string")
    est = {r["v"]: r["est_n"] for r in cms_lookup(sk, items, "v", depth=4, width=2048).collect()}
    # no false negatives ever; with width >> distinct values, no collisions
    for v, n in spec.items():
        assert est[v] >= n
    assert est == spec  # 4 distinct values in 2048 buckets: exact


def test_cms_overcount_bounded_when_narrow(spark):
    spec = {f"v{i}": 10 for i in range(50)}
    df = _stream(spark, spec)
    sk = cms_table(df, "v", depth=4, width=16)  # force collisions
    items = spark.createDataFrame([(v,) for v in spec], "v string")
    est = {r["v"]: r["est_n"] for r in cms_lookup(sk, items, "v", depth=4, width=16).collect()}
    n_total = sum(spec.values())
    for v, n in spec.items():
        assert n <= est[v] <= n + n_total  # one-sided error
    # depth=4 mins should beat the single-row worst case somewhere
    assert any(est[v] == n for v in spec) or sum(est.values()) < 4 * n_total


def test_cms_absent_item_estimates_zero_or_collision(spark):
    sk = cms_table(_stream(spark, {"x": 5}), "v", depth=4, width=1024)
    items = spark.createDataFrame([("never-seen",)], "v string")
    est = cms_lookup(sk, items, "v", depth=4, width=1024).first()["est_n"]
    assert est in (0, 5)  # 0 unless all 4 cells collide with "x"


def test_cms_merge_equals_direct(spark):
    whole = _stream(spark, {"a": 30, "b": 20, "c": 5})
    # deterministic value split; counts are linear so ANY split merges back
    left = whole.filter(F.md5(F.col("v")) < "8")
    right = whole.filter(~(F.md5(F.col("v")) < "8"))
    parts = cms_table(left, "v", width=64).union(cms_table(right, "v", width=64))
    merged = cms_merge(parts)
    direct = cms_table(whole, "v", width=64)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cms_grouped_and_validation(spark):
    df = spark.createDataFrame(
        [("g1", "a")] * 8 + [("g1", "b")] * 2 + [("g2", "a")] * 3,
        "g string, v string",
    )
    sk = cms_table(df, "v", ["g"], depth=3, width=512)
    items = df.select("g", "v").distinct()
    est = {
        (r["g"], r["v"]): r["est_n"]
        for r in cms_lookup(sk, items, "v", ["g"], depth=3, width=512).collect()
    }
    assert est == {("g1", "a"): 8, ("g1", "b"): 2, ("g2", "a"): 3}
    with pytest.raises(ValueError, match="depth"):
        cms_table(df, "v", depth=0)
    with pytest.raises(ValueError, match="width"):
        cms_table(df, "v", width=1)


# ---------------------------------------------------------- histogram


def test_hist_quantiles_track_exact(spark):
    from otters_spark.operators.sketches import hist_quantiles, hist_sketch

    df = spark.range(0, 10000).select(F.col("id").cast("double").alias("v"))
    sk = hist_sketch(df, "v", lo=0.0, hi=10000.0, bins=100)
    r = hist_quantiles(sk, [0.25, 0.5, 0.99], lo=0.0, hi=10000.0, bins=100).first()
    assert r["n"] == 10000
    # bin width is 100: estimates land within one bin of the truth
    assert abs(r["q_0_25"] - 2500) <= 100
    assert abs(r["q_0_5"] - 5000) <= 100
    assert abs(r["q_0_99"] - 9900) <= 100


def test_hist_merge_equals_direct_and_clamps(spark):
    from otters_spark.operators.sketches import hist_merge, hist_sketch

    df = spark.range(-50, 150).select(F.col("id").cast("double").alias("v"))
    left = df.filter("v < 40")
    right = df.filter("v >= 40")
    direct = hist_sketch(df, "v", lo=0.0, hi=100.0, bins=10)
    merged = hist_merge(
        hist_sketch(left, "v", lo=0.0, hi=100.0, bins=10).union(
            hist_sketch(right, "v", lo=0.0, hi=100.0, bins=10)
        )
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    cells = {r["bin"]: r["cnt"] for r in direct.collect()}
    assert cells[0] == 60   # 50 below-range clamp into bin 0 + 10 real
    assert cells[9] == 60   # 50 above-range clamp into bin 9 + 10 real


def test_hist_grouped_and_validation(spark):
    import pytest as _pytest

    from otters_spark.operators.sketches import hist_quantiles, hist_sketch

    df = spark.range(0, 2000).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("double").alias("v")
    )
    sk = hist_sketch(df, "v", ["g"], lo=0.0, hi=2000.0, bins=50)
    rows = {
        r["g"]: r
        for r in hist_quantiles(sk, [0.5], ["g"], lo=0.0, hi=2000.0, bins=50).collect()
    }
    assert rows[0]["n"] == 1000 and rows[1]["n"] == 1000
    for r in rows.values():
        assert abs(r["q_0_5"] - 1000) <= 80  # median of both parities ~1000
    with _pytest.raises(ValueError, match="bins"):
        hist_sketch(df, "v", bins=1)
    with _pytest.raises(ValueError, match="hi must"):
        hist_sketch(df, "v", lo=1.0, hi=1.0)
    with _pytest.raises(ValueError, match="quantiles"):
        hist_quantiles(sk, [1.5])


def test_kmv_pairwise_exact_when_unsaturated_and_close_when_not(spark):
    """Below k the pairwise numbers are exact; saturated estimates land
    within the order-statistic error envelope; both replicate in
    Python from the same sketch arrays."""
    import hashlib

    from otters_spark.operators.sketches import kmv_pairwise, kmv_sketch

    def h(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    # groups: small (unsaturated at k=64) and large overlapping sets
    rows = []
    for v in range(20):
        rows.append(("s1", f"a{v}"))
    for v in range(10, 30):
        rows.append(("s2", f"a{v}"))          # |s1 ∩ s2| = 10
    for v in range(3000):
        rows.append(("b1", f"x{v}"))
    for v in range(1500, 4500):
        rows.append(("b2", f"x{v}"))          # |b1 ∩ b2| = 1500
    df = spark.createDataFrame(rows, "g string, v string")
    sk = kmv_sketch(df, "v", ["g"], k=64)
    out = {(r["g_a"], r["g_b"]): r for r in kmv_pairwise(sk, "g", k=64).collect()}
    small = out[("s1", "s2")]
    assert small["est_union"] == 30.0
    assert small["est_intersect"] == 10.0
    assert small["est_jaccard"] == round(10 / 30, 6)
    big = out[("b1", "b2")]
    # true: union 4500, inter 1500, jaccard 1/3; k=64 gives ~1/sqrt(k)
    # ≈ 12% relative error envelopes (3 sigma ≈ 38%)
    assert abs(big["est_union"] - 4500) / 4500 < 0.4
    assert abs(big["est_jaccard"] - 1 / 3) < 0.25
    # python replication from the same hash definition (double md5:
    # kmv_sketch hashes its value column, which is itself md5-hashed
    # only when the caller pre-hashes; here values are raw strings)
    hs = {g: sorted(h(v) for g2, v in rows if g2 == g) for g in ("b1", "b2")}
    union = sorted(set(hs["b1"][:]) | set(hs["b2"][:]))
    sk1, sk2 = set(hs["b1"][:64]), set(hs["b2"][:64])
    merged = sorted(sk1 | sk2)[:64]
    theta = merged[-1]
    c = sum(1 for x in sk1 & sk2 if x <= theta)
    est_u = 63.0 * float(2**60) / theta
    assert big["est_jaccard"] == round(c / 64.0, 6)
    assert big["est_union"] == round(est_u, 6)
    assert big["est_intersect"] == round(c / 64.0 * est_u, 6)


# --------------------------------------------------------------------------
# AMS F2 / join-size
# --------------------------------------------------------------------------


def test_ams_f2_tracks_exact(spark):
    from otters_spark.operators.sketches import ams_f2_estimate, ams_sketch

    # skewed synthetic stream: key k appears k times, k = 1..60
    rows = [(k,) for k in range(1, 61) for _ in range(k)]
    df = spark.createDataFrame(rows, "k long")
    exact = sum(k * k for k in range(1, 61))
    sk = ams_sketch(df, "k", n_counters=32)
    est = ams_f2_estimate(sk).collect()[0]["f2_est"]
    assert abs(est - exact) / exact < 0.6, (est, exact)


def test_ams_sketch_is_linear_and_mergeable(spark):
    from otters_spark.operators.sketches import ams_sketch

    a = spark.createDataFrame([(k,) for k in range(100)], "k long")
    b = spark.createDataFrame([(k,) for k in range(50, 150)], "k long")
    za = {r["i"]: r["z"] for r in ams_sketch(a, "k").collect()}
    zb = {r["i"]: r["z"] for r in ams_sketch(b, "k").collect()}
    zu = {r["i"]: r["z"] for r in ams_sketch(a.unionAll(b), "k").collect()}
    assert zu == {i: za[i] + zb[i] for i in za}


def test_ams_join_size_tracks_exact(spark):
    from otters_spark.operators.sketches import (
        ams_join_size_estimate,
        ams_sketch,
    )

    # R: key k x k times; S: key k x (61-k) times; true join size known
    r = spark.createDataFrame([(k,) for k in range(1, 61) for _ in range(k)], "k long")
    s = spark.createDataFrame(
        [(k,) for k in range(1, 61) for _ in range(61 - k)], "k long"
    )
    exact = sum(k * (61 - k) for k in range(1, 61))
    est = ams_join_size_estimate(ams_sketch(r, "k"), ams_sketch(s, "k")).collect()[
        0
    ]["join_est"]
    assert abs(est - exact) / exact < 0.6, (est, exact)


def test_ams_counter_bounds(spark):
    import pytest as _pytest

    from otters_spark.operators.sketches import ams_sketch

    df = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError, match="n_counters"):
        ams_sketch(df, "k", n_counters=0)
    with _pytest.raises(ValueError, match="n_counters"):
        ams_sketch(df, "k", n_counters=61)
