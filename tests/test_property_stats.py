"""Property-based differential tests for the time-series / testing
statistics operators (acf, group_trend, mann_whitney, chi_square,
woe_iv, skew_report): on seeded random inputs, the scale-shaped Spark
formulations must agree with straightforward Python/NumPy references
computed driver-side. Randomness is seeded per case so failures
reproduce; values are INTEGERS where the operator contract demands it
(micros discipline) so the comparisons are exact up to the operators'
own 6-dp rounding."""

import math
import random
from collections import Counter

import pytest


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = n * sxy - sx * sy
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return num / den if den > 0 else None


@pytest.mark.parametrize("seed", [21, 22])
def test_acf_random_series_vs_python(spark, seed):
    from otters_spark.operators.stats import acf

    rng = random.Random(seed)
    series = {
        f"k{j}": [rng.randint(-50, 10_000) for _ in range(rng.randint(5, 40))]
        for j in range(4)
    }
    rows = [(k, t, v) for k, vs in series.items() for t, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "k string, t int, y long")
    lags = [1, 2, 5]
    got = {
        (r["k"], r["lag"]): (r["n"], r["acf"])
        for r in acf(df, ["k"], "t", "y", lags).collect()
    }
    for k, vs in series.items():
        for lag in lags:
            xs, ys = vs[lag:], vs[:-lag]
            if not xs:
                assert (k, lag) not in got  # lag exceeds the series
                continue
            n, a = got[(k, lag)]
            assert n == len(xs)
            want = _pearson(xs, ys)
            if want is None:
                assert a is None
            else:
                assert a == pytest.approx(round(want, 6), abs=2e-6)


@pytest.mark.parametrize("seed", [31, 32])
def test_group_trend_random_vs_python(spark, seed):
    from otters_spark.operators.stats import group_trend

    rng = random.Random(seed)
    rows = []
    groups = {}
    for j in range(5):
        pts = [
            (rng.randint(0, 100), rng.randint(-10_000, 10_000))
            for _ in range(rng.randint(1, 25))
        ]
        groups[f"g{j}"] = pts
        rows += [(f"g{j}", x, y) for x, y in pts]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in group_trend(df, ["g"], "x", "y").collect()}
    for g, pts in groups.items():
        xs = [float(x) for x, _ in pts]
        ys = [float(y) for _, y in pts]
        n = len(pts)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        r = got[g]
        assert r["n"] == n
        if denx <= 0:
            assert r["slope"] is None
        else:
            slope = num / denx
            assert r["slope"] == pytest.approx(round(slope, 6), abs=2e-6)
            assert r["intercept"] == pytest.approx(
                round((sy - slope * sx) / n, 6), abs=2e-6
            )
            if deny > 0:
                assert r["r2"] == pytest.approx(
                    round(num * num / (denx * deny), 6), abs=2e-6
                )
            else:
                assert r["r2"] is None


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_mann_whitney_random_with_heavy_ties_vs_python(spark, seed):
    from otters_spark.operators.stats import mann_whitney

    rng = random.Random(seed)
    # values drawn from a SMALL integer domain -> dense ties, the case
    # the tie-averaged-rank algebra must get exactly right
    a = [float(rng.randint(0, 12)) for _ in range(rng.randint(3, 80))]
    b = [float(rng.randint(0, 12)) for _ in range(rng.randint(3, 80))]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = mann_whitney(df, "g", "v", "a", "b", n_bins=8).collect()[0]

    pooled = sorted(a + b)
    ranks = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        ranks[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    n_a, n_b = len(a), len(b)
    u_a = sum(ranks[v] for v in a) - n_a * (n_a + 1) / 2.0
    assert got["n_a"] == n_a and got["n_b"] == n_b
    assert got["u2_a"] == int(round(2 * u_a))
    assert got["auc"] == pytest.approx(round(u_a / (n_a * n_b), 6), abs=2e-6)
    n = n_a + n_b
    ties = sum(c**3 - c for c in Counter(pooled).values())
    var = n_a * n_b / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    if var > 0:
        z = (u_a - n_a * n_b / 2.0) / math.sqrt(var)
        assert got["z"] == pytest.approx(round(z, 6), abs=2e-6)
    else:
        assert got["z"] is None


@pytest.mark.parametrize("seed", [51, 52])
def test_chi_square_random_vs_python(spark, seed):
    from otters_spark.operators.stats import chi_square

    rng = random.Random(seed)
    cats_a = [f"a{i}" for i in range(rng.randint(2, 5))]
    cats_b = [f"b{i}" for i in range(rng.randint(2, 6))]
    rows = [
        (rng.choice(cats_a), rng.choice(cats_b))
        for _ in range(rng.randint(50, 400))
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi_square(df, "a", "b").collect()[0]
    obs = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    chi2 = sum(
        (obs.get((x, y), 0) - ra[x] * cb[y] / n) ** 2 / (ra[x] * cb[y] / n)
        for x in ra
        for y in cb
    )
    assert got["n"] == n
    assert got["n_a"] == len(ra) and got["n_b"] == len(cb)
    assert got["dof"] == (len(ra) - 1) * (len(cb) - 1)
    assert got["chi2"] == pytest.approx(round(chi2, 6), abs=2e-6)
    mind = min(len(ra), len(cb)) - 1
    if mind > 0:
        assert got["cramers_v"] == pytest.approx(
            round(math.sqrt(chi2 / (n * mind)), 6), abs=2e-6
        )


@pytest.mark.parametrize("seed", [61, 62])
def test_woe_iv_random_vs_python(spark, seed):
    from otters_spark.operators.stats import woe_iv

    rng = random.Random(seed)
    buckets = [f"q{i}" for i in range(rng.randint(2, 6))]
    rows = [
        (rng.choice(buckets), rng.randint(0, 1))
        for _ in range(rng.randint(40, 300))
    ]
    df = spark.createDataFrame(rows, "f string, y int")
    got = {r["bucket"]: r for r in woe_iv(df, "f", "y").collect()}
    pos = sum(y for _, y in rows)
    neg = len(rows) - pos
    for b in set(f for f, _ in rows):
        np_ = sum(1 for f, y in rows if f == b and y == 1)
        nn = sum(1 for f, y in rows if f == b and y == 0)
        r = got[b]
        assert r["n_pos"] == np_ and r["n_neg"] == nn
        if np_ > 0 and nn > 0 and pos > 0 and neg > 0:
            woe = math.log((np_ / pos) / (nn / neg))
            assert r["woe"] == pytest.approx(round(woe, 6), abs=2e-6)
            assert r["iv_term"] == pytest.approx(
                round((np_ / pos - nn / neg) * woe, 6), abs=2e-6
            )
        else:
            assert r["woe"] is None and r["iv_term"] is None


@pytest.mark.parametrize("seed", [71, 72])
def test_skew_report_random_vs_python(spark, seed):
    from otters_spark.operators.skew import skew_report

    rng = random.Random(seed)
    # zipf-ish keys: key i drawn with weight 1/(i+1)
    keys = list(range(rng.randint(3, 30)))
    weights = [1.0 / (i + 1) for i in keys]
    rows = [(rng.choices(keys, weights)[0],) for _ in range(rng.randint(60, 500))]
    df = spark.createDataFrame(rows, "k int")
    top_k = rng.randint(1, 6)
    got = skew_report(df, ["k"], top_k=top_k).collect()[0]
    c = Counter(k for (k,) in rows)
    counts = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(rows)
    topk_sum = sum(v for _, v in counts[:top_k])
    ent = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
    assert got["n_rows"] == n and got["n_keys"] == len(c)
    assert got["max_count"] == counts[0][1]
    assert got["p_top1"] == round(counts[0][1] / n, 6)
    assert got["p_topk"] == round(topk_sum / n, 6)
    assert got["entropy"] == pytest.approx(round(ent, 6), abs=2e-6)
    if len(c) > 1:
        assert got["norm_entropy"] == pytest.approx(
            round(ent / math.log(len(c)), 6), abs=2e-6
        )


@pytest.mark.parametrize("seed", [31, 32])
def test_weighted_percentiles_expansion_equivalence(spark, seed):
    """Definitional invariant: weighted_percentiles on (value, weight)
    rows must equal the same operator run on the weight-EXPANDED
    multiset with all weights 1 — for random groups, duplicate values
    across rows (weights must merge), and boundary ps."""
    from otters_spark.operators.stats import weighted_percentiles

    rng = random.Random(seed)
    rows, expanded = [], []
    for g in ("a", "b", "c"):
        for _ in range(rng.randint(3, 25)):
            v = rng.randint(-20, 30)  # small range -> duplicate values
            w = rng.randint(1, 7)
            rows.append((g, v, w))
            expanded.extend((g, v, 1) for _ in range(w))
    ps = [0.25, 0.5, 0.9, 1.0]
    schema = "g string, v long, w long"
    got_w = {
        r["g"]: tuple(r)[1:]
        for r in weighted_percentiles(
            spark.createDataFrame(rows, schema), ["g"], "v", "w", ps
        ).collect()
    }
    got_e = {
        r["g"]: tuple(r)[1:]
        for r in weighted_percentiles(
            spark.createDataFrame(expanded, schema), ["g"], "v", "w", ps
        ).collect()
    }
    assert got_w == got_e
    # and p=1.0 is the max observed value per group
    for g in ("a", "b", "c"):
        assert got_w[g][-1] == max(v for gg, v, _ in rows if gg == g)
