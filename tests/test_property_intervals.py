"""Property-based differential tests for the second-wave operators:
random inputs, scale-shaped Spark formulations vs straightforward
driver-side Python references. Seeded so failures reproduce."""

import random

import pytest


def _random_intervals(seed: int, n_keys: int = 6, n_rows: int = 120):
    rng = random.Random(seed)
    rows = []
    for _ in range(n_rows):
        k = f"k{rng.randint(1, n_keys)}"
        s = rng.randint(0, 500)
        # mix of zero-length, short and long, plus occasional inverted
        e = s + rng.choice([0, 1, 3, 10, 40, -5])
        rows.append((k, s, e))
    return rows


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_interval_coverage_vs_python_sweep(spark, seed):
    from otters_spark.operators.intervals import interval_coverage

    rows = _random_intervals(seed)
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {
        r["k"]: (r["n_intervals"], r["n_islands"], r["covered"])
        for r in interval_coverage(df, ["k"], "s", "e").collect()
    }
    by_key: dict[str, list] = {}
    for k, s, e in rows:
        if e > s:
            by_key.setdefault(k, []).append((s, e))
    for k, iv in by_key.items():
        iv.sort()
        islands, covered, frontier = 0, 0, None
        for s, e in iv:
            if frontier is None or s > frontier:
                islands += 1
                covered += e - s
                frontier = e
            elif e > frontier:
                covered += e - frontier
                frontier = e
        assert got[k] == (len(iv), islands, covered), k
    assert set(got) == set(by_key)


@pytest.mark.parametrize("seed", [41, 42])
@pytest.mark.parametrize("alpha", [0.5, 0.3])
def test_ewma_vs_python_recurrence(spark, seed, alpha):
    from otters_spark.operators.stats import ewma_smooth

    rng = random.Random(seed)
    rows = [
        (f"k{i % 4}", i, round(rng.uniform(-50, 50), 3)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    got = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma_smooth(df, ["k"], "t", "x", alpha=alpha).collect()
    }
    series: dict[str, list] = {}
    for k, t, x in sorted(rows, key=lambda r: r[1]):
        series.setdefault(k, []).append((t, x))
    w = 1.0 - alpha
    for k, pts in series.items():
        num = den = 0.0
        for t, x in pts:
            num = x + w * num
            den = 1.0 + w * den
            assert got[(k, t)] == pytest.approx(num / den, abs=1e-9), (k, t)


@pytest.mark.parametrize("seed", [51, 52])
def test_binary_search_vs_python_pipeline(spark, seed):
    import numpy as np

    from otters_spark.operators.similarity import binary_index, binary_search

    rng = np.random.default_rng(seed)
    dim, n = 48, 150
    V = rng.standard_normal((n, dim))
    V[rng.integers(0, n, 10)] = 0.0  # some zero rows
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    q = [float(x) for x in rng.standard_normal(dim)]
    got = binary_search(
        binary_index(df, dim=dim), q, k=8, dim=dim, shortlist=30, round_to=6
    ).toPandas()
    qa = np.array(q)
    ham = ((V > 0) != (qa > 0)).sum(axis=1)
    order = np.lexsort((np.arange(n), ham))[:30]
    norms = np.linalg.norm(V, axis=1)
    inv = np.where(norms == 0, 0.0, 1.0 / np.where(norms == 0, 1.0, norms))
    cos = np.round((V @ qa) * inv / np.linalg.norm(qa), 6)
    cand = sorted(order, key=lambda i: (-cos[i], i))[:8]
    assert got.vec_id.tolist() == cand
