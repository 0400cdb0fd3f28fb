"""Property-based differential tests for three operators whose only
random-input coverage so far was the fixed suite data: the as-of join
family vs pandas ``merge_asof`` (the independent reference its
docstring claims parity with), the closed-form Gaussian-NB trainer vs
a numpy re-derivation, and MMR reranking vs a pure-Python greedy
replay of the documented rounding/tie-break discipline. Randomness is
seeded per-case so failures replay exactly."""

import math
import random

import pandas as pd
import pytest

from otters_spark.operators.asof import asof_join


def _asof_case(seed: int):
    """Random left/right frames with the awkward shapes: duplicate
    left timestamps, keys present on only one side, left rows before
    any right row, simultaneous left/right timestamps, NULL payload
    values. Right (key, ts) pairs are unique — the operator documents
    carried-payload nondeterminism for exact right duplicates."""
    rng = random.Random(seed)
    keys = list(range(6))  # 0-3 on both sides, 4 left-only, 5 right-only
    left = []
    for i in range(60):
        k = rng.choice(keys[:5])
        ts = rng.randrange(0, 5000)
        if rng.random() < 0.15 and left:
            ts = left[rng.randrange(len(left))][2]  # duplicate left ts
        left.append((i, k, ts))
    right, seen = [], set()
    for _ in range(40):
        k = rng.choice(keys[:4] + [5])
        ts = rng.randrange(0, 5000)
        if rng.random() < 0.1 and left:
            ts = left[rng.randrange(len(left))][2]  # simultaneous ts
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        val = None if rng.random() < 0.15 else f"v{rng.randrange(100)}"
        right.append((k, ts, val))
    return left, right


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 300])
def test_asof_random_vs_pandas_merge_asof(spark, seed, direction, tolerance):
    lrows, rrows = _asof_case(seed)
    left = spark.createDataFrame(lrows, ["event_id", "key", "ts"])
    right = spark.createDataFrame(rrows, ["key", "ts", "val"])
    got = {
        r["event_id"]: (r["ts_asof"], r["val_asof"])
        for r in asof_join(
            left,
            right,
            on=["key"],
            ts_col="ts",
            direction=direction,
            tolerance=tolerance,
        ).collect()
    }

    lpd = pd.DataFrame(lrows, columns=["event_id", "key", "ts"]).sort_values(
        "ts", kind="mergesort"
    )
    rpd = pd.DataFrame(rrows, columns=["key", "ts", "val"])
    rpd["rts"] = rpd["ts"]
    rpd = rpd.sort_values("ts", kind="mergesort")
    want_pd = pd.merge_asof(
        lpd,
        rpd,
        on="ts",
        by="key",
        direction=direction,
        tolerance=tolerance,
    )
    assert len(got) == len(lrows)
    for rec in want_pd.itertuples(index=False):
        w_ts = None if pd.isna(rec.rts) else int(rec.rts)
        w_val = None if (isinstance(rec.val, float) and pd.isna(rec.val)) else rec.val
        g_ts, g_val = got[rec.event_id]
        assert g_ts == w_ts, (seed, direction, tolerance, rec.event_id)
        assert g_val == w_val, (seed, direction, tolerance, rec.event_id)


def _round_half_up(x: float, nd: int = 6) -> float:
    s = 10.0 ** nd
    return math.copysign(math.floor(abs(x) * s + 0.5), x) / s


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_nb_train_and_score_random_vs_numpy(spark, seed):
    import numpy as np

    from otters_spark.operators.quality_model import (
        QUALITY_FEATURES,
        score_nb,
        train_nb_quality,
    )

    rng = np.random.default_rng(seed)
    n = 300
    X = rng.normal(size=(n, len(QUALITY_FEATURES)))
    # class-1 rows shifted so the classes are genuinely separable
    y = (rng.random(n) < 0.4).astype(int)
    X[y == 1] += 0.8
    rows = [
        (i,) + tuple(float(v) for v in X[i]) + (int(y[i]),) for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["rid"] + list(QUALITY_FEATURES) + ["label"])

    floor = 1e-6
    stats = train_nb_quality(df, var_floor=floor)
    assert stats["__n0"] == int((y == 0).sum())
    assert stats["__n1"] == int((y == 1).sum())
    for j, feat in enumerate(QUALITY_FEATURES):
        mu0, v0, mu1, v1 = stats[feat]
        assert mu0 == pytest.approx(X[y == 0, j].mean(), abs=1e-9)
        assert mu1 == pytest.approx(X[y == 1, j].mean(), abs=1e-9)
        assert v0 == pytest.approx(X[y == 0, j].var(ddof=1) + floor, abs=1e-9)
        assert v1 == pytest.approx(X[y == 1, j].var(ddof=1) + floor, abs=1e-9)

    got = {
        r["rid"]: r["quality_prob"] for r in score_nb(df, stats).collect()
    }
    n0, n1 = stats["__n0"], stats["__n1"]
    for i in range(n):
        z = math.log(n1 / n0)
        for j, feat in enumerate(QUALITY_FEATURES):
            mu0, v0, mu1, v1 = stats[feat]
            x = float(X[i, j])
            z += (
                -0.5 * math.log(2.0 * math.pi * v1)
                - (x - mu1) ** 2 / (2.0 * v1)
                + 0.5 * math.log(2.0 * math.pi * v0)
                + (x - mu0) ** 2 / (2.0 * v0)
            )
        want = 1.0 / (1.0 + math.exp(-z))
        assert got[i] == pytest.approx(want, abs=1e-8), i


@pytest.mark.parametrize("seed", [21, 22])
@pytest.mark.parametrize("lam", [0.3, 0.7])
def test_mmr_random_vs_python_greedy(spark, seed, lam):
    import numpy as np

    from otters_spark.operators.similarity import mmr_rerank

    rng = np.random.default_rng(seed)
    n, dim, k = 20, 8, 6
    vecs = rng.normal(size=(n, dim))
    # plant a near-duplicate pair so diversification actually bites
    vecs[7] = vecs[3] * 1.01
    rels = rng.random(n)
    rows = [
        (i, [float(v) for v in vecs[i]], float(rels[i])) for i in range(n)
    ]
    cand = spark.createDataFrame(rows, ["vec_id", "embedding", "score"])
    got = [
        (r["mmr_rank"], r["vec_id"])
        for r in mmr_rerank(cand, k=k, lam=lam).orderBy("mmr_rank").collect()
    ]

    rel_r = {i: _round_half_up(float(rels[i])) for i in range(n)}
    norms = {i: float(np.linalg.norm(vecs[i])) for i in range(n)}

    def cos(a: int, b: int) -> float:
        return _round_half_up(
            float(np.dot(vecs[a], vecs[b])) / (norms[a] * norms[b])
        )

    picked = [max(range(n), key=lambda i: (rel_r[i], -i))]
    while len(picked) < k:
        pool = [i for i in range(n) if i not in picked]
        mmr = {
            i: _round_half_up(
                lam * rel_r[i] - (1.0 - lam) * max(cos(i, p) for p in picked)
            )
            for i in pool
        }
        picked.append(max(pool, key=lambda i: (mmr[i], -i)))
    want = [(r + 1, i) for r, i in enumerate(picked)]
    assert got == want, (seed, lam)
