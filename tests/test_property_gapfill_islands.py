"""Property-based differential tests for the time-series densification
lane: ``gap_fill`` (zero-fill + LOCF over a per-group bucket grid,
NULL-safe group keys) and the interval island trio
(``merge_intervals`` / ``interval_coverage`` / ``interval_gaps``)
against direct Python replays on random inputs — duplicate and nested
intervals, NULL group keys, groups with a single bucket. Seeded so
failures replay exactly."""

import random

import pytest

from otters_spark.operators.asof import gap_fill
from otters_spark.operators.intervals import (
    interval_coverage,
    interval_gaps,
    merge_intervals,
)


@pytest.mark.parametrize("seed", [71, 72, 73])
def test_gap_fill_random_vs_python(spark, seed):
    rng = random.Random(seed)
    step = 10
    groups = ["g1", "g2", None]  # NULL group key must densify too
    rows = []
    for g in groups:
        buckets = sorted(
            rng.sample(range(0, 200, step), rng.randint(1, 8))
        )
        for b in buckets:
            cnt = rng.randrange(5)
            meas = None if rng.random() < 0.4 else round(rng.random(), 3)
            rows.append((g, b, cnt, meas))
    df = spark.createDataFrame(
        rows, "grp string, bucket long, cnt long, meas double"
    )
    got = {
        (r["grp"], r["bucket"]): (r["cnt"], r["meas"])
        for r in gap_fill(
            df, "bucket", step, ["grp"], zero_fill=["cnt"], locf=["meas"]
        ).collect()
    }

    want = {}
    for g in groups:
        obs = {b: (c, m) for gg, b, c, m in rows if gg == g}
        lo, hi = min(obs), max(obs)
        carried = None
        for b in range(lo, hi + 1, step):
            if b in obs:
                c, m = obs[b]
                if m is not None:
                    carried = m
                want[(g, b)] = (c, m if m is not None else carried)
            else:
                want[(g, b)] = (0, carried)
    assert got == want, seed


def _islands_python(ivs):
    """Merge [s, e) intervals (already filtered valid) per key."""
    out = {}
    for k in {k for k, *_ in ivs}:
        spans = sorted((s, e) for kk, s, e in ivs if kk == k)
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += 1
            else:
                merged.append([s, e, 1])
        out[k] = [(s, e, n) for s, e, n in merged]
    return out


@pytest.mark.parametrize("seed", [81, 82, 83])
def test_interval_islands_coverage_gaps_random_vs_python(spark, seed):
    rng = random.Random(seed)
    rows = []
    for _ in range(60):
        k = rng.choice(["a", "b", "c"])
        s = rng.randrange(0, 100)
        kind = rng.random()
        if kind < 0.15:
            e = s  # empty: dropped
        elif kind < 0.25:
            e = s - rng.randrange(1, 5)  # inverted: dropped
        else:
            e = s + rng.randrange(1, 20)
        if rng.random() < 0.1:
            s = None  # NULL endpoint: dropped
        rows.append((k, s, e))
    df = spark.createDataFrame(rows, "k string, start long, end long")
    valid = [
        (k, s, e)
        for k, s, e in rows
        if s is not None and e is not None and e > s
    ]
    want = _islands_python(valid)

    got_islands = {}
    for r in merge_intervals(df, ["k"]).collect():
        got_islands.setdefault(r["k"], []).append(
            (r["island_start"], r["island_end"], r["n_intervals"])
        )
    assert {k: sorted(v) for k, v in got_islands.items()} == {
        k: sorted(v) for k, v in want.items()
    }, seed

    got_cov = {
        r["k"]: (r["n_intervals"], r["n_islands"], r["covered"])
        for r in interval_coverage(df, ["k"]).collect()
    }
    want_cov = {
        k: (
            sum(n for _, _, n in isl),
            len(isl),
            sum(e - s for s, e, _ in isl),
        )
        for k, isl in want.items()
    }
    assert got_cov == want_cov, seed

    lo, hi = 0, 120
    got_gaps = {}
    for r in interval_gaps(df, ["k"], bounds=(lo, hi)).collect():
        got_gaps.setdefault(r["k"], []).append((r["gap_start"], r["gap_end"]))
    want_gaps = {}
    for k, isl in want.items():
        gaps, cursor = [], lo
        for s, e, _ in sorted(isl):
            if max(s, lo) > cursor:
                gaps.append((cursor, min(s, hi)))
            cursor = max(cursor, min(e, hi))
        if cursor < hi:
            gaps.append((cursor, hi))
        gaps = [(s, e) for s, e in gaps if e > s]
        if gaps:
            want_gaps[k] = gaps
    assert {k: sorted(v) for k, v in got_gaps.items()} == want_gaps, seed
