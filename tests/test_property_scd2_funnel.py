"""Property-based differential tests for SCD2 dimension maintenance
and funnel chaining: random update-batch sequences replayed against a
plain-Python dimension model (including NULL keys, NULL attribute
flips, and re-opened keys), and random event streams funneled against
a direct per-user replay of the strictly-after first-occurrence rule.
Seeded so failures replay exactly."""

import datetime as dt
import random

import pytest

from otters_spark.operators.behavior import funnel_counts, funnel_stages
from otters_spark.sources.merge import scd2_as_of, scd2_merge

DIM_SCHEMA = "k string, a string, b string, valid_from date, valid_to date"


def _replay_python(batches):
    """Dict-model SCD2 replay. Returns the final row multiset and the
    per-date current snapshots for time-travel checks."""
    current = {}  # key -> (a, b, vfrom)
    history = []  # closed versions: (k, a, b, vfrom, vto)
    snapshots = {}
    for d, rows in batches:
        for k, a, b in rows:
            if k not in current:
                current[k] = (a, b, d)
            elif (current[k][0], current[k][1]) != (a, b):
                ca, cb, vf = current[k]
                history.append((k, ca, cb, vf, d))
                current[k] = (a, b, d)
        snapshots[d] = {k: (a, b) for k, (a, b, _) in current.items()}
    final = list(history) + [
        (k, a, b, vf, None) for k, (a, b, vf) in current.items()
    ]
    return final, snapshots


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_scd2_random_batch_replay(spark, seed):
    rng = random.Random(seed)
    keys = [f"k{i}" for i in range(8)] + [None]  # NULL key is a key
    vals = ["x", "y", "z", None]  # NULL attr flips must count as changes
    base = dt.date(2024, 1, 1)
    batches = []
    for step in range(6):
        d = base + dt.timedelta(days=step * 3 + rng.randrange(1, 3))
        batch_keys = rng.sample(keys, rng.randint(1, 6))
        batches.append(
            (d, [(k, rng.choice(vals), rng.choice(vals)) for k in batch_keys])
        )
    batches.sort(key=lambda b: b[0])
    # distinct batch dates: two merges on one date would be ambiguous
    assert len({d for d, _ in batches}) == len(batches)

    dim = spark.createDataFrame([], DIM_SCHEMA)
    for d, rows in batches:
        upd = spark.createDataFrame(rows, "k string, a string, b string")
        dim = scd2_merge(dim, upd, ["k"], ["a", "b"], d)
        dim = spark.createDataFrame(dim.collect(), DIM_SCHEMA)  # pin

    want_final, want_snaps = _replay_python(batches)
    got_final = [
        (r["k"], r["a"], r["b"], r["valid_from"], r["valid_to"])
        for r in dim.collect()
    ]
    assert sorted(got_final, key=str) == sorted(want_final, key=str), seed

    # time travel: at each batch date and one day before/after
    probe_dates = set()
    for d, _ in batches:
        probe_dates |= {d, d - dt.timedelta(days=1), d + dt.timedelta(days=1)}
    for p in sorted(probe_dates):
        # python state as of p: last snapshot with date <= p
        state = {}
        for d, _ in batches:
            if d <= p:
                state = want_snaps[d]
        got = sorted(
            ((r["k"], r["a"], r["b"]) for r in scd2_as_of(dim, p).collect()),
            key=str,
        )
        want = sorted(((k, a, b) for k, (a, b) in state.items()), key=str)
        assert got == want, (seed, p)


STEPS = ["view", "cart", "buy"]
NOISE = ["ping", "scroll"]


def _funnel_replay(events, steps):
    """Per-user strictly-after first-occurrence chaining."""
    by_user = {}
    for u, ts, ty in events:
        by_user.setdefault(u, []).append((ts, ty))
    rows = {}
    for u, evs in by_user.items():
        t1 = min((ts for ts, ty in evs if ty == steps[0]), default=None)
        if t1 is None:
            continue
        chain = [t1]
        for step in steps[1:]:
            prev = chain[-1]
            nxt = (
                min(
                    (ts for ts, ty in evs if ty == step and prev is not None and ts > prev),
                    default=None,
                )
                if prev is not None
                else None
            )
            chain.append(nxt)
        rows[u] = chain
    return rows


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_funnel_random_vs_python_replay(spark, seed):
    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    events = []
    for i in range(300):
        u = rng.randrange(25)
        # coarse grid so same-timestamp collisions (the strictly-after
        # edge) actually occur, with sub-second jitter half the time
        ts = base + dt.timedelta(
            minutes=rng.randrange(48),
            microseconds=rng.choice([0, 0, rng.randrange(1_000_000)]),
        )
        events.append((u, ts, rng.choice(STEPS + NOISE)))
    df = spark.createDataFrame(
        [(u, ts, ty, i) for i, (u, ts, ty) in enumerate(events)],
        "user_id int, ts timestamp, event_type string, event_id int",
    )

    want = _funnel_replay(events, STEPS)
    got = {
        r["user_id"]: [r["t1"], r["t2"], r["t3"]]
        for r in funnel_stages(df, STEPS).collect()
    }
    assert got == want, seed

    summary = funnel_counts(df, STEPS).collect()[0]
    for k in range(1, 4):
        n = sum(1 for chain in want.values() if chain[k - 1] is not None)
        assert summary[f"n_stage_{k}"] == n, (seed, k)
    def _micros(delta: dt.timedelta) -> int:
        return (
            delta.days * 86_400_000_000
            + delta.seconds * 1_000_000
            + delta.microseconds
        )

    conv = sum(
        _micros(chain[2] - chain[0])
        for chain in want.values()
        if chain[2] is not None
    )
    assert summary["conv_micros_total"] == conv, seed
