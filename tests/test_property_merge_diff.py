"""Property-based differential tests for the remaining CDC primitives:
``merge_upsert`` replayed as a chain of random batches against a plain
dict model, and ``snapshot_diff`` against a direct dict diff — both
over COMPOSITE keys with NULL components and NULL values, the exact
shapes where a non-null-safe join silently drops or duplicates rows.
Seeded so failures replay exactly."""

import random

import pytest

from otters_spark.sources.merge import merge_upsert, snapshot_diff

SCHEMA = "k1 string, k2 int, v string"
K1S = ["a", "b", "c", None]
K2S = [1, 2, None]
VALS = ["x", "y", None]


def _random_rows(rng, n):
    """n rows with unique composite keys (NULL components allowed)."""
    keys = rng.sample([(a, b) for a in K1S for b in K2S], n)
    return [(k1, k2, rng.choice(VALS)) for k1, k2 in keys]


@pytest.mark.parametrize("seed", [51, 52, 53])
def test_merge_upsert_random_chain_vs_dict(spark, seed):
    rng = random.Random(seed)
    state = {(k1, k2): v for k1, k2, v in _random_rows(rng, 6)}
    cur = spark.createDataFrame(
        [(k1, k2, v) for (k1, k2), v in state.items()], SCHEMA
    )
    for step in range(4):
        batch = _random_rows(rng, rng.randint(1, 8))
        upd = spark.createDataFrame(batch, SCHEMA)
        cur = merge_upsert(cur, upd, ["k1", "k2"])
        cur = spark.createDataFrame(cur.collect(), SCHEMA)  # pin lineage
        for k1, k2, v in batch:
            state[(k1, k2)] = v
        got = sorted(
            ((r["k1"], r["k2"], r["v"]) for r in cur.collect()), key=str
        )
        want = sorted(
            ((k1, k2, v) for (k1, k2), v in state.items()), key=str
        )
        assert got == want, (seed, step)


@pytest.mark.parametrize("seed", [61, 62, 63])
def test_snapshot_diff_random_vs_dict(spark, seed):
    rng = random.Random(seed)
    old_rows = _random_rows(rng, rng.randint(3, 10))
    new_rows = _random_rows(rng, rng.randint(3, 10))
    old = spark.createDataFrame(old_rows, SCHEMA)
    new = spark.createDataFrame(new_rows, SCHEMA)

    om = {(k1, k2): v for k1, k2, v in old_rows}
    nm = {(k1, k2): v for k1, k2, v in new_rows}
    want = {}
    for k in om.keys() | nm.keys():
        if k not in om:
            want[k] = "added"
        elif k not in nm:
            want[k] = "removed"
        elif om[k] == nm[k]:  # NULL == NULL is "same value" here
            want[k] = "unchanged"
        else:
            want[k] = "changed"

    got = {
        (r["k1"], r["k2"]): r["change_type"]
        for r in snapshot_diff(old, new, ["k1", "k2"]).collect()
    }
    assert got == want, seed
