"""PSI drift detection: zero on identity, sensitivity to planted
shift, NULL/clamp bins, exactness vs a NumPy reference."""

import math

import pytest
from pyspark.sql import functions as F

from otters_spark.operators.drift import psi_summary, psi_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_identity_is_zero(docs):
    out = psi_summary(docs, docs, numeric={"n_chars": (0, 600, 12)},
                      categorical=["lang"]).collect()
    assert {r["column"] for r in out} == {"n_chars", "lang"}
    assert all(r["psi"] == 0.0 for r in out)


def test_planted_shift_detected(docs):
    # current snapshot: keep only long documents -> n_chars drifts hard,
    # lang barely moves
    cur = docs.filter(F.col("n_chars") > 300)
    out = {r["column"]: r["psi"] for r in psi_summary(
        docs, cur, numeric={"n_chars": (0, 600, 12)}, categorical=["lang"]
    ).collect()}
    assert out["n_chars"] > 0.25          # action-level drift
    assert out["lang"] < out["n_chars"]   # unshifted column stays lower


def test_null_and_clamp_bins(spark):
    ref = spark.createDataFrame([(10.0,), (None,), (250.0,)], "x double")
    cur = spark.createDataFrame([(-5.0,), (999.0,), (None,)], "x double")
    rows = {(r["bin"]): (r["n_ref"], r["n_cur"]) for r in psi_table(
        ref, cur, numeric={"x": (0, 100, 4)}).collect()}
    # -5 clamps into bin 0; 250 and 999 clamp into the top bin 3
    assert rows["0"] == (1, 1)
    assert rows["3"] == (1, 1)
    assert rows["null"] == (1, 1)


def test_matches_numpy_reference(spark):
    import numpy as np

    ref_vals = [5, 15, 25, 35, 45, 15, 25, 25]
    cur_vals = [5, 45, 45, 45, 35, 35]
    ref = spark.createDataFrame([(float(v),) for v in ref_vals], "x double")
    cur = spark.createDataFrame([(float(v),) for v in cur_vals], "x double")
    got = psi_summary(ref, cur, numeric={"x": (0, 50, 5)}).collect()[0]["psi"]

    rbins = np.bincount([v // 10 for v in ref_vals], minlength=5)
    cbins = np.bincount([v // 10 for v in cur_vals], minlength=5)
    observed = [i for i in range(5) if rbins[i] + cbins[i] > 0]
    nb = len(observed)
    psi = 0.0
    for i in observed:
        p = (rbins[i] + 1) / (len(ref_vals) + nb)
        q = (cbins[i] + 1) / (len(cur_vals) + nb)
        psi += (p - q) * math.log(p / q)
    assert got == pytest.approx(psi, abs=1e-6)


def test_validation(docs):
    with pytest.raises(ValueError):
        psi_table(docs, docs)
    with pytest.raises(ValueError):
        psi_table(docs, docs, numeric={"n_chars": (10, 10, 4)})
    with pytest.raises(ValueError):
        psi_table(docs, docs, numeric={"lang": (0, 1, 2)}, categorical=["lang"])


def test_one_scan_per_side(docs):
    df = psi_table(docs, docs.limit(100), numeric={"n_chars": (0, 600, 12)},
                   categorical=["lang", "source"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # three profiled columns must NOT triple the scans
    assert plan.count("FileScan parquet") <= 3  # ref + cur (+1 limit reuse)


def test_unknown_columns_rejected(docs):
    with pytest.raises(ValueError, match="unknown column"):
        psi_table(docs, docs, numeric={"nope": (0, 1, 2)})
    with pytest.raises(ValueError, match="cur"):
        psi_table(docs, docs.drop("lang"), categorical=["lang"])


def test_psi_properties(spark):
    # PSI is an f-divergence: every smoothed bin term is >= 0, the
    # total is 0 iff distributions match, and it is symmetric in
    # (ref, cur). Deterministic grid of skews instead of random draws.
    import itertools

    for shift, scale in itertools.product([0, 5, 20], [1, 3]):
        ref = spark.createDataFrame(
            [(float(v % 50),) for v in range(200)], "x double")
        cur = spark.createDataFrame(
            [(float((v * scale + shift) % 50),) for v in range(150)], "x double")
        tbl = psi_table(ref, cur, numeric={"x": (0, 50, 10)}).collect()
        assert all(r["contrib"] >= 0 for r in tbl)
        fwd = psi_summary(ref, cur, numeric={"x": (0, 50, 10)}).collect()[0]["psi"]
        rev = psi_summary(cur, ref, numeric={"x": (0, 50, 10)}).collect()[0]["psi"]
        assert fwd == rev >= 0


def test_nan_goes_to_null_bin(spark):
    ref = spark.createDataFrame(
        [(float("nan"),), (50.0,), (None,)], "x double")
    rows = {r["bin"]: r["n_ref"] for r in psi_table(
        ref, ref, numeric={"x": (0, 100, 4)}).collect()}
    # NaN + NULL share the null bin; nothing lands in bin "0"
    assert rows["null"] == 2
    assert "0" not in rows
