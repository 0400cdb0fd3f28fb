"""group_percentiles: exact/approx agreement and knob behavior."""

import pytest

from otters_spark.operators.stats import group_percentiles


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_exact_matches_sql_percentile(li, spark):
    got = {
        r["l_returnflag"]: r["p50_l_quantity"]
        for r in group_percentiles(
            li, ["l_returnflag"], {"l_quantity": [0.5]}, exact=True
        ).collect()
    }
    li.createOrReplaceTempView("li_stats")
    want = {
        r["l_returnflag"]: r["m"]
        for r in spark.sql(
            "SELECT l_returnflag, round(percentile(l_quantity, 0.5), 4) AS m "
            "FROM li_stats GROUP BY l_returnflag"
        ).collect()
    }
    assert got == want


def test_approx_tracks_exact(li):
    kw = dict(
        group_cols=["l_returnflag"],
        value_cols={"l_extendedprice": [0.5, 0.9]},
        round_to=None,
    )
    exact = {r["l_returnflag"]: r for r in group_percentiles(li, exact=True, **kw).collect()}
    approx = {
        r["l_returnflag"]: r
        for r in group_percentiles(li, exact=False, accuracy=10_000, **kw).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        for c in ("p50_l_extendedprice", "p90_l_extendedprice"):
            # GK rank error 1/accuracy -> value error well under 2% on
            # this distribution
            assert approx[k][c] == pytest.approx(exact[k][c], rel=0.02)


def test_empty_request_rejected(li):
    with pytest.raises(ValueError):
        group_percentiles(li, ["l_returnflag"], {})
