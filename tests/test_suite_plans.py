"""Whole-suite physical-plan audit: no query may regress into a plan
shape that dies at scale. Checks every QUERIES entry's executed plan:

* no CartesianProduct (unbounded pair explosion)
* no BatchEvalPython (row-at-a-time Python in the row path; Arrow-batch
  MapInPandas is allowed — that's the sanctioned Python lane)
* broadcast nested-loop joins only with a broadcast side (the query
  batch / packed blocks), never as a fallback for a real join
* bounded md5 fan-out in the optimized plan — CollapseProject merges
  projections (even through RepartitionByExpression) and runtime
  subexpression elimination skips lambda-bearing higher-order
  functions, so an expensive hash fed into a fan-out of HOF consumers
  silently re-inlines per consumer (observed 34-68 md5 nodes, >5×
  slower; fixed by computing signatures as hash aggregations over
  exploded scalars — see operators/dedup.py:_exploded_token_hashes)
"""

import pytest

from otters_spark.suite import QUERIES

# queries whose operators intentionally use mapInPandas (Arrow batches)
ARROW_OK = {
    "neardup_embedding_pairs",
    "multimodal_features",
    "multimodal_frame_sample",  # Arrow-batched frame decode kernel
    "sim_pandas_matmul_topk",
    "dedup_char_shingle_pairs",  # incidence-matmul kernel
    "dedup_containment_pairs",  # incidence-matmul kernel
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_is_scale_safe(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product:\n{plan[:1500]}"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in ARROW_OK:
        assert "MapInPandas" not in plan, f"{name}: unexpected Python stage"
    # expensive-hash fan-out guard: suite-wide max is 6 md5 nodes; the
    # re-inline failure mode lands at 30+
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("md5") <= 10, (
        f"{name}: md5 evaluated {optimized.count('md5')}x in the optimized plan "
        "— an expression fan-out re-inlined an expensive hash (see module doc)"
    )
