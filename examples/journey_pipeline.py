"""Journey analytics end to end: from "what paths exist" to "funnel-test
the winner".

The behavior lane's intended composition (operators/behavior.py):

1. transition_matrix — which steps follow which, with probabilities
   and exact gap totals (the journey map);
2. path_counts — the most common consecutive 3-step paths (journey
   n-grams: candidates for funnel design);
3. funnel_counts — rigorous ordered-funnel measurement of the top
   discovered path (first-occurrence chaining);
4. cohort_retention — do users who complete it come back?

Every stage is one user-keyed window or aggregate — nothing
stream-proportional in a single task at any event volume.

Run: python examples/journey_pipeline.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

import otters_spark as ot  # noqa: E402
from otters_spark.operators.behavior import (  # noqa: E402
    cohort_retention,
    funnel_counts,
    path_counts,
    transition_matrix,
)
from otters_spark.suite import load_events  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = ot.get_spark(master="local[8]", shuffle_partitions=16)
    ev = load_events(spark, sf_dir)

    print("-- transition matrix (top rows by probability) --")
    tm = transition_matrix(ev)
    tm.orderBy(F.desc("prob"), "from_type", "to_type").show(10)

    print("-- most common 3-step paths --")
    paths = path_counts(ev, depth=3).orderBy(
        F.desc("n_paths"), "step_1", "step_2", "step_3"
    )
    paths.show(10)
    top = paths.first()
    steps = (
        [top["step_1"], top["step_2"], top["step_3"]] if top is not None else []
    )
    if len(set(steps)) < 3:
        # funnel steps must be distinct event types; fall back to the
        # classic trio if the top path repeats a step
        steps = ["view", "click", "purchase"]

    print(f"-- ordered funnel over the discovered path {steps} --")
    funnel_counts(ev, steps).show()

    print("-- cohort retention (1/3/7 days) --")
    cohort_retention(ev).orderBy("cohort_day").show(10)


if __name__ == "__main__":
    main(*sys.argv[1:])
