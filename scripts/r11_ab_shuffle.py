#!/usr/bin/env python
"""Round-10 verdict item 5: A/B the shuffle-partition floor.

The gap decomposition (BASELINE.md) attributes the remaining anchor-ratio
deficit to Spark's fixed per-job floor on the ~150 sub-second queries.
Hypothesis to test: `spark.sql.shuffle.partitions = 32` over-partitions the
tiny sf0.1 aggregates and AQE coalescing then pays stage-conversion cost to
undo it, so a lower initial floor would shave the per-job constant.

Method: every query whose committed BENCH_FULL.json time is < 1.0 s is timed
exactly the way bench.py times it (noop sink, min-of-2 reps, warm JVM), once
per shuffle-partition variant, in MIRRORED pass order (32, 16, 8, 8, 16, 32)
with one fresh Spark session per pass — box drift cancels across the mirror,
and each variant's final number is the min over its two passes per query.

This is a measurement harness only; it changes no engine code and no bench
methodology.  Usage:

    python scripts/r11_ab_shuffle.py            # variants 32 16 8
    python scripts/r11_ab_shuffle.py 32 8       # explicit variants
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    variants = [int(a) for a in sys.argv[1:]] or [32, 16, 8]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_FULL.json")) as f:
        prev = json.load(f)
    names = sorted(
        k for k, v in prev["queries"].items() if v is not None and v < 1.0
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))

    from otters_spark.session import get_spark
    from otters_spark.suite import QUERIES

    order = variants + list(reversed(variants))  # mirrored: A B C C B A
    results: dict[int, dict[str, float]] = {v: {} for v in variants}
    pass_walls: list[tuple[int, float]] = []

    for pidx, sp in enumerate(order):
        spark = get_spark(
            app_name=f"r11-ab-shuffle-{sp}",
            master=f"local[{cpus}]",
            shuffle_partitions=sp,
        )
        spark.sparkContext.setLogLevel("ERROR")
        # warm JVM/codegen with the cheapest stable plan (untimed)
        QUERIES["vs_dot_topk"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        t_pass = time.perf_counter()
        for name in names:
            fn = QUERIES[name]
            spark.sparkContext.setJobDescription(f"ab{sp}:{name}")
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
            cur = results[sp].get(name)
            results[sp][name] = best if cur is None else min(cur, best)
            gc.collect()
        wall = time.perf_counter() - t_pass
        pass_walls.append((sp, round(wall, 1)))
        print(
            f"pass {pidx + 1}/{len(order)} sp={sp}: {len(names)} queries, "
            f"{wall:.1f}s wall",
            flush=True,
        )
        spark.stop()

    base = variants[0]
    print(f"\n{len(names)} sub-second queries, min-of-{reps} x 2 mirrored passes")
    print(f"{'variant':>8} {'sum_sec':>8} {'vs sp=' + str(base):>10}")
    sums = {v: sum(results[v].values()) for v in variants}
    for v in variants:
        print(f"{v:>8} {sums[v]:>8.1f} {sums[v] / sums[base]:>10.3f}")
    # biggest per-query movers vs the baseline variant
    movers = sorted(
        names, key=lambda n: abs(results[variants[-1]][n] - results[base][n])
    )[-10:]
    print("\nlargest per-query deltas (baseline -> last variant):")
    for n in reversed(movers):
        print(f"  {results[base][n]:6.3f} -> {results[variants[-1]][n]:6.3f}  {n}")
    out = {
        "names": names,
        "pass_walls": pass_walls,
        "sums": {str(v): round(s, 2) for v, s in sums.items()},
        "per_query": {
            str(v): {n: round(t, 3) for n, t in results[v].items()}
            for v in variants
        },
    }
    with open("/tmp/r11_ab_shuffle.json", "w") as f:
        json.dump(out, f)
    print("\ndetail: /tmp/r11_ab_shuffle.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
