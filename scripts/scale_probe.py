#!/usr/bin/env python
"""Empirical scaling probe: replicate the sf0.1 documents table 10x
(ids shifted per replica, one varied token per replica so replicas are
near-dups rather than exact copies — the workload gets DENSER, not
just bigger) and time the headline dedup/linkage suite queries at both
scales in one session.

Usage:  python scripts/scale_probe.py [replicas]

Checks the claim SCALE.md makes qualitatively: the pair generators are
bucketed/blocked, so wall time grows far sub-linearly in corpus size
while the pair OUTPUT (inherently quadratic in dup-cluster size) can
grow super-linearly.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

QUERIES = [
    "dedup_minhash_banded_verified",
    "dedup_frequent_segments",
    "dedup_span_removal",
    "link_fuzzy_best_match",
    "dedup_incremental_ingest",
    # session-8 governance lane (documents-table queries only — the
    # probe replicates documents, not the TPC-H tables)
    "pipeline_shuffle_shards",
    "pipeline_drift_psi",
    # session-9: cluster-granular splitting + collocation mining
    # (documents) and late-interaction / L1 retrieval (embeddings)
    "pipeline_leakage_safe_split",
    "text_pmi_topk",
    "sim_maxsim_topk",
    "vs_manhattan_topk",
    # round-4: novelty (df-aggregate + probe join), weighted sampling
    # (scan-fused keys + grouped top-n), dim stats (posexplode + agg)
    "text_ngram_novelty",
    "pipeline_weighted_sample",
    "sim_dim_stats",
    # round-4 second wave: entity clustering (documents), binary-quant
    # ANN (embeddings)
    "link_entity_clusters",
    # round-5: survivorship on top of the resolved clusters — the
    # trigram-blocked candidate join plus two entity-keyed aggregates
    # must scale with cluster density, not corpus^2
    "link_golden_records",
    "sim_binary_quant_topk",
    # fourth wave: corpus-stat scans (one-pass regex/count shapes),
    # byte-exact multimodal gate, quantized-tier recall curve
    "text_zipf_slope",
    "text_readability",
    "text_heaps_curve",
    "pipeline_curriculum_buckets",
    "multimodal_exact_dedup",
    "eval_quant_recall_curve",
    # round-6: weighted_percentiles now accumulates in decimal(38,0)
    # end-to-end (cast-before-accumulate) — re-probe the suite query
    # riding that plan; phash threshold now runs over the sliced
    # 32-cell window
    "text_weighted_length",
    "multimodal_phash_neardup",
    # round-7: the formerly-rows-only queries now ride deterministic
    # plans (NB closed-form fit; SRP cells for semdedup/IVF/PQ) —
    # probe the changed Spark plans at 10x
    "pipeline_quality_model",
    "pipeline_semdedup",
    "sim_ivf_topk",
    "sim_pq_topk",
]

# events-lane probe: the third table family. Replication shifts each
# copy by a whole number of days with event ids re-keyed but the SAME
# user_ids — per-user history grows replicas-fold across disjoint
# days (the shape real traffic growth takes), and the SCD2 lookup
# keeps joining the unreplicated customer dimension.
EVENTS_QUERIES = [
    "events_sessionization",
    "events_asof_attribution",
    "events_funnel_conversion",
    "events_anomaly_mad",
    "events_drift_window",
    "events_scd2_lookup",
    # round-4 journey lane: one user-keyed window + pair/path-keyed agg
    "events_transition_matrix",
    "events_common_paths",
    # round-4 second wave: interval sweep-line, daily EWMA (series
    # grows 30 -> 300 days, still far under the 900-row guard),
    # growth accounting, rolling actives
    "events_interval_coverage",
    "events_ewma_daily",
    "events_cumulative_users",
    "events_rolling_actives",
    # sixth/seventh wave: ACF (series grows 30 -> 300 points/key),
    # Mann-Whitney (distinct-value table grows 10x, binned device),
    # chi-squared (cells stay |types| x 7)
    "events_acf_daily",
    "events_mann_whitney",
    "events_chi_square",
    # later waves: WOE cells, cohort LTV, forecast scorecard, skew
    # report, item-item CF over session baskets
    "events_woe_hour",
    "events_cohort_ltv",
    "events_forecast_eval",
    "events_skew_report",
    "events_item_neighbors",
]

# fact-lane probe: orders + lineitem replicated with shifted order
# keys; part/supplier/customer and the nation/region dims stay
# UNREPLICATED (the star-schema growth shape: facts grow, dims don't).
# Per-part / per-supplier / per-month groups get replicas-fold fatter
# — exactly what stresses the decorrelated-aggregate joins.
REL_QUERIES = [
    "rel_forecast_revenue",      # pure pushdown scan-agg
    "rel_product_type_profit",   # 4-way join, broadcast dims
    "rel_important_parts",       # agg + one-row-broadcast threshold
    "rel_supplier_part_counts",  # distinct pairs + anti-join
    "rel_promotable_suppliers",  # conditional agg, HAVING in longs
    "rel_revenue_trend",         # monthly rollup -> moment aggregate
    "rel_incremental_join",      # both-side CDC churn, delta-join
    "rel_benford_audit",         # 1 scan -> 9 cells
]


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    # optional: probe only the named queries (args after replicas)
    only = set(sys.argv[2:])
    from otters_spark.session import get_spark
    from otters_spark import suite

    spark = get_spark(app_name="otters-scale-probe")
    spark.range(10).count()
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{base_dir}/documents.parquet")

    reps = [
        docs.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.lit(f"rep{k}")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for k in range(replicas)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    tmp = tempfile.mkdtemp(prefix="otters_scale_probe_")
    big.write.parquet(f"{tmp}/documents.parquet")
    n_small = docs.count()
    n_big = spark.read.parquet(f"{tmp}/documents.parquet").count()
    print(f"probe corpus: {n_small} -> {n_big} docs ({replicas}x)")

    # embeddings replicate with shifted ids (vectors unchanged — the
    # retrieval probes measure scan/agg scaling, not dup density)
    emb = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    bige = None
    for k in range(replicas):
        rep = emb.select(
            (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
            "embedding",
            "label",
        )
        bige = rep if bige is None else bige.unionByName(rep)
    bige.write.parquet(f"{tmp}/embeddings.parquet")

    # events replicate day-shifted (same users, same dimension): the
    # per-user history grows replicas-fold across disjoint days — the
    # shape of real traffic growth. customer links in unchanged for
    # the SCD2 lookup.
    ev = spark.read.parquet(f"{base_dir}/events.parquet")
    ts_is_long = dict(ev.dtypes).get("ts") == "bigint"
    bige_v = None
    for k in range(replicas):
        shift = (
            (F.col("ts") + F.lit(k * 86_400_000_000_000))
            if ts_is_long
            else F.col("ts") + F.expr(f"INTERVAL {k} DAYS")
        )
        rep = ev.select(
            (F.col("event_id") + k * 10_000_000).alias("event_id"),
            shift.alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        bige_v = rep if bige_v is None else bige_v.unionByName(rep)
    bige_v.write.parquet(f"{tmp}/events.parquet")
    os.symlink(
        os.path.abspath(f"{base_dir}/customer.parquet"),
        f"{tmp}/customer.parquet",
    )

    # orders/lineitem replicate with shifted order keys; every other
    # table links in unreplicated (dimension discipline)
    orders = spark.read.parquet(f"{base_dir}/orders.parquet")
    bago = None
    for k in range(replicas):
        rep = orders.select(
            (F.col("o_orderkey") + k * 100_000_000).alias("o_orderkey"),
            "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        )
        bago = rep if bago is None else bago.unionByName(rep)
    bago.write.parquet(f"{tmp}/orders.parquet")
    li = spark.read.parquet(f"{base_dir}/lineitem.parquet")
    bagl = None
    for k in range(replicas):
        rep = li.select(
            (F.col("l_orderkey") + k * 100_000_000).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        )
        bagl = rep if bagl is None else bagl.unionByName(rep)
    bagl.write.parquet(f"{tmp}/lineitem.parquet")
    for dim in ("part", "supplier", "nation", "region"):
        os.symlink(
            os.path.abspath(f"{base_dir}/{dim}.parquet"),
            f"{tmp}/{dim}.parquet",
        )

    for q in QUERIES + EVENTS_QUERIES + REL_QUERIES:
        if only and q not in only:
            continue
        t = time.time()
        r1 = suite.QUERIES[q](spark, base_dir).count()
        t1 = time.time() - t
        t = time.time()
        rn = suite.QUERIES[q](spark, tmp).count()
        tn = time.time() - t
        print(
            f"{q}: {t1:.2f}s ({r1} rows) -> {tn:.2f}s ({rn} rows) "
            f"= {tn / t1:.1f}x time for {replicas}x data"
        )

    # The suite's link_entity_clusters / link_golden_records run the
    # EXACT shingle-inverted-index candidate generator (oracle
    # checkability) — quadratic in duplicate density, and this probe
    # turns every doc into a replicas-sized near-dup clique, so those
    # rows blow up BY DESIGN (SCALE.md §Linkage). The production
    # dup-dense path is method='banded' (MinHash LSH candidates +
    # exact verify); time the full banded resolution + survivorship
    # here to pin that the shipping path scales.
    def banded_golden(d: str) -> int:
        from otters_spark.operators.linkage import (
            entity_clusters,
            golden_records,
        )

        docs = spark.read.parquet(f"{d}/documents.parquet")
        ent = entity_clusters(
            docs,
            threshold=0.8,
            method="banded",
            block_cols=("lang", "source"),
        )
        gold = golden_records(
            docs,
            ent,
            {
                "text": "longest",
                "lang": "most_frequent",
                "source": "most_frequent",
                "n_chars": "max",
            },
        )
        return gold.count()

    if not only or "banded_golden_records" in only:
        t = time.time()
        r1 = banded_golden(base_dir)
        t1 = time.time() - t
        t = time.time()
        rn = banded_golden(tmp)
        tn = time.time() - t
        print(
            f"banded_golden_records: {t1:.2f}s ({r1} rows) -> {tn:.2f}s "
            f"({rn} rows) = {tn / t1:.1f}x time for {replicas}x data"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
