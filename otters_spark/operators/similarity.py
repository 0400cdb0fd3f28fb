"""Similarity search operators.

Three tiers, trading exactness for scale:

* **brute-force** (exact, the reference's own semantics) — the fluent
  plan in ``otters_spark.plan``; scoring is codegen'd JVM expressions.
  Exact and embarrassingly parallel: at 100 TB it is one scan, no
  shuffle, top-k via per-partition bounded heaps.
* **pandas/Arrow matmul** — same exact math through ``mapInPandas`` +
  NumPy BLAS; wins for wide vectors (dim >~ 256) or large query
  batches where per-element codegen loses to a (n×d)@(d×q) matmul.
* **approximate** — random-hyperplane LSH bucketing and IVF (MLlib
  KMeans coarse quantizer, "batch index build"): prune the scan to a
  few buckets/cells, then exact re-score inside. The index build is a
  batch job; search touches only matching partitions when the store
  is written partitioned by bucket/cell.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..functions.vector import dot_expr, inv_norm_of
from ..store import INV_NORM_COL, VecStore

__all__ = [
    "knn",
    "pandas_matmul_topk",
    "hyperplanes",
    "lsh_bucket_expr",
    "lsh_index",
    "lsh_search",
    "ivf_build",
    "ivf_search",
]


def knn(store: VecStore, query: Sequence[float], k: int, metric: str = "cosine") -> DataFrame:
    """Exact top-k — the reference's core query (src/vec.rs:206-311)."""
    return store.query(list(query), metric).take(k).df()


# --- Arrow/NumPy matmul path --------------------------------------------


def pandas_matmul_topk(
    df: DataFrame,
    queries: Iterable[Sequence[float]],
    k: int,
    metric: str = "cosine",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch top-k via Arrow-batched NumPy matmul: each partition
    scores (batch×dim) @ (dim×q) in one BLAS call, keeps its own
    top-k, and the global merge is ORDER BY/LIMIT over q*k rows per
    partition. Global-merge semantics match the reference's batch
    behavior (src/vec.rs:217-219)."""
    Q = np.asarray([list(map(float, q)) for q in queries], dtype=np.float64)
    if metric == "cosine":
        norms = np.linalg.norm(Q, axis=1)
        Qn = Q * np.where(norms == 0.0, 0.0, 1.0 / np.where(norms == 0, 1, norms))[:, None]
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.IntegerType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    nq = Q.shape[0]

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.asarray(np.vstack(pdf[vec_col].to_numpy()), dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            if metric == "dot":
                S = M @ Q.T
            elif metric == "cosine":
                mn = np.linalg.norm(M, axis=1)
                Mn = M * np.where(mn == 0.0, 0.0, 1.0 / np.where(mn == 0, 1, mn))[:, None]
                S = Mn @ Qn.T
            elif metric == "euclidean":
                S = (
                    (M * M).sum(1)[:, None]
                    - 2.0 * (M @ Q.T)
                    + (Q * Q).sum(1)[None, :]
                )
            else:
                raise ValueError(f"unknown metric {metric!r}")
            # per-partition top-k per query before emitting: bounds the
            # merge input to k rows per (partition, query)
            frames = []
            for qi in range(nq):
                s = S[:, qi]
                if len(s) > k:
                    idx = np.argpartition(-s if metric != "euclidean" else s, k)[:k]
                else:
                    idx = np.arange(len(s))
                frames.append(
                    pd.DataFrame(
                        {"query_id": qi, id_col: ids[idx], "score": s[idx]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    scored = df.mapInPandas(score, out_schema)
    asc = metric == "euclidean"
    order = [
        F.col("score").asc() if asc else F.col("score").desc(),
        F.col(id_col).asc(),
    ]
    return scored.orderBy(*order).limit(k)


# --- random-hyperplane LSH ----------------------------------------------


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for signature hashing."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_bucket_expr(vec_col: str, planes: np.ndarray) -> F.Column:
    """Signature bucket id: bit p = sign(dot(v, plane_p)). Pure
    codegen — each plane is a literal array folded with zip_with."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot_expr(vec_col, lit_plane) >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        bucket = bucket + bit
    return bucket


def lsh_index(
    df: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach the LSH bucket. At scale, write this partitioned by
    ``lsh_bucket`` so a search prunes to matching files (partition
    pruning does the candidate selection)."""
    return df.withColumn("lsh_bucket", lsh_bucket_expr(vec_col, planes))


def lsh_save(indexed: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist an LSH-indexed store partitioned by bucket: a search's
    ``lsh_bucket IN (...)`` filter becomes *partition pruning* — only
    the probed buckets' files are even listed/opened. Asserted in
    tests/test_ann_pruning.py."""
    indexed.write.mode(mode).partitionBy("lsh_bucket").parquet(path)


def lsh_load(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _query_buckets(q: np.ndarray, planes: np.ndarray, multiprobe: int) -> list[int]:
    proj = planes @ q
    base = 0
    for p, v in enumerate(proj):
        if v >= 0:
            base |= 1 << p
    buckets = [base]
    # multiprobe: flip the lowest-|margin| bits first
    order = np.argsort(np.abs(proj))
    for bit in order[:multiprobe]:
        buckets.append(base ^ (1 << int(bit)))
    return buckets


def lsh_search(
    indexed: DataFrame,
    query: Sequence[float],
    planes: np.ndarray,
    k: int,
    metric: str = "cosine",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe: int = 3,
) -> DataFrame:
    """ANN search: prune to the query's bucket (+ multiprobe neighbor
    buckets), then exact re-score. Recall is tunable via n_planes /
    multiprobe; the pruned scan reads only matching partitions when
    the index was written partitioned by bucket."""
    from ..functions.vector import score_expr

    q = np.asarray(list(map(float, query)), dtype=np.float64)
    buckets = _query_buckets(q, planes, multiprobe)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    inv_norm = (
        F.col(INV_NORM_COL)
        if INV_NORM_COL in indexed.columns
        else None
    )
    cand = indexed.filter(F.col("lsh_bucket").isin(buckets))
    scored = cand.withColumn(
        "score",
        score_expr(vec_col, qlit, metric, inv_norm_col=inv_norm, q_inv_norm=inv_norm_of(q)),
    )
    asc = metric == "euclidean"
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col(id_col).asc()]
    return scored.orderBy(*order).limit(k).select(id_col, "score", "lsh_bucket")


def ivf_save(assigned: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist an IVF-assigned store partitioned by cell — nprobe
    searches then prune to the probed cells' files (partition pruning),
    same layout trick as :func:`lsh_save`."""
    assigned.write.mode(mode).partitionBy("ivf_cell").parquet(path)


def ivf_load(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


# --- IVF (KMeans coarse quantizer) --------------------------------------


def ivf_build(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    init_mode: str = "k-means||",
):
    """Batch index build: MLlib KMeans over the vectors; returns
    (assigned_df, centroids ndarray). The assigned DataFrame carries
    ``ivf_cell``; persist it partitioned by cell for pruned search.
    ``init_mode='random'`` skips the k-means|| init rounds — the right
    trade when cells only need rough locality (e.g. SemDeDup blocking,
    where each KMeans round is distributed jobs and centroid QUALITY
    barely moves the result)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("__features", array_to_vector(F.col(vec_col)))
    model = KMeans(
        k=n_cells, seed=seed, maxIter=max_iter, featuresCol="__features",
        predictionCol="ivf_cell", initMode=init_mode,
    ).fit(feat)
    assigned = model.transform(feat).drop("__features")
    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: np.ndarray,
    query: Sequence[float],
    k: int,
    nprobe: int = 3,
    metric: str = "cosine",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Search the nprobe nearest cells (chosen driver-side against the
    tiny centroid table), exact re-score inside."""
    from ..functions.vector import score_expr

    q = np.asarray(list(map(float, query)), dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(1)
    cells = [int(c) for c in np.argsort(d2)[:nprobe]]
    qlit = F.array(*[F.lit(float(x)) for x in q])
    cand = assigned.filter(F.col("ivf_cell").isin(cells))
    scored = cand.withColumn(
        "score", score_expr(vec_col, qlit, metric, q_inv_norm=inv_norm_of(q))
    )
    asc = metric == "euclidean"
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col(id_col).asc()]
    return scored.orderBy(*order).limit(k).select(id_col, "score", "ivf_cell")
