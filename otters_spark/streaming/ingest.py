"""Streaming ingest gate: dedup documents against a static corpus as
they LAND — the streaming twin of ``operators.dedup.incremental_dedup``.

The gate's verdict for a new document depends only on that document
and the (static) corpus — never on other stream rows — so gating each
micro-batch independently IS the batch semantics: the union of
admitted rows over any micro-batch partitioning equals one batch call
over the same rows (locked in by ``tests/test_streaming_ingest.py``).
That row-wise independence is why ``foreachBatch`` + the batch
operator is the right realization, not a bespoke stateful operator:
every scale property of the batch gate (band-bucket shuffles, never
|new| x |corpus|; unblocked md5 pre-gate) carries over per batch.

What this gate does NOT do: intra-stream dedup. Two near-identical
docs arriving in different micro-batches both pass if neither matches
the corpus. Compose ``stateful.streaming_exact_dedup`` upstream for
cross-batch exact dups; for cross-batch NEAR dups, fold admitted
batches back into the corpus and rebuild the ``PreparedCorpus``
between restarts. The corpus side is a SNAPSHOT by construction: the
gate persists its derived artifacts (keys/signatures/tokens) once at
gate build, so files appended to a corpus directory mid-stream are
deliberately NOT picked up — a gate whose reference set silently
shifts under a running query is not reproducible.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

from ..operators.dedup import PreparedCorpus, prepare_ingest_corpus

__all__ = [
    "maintained_join_view",
    "streaming_component_maintenance",
    "streaming_ingest_gate",
    "streaming_maintained_aggregate",
    "streaming_maintained_join",
]


def streaming_ingest_gate(
    stream: DataFrame,
    corpus: "DataFrame | PreparedCorpus",
    admit: Callable[[DataFrame, int], None],
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    block_cols: Sequence[str] = (),
) -> DataStreamWriter:
    """Configure (not start) a stream writer that gates every
    micro-batch against ``corpus`` with
    ``operators.dedup.incremental_dedup`` and hands the ADMITTED rows
    to ``admit(df, batch_id)``. Caller picks trigger/checkpoint and
    calls ``.start()``.

    A raw ``corpus`` DataFrame is prepared ONCE here (content keys,
    banded signatures and token arrays derived and persisted via
    ``prepare_ingest_corpus``) — without that, every micro-batch
    re-scans and re-hashes the entire static corpus and a short
    trigger interval cannot keep up. Pass an existing
    ``PreparedCorpus`` to share artifacts across gates;
    ``unpersist()`` it when the gate retires (artifacts built here are
    released when the session ends)."""
    from ..operators.dedup import incremental_dedup

    prepared = (
        corpus
        if isinstance(corpus, PreparedCorpus)
        else prepare_ingest_corpus(
            corpus, text_col, id_col, n_hashes, bands, block_cols
        )
    )
    # fail fast at gate construction: a parameter mismatch raising
    # inside foreachBatch would kill the whole streaming query at the
    # first micro-batch instead of here
    prepared.check(n_hashes, bands, block_cols, text_col, id_col)

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        admit(
            incremental_dedup(
                batch_df,
                prepared,
                threshold,
                text_col,
                id_col,
                n_hashes,
                bands,
                block_cols,
            ),
            batch_id,
        )

    return stream.writeStream.foreachBatch(_gate).outputMode("append")


def streaming_maintained_aggregate(
    stream: DataFrame,
    agg_path: str,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataStreamWriter:
    """Configure (not start) a stream writer that MAINTAINS a
    per-group sum/count aggregate table at ``agg_path`` from an
    append-only stream — the streaming face of
    ``sources.merge.apply_agg_delta``: each micro-batch becomes a
    +1-signed change feed, the previous aggregate parquet is read,
    the delta applied, and the table atomically replaced (write to
    ``<path>.next``, then swap). New aggregate reads touch one tiny
    table instead of re-scanning the stream's history — the
    incremental-maintenance contract, now fed by a stream.

    Exactly-once caveat, stated not hidden: foreachBatch retries can
    re-apply a batch after a crash between swap and checkpoint
    commit. Production pairs this with an idempotent sink (batch_id
    recorded in the table, MERGE on it) or a transactional format;
    this writer records ``last_batch_id`` and SKIPS batches it has
    already applied, which closes the common restart path (replayed
    batch ids repeat under Structured Streaming's contract)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..sources.merge import apply_agg_delta

    g = list(group_cols)
    sums = list(sum_cols)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        feed = batch_df.select(
            *g, *sums, F.lit(1).alias("__sign")
        )
        if os.path.exists(agg_path):
            old = spark.read.parquet(agg_path)
            applied = old.select(F.max("__last_batch_id")).collect()[0][0]
            if applied is not None and batch_id <= applied:
                return  # replayed batch after restart: already applied
            old = old.drop("__last_batch_id")
        else:
            schema = ", ".join(
                [f"`{c}` {dict(batch_df.dtypes)[c]}" for c in g]
                + [f"`{c}` bigint" for c in sums]
                + [f"`{count_col}` bigint"]
            )
            old = spark.createDataFrame([], schema)
        new = apply_agg_delta(old, feed, g, sums, count_col=count_col)
        nxt = agg_path + ".next"
        new.withColumn("__last_batch_id", F.lit(batch_id)).coalesce(
            1
        ).write.mode("overwrite").parquet(nxt)
        if os.path.exists(agg_path):
            shutil.rmtree(agg_path)
        os.replace(nxt, agg_path)

    return stream.writeStream.foreachBatch(_apply).outputMode("append")


def streaming_component_maintenance(
    pair_stream: DataFrame,
    comp_path: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataStreamWriter:
    """Configure (not start) a stream writer that MAINTAINS a
    near-dup component table at ``comp_path`` from a stream of match
    PAIRS — the streaming face of
    ``operators.dedup.incremental_components``: each micro-batch of
    pairs merges into the standing ``(id, component)`` table through
    the contracted component graph, so per-batch cost tracks the
    batch and the corpus-wide re-cluster never reruns. After any
    micro-batch partitioning of the same pairs, the table equals one
    ``connected_components`` call over all of them (locked in by
    ``tests/test_streaming_components.py``) — THE streaming dedup
    state: compose downstream of an ingest gate whose match lane
    emits (new_id, corpus_id) pairs.

    Same durability contract as ``streaming_maintained_aggregate``:
    write-to-``.next`` + atomic swap, ``__last_batch_id`` recorded and
    replayed batches SKIPPED (closes the restart double-apply path;
    a transactional table format closes the residual crash window
    between swap and checkpoint commit)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from ..operators.dedup import incremental_components

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        pairs = batch_df.select(
            F.col(id_a).alias("id_a"), F.col(id_b).alias("id_b")
        )
        if os.path.exists(comp_path):
            old = spark.read.parquet(comp_path)
            applied = old.select(F.max("__last_batch_id")).collect()[0][0]
            if applied is not None and batch_id <= applied:
                return  # replayed batch after restart: already applied
            old = old.drop("__last_batch_id")
        else:
            old = spark.createDataFrame(
                [], f"`id` {dict(pairs.dtypes)['id_a']}, "
                    f"`component` {dict(pairs.dtypes)['id_a']}"
            )
        new = incremental_components(old, pairs)
        nxt = comp_path + ".next"
        new.withColumn("__last_batch_id", F.lit(batch_id)).coalesce(
            1
        ).write.mode("overwrite").parquet(nxt)
        if os.path.exists(comp_path):
            shutil.rmtree(comp_path)
        os.replace(nxt, comp_path)

    return pair_stream.writeStream.foreachBatch(_apply).outputMode("append")

def streaming_maintained_join(
    stream: DataFrame,
    partial_path: str,
    on: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> "DataStreamWriter":
    """Configure (not start) a writer that maintains the STREAM-side
    PARTIAL aggregate of a join view — the streaming face of
    ``sources.merge.join_change_feed`` for the star-schema case where
    facts stream in and the dimension churns independently.

    Design choice, stated up front: the maintained state is
    ``P(join_key -> sums, n)`` — facts PRE-AGGREGATED to the join key,
    change-sized to maintain (each micro-batch is a +1 feed into
    :func:`~otters_spark.sources.merge.apply_agg_delta`) and
    key-bounded to store. The final view is derived per read by
    :func:`maintained_join_view` as ``P ⨝ dim → aggregate`` — a
    PARTIAL-sized join, never a re-scan of stream history — so
    dimension churn (re-segmented customers, renamed categories) is
    picked up on the next read WITHOUT replaying facts: the R_old ⨝ ΔS
    term of the delta-join identity degenerates to "re-join the
    partials", exactly because P already collapsed R onto the join
    key. A maintained view that instead froze dim attributes into the
    state would silently serve stale joins forever.

    Same exactly-once posture as streaming_maintained_aggregate:
    ``last_batch_id`` recorded, replayed batches skipped."""
    keys = list(on)
    return streaming_maintained_aggregate(
        stream, partial_path, keys, list(sum_cols), count_col=count_col
    )


def maintained_join_view(
    spark: "SparkSession",
    partial_path: str,
    dim: DataFrame,
    on: Sequence[str],
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Derive the final join view from :func:`streaming_maintained_join`
    partials: ``P ⨝ dim`` (inner — facts whose dimension row vanished
    drop out, matching a batch rebuild over the current dim), then
    re-aggregate the partial sums/counts to ``group_cols``. Cost is
    |P| x broadcast(dim attrs), independent of stream history."""
    from pyspark.sql import functions as F

    p = spark.read.parquet(partial_path).drop("__last_batch_id")
    j = p.join(F.broadcast(dim), list(on))
    return j.groupBy(*group_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.sum(count_col).alias(count_col),
    )
