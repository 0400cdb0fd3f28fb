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

__all__ = ["streaming_ingest_gate"]


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
