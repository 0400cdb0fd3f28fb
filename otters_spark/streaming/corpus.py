"""Streaming corpus ingestion — the cleaning lane applied as documents
LAND rather than in nightly batches.

Every per-doc gate in ``operators.text_analysis`` / ``operators.pii``
is a stateless narrow transformation (no shuffle, no state store), so
the exact same Column expressions run unchanged under Structured
Streaming: each micro-batch is scrubbed/gated at scan speed and the
batch pipeline remains the oracle. That property is by construction —
the operators avoid explode+groupBy formulations (see
``repetition_features``) — and is locked in by
``tests/test_streaming_corpus.py``.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["DOCUMENTS_SCHEMA", "stream_documents"]

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (symlink staging
    into a landing dir, same shape as ``events.stream_events``)."""
    src = os.path.join(sf_dir, "documents.parquet")
    landing = tempfile.mkdtemp(prefix="otters_docs_landing_")
    os.symlink(os.path.abspath(src), os.path.join(landing, "documents.parquet"))
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA).format("parquet").load(landing)
    )
