"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched pandas
iterators (``mapInPandas``).

The Spark-side machinery here is real and tested — schemas, batch
iteration, partition behavior, UDF signatures. The actual media
codecs (PIL/ffmpeg/torchaudio) are NOT in this environment, so the
decode step is stubbed two ways:

* ``decode_image`` / ``decode_audio`` raise ``NotImplementedError``
  with the exact library call a production deployment would make;
* ``fake_feature_extractor`` is a deterministic stand-in (first bytes
  of the payload as features) so the full pipeline — binary column ->
  mapInPandas -> feature vector — runs and is oracle-checkable.

At 100 TB: binary payloads dominate row size, so these operators
repartition by byte budget, not row count; Arrow batch size is capped
via spark.sql.execution.arrow.maxRecordsPerBatch (set in session.py)
to keep executor memory bounded at ~batch*payload bytes.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_payload",
    "decode_image",
    "decode_audio",
    "extract_features",
    "frame_sample_plan",
]

#: canonical multimodal row: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic binary payload column from existing data
    (md5 bytes of the text) — exercises BinaryType plumbing without
    shipping real media in the test environment."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.unhex(F.md5(F.col("text"))).alias("payload"),
        F.lit("image").alias("media_type"),
        F.lit("application/x-fake").alias("mime"),
    )


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB — production implementation decodes via PIL:
    ``Image.open(io.BytesIO(payload)).convert("RGB")`` inside the
    mapInPandas iterator below. The image codecs are not available in
    this environment."""
    raise NotImplementedError(
        "image decode requires PIL/pillow; wire Image.open into "
        "extract_features' iterator in a deployment with codecs installed"
    )


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB — production implementation: soundfile/torchaudio load +
    resample inside the Arrow batch iterator."""
    raise NotImplementedError("audio decode requires soundfile/torchaudio")


def extract_features(
    df: DataFrame,
    n_features: int = 4,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The iterator shape (Iterator[pd.DataFrame] -> Iterator[pd.DataFrame])
    is exactly what a real embedding model would use — swap
    ``fake_feature_extractor`` for a model forward pass. Deterministic
    stand-in features: the first ``n_features`` bytes of the payload as
    doubles."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def fake_feature_extractor(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                [float(b) for b in (bytes(p)[:n_features] if p is not None else b"")]
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(fake_feature_extractor, out_schema)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (the decode of each frame is the stubbed step). Pure
    Catalyst — explode a generated sequence, no UDF."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
