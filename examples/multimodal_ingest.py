#!/usr/bin/env python
"""Multimodal ingestion demo — file system to feature table:

    directory of raw media files -> binaryFile source
    (sources.read_binary_files, the engine's payload contract)
    -> byte-exact dedup gate -> Arrow-batched feature extraction
    -> perceptual-hash near-dup pairs -> keep-one winners
    -> decode lanes (import-gated: live where PIL/soundfile exist,
       documented NotImplementedError here).

The reference is vector-search only; this is the extension lane a
training-data pipeline needs for image/audio corpora. Everything
below the source is the same Arrow mapInPandas plumbing the suite
oracle-checks on the parquet testdata (multimodal_* queries).

Run:  python examples/multimodal_ingest.py [media_dir]
      (no media_dir: synthesizes a small corpus under /tmp with
      duplicate payloads planted)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import otters_spark as ot
from otters_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    extract_features,
    perceptual_neardup_pairs,
)
from otters_spark.sources import read_binary_files


def _synthesize_corpus() -> str:
    root = tempfile.mkdtemp(prefix="otters_media_")
    # deterministic fake media with phash-visible structure (the
    # aHash stand-in thresholds the leading hex nibbles against the
    # global mean, so the patterns below need high/low contrast):
    # 002/005 are byte-exact duplicates, 003 is a 1-byte near-dup of
    # 001, 004 is 001's inverse (maximally far)
    pat_a = b"\xff\x00" * 32
    pat_b = b"\x0f\xf0" * 32
    blobs = {
        "img_001.bin": pat_a,
        "img_002.bin": pat_b,
        "img_003.bin": pat_a[:10] + b"\x0f" + pat_a[11:],  # near-dup of 001
        "img_004.bin": b"\x00\xff" * 32,                    # inverse of 001
        "img_005.bin": pat_b,                               # dup of 002
        "img_006.bin": bytes(range(64)),
    }
    for name, payload in blobs.items():
        with open(os.path.join(root, name), "wb") as f:
            f.write(payload)
    return root


def main() -> int:
    media_dir = sys.argv[1] if len(sys.argv) > 1 else _synthesize_corpus()
    spark = ot.get_spark(app_name="otters-multimodal-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. ingest: one row per file, stable hash ids, size column
    #    filterable BEFORE content reads (binaryFile pushdown)
    media = read_binary_files(spark, media_dir, glob="*.bin")
    media = media.filter(F.col("n_bytes") > 0)
    n0 = media.count()
    print(f"ingested {n0} media files from {media_dir}")

    # 2. byte-exact dedup gate: md5 over the payload, keep min id per
    #    digest — the cheap gate before any decode work
    hashed = media.withColumn("digest", F.md5(F.col("payload")))
    keep = hashed.groupBy("digest").agg(F.min("media_id").alias("media_id"))
    deduped = hashed.join(F.broadcast(keep), ["digest", "media_id"]).drop("digest")
    n1 = deduped.count()
    print(f"byte-exact dedup: {n0} -> {n1}")

    # 3. Arrow-batched feature extraction (deterministic stand-in
    #    kernel; swap for a model forward pass — the batch shape is
    #    the production one)
    feats = extract_features(
        deduped.select("media_id", "payload"), n_features=4
    )
    print("feature table:")
    feats.show(6, truncate=False)

    # 4. perceptual-hash near-dup lane: 32-bit fingerprints, banded
    #    pigeonhole candidates, Hamming-verified pairs
    pairs = perceptual_neardup_pairs(
        deduped, max_hamming=4, id_col="media_id"
    )
    print(f"phash near-dup pairs (hamming<=4): {pairs.count()}")
    pairs.show(10, truncate=False)

    # 5. decode lanes are import-gated: live where the codec exists,
    #    fast documented error here (this container has none)
    for lane, fn in (("image", decode_image), ("audio", decode_audio)):
        try:
            fn(deduped).show(2)
        except NotImplementedError as e:
            print(f"{lane} decode gate: {e}")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
