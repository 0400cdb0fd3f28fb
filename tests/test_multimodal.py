"""Multimodal plumbing: binary columns through Arrow batches."""

import hashlib

import pytest

from otters_spark.operators.multimodal import (
    attach_fake_payload,
    decode_audio,
    decode_image,
    extract_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "spark engine")], ["doc_id", "text"]
    )
    return attach_fake_payload(docs)


def test_payload_is_md5_bytes(media):
    rows = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert rows[0] == hashlib.md5(b"hello world").digest()


def test_extract_features_deterministic(media):
    rows = {r["media_id"]: r["features"] for r in extract_features(media, 4).collect()}
    expect = [float(b) for b in hashlib.md5(b"hello world").digest()[:4]]
    assert rows[0] == expect


def test_decode_stubs_raise(media):
    with pytest.raises(NotImplementedError):
        decode_image(media)
    with pytest.raises(NotImplementedError):
        decode_audio(media)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(0, 3500), (1, 999)], ["media_id", "duration_ms"])
    rows = frame_sample_plan(df, every_ms=1000).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert by_id[0] == [0, 1000, 2000, 3000]
    assert by_id[1] == [0]
