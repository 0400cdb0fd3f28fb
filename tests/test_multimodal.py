"""Multimodal plumbing: binary columns through Arrow batches."""

import hashlib

from pyspark.sql import functions as F

import pytest

from otters_spark.operators.multimodal import (
    attach_fake_payload,
    decode_audio,
    decode_frames,
    decode_image,
    extract_features,
    frame_sample_plan,
    resize_images,
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
    # codec-less environments must fail FAST with the documented
    # production pointer; with pillow installed decode_image is live
    # instead (tests/test_multimodal_codecs.py)
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            decode_image(media)
    try:
        import soundfile  # noqa: F401
    except ImportError:
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


def test_typed_meta_schemas():
    from otters_spark.operators.multimodal import (
        AUDIO_META_SCHEMA,
        IMAGE_META_SCHEMA,
        VIDEO_META_SCHEMA,
    )

    assert [f.name for f in IMAGE_META_SCHEMA] == [
        "width", "height", "channels", "exif_rotated"]
    assert [f.name for f in AUDIO_META_SCHEMA] == [
        "sample_rate_hz", "channels", "duration_ms", "codec"]
    assert [f.name for f in VIDEO_META_SCHEMA] == [
        "width", "height", "fps", "duration_ms", "codec"]
    # durations are long (100TB: ms since epoch-scale values), rates int
    assert AUDIO_META_SCHEMA["duration_ms"].dataType.typeName() == "long"
    assert VIDEO_META_SCHEMA["fps"].dataType.typeName() == "double"


def test_fake_video_meta_struct(spark):
    from otters_spark.operators.multimodal import VIDEO_META_SCHEMA, attach_fake_video

    docs = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    media = attach_fake_video(docs)
    meta_type = media.schema["video_meta"].dataType
    assert [f.name for f in meta_type] == [f.name for f in VIDEO_META_SCHEMA]
    row = media.collect()[0]
    # len("hello world") = 11 -> (11 % 10)*1000 + 500 = 1500
    assert row["video_meta"]["duration_ms"] == 1500
    assert row["media_type"] == "video" and len(row["payload"]) == 16


def test_decode_frames_pipeline(spark):
    from otters_spark.operators.multimodal import attach_fake_video, decode_frames

    docs = spark.createDataFrame(
        [(1, "x" * 11), (2, "y" * 23)], ["doc_id", "text"]  # dur 1500, 3500
    )
    media = attach_fake_video(docs)
    flat = media.select(
        "media_id", "payload", F.col("video_meta.duration_ms").alias("duration_ms")
    )
    frames = decode_frames(flat, every_ms=1000).collect()
    got = {(r["media_id"], r["frame_ts_ms"]): r["frame_sig"] for r in frames}
    assert sorted(got) == [(1, 0), (1, 1000), (2, 0), (2, 1000), (2, 2000), (2, 3000)]
    # fake lane is reproducible: md5(payload_hex + ts) first 8 hex chars
    import hashlib

    payload_hex = hashlib.md5(b"x" * 11).hexdigest()
    want = int(hashlib.md5((payload_hex + "1000").encode()).hexdigest()[:8], 16)
    assert got[(1, 1000)] == want


def test_decode_frames_custom_decoder(spark):
    from otters_spark.operators.multimodal import attach_fake_video, decode_frames

    docs = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    flat = attach_fake_video(docs).select(
        "media_id", "payload", F.col("video_meta.duration_ms").alias("duration_ms")
    )
    out = decode_frames(flat, every_ms=1000, decoder=lambda p, ts: len(p) + ts).collect()
    assert {r["frame_sig"] for r in out} == {16, 1016, 2016, 3016}


def test_resize_images_deterministic(spark):
    import hashlib

    from otters_spark.operators.multimodal import attach_fake_payload, resize_images

    docs = spark.createDataFrame(
        [(1, "hello"), (2, None)], ["doc_id", "text"]
    )
    media = attach_fake_payload(docs)  # payload NULL for null text
    out = {r["media_id"]: r for r in resize_images(media, 32, 32).collect()}
    assert out[1]["width"] == 32 and out[1]["height"] == 32
    want = hashlib.md5(hashlib.md5(b"hello").digest() + b"32x32").digest()
    assert bytes(out[1]["payload"]) == want
    assert out[2]["payload"] is None  # NULL passes through

    # custom resizer is a drop-in
    out2 = resize_images(media, 8, 8, resizer=lambda p, w, h: p[:4]).collect()
    assert all(r["payload"] is None or len(r["payload"]) == 4 for r in out2)


def test_resize_images_real_pil_decoder(spark):
    """Real-codec lane: the same resize_images plumbing with an actual
    PIL decode→resize→encode resizer. Runs only where pillow is
    installed (skipped in the codec-less sandbox); proves the stubbed
    step is a drop-in boundary, not a design hole."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    def png_bytes(w, h, color):
        buf = io.BytesIO()
        PIL_Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    def pil_resizer(payload, w, h):
        img = PIL_Image.open(io.BytesIO(payload)).convert("RGB").resize((w, h))
        out = io.BytesIO()
        img.save(out, format="PNG")
        return out.getvalue()

    media = spark.createDataFrame(
        [(1, png_bytes(64, 48, (255, 0, 0))), (2, None)],
        "media_id long, payload binary",
    )
    out = {
        r["media_id"]: r for r in resize_images(media, 16, 12, resizer=pil_resizer).collect()
    }
    resized = PIL_Image.open(io.BytesIO(bytes(out[1]["payload"])))
    assert resized.size == (16, 12)
    assert resized.convert("RGB").getpixel((0, 0)) == (255, 0, 0)
    assert out[2]["payload"] is None


def test_decode_frames_real_pyav_decoder(spark):
    """Real-codec lane for the frame pipeline: decode_frames with a
    PyAV-backed decoder over a genuine encoded video. Runs only where
    av is installed (skipped in the codec-less sandbox)."""
    av = pytest.importorskip("av")
    import io

    import numpy as np

    def make_video(n_frames=3, fps=1):
        buf = io.BytesIO()
        container = av.open(buf, mode="w", format="mp4")
        stream = container.add_stream("mpeg4", rate=fps)
        stream.width, stream.height = 64, 48
        stream.pix_fmt = "yuv420p"
        for i in range(n_frames):
            arr = np.full((48, 64, 3), i * 40, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
        container.close()
        return buf.getvalue()

    def pyav_decoder(payload, frame_ts_ms):
        with av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            container.seek(
                int(frame_ts_ms * av.time_base / 1000), any_frame=True
            )
            frame = next(container.decode(stream))
            # luma mean as the frame signature
            return int(frame.to_ndarray(format="gray").mean())

    video = make_video()
    media = spark.createDataFrame(
        [(1, video, 3000)], "media_id long, payload binary, duration_ms long"
    )
    rows = decode_frames(media, every_ms=1000, decoder=pyav_decoder).collect()
    assert len(rows) == 3
    assert all(r["frame_sig"] is not None for r in rows)


# ----------------------------------------------------- perceptual hash


def test_perceptual_hash_mean_threshold(spark):
    from otters_spark.operators.multimodal import perceptual_hash_table

    # payload bytes 0x00..0x0F: nibbles 0,0,0,1,...,0,15 — exactly the
    # nibbles above the mean set their bit
    payload = bytes(range(16))
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    r = perceptual_hash_table(df).first()
    nibbles = [n for b in payload for n in (b >> 4, b & 15)]
    mean_n, s = len(nibbles), sum(nibbles)
    expect = sum(1 << i for i, c in enumerate(nibbles) if c * mean_n > s)
    assert r["phash"] == expect


def test_perceptual_neardup_hamming_exactness(spark):
    from otters_spark.operators.multimodal import (
        perceptual_hash_table,
        perceptual_neardup_pairs,
    )

    base = bytes(range(16))
    flip1 = bytes([base[0] ^ 0xF0]) + base[1:]   # perturb first nibble
    far = bytes([b ^ 0xFF for b in base])         # complement everything
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, flip1), (4, far), (5, None)],
        "doc_id long, payload binary",
    )
    t = {r["doc_id"]: r["phash"] for r in perceptual_hash_table(df).collect()}
    assert 5 not in t  # NULL payload: no row
    assert t[1] == t[2]
    d13 = bin(t[1] ^ t[3]).count("1")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in perceptual_neardup_pairs(df, max_hamming=max(3, d13)).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == d13 and pairs[(2, 3)] == d13


def test_perceptual_banded_equals_allpairs(spark, sf_dir):
    from otters_spark.operators.dedup import fingerprint_banded_pairs
    from otters_spark.operators.multimodal import (
        attach_fake_payload,
        perceptual_hash_table,
    )
    from pyspark.sql import functions as F

    media = attach_fake_payload(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    t = perceptual_hash_table(media, id_col="media_id")
    banded = fingerprint_banded_pairs(t, 6, id_col="media_id", fp_col="phash", bits=32)
    a, b = t.alias("a"), t.alias("b")
    allpairs = (
        a.join(b, F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
    )
    assert banded.exceptAll(allpairs).count() == 0
    assert allpairs.exceptAll(banded).count() == 0


def test_perceptual_hash_long_payloads_discriminate(spark):
    """Payloads longer than 16 bytes must still produce discriminating
    fingerprints: the mean threshold runs over exactly the 32 hashed
    cells, not every nibble of the payload (round-6 fix — the old
    whole-payload sum inflated the threshold ~len/16-fold and
    collapsed all long-payload fingerprints toward 0). A 64-byte
    high/low pattern, its 1-byte perturbation, and its inverse must
    come out close / far respectively; and for 16-byte payloads the
    fix is a no-op (slice == whole)."""
    from otters_spark.operators.multimodal import perceptual_hash_table

    pat_a = b"\xff\x00" * 32
    rows = [
        (1, pat_a),
        (2, pat_a[:10] + b"\x0f" + pat_a[11:]),  # 1-byte perturbation
        (3, b"\x00\xff" * 32),                    # inverse pattern
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    t = {r["doc_id"]: r["phash"] for r in perceptual_hash_table(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert t[1] != 0, "long payload must not collapse to the zero hash"
    assert ham(t[1], t[2]) <= 2
    assert ham(t[1], t[3]) >= 16


def test_perceptual_hash_images_rejects_oversized_grid(spark):
    """shiftleft wraps its shift count mod 64, so >64 cells must be a
    loud error, never silent bit aliasing."""
    import pytest as _pytest

    pil = True
    try:
        import PIL  # noqa: F401
    except ImportError:
        pil = False
    from otters_spark.operators.multimodal import perceptual_hash_images

    df = spark.createDataFrame([(1, b"x")], "media_id long, payload binary")
    if pil:
        with _pytest.raises(ValueError, match="64-bit"):
            perceptual_hash_images(df, grid=9).collect()
    else:
        with _pytest.raises(NotImplementedError):
            perceptual_hash_images(df, grid=9)
