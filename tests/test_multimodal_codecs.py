"""Real-codec lane for the multimodal operators — each lane runs
wherever ITS codec is installed (pillow for images, soundfile for
audio) and skips cleanly in codec-less environments (this container).
The gates are per-lane, not module-level, so an environment with only
one codec still exercises that lane. The fake-extractor path stays
oracle-checked regardless (tests/test_multimodal.py); these tests
close the loop on the production decode/resize kernels themselves."""

import pytest


def _png_bytes(w: int, h: int, color) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def media(spark):
    pytest.importorskip("PIL")
    rows = [
        (1, _png_bytes(8, 6, (255, 0, 0))),
        (2, _png_bytes(4, 4, (0, 255, 0))),
        (3, None),                      # NULL payload
        (4, b"not an image at all"),    # undecodable
        # header parses but the body is truncated: Image.open()
        # succeeds, the decode throws later at convert()/tobytes()
        (5, _png_bytes(64, 64, (9, 9, 9))[:80]),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_decode_image_real_pil(media):
    from otters_spark.operators.multimodal import decode_image

    got = {r["media_id"]: r for r in decode_image(media).collect()}
    assert (got[1]["width"], got[1]["height"]) == (8, 6)
    assert bytes(got[1]["rgb"])[:3] == b"\xff\x00\x00"
    assert len(bytes(got[1]["rgb"])) == 8 * 6 * 3
    assert (got[2]["width"], got[2]["height"]) == (4, 4)
    # NULL, undecodable, and decode-late-failure payloads are data,
    # not errors — and must not desync the batch's columns
    assert got[3]["width"] is None and got[3]["rgb"] is None
    assert got[4]["width"] is None and got[4]["rgb"] is None
    assert got[5]["rgb"] is None
    assert len(got) == 5


def test_resize_images_with_pil_resizer(media):
    from otters_spark.operators.multimodal import (
        decode_image,
        pil_resizer,
        resize_images,
    )

    resized = resize_images(
        media.filter("media_id <= 2"), 3, 2, resizer=pil_resizer
    )
    back = decode_image(resized)
    for r in back.collect():
        assert (r["width"], r["height"]) == (3, 2)
        assert len(bytes(r["rgb"])) == 3 * 2 * 3


# ---- audio lane (soundfile-gated, mirror of the PIL lane) ----------


def test_decode_audio_real_soundfile(spark):
    sf = pytest.importorskip("soundfile")
    import io
    import wave

    import numpy as np

    def _wav_bytes(rate: int, frames: int, channels: int = 1) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            t = np.arange(frames * channels, dtype=np.int16)
            w.writeframes((t % 1000).astype("<i2").tobytes())
        return buf.getvalue()

    rows = [
        (1, _wav_bytes(16000, 160)),
        (2, _wav_bytes(8000, 80, channels=2)),
        (3, None),                       # NULL payload
        (4, b"not audio at all"),        # undecodable
        # header parses, body truncated: read throws mid-stream
        (5, _wav_bytes(16000, 4096)[:100]),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    from otters_spark.operators.multimodal import decode_audio

    got = {r["media_id"]: r for r in decode_audio(media).collect()}
    assert got[1]["sample_rate"] == 16000 and got[1]["n_frames"] == 160
    assert got[1]["n_channels"] == 1
    assert len(bytes(got[1]["pcm"])) == 160 * 1 * 4  # float32 plane
    assert got[2]["sample_rate"] == 8000 and got[2]["n_channels"] == 2
    assert len(bytes(got[2]["pcm"])) == 80 * 2 * 4
    # bad media is data, not an engine error, and must not desync
    for bad in (3, 4):
        assert got[bad]["sample_rate"] is None and got[bad]["pcm"] is None
    assert len(got) == 5


def test_perceptual_hash_images_real_pil(spark):
    """The decode → 8×8 luma → aHash composition: resolution-invariant
    for the same layout, discriminative for the inverted layout, and
    silent (no row) for NULL/undecodable payloads."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from otters_spark.operators.multimodal import perceptual_hash_images

    def two_tone(w: int, h: int, flip: bool) -> bytes:
        # left half dark, right half bright (or flipped): survives any
        # downsample kernel, so the 8x8 luma threshold pattern is stable
        img = Image.new("L", (w, h))
        for x in range(w):
            for y in range(h):
                bright = x >= w // 2
                img.putpixel((x, y), 230 if bright != flip else 20)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, two_tone(64, 64, False)),
        (2, two_tone(48, 32, False)),   # same layout, other resolution
        (3, two_tone(64, 64, True)),    # inverted layout
        (4, None),
        (5, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["phash"] for r in perceptual_hash_images(df).collect()}
    assert set(got) == {1, 2, 3}        # NULL/undecodable yield no row
    assert got[1] == got[2]             # perceptual: resolution-invariant
    # inverted layout flips every decided bit: hamming = 64
    assert bin((got[1] ^ got[3]) & ((1 << 64) - 1)).count("1") == 64
