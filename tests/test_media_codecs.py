"""Stdlib media codecs: real BMP/PPM/WAV built byte-for-byte in-test, driven
through decode and the multimodal Spark operators."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

from restaurant_etl_spark.sources.media_codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_ppm,
    sniff,
)
from restaurant_etl_spark.sources.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
)


def make_bmp(px: np.ndarray) -> bytes:
    """Encode HxWx3 RGB as a bottom-up uncompressed 24-bit BMP."""
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    img = bytearray()
    for row in px[::-1]:  # bottom-up
        bgr = row[:, ::-1].astype(np.uint8).tobytes()
        img += bgr + b"\x00" * (row_bytes - len(bgr))
    header_size = 14 + 40
    file_size = header_size + len(img)
    return (
        b"BM" + struct.pack("<IHHI", file_size, 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
        + bytes(img)
    )


def make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes((samples * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_bmp_roundtrip_and_ppm():
    px = np.zeros((5, 3, 3), dtype=np.uint8)
    px[0, 0] = (255, 0, 0)
    px[4, 2] = (0, 0, 255)
    bmp = make_bmp(px)
    assert sniff(bmp) == "bmp"
    assert np.array_equal(decode_bmp(bmp), px)
    ppm = encode_ppm(px)
    assert sniff(ppm) == "ppm"
    assert np.array_equal(decode_ppm(ppm), px)


def test_wav_decode():
    t = np.linspace(0, 1, 8000, endpoint=False)
    wav = make_wav(np.sin(2 * np.pi * 440 * t) * 0.5)
    assert sniff(wav) == "wav"
    samples, rate, dur = decode_wav(wav)
    assert rate == 8000 and dur == 1000 and samples.size == 8000
    assert abs(float(np.max(np.abs(samples))) - 0.5) < 0.01


def test_features_use_real_pixels_and_samples(spark):
    # solid white image → histogram mass entirely in the last bin
    white = np.full((8, 8, 3), 255, dtype=np.uint8)
    # silent audio → all-zero RMS windows → zero vector stays zero
    silence = make_wav(np.zeros(4000))
    tone = make_wav(np.sin(2 * np.pi * 100 * np.linspace(0, 0.5, 4000)) * 0.9)
    rows = [
        (1, "image", make_bmp(white), (8, 8, None, "bmp")),
        (2, "audio", silence, (None, None, 500, "pcm")),
        (3, "audio", tone, (None, None, 500, "pcm")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert feats[1][-1] == 1.0 and sum(feats[1][:-1]) == 0.0  # all-white pixels
    assert all(x == 0.0 for x in feats[2])  # silence has zero energy
    assert abs(sum(x * x for x in feats[3]) - 1.0) < 1e-5  # tone: unit-norm RMS


def test_resize_produces_decodable_thumbnail(spark):
    px = np.arange(128 * 96 * 3, dtype=np.uint32).reshape(128, 96, 3) % 256
    bmp = make_bmp(px.astype(np.uint8))
    media = spark.createDataFrame([(1, "image", bmp, (96, 128, None, "bmp"))], MEDIA_SCHEMA)
    thumb = resize_images(media, max_side=64).collect()[0]
    assert thumb["thumb_h"] == 64 and thumb["thumb_w"] == 48
    small = decode_ppm(bytes(thumb["thumb"]))
    assert small.shape == (64, 48, 3)
    # nearest-neighbor: top-left pixel survives exactly
    assert np.array_equal(small[0, 0], px[0, 0])


def test_sniff_rejects_two_byte_payload():
    # regression: b"P6"[2:3] == b"" and b"" in b" \t\r\n" is True —
    # substring containment misclassified 2-byte payloads as PPM
    assert sniff(b"P6") is None
    assert sniff(b"P5") is None
    assert sniff(b"") is None


def test_decode_failure_degrades_to_stub_not_crash(spark):
    """A payload that sniffs as BMP but can't decode must produce a stub
    feature row, never kill the job (per-item isolation)."""
    rows = [
        (1, "image", b"BM garbage that is not a real bitmap header", (8, 8, None, "bmp")),
        (2, "image", b"P6 1 1 255 not-really", (1, 1, None, "ppm")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    assert set(feats) == {1, 2}
    for v in feats.values():
        assert len(v) == FEATURE_DIM
    thumbs = resize_images(media).collect()
    assert {r["media_id"] for r in thumbs} == {1, 2}  # stub path produced rows
