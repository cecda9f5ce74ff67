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


# ---------------------------------------------------------------- PNG ----

def _gradient(h, w, ch=3):
    """Deterministic non-trivial pixels: every filter type produces distinct
    encoded bytes on this pattern, so a decoder that mishandles one filter
    cannot pass by accident."""
    idx = np.arange(h * w * ch, dtype=np.uint32).reshape(h, w, ch)
    px = ((idx * 37 + idx // 7) % 256).astype(np.uint8)
    return px if ch > 1 else px.reshape(h, w)


def test_png_roundtrip_all_filter_types():
    from restaurant_etl_spark.sources.media_codecs import decode_png, encode_png

    px = _gradient(13, 9, 3)
    for ftype in range(5):  # None, Sub, Up, Average, Paeth — all reversed
        blob = encode_png(px, filter_type=ftype)
        assert sniff(blob) == "png"
        assert np.array_equal(decode_png(blob), px), f"filter {ftype}"


def test_png_gray_and_rgba():
    from restaurant_etl_spark.sources.media_codecs import decode_png, encode_png

    gray = _gradient(6, 11, 1)
    assert np.array_equal(decode_png(encode_png(gray, filter_type=4)), gray)
    rgba = _gradient(5, 7, 4)
    out = decode_png(encode_png(rgba, filter_type=3))
    assert out.shape == (5, 7, 4)
    assert np.array_equal(out, rgba)


def test_png_palette_expansion():
    from restaurant_etl_spark.sources.media_codecs import PNG_SIGNATURE, decode_png
    import struct as _s
    import zlib as _z

    # hand-built 2x2 palette PNG: indices [[0,1],[1,0]] into a 2-entry PLTE
    def chunk(t, d):
        return _s.pack(">I", len(d)) + t + d + _s.pack(">I", _z.crc32(t + d) & 0xFFFFFFFF)

    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 0, 1, 0])  # filter 0 + indices per scanline
    blob = (PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
            + chunk(b"IDAT", _z.compress(raw)) + chunk(b"IEND", b""))
    px = decode_png(blob)
    assert px.shape == (2, 2, 3)
    assert tuple(px[0, 0]) == (255, 0, 0) and tuple(px[0, 1]) == (0, 0, 255)


def test_png_rejects_unsupported_variants():
    import pytest as _pytest

    from restaurant_etl_spark.sources.media_codecs import decode_png, encode_png

    px = _gradient(4, 4, 3)
    blob = bytearray(encode_png(px))
    # flip IHDR bit depth (offset 8+8+8=24) to 16: must raise, not garble
    blob[24] = 16
    with _pytest.raises(ValueError):
        decode_png(bytes(blob))
    blob = bytearray(encode_png(px))
    blob[28] = 1  # interlace byte → Adam7
    with _pytest.raises(ValueError):
        decode_png(bytes(blob))
    with _pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot chunks")


def test_png_features_use_real_pixels(spark):
    """A solid-white PNG through the Spark feature path must land all its
    histogram mass in the last bin — proof the REAL decoder (not the byte
    stub, which would see zlib bytes) fed the histogram."""
    from restaurant_etl_spark.sources.media_codecs import encode_png

    white = np.full((8, 8, 3), 255, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", encode_png(white, filter_type=2), (8, 8, None, "png"))],
        MEDIA_SCHEMA,
    )
    feats = extract_features(media).collect()[0]["features"]
    assert feats[-1] == 1.0 and sum(feats[:-1]) == 0.0


def test_png_resize_produces_decodable_thumbnail(spark):
    from restaurant_etl_spark.sources.media_codecs import decode_ppm, encode_png

    px = _gradient(128, 96, 3)
    media = spark.createDataFrame(
        [(1, "image", encode_png(px, filter_type=1), (96, 128, None, "png"))],
        MEDIA_SCHEMA,
    )
    thumb = resize_images(media, max_side=64).collect()[0]
    small = decode_ppm(bytes(thumb["thumb"]))
    assert small.shape == (64, 48, 3)
    assert np.array_equal(small[0, 0], px[0, 0])


def test_png_rgba_thumbnail_drops_alpha(spark):
    from restaurant_etl_spark.sources.media_codecs import decode_ppm, encode_png

    rgba = _gradient(100, 80, 4)
    media = spark.createDataFrame(
        [(1, "image", encode_png(rgba, filter_type=4), (80, 100, None, "png"))],
        MEDIA_SCHEMA,
    )
    thumb = resize_images(media, max_side=64).collect()[0]
    small = decode_ppm(bytes(thumb["thumb"]))
    assert small.shape == (50, 40, 3)  # alpha gone, PPM decodable
    assert np.array_equal(small[0, 0], rgba[0, 0, :3])


# ---------------------------------------------------------------- GIF ----

def test_gif_roundtrip_both_encoders():
    """Two structurally different LZW streams — real compression and the
    clear-heavy literal ('uncompressed GIF') style — must both decode to
    identical pixels, cross-checking the decoder's clear handling, code
    growth, and KwKwK path."""
    from restaurant_etl_spark.sources.media_codecs import decode_gif, encode_gif

    rng = np.random.default_rng(7)
    for shape, ncolors in [((7, 11), 4), ((64, 64), 16), ((120, 200), 250)]:
        pal = rng.integers(0, 256, size=(ncolors, 3))
        px = pal[rng.integers(0, ncolors, size=shape)].astype(np.uint8)
        for lit in (False, True):
            blob = encode_gif(px, literals_only=lit)
            assert sniff(blob) == "gif"
            assert np.array_equal(decode_gif(blob), px), (shape, ncolors, lit)


def test_gif_full_table_deferred_clear():
    """Low-entropy 250-color noise at 24k pixels drives the LZW table past
    4096 entries: the encoder freezes it (no clear) and the decoder must
    keep using 12-bit codes without corrupting — the deferred-clear case."""
    from restaurant_etl_spark.sources.media_codecs import decode_gif, encode_gif

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(250, 3))
    px = pal[rng.integers(0, 250, size=(150, 220))].astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


def test_gif_kwkwk_and_run_lengths():
    """Solid runs produce the classic KwKwK code-just-created case."""
    from restaurant_etl_spark.sources.media_codecs import decode_gif, encode_gif

    px = np.zeros((32, 32, 3), dtype=np.uint8)
    px[:, 16:] = (200, 10, 30)
    assert np.array_equal(decode_gif(encode_gif(px)), px)


def test_gif_rejects_interlaced_and_garbage():
    import pytest as _pytest

    from restaurant_etl_spark.sources.media_codecs import decode_gif, encode_gif

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = bytearray(encode_gif(px))
    # image descriptor flags byte: header(13) + GCT(768) + 1 marker + 8 geom
    flags_at = 13 + 768 + 9
    assert blob[13 + 768] == 0x2C
    blob[flags_at] |= 0x40  # set interlace bit
    with _pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(blob))
    with _pytest.raises(ValueError):
        decode_gif(b"GIF89a\x00\x00")


def test_gif_features_through_spark(spark):
    """A solid-white GIF through the feature path lands all histogram mass
    in the last bin — the real LZW decoder fed the histogram, not the
    byte stub."""
    from restaurant_etl_spark.sources.media_codecs import encode_gif

    white = np.full((8, 8, 3), 255, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", encode_gif(white), (8, 8, None, "gif"))], MEDIA_SCHEMA
    )
    feats = extract_features(media).collect()[0]["features"]
    assert feats[-1] == 1.0 and sum(feats[:-1]) == 0.0


# ---------------------------------------------------------------- MP4 ----

def test_mp4_metadata_roundtrip():
    from restaurant_etl_spark.sources.media_codecs import make_mp4, parse_mp4_meta

    m = parse_mp4_meta(make_mp4(123456, 1920, 1080, 3))
    assert m == {"duration_ms": 123456, "n_tracks": 3, "width": 1920, "height": 1080}
    m = parse_mp4_meta(make_mp4(500))
    assert m["duration_ms"] == 500 and m["n_tracks"] == 1 and m["width"] is None
    assert sniff(make_mp4(1)) == "mp4"


def test_mp4_rejects_non_bmff():
    import pytest as _pytest

    from restaurant_etl_spark.sources.media_codecs import parse_mp4_meta

    with _pytest.raises(ValueError):
        parse_mp4_meta(b"\x00\x00\x00\x08freeXXXX")
    with _pytest.raises(ValueError):
        parse_mp4_meta(b"")


def test_container_stats_through_spark(spark):
    from restaurant_etl_spark.sources.media_codecs import make_mp4
    from restaurant_etl_spark.sources.multimodal import MEDIA_SCHEMA, container_stats

    rows = [
        (1, "video", make_mp4(9000, 640, 480, 2), (640, 480, 9000, "mp4")),
        (2, "video", b"not a container at all", (None, None, 0, "raw")),
        (3, "image", make_mp4(1, 1, 1, 1), (1, 1, 1, "mp4")),  # filtered out
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in container_stats(media).collect()}
    assert set(got) == {1, 2}
    assert got[1]["duration_ms"] == 9000 and got[1]["vid_w"] == 640
    assert got[1]["n_tracks"] == 2
    assert got[2]["container"] is None  # per-item isolation, null row


# ---------------------------------------------------------------- MP3 ----

def test_mp3_metadata_roundtrip():
    from restaurant_etl_spark.sources.media_codecs import make_mp3, parse_mp3_meta

    for dur, br, mono in [(5000, 128, False), (123, 320, True), (60000, 64, False)]:
        m = parse_mp3_meta(make_mp3(dur, br, mono))
        assert m["bitrate_kbps"] == br and m["duration_ms"] == dur
        assert m["channels"] == (1 if mono else 2) and m["sample_rate"] == 44100


def test_mp3_skips_id3_tag_and_rejects_garbage():
    import pytest as _pytest

    from restaurant_etl_spark.sources.media_codecs import make_mp3, parse_mp3_meta

    tagged = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 + make_mp3(777)
    assert parse_mp3_meta(tagged)["duration_ms"] == 777
    with _pytest.raises(ValueError):
        parse_mp3_meta(b"\x12\x34 not audio")


def test_audio_meta_through_spark(spark):
    from restaurant_etl_spark.sources.media_codecs import make_mp3
    from restaurant_etl_spark.sources.multimodal import audio_meta

    wav = make_wav(np.zeros(8000))  # 1 s @ 8 kHz
    rows = [
        (1, "audio", wav, (None, None, 1000, "wav")),
        (2, "audio", make_mp3(2500, 192), (None, None, 2500, "mp3")),
        (3, "audio", b"static noise", (None, None, 0, "raw")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in audio_meta(media).collect()}
    assert got[1]["container"] == "wav" and got[1]["duration_ms"] == 1000
    assert got[1]["sample_rate"] == 8000
    assert got[2]["container"] == "mp3" and got[2]["duration_ms"] == 2500
    assert got[2]["bitrate_kbps"] == 192
    assert got[3]["container"] is None  # per-item isolation


def test_audio_meta_reports_source_channels_for_stereo_wav(spark):
    import io as _io
    import wave as _wave

    from restaurant_etl_spark.sources.multimodal import audio_meta

    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(b"\x00\x00" * 2 * 4000)  # 0.5 s stereo
    media = spark.createDataFrame(
        [(1, "audio", buf.getvalue(), (None, None, 500, "wav"))], MEDIA_SCHEMA
    )
    row = audio_meta(media).collect()[0]
    assert row["channels"] == 2 and row["duration_ms"] == 500


def test_mp3_sub_frame_duration_refused():
    import pytest as _pytest

    from restaurant_etl_spark.sources.media_codecs import make_mp3

    with _pytest.raises(ValueError, match="shorter than one frame"):
        make_mp3(20, 128)


# ------------------------------------------------------------ AVI/MJPEG ----


def test_avi_mjpeg_round_trip_exact():
    """Flat grayscale frames survive make_avi_mjpeg → parse_avi →
    decode_jpeg byte-exactly (DC-only blocks quantize losslessly)."""
    import numpy as np

    from restaurant_etl_spark.sources.jpeg_codec import decode_jpeg
    from restaurant_etl_spark.sources.media_codecs import make_avi_mjpeg, parse_avi

    frames = [np.full((4, 6), (17 + 40 * f) % 256, dtype=np.uint8) for f in range(3)]
    avi = make_avi_mjpeg(frames, fps=7)
    info = parse_avi(avi)
    assert (info["width"], info["height"]) == (6, 4)
    assert info["fps"] == 7
    assert info["n_frames"] == 3 and len(info["frames"]) == 3
    assert info["usec_per_frame"] == 1_000_000 // 7
    for f, payload in zip(frames, info["frames"]):
        decoded = decode_jpeg(payload)
        assert decoded.shape == f.shape
        assert (decoded == f).all()


def test_avi_odd_sized_chunks_word_aligned():
    """RIFF requires word alignment: odd-length JPEG payloads must be
    padded in the container but returned unpadded by the parser."""
    import numpy as np

    from restaurant_etl_spark.sources.jpeg_codec import decode_jpeg
    from restaurant_etl_spark.sources.media_codecs import make_avi_mjpeg, parse_avi

    # sweep sizes until both parities of payload length are seen
    seen = set()
    for v in range(16):
        frames = [np.full((3, 3), v * 16, dtype=np.uint8), np.full((3, 3), 7, dtype=np.uint8)]
        info = parse_avi(make_avi_mjpeg(frames, fps=5))
        assert len(info["frames"]) == 2
        for f, p in zip(frames, info["frames"]):
            seen.add(len(p) % 2)
            assert (decode_jpeg(p) == f).all()
    assert seen == {0, 1}


def test_parse_avi_rejects_non_avi():
    import pytest as _pytest

    from restaurant_etl_spark.sources.media_codecs import parse_avi

    with _pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with _pytest.raises(ValueError):
        parse_avi(b"\x00" * 4)


def test_parse_avi_ntsc_rational_fps_rounds():
    """A 30000/1001 (NTSC) strh rate must read as fps=30, not the
    floor-divided 29 (ADVICE r5); the exact rational is kept in meta."""
    import numpy as np

    from restaurant_etl_spark.sources.media_codecs import make_avi_mjpeg, parse_avi

    avi = bytearray(make_avi_mjpeg([np.full((3, 3), 9, dtype=np.uint8)], fps=25))
    # patch dwScale/dwRate inside the strh payload (offsets 20/24 past 'vids')
    i = bytes(avi).index(b"vids")
    import struct as _s

    avi[i + 20 : i + 28] = _s.pack("<II", 1001, 30000)
    info = parse_avi(bytes(avi))
    assert info["fps"] == 30
    assert (info["scale"], info["rate"]) == (1001, 30000)
