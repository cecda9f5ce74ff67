"""Multimodal columns (SURVEY.md §2B): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas transforms.

Real in this module: the media schema, the mapInPandas plumbing (batch
shapes, signatures, per-executor decoder lifecycle), metadata handling,
partitioning — and the DECODE itself for every image format the
reference routes (PNG with full scanline unfiltering, baseline JPEG with
full Huffman+IDCT, GIF with full LZW, uncompressed BMP, binary PPM/PGM)
plus PCM WAV audio; see sources/media_codecs.py and
sources/jpeg_codec.py: real pixels feed the histogram features, real
samples feed the audio features, and thumbnails are genuine
nearest-neighbor downsamples re-encoded as PPM. STUBBED: only
codec-library-bound audio/video containers (MP3/MP4) fall back to a
deterministic byte-level fake. Swap the fallback for ffmpeg on a real
cluster; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from restaurant_etl_spark.sources.media_codecs import (
    decode_image,
    decode_wav,
    encode_ppm,
    sniff,
)

#: media table schema: binary payload + typed metadata, the 100 TB layout —
#: content stays opaque bytes; metadata columns drive partition pruning.
MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_DIM = 16

FEATURES_SCHEMA = "media_id bigint, kind string, n_bytes int, features array<float>"
IMAGE_STATS_SCHEMA = (
    "media_id bigint, img_w int, img_h int, n_channels int, mean_pixel double"
)
THUMB_SCHEMA = "media_id bigint, thumb binary, thumb_w int, thumb_h int"
FRAMES_SCHEMA = "media_id bigint, frame_idx int, frame binary"


def _decode_stub(content: bytes) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels from raw bytes. A real
    deployment decodes with PIL/libav here; the surrounding plumbing is
    identical."""
    arr = np.frombuffer(content, dtype=np.uint8)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.uint8)
    return arr


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction: content → fixed-dim float vector (here a 16-bin
    byte histogram — STUB for a vision encoder). Arrow-batched mapInPandas;
    one pass, no shuffle; output is joinable with the embeddings surface."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                raw = bytes(content)
                # per-item isolation: a payload that SNIFFS as a stdlib
                # format but fails decode (8-bit BMP, truncated file) must
                # degrade to the stub row, never kill the job — the same
                # contract extract_binary_text keeps per document
                try:
                    fmt = sniff(raw)
                    if fmt == "wav":
                        # real audio features: RMS energy over FEATURE_DIM
                        # equal windows of the decoded mono signal
                        samples, _, _ = decode_wav(raw)
                        if samples.size == 0:
                            samples = np.zeros(FEATURE_DIM, dtype=np.float32)
                        windows = np.array_split(samples, FEATURE_DIM)
                        hist = np.array(
                            [float(np.sqrt(np.mean(np.square(w)))) if w.size else 0.0 for w in windows]
                        )
                    elif fmt in ("png", "jpeg", "gif", "bmp", "ppm"):
                        # real pixel histogram over the decoded image
                        arr = decode_image(raw).ravel()
                        hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
                    else:
                        raise ValueError("no stdlib decoder")
                except Exception:  # noqa: BLE001 - per-item isolation
                    arr = _decode_stub(raw)
                    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm else hist).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "features": feats,
                }
            )

    return media.mapInPandas(_feat, FEATURES_SCHEMA)


def image_stats(media: DataFrame) -> DataFrame:
    """Image metadata extraction: decode each payload with the REAL stdlib
    codecs and report (width, height, channels, mean pixel value) — the
    decode-verification surface: a byte-level stub cannot reproduce these
    because it never sees pixels. Rows whose payload has no stdlib decoder
    come back null-valued rather than failing the batch (per-item
    isolation, same contract as extract_features)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    px = decode_image(bytes(content))
                    h, w = px.shape[0], px.shape[1]
                    ch = px.shape[2] if px.ndim == 3 else 1
                    rows.append((mid, w, h, ch, float(px.mean())))
                except Exception:  # noqa: BLE001 - per-item isolation
                    rows.append((mid, None, None, None, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "img_w", "img_h", "n_channels", "mean_pixel"]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        _stats, IMAGE_STATS_SCHEMA
    )


CONTAINER_SCHEMA = (
    "media_id bigint, container string, duration_ms int, n_tracks int, "
    "vid_w int, vid_h int"
)


def container_stats(media: DataFrame) -> DataFrame:
    """REAL container-metadata extraction for video rows: parse the
    ISO-BMFF box tree (sources/media_codecs.py:parse_mp4_meta) for
    duration, track count, and presentation geometry. This is the piece
    of video handling that needs no codec — and the piece a 100 TB
    pipeline runs at scan time to drive partitioning and filtering, long
    before any frame is decoded. Non-BMFF payloads yield null metadata
    (per-item isolation)."""
    from restaurant_etl_spark.sources.media_codecs import parse_mp4_meta

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    m = parse_mp4_meta(bytes(content))
                    rows.append(
                        (mid, "mp4", m["duration_ms"], m["n_tracks"],
                         m["width"], m["height"])
                    )
                except Exception:  # noqa: BLE001 - per-item isolation
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "container", "duration_ms", "n_tracks",
                         "vid_w", "vid_h"],
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        _stats, CONTAINER_SCHEMA
    )


AUDIO_META_SCHEMA = (
    "media_id bigint, container string, duration_ms int, bitrate_kbps int, "
    "sample_rate int, channels int"
)


def audio_meta(media: DataFrame) -> DataFrame:
    """REAL audio container metadata for audio rows: WAV via the stdlib
    header (exact), MP3 via frame-header math (CBR estimate). Sample
    decode stays real for WAV and stubbed for MP3 — metadata is the part
    a pipeline needs at scan time. Unparseable payloads yield null rows
    (per-item isolation)."""
    import io
    import wave

    from restaurant_etl_spark.sources.media_codecs import parse_mp3_meta, sniff

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                try:
                    if sniff(raw) == "wav":
                        # header-only read: metadata must not decode samples,
                        # and must report the SOURCE channel count (decode_wav
                        # downmixes to mono — using it here misreported stereo)
                        with wave.open(io.BytesIO(raw), "rb") as wf:
                            rate = wf.getframerate()
                            dur = (
                                int(round(1000 * wf.getnframes() / rate))
                                if rate
                                else 0
                            )
                            rows.append(
                                (mid, "wav", dur, None, rate, wf.getnchannels())
                            )
                    else:
                        m = parse_mp3_meta(raw)
                        rows.append(
                            (mid, "mp3", m["duration_ms"], m["bitrate_kbps"],
                             m["sample_rate"], m["channels"])
                        )
                except Exception:  # noqa: BLE001 - per-item isolation
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "container", "duration_ms",
                         "bitrate_kbps", "sample_rate", "channels"],
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        _meta, AUDIO_META_SCHEMA
    )


def resize_images(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Thumbnailing: content → smaller binary (STUB: truncated byte stream
    standing in for a real resampled encode). Keeps the binary-in/binary-out
    contract and per-row error isolation."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                raw = bytes(content)
                decoded = None
                if sniff(raw) in ("png", "jpeg", "gif", "bmp", "ppm"):
                    try:
                        decoded = decode_image(raw)
                    except Exception:  # noqa: BLE001 - degrade to the stub path
                        decoded = None
                if decoded is not None:
                    # real thumbnail: nearest-neighbor stride downsample of
                    # decoded pixels, re-encoded as PPM/PGM (decodable);
                    # PNG alpha channels are dropped — PPM carries no alpha
                    px = decoded
                    if px.ndim == 3 and px.shape[2] == 4:
                        px = px[:, :, :3]
                    elif px.ndim == 3 and px.shape[2] == 2:
                        px = px[:, :, 0]
                    ih, iw = px.shape[0], px.shape[1]
                    scale = max(1, (max(iw, ih) + max_side - 1) // max_side)
                    small = px[::scale, ::scale]
                    out.append((mid, encode_ppm(small), small.shape[1], small.shape[0]))
                else:
                    # STUB path for codec-dependent formats. A width or
                    # height of 0 is DATA, not absence — only a missing
                    # meta struct falls back to max_side. (r8: the former
                    # `w or max_side` treated 0 as missing and diverged
                    # from the closed-form oracle at text lengths ≡ 0 mod
                    # 640/480 — a class no doc below sf1 happened to hit.)
                    w = meta["width"] if meta is not None else max_side
                    h = meta["height"] if meta is not None else max_side
                    scale = max(1, max(w, h) // max_side)
                    thumb = raw[:: scale * 4] or raw[:1]
                    out.append((mid, thumb, w // scale, h // scale))
            yield pd.DataFrame(out, columns=["media_id", "thumb", "thumb_w", "thumb_h"])

    return media.filter(F.col("kind") == "image").mapInPandas(_resize, THUMB_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: one synthetic frame per second of
    duration metadata (STUB decode; a real build emits decoded frames).
    Output explodes one row per frame — partition by media_id upstream if
    frames feed a wide stage."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                dur = (meta["duration_ms"] or 0) if meta is not None else 0
                n = max(1, dur // every_ms)
                raw = bytes(content)
                step = max(1, len(raw) // n)
                for i in range(n):
                    rows.append((mid, i, raw[i * step : (i + 1) * step] or raw[:1]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.filter(F.col("kind") == "video").mapInPandas(_frames, FRAMES_SCHEMA)


VIDEO_FRAMES_SCHEMA = (
    "media_id bigint, vid_w int, vid_h int, fps int, n_frames int, "
    "mean_first double, mean_frames double"
)


def video_frame_stats(media: DataFrame) -> DataFrame:
    """REAL video frame decode for MJPEG/AVI rows: traverse the RIFF
    container (sources/media_codecs.py:parse_avi), decode every '00dc'
    frame through the full baseline-JPEG pipeline, and report geometry,
    frame rate, frame count, and per-frame pixel means. This closes the
    video-decode gap for the one video codec expressible in pure
    stdlib+numpy — codec-bound containers (H.264-in-MP4) remain
    metadata-only. Non-AVI payloads yield null rows (per-item isolation,
    same contract as image_stats)."""
    from restaurant_etl_spark.sources.jpeg_codec import decode_jpeg
    from restaurant_etl_spark.sources.media_codecs import parse_avi

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    info = parse_avi(bytes(content))
                    means = [float(decode_jpeg(p).mean()) for p in info["frames"]]
                    rows.append(
                        (mid, info["width"], info["height"], info["fps"],
                         len(means), means[0], sum(means) / len(means))
                    )
                except Exception:  # noqa: BLE001 - per-item isolation
                    rows.append((mid, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "vid_w", "vid_h", "fps", "n_frames",
                         "mean_first", "mean_frames"],
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        _stats, VIDEO_FRAMES_SCHEMA
    )
