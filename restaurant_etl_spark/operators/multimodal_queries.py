"""Multimodal pipeline under the driver's correctness gate (SURVEY.md §2B).

The media table is synthesized from ``documents`` (content = utf-8 bytes of
the text, kind cycling image/audio/video, typed metadata from text length)
so the full binary-column pipeline — opaque ``binary`` payload + typed
metadata struct → Arrow-batched ``mapInPandas`` feature extraction
(sources/multimodal.py) — runs end-to-end with a DuckDB-checkable result.

The oracle checks what SQL can state in closed form: exact byte counts and
kinds per media row, plus a unit-norm flag proving the feature vector came
out of the (stubbed, deterministic) decoder normalized. The decode itself
is environment-stubbed (no codecs in this container) — swap _decode_stub
for PIL/libav on a real cluster; this query's plumbing is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.multimodal import MEDIA_SCHEMA, extract_features
from restaurant_etl_spark.sources.tables import load_table


def media_from_documents(docs: DataFrame) -> DataFrame:
    """documents → media table: binary payload + typed metadata. The 100 TB
    layout: content stays opaque bytes, metadata columns are scalars that
    drive partition pruning; no decode happens at scan time."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    n = F.length("text")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            (n % 640).cast("int").alias("width"),
            (n % 480).cast("int").alias("height"),
            (n * 10).cast("int").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(length(text) AS INTEGER) AS n_bytes,
           TRUE AS unit_norm
    FROM documents
    WHERE doc_id % 7 = 0 AND length(text) > 0
    """,
    category="multimodal",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media → fixed-dim feature vectors via Arrow mapInPandas, then
    a scalar projection the driver can hash: byte counts are exact (ASCII
    text ⇒ chars == bytes, asserted by the oracle's length()), and the
    unit_norm flag proves each 16-dim histogram came out L2-normalized."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 7 == 0) & (F.length("text") > 0)
    )
    media = media_from_documents(docs)
    feats = extract_features(media)
    sq_norm = F.aggregate(
        "features", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        (F.abs(F.sqrt(sq_norm) - 1.0) < 1e-3).alias("unit_norm"),
    )


def synth_media_from_documents(docs: DataFrame, fmt: str) -> DataFrame:
    """documents → media rows whose content is a REAL encoded image
    (``fmt`` = 'png' or 'gif'), synthesized executor-side by the stdlib
    encoders: each doc becomes a solid-color (doc_id % 256) image of
    (doc_id % 5 + 2) × (doc_id % 7 + 2) pixels. PNG rows cycle the
    scanline filter type through doc_id % 5 so the oracle-checked decode
    exercises None/Sub/Up/Average/Paeth; GIF rows alternate the two LZW
    stream styles (real compression / literal+clear) by doc parity."""
    from collections.abc import Iterator as _Iter

    from restaurant_etl_spark.sources.jpeg_codec import encode_jpeg
    from restaurant_etl_spark.sources.media_codecs import encode_gif, encode_png

    def _gen(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        for pdf in batches:
            content = []
            for did in pdf["media_id"]:
                h = int(did) % 5 + 2
                w = int(did) % 7 + 2
                val = int(did) % 256
                px = np.full((h, w, 3), val, dtype=np.uint8)
                if fmt == "png":
                    content.append(encode_png(px, filter_type=int(did) % 5))
                elif fmt == "jpeg":
                    # grayscale: flat blocks quantize losslessly at q=1, so
                    # the decoded mean is exactly val (the oracle's claim)
                    content.append(encode_jpeg(px[:, :, 0]))
                else:
                    content.append(encode_gif(px, literals_only=bool(did % 2)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "content": content,
                    "meta": [None] * len(pdf),
                }
            )

    base = docs.select(F.col("doc_id").alias("media_id"))
    return base.mapInPandas(_gen, MEDIA_SCHEMA)


@register(
    "multimodal_png_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(doc_id % 7 + 2 AS INTEGER) AS img_w,
           CAST(doc_id % 5 + 2 AS INTEGER) AS img_h,
           3 AS n_channels,
           CAST(doc_id % 256 AS DOUBLE) AS mean_pixel
    FROM documents
    WHERE doc_id % 11 = 0
    """,
    category="multimodal",
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode under the correctness gate: synthesize genuine PNG
    payloads (zlib-compressed, filtered scanlines — filter type cycles
    through all five per doc_id) and recover exact dimensions and pixel
    values via the stdlib decoder (sources/media_codecs.py:decode_png).
    The oracle states the geometry and solid-color mean in closed form; a
    stub that histograms compressed bytes instead of decoding cannot match.
    Ref: universal_extractor.py:16-24 routes .png as a first-class input."""
    from restaurant_etl_spark.sources.multimodal import image_stats

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    media = synth_media_from_documents(docs, "png")
    return image_stats(media)


@register(
    "multimodal_jpeg_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(doc_id % 7 + 2 AS INTEGER) AS img_w,
           CAST(doc_id % 5 + 2 AS INTEGER) AS img_h,
           1 AS n_channels,
           CAST(doc_id % 256 AS DOUBLE) AS mean_pixel
    FROM documents
    WHERE doc_id % 17 = 0
    """,
    category="multimodal",
)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode under the correctness gate: grayscale
    JPEGs synthesized executor-side (full FDCT → quantize → Huffman
    entropy coding, q=1) and decoded back through the complete Huffman +
    IDCT pipeline (sources/jpeg_codec.py). Solid-color flat blocks carry
    only a DC coefficient, which quantizes losslessly — so the decoded
    mean is EXACTLY doc_id % 256 and DuckDB can state it in closed form.
    Ref: universal_extractor.py:16-24 routes .jpg/.jpeg as primary
    inputs."""
    from restaurant_etl_spark.sources.multimodal import image_stats

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 0)
    media = synth_media_from_documents(docs, "jpeg")
    return image_stats(media)


@register(
    "multimodal_mp4_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           'mp4' AS container,
           CAST(doc_id % 100000 * 40 + 1000 AS INTEGER) AS duration_ms,
           CAST(doc_id % 3 + 1 AS INTEGER) AS n_tracks,
           CAST(320 + doc_id % 4 * 320 AS INTEGER) AS vid_w,
           CAST(240 + doc_id % 4 * 240 AS INTEGER) AS vid_h
    FROM documents
    WHERE doc_id % 19 = 0
    """,
    category="multimodal",
)
def multimodal_mp4_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 container-metadata extraction under the correctness gate:
    valid ISO-BMFF skeletons (ftyp + moov/mvhd/trak/tkhd) synthesized
    executor-side and parsed back — movie duration from mvhd timescale
    arithmetic, track count, 16.16 fixed-point presentation geometry from
    the video tkhd. The codec-free half of video handling; frame decode
    remains the stubbed half."""
    from collections.abc import Iterator as _Iter

    from restaurant_etl_spark.sources.media_codecs import make_mp4
    from restaurant_etl_spark.sources.multimodal import container_stats

    def _gen(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        for pdf in batches:
            content = [
                make_mp4(
                    int(did) % 100000 * 40 + 1000,
                    320 + int(did) % 4 * 320,
                    240 + int(did) % 4 * 240,
                    int(did) % 3 + 1,
                )
                for did in pdf["media_id"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "content": content,
                    "meta": [None] * len(pdf),
                }
            )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 19 == 0)
    media = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        _gen, MEDIA_SCHEMA
    )
    return container_stats(media)


@register(
    "multimodal_mp3_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           'mp3' AS container,
           CAST(doc_id % 500 * 20 + 2000 AS INTEGER) AS duration_ms,
           CAST(CASE doc_id % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 320 END
                AS INTEGER) AS bitrate_kbps,
           44100 AS sample_rate,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INTEGER) AS channels
    FROM documents
    WHERE doc_id % 23 = 0
    """,
    category="multimodal",
)
def multimodal_mp3_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP3 frame-header metadata under the correctness gate: CBR
    MPEG-1 Layer III streams synthesized executor-side (valid frame sync,
    bitrate/rate indices, channel mode) and parsed back — bitrate table
    lookup, byte-rate duration arithmetic, ID3-skip logic all real
    (sources/media_codecs.py:parse_mp3_meta). Sample decode is the
    codec-bound half and stays stubbed."""
    from collections.abc import Iterator as _Iter

    from restaurant_etl_spark.sources.media_codecs import make_mp3
    from restaurant_etl_spark.sources.multimodal import audio_meta

    def _gen(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        for pdf in batches:
            # duration modulus 500 (not the id range): a CBR MP3 carries
            # duration × bitrate REAL bytes, so row size must be bounded
            # by the fixture formula, not by how large doc_ids grow —
            # doc_id % 100000 * 20 ms at sf1's 10^7-range ids meant 80 MB
            # rows, overflowing Arrow's 2 GiB int32-offset binary chunks
            # in the worker (r8, caught by the sf1 full-registry oracle)
            content = [
                make_mp3(
                    int(did) % 500 * 20 + 2000,
                    (64, 128, 320)[int(did) % 3],
                    mono=int(did) % 2 == 0,
                )
                for did in pdf["media_id"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "audio",
                    "content": content,
                    "meta": [None] * len(pdf),
                }
            )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 23 == 0)
    media = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        _gen, MEDIA_SCHEMA
    )
    return audio_meta(media)


@register(
    "multimodal_gif_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(doc_id % 7 + 2 AS INTEGER) AS img_w,
           CAST(doc_id % 5 + 2 AS INTEGER) AS img_h,
           3 AS n_channels,
           CAST(doc_id % 256 AS DOUBLE) AS mean_pixel
    FROM documents
    WHERE doc_id % 13 = 0
    """,
    category="multimodal",
)
def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode under the correctness gate: genuine GIF payloads
    (palette + full LZW, both stream styles by doc parity) synthesized
    executor-side and decoded back to exact dimensions and pixel values
    (sources/media_codecs.py:decode_gif). Same closed-form oracle shape
    as multimodal_png_decode."""
    from restaurant_etl_spark.sources.multimodal import image_stats

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    media = synth_media_from_documents(docs, "gif")
    return image_stats(media)


@register(
    "multimodal_resize",
    oracle="""
    WITH m AS (
        SELECT doc_id, length(text) AS n FROM documents
        WHERE doc_id % 3 = 0 AND length(text) > 0
    ), p AS (
        SELECT doc_id, n, n % 640 AS w, n % 480 AS h,
               greatest(1, greatest(n % 640, n % 480) // 64) AS scale
        FROM m
    )
    SELECT doc_id AS media_id,
           CAST(w // scale AS INTEGER) AS thumb_w,
           CAST(h // scale AS INTEGER) AS thumb_h,
           CAST((n + scale * 4 - 1) // (scale * 4) AS INTEGER) AS n_thumb_bytes
    FROM p
    """,
    category="multimodal",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image thumbnailing through the binary-in/binary-out mapInPandas seam
    (STUB resampler: strided byte take). The oracle states the thumbnail
    geometry and byte count in closed form, pinning the Arrow batch shape,
    the metadata-struct plumbing, and the stride arithmetic."""
    from restaurant_etl_spark.sources.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 0) & (F.length("text") > 0)
    )
    thumbs = resize_images(media_from_documents(docs))
    return thumbs.select(
        "media_id",
        "thumb_w",
        "thumb_h",
        F.length("thumb").cast("int").alias("n_thumb_bytes"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (
        SELECT doc_id, length(text) AS n FROM documents
        WHERE doc_id % 3 = 2 AND length(text) > 0
    ), p AS (
        SELECT doc_id, n,
               greatest(1, (n * 10) // 1000) AS n_frames
        FROM m
    ), f AS (
        SELECT doc_id, n, n_frames,
               greatest(1, n // n_frames) AS step,
               unnest(range(0, n_frames)) AS frame_idx
        FROM p
    )
    SELECT doc_id AS media_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(CASE WHEN greatest(0, least(n - frame_idx * step, step)) = 0
                     THEN 1
                     ELSE least(n - frame_idx * step, step) END AS INTEGER) AS n_frame_bytes
    FROM f
    """,
    category="multimodal",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (one frame per second of duration metadata)
    through mapInPandas — the row-explode path of the multimodal surface.
    The oracle replays the frame count, stride, and per-frame byte length
    arithmetic exactly."""
    from restaurant_etl_spark.sources.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 3 == 2) & (F.length("text") > 0)
    )
    frames = sample_frames(media_from_documents(docs))
    return frames.select(
        "media_id",
        "frame_idx",
        F.length("frame").cast("int").alias("n_frame_bytes"),
    )


@register(
    "multimodal_video_frames",
    oracle="""
    WITH v AS (
        SELECT doc_id,
               CAST(doc_id % 7 + 2 AS INTEGER) AS vid_w,
               CAST(doc_id % 5 + 2 AS INTEGER) AS vid_h,
               CAST(doc_id % 4 + 5 AS INTEGER) AS fps,
               CAST(doc_id % 3 + 2 AS INTEGER) AS n_frames
        FROM documents WHERE doc_id % 29 = 0
    )
    SELECT doc_id AS media_id, vid_w, vid_h, fps, n_frames,
           CAST(doc_id % 256 AS DOUBLE) AS mean_first,
           round(list_aggregate(
               list_transform(range(0, CAST(n_frames AS BIGINT)),
                              g -> (doc_id + 40 * g) % 256),
               'avg'), 2) AS mean_frames
    FROM v
    """,
    category="multimodal",
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame decode under the correctness gate: MJPEG AVI
    files are synthesized executor-side (every frame a real baseline
    JPEG inside a valid RIFF container) and decoded back frame by frame
    — RIFF traversal, per-frame Huffman + IDCT, pixel means. Frame f of
    doc d is a flat (doc_id + 40f) % 256 gray image, so each frame's DC
    coefficient quantizes losslessly and DuckDB states every mean in
    closed form. This is the stdlib-complete video path; codec-bound
    containers (H.264-in-MP4) stay metadata-only
    (multimodal_mp4_metadata). Ref: universal_extractor.py:16-24 routes
    media files by extension — video is the natural extension point."""
    from collections.abc import Iterator as _Iter

    from restaurant_etl_spark.sources.media_codecs import make_avi_mjpeg
    from restaurant_etl_spark.sources.multimodal import video_frame_stats

    def _gen(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        for pdf in batches:
            content = []
            for did in pdf["media_id"]:
                d = int(did)
                h, w = d % 5 + 2, d % 7 + 2
                frames = [
                    np.full((h, w), (d + 40 * f) % 256, dtype=np.uint8)
                    for f in range(d % 3 + 2)
                ]
                content.append(make_avi_mjpeg(frames, fps=d % 4 + 5))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "content": content,
                    "meta": [None] * len(pdf),
                }
            )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 0)
    media = docs.select(F.col("doc_id").alias("media_id")).mapInPandas(
        _gen, MEDIA_SCHEMA
    )
    stats = video_frame_stats(media)
    return stats.select(
        "media_id", "vid_w", "vid_h", "fps", "n_frames", "mean_first",
        F.round("mean_frames", 2).alias("mean_frames"),
    )
