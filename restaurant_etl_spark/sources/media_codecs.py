"""Pure-stdlib media codecs for the multimodal column operators: the
formats that need no external library are decoded for REAL — uncompressed
24-bit BMP, binary PPM/PGM (P6/P5) images, and PCM WAV audio (stdlib
``wave``). Codec-dependent formats (JPEG/PNG/MP3/video) still fall back to
the deterministic stub in sources/multimodal.py — no imaging/av libraries
exist in this environment, and a fake JPEG decoder would be worse than an
honest stub.

Everything returns numpy arrays so the callers' Arrow-batched feature /
resize code is identical for real and stubbed inputs.
"""

from __future__ import annotations

import io
import struct

import numpy as np


def sniff(content: bytes) -> str | None:
    """Best-effort container detection for the stdlib-decodable formats.
    (content[2:3] is compared against a tuple — substring containment
    would accept the empty slice of a 2-byte payload as whitespace.)"""
    if content[:2] == b"BM":
        return "bmp"
    if content[:2] in (b"P6", b"P5") and content[2:3] in (b" ", b"\t", b"\r", b"\n"):
        return "ppm"
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    return None


def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → HxWx3 uint8 (RGB). Raises on anything
    fancier (compression, other depths) so callers fall back to the stub."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    width, height = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    px = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * height, offset=data_offset
    ).reshape(height, row_bytes)[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR → RGB


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary PPM (P6) → HxWx3, binary PGM (P5) → HxW, uint8."""
    magic = content[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    # header tokens: magic, width, height, maxval — comments (#…) allowed
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            while i < len(content) and content[i : i + 1] not in b"\r\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        tokens.append(int(content[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(content, dtype=np.uint8, count=width * height * ch, offset=i)
    return px.reshape((height, width, 3) if ch == 3 else (height, width)).copy()


def encode_ppm(px: np.ndarray) -> bytes:
    """HxWx3 → P6 bytes, HxW → P5 bytes (the inverse of decode_ppm) —
    thumbnails stay decodable, not truncated byte soup."""
    if px.ndim == 3:
        h, w, _ = px.shape
        magic = b"P6"
    else:
        h, w = px.shape
        magic = b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()


def decode_image(content: bytes) -> np.ndarray:
    kind = sniff(content)
    if kind == "bmp":
        return decode_bmp(content)
    if kind == "ppm":
        return decode_ppm(content)
    raise ValueError("no stdlib decoder for this image format")


def decode_wav(content: bytes) -> tuple[np.ndarray, int, int]:
    """PCM WAV → (mono float32 samples in [-1, 1], sample_rate, duration_ms)
    via the stdlib ``wave`` module. 16-bit and 8-bit PCM supported."""
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        n = w.getnframes()
        rate = w.getframerate()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    duration_ms = int(round(1000 * n / rate)) if rate else 0
    return samples, rate, duration_ms
