"""Pure-stdlib media codecs for the multimodal column operators: the
formats that need no external library are decoded for REAL — PNG
(non-interlaced 8-bit gray/palette/RGB/RGBA via stdlib ``zlib`` +
scanline unfiltering), uncompressed 24-bit BMP, binary PPM/PGM (P6/P5)
images, and PCM WAV audio (stdlib ``wave``). Codec-dependent formats
(JPEG/MP3/video) still fall back to the deterministic stub in
sources/multimodal.py — no imaging/av libraries exist in this
environment, and a fake JPEG decoder would be worse than an honest stub.

PNG matters most here: the reference routes ``.png`` as a first-class
image input (universal_extractor.py:16-24), and its whole compression
stack — DEFLATE, CRC-32 — ships in the Python standard library, so the
decode is exact, not approximated.

Everything returns numpy arrays so the callers' Arrow-batched feature /
resize code is identical for real and stubbed inputs.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def sniff(content: bytes) -> str | None:
    """Best-effort container detection for the stdlib-decodable formats.
    (content[2:3] is compared against a tuple — substring containment
    would accept the empty slice of a 2-byte payload as whitespace.)"""
    if content[:8] == PNG_SIGNATURE:
        return "png"
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


#: PNG color types → sample channels per pixel (8-bit depth only here).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (spec §9: None/Sub/Up/Average/
    Paeth). Each scanline is 1 filter-type byte + ``stride`` sample bytes;
    Sub/Average/Paeth recur on the previous pixel so those rows run a
    per-byte loop — rows with filter 0/2 (the common case for synthetic
    and screenshot-like content) stay vectorized."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(
            np.int32
        )
        pos += 1 + stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub
            cur = line
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 3:  # Average
            cur = line
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(content: bytes) -> np.ndarray:
    """PNG → uint8 pixel array: HxW (grayscale), HxWx2 (gray+alpha), HxWx3
    (RGB / expanded palette), HxWx4 (RGBA). REAL decode: chunk walk → IDAT
    concat → zlib inflate → scanline unfilter. Supports the baseline cases
    the spec makes stdlib-reachable — bit depth 8, no interlace; anything
    else (16-bit, Adam7, sub-byte palette) raises so callers fall back to
    the stub rather than emit wrong pixels."""
    if content[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette: bytes | None = None
    while pos + 8 <= len(content):
        (clen,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + clen]
        if len(data) < clen:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = bytes(data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace})"
        )
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    px = _png_unfilter(raw, height, stride, ch)
    if color_type == 3:  # palette → RGB expansion
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        lut = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        return lut[px.reshape(height, width)].copy()
    if ch == 1:
        return px.reshape(height, width).copy()
    return px.reshape(height, width, ch).copy()


def encode_png(px: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 pixels (HxW gray, HxWx3 RGB, HxWx4 RGBA) → PNG bytes, every
    scanline carrying ``filter_type`` — the test harness uses non-zero
    types to prove the decoder actually reverses Sub/Up/Average/Paeth
    rather than only handling unfiltered data."""
    px = np.ascontiguousarray(px.astype(np.uint8))
    if px.ndim == 2:
        color_type, ch = 0, 1
        h, w = px.shape
    else:
        h, w, ch = px.shape
        color_type = {1: 0, 3: 2, 4: 6}[ch]
    bpp = ch
    rows = bytearray()
    flat = px.reshape(h, w * ch).astype(np.int32)
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            enc = np.empty_like(cur)
            for i in range(w * ch):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {filter_type}")
        rows.append(filter_type)
        rows += enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )


def decode_image(content: bytes) -> np.ndarray:
    kind = sniff(content)
    if kind == "png":
        return decode_png(content)
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
