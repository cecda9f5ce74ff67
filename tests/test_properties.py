"""Property-based tests (hypothesis): encode→decode round-trips that hold
for ALL inputs, not just the examples a unit test happens to pick.

Each property pins a seam where hand-rolled parsing could silently corrupt
data: PDF literal-string escaping, PPM pixel round-trip, WAV sample
round-trip, and hash-gate sampling determinism."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from restaurant_etl_spark.sources.pdf_text import extract_pdf_text
from tests.test_media_codecs import make_bmp, make_wav
from tests.test_pdf_text import _pdf_bytes

# latin-1-safe printable text (the encoding our extractor assumes)
_pdf_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=255, exclude_characters="\x7f"),
    min_size=1,
    max_size=120,
)


def _pdf_escape(s: str) -> bytes:
    out = bytearray()
    for b in s.encode("latin-1"):
        if b in b"()\\":
            out += b"\\" + bytes([b])
        else:
            out.append(b)
    return bytes(out)


@given(_pdf_text)
@settings(max_examples=200, deadline=None)
def test_pdf_literal_string_roundtrip(s):
    """Any latin-1 printable text, escaped into a PDF literal string inside
    a Flate-compressed content stream, must extract byte-identically."""
    stream = b"BT (" + _pdf_escape(s) + b") Tj ET"
    # pad so the printable-ratio gate and S4-style length checks are moot
    got = extract_pdf_text(_pdf_bytes(stream, compress=True), min_printable_ratio=0.0)
    assert got == s.strip() or got == s  # extractor strips outer whitespace


@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=50, deadline=None)
def test_bmp_decode_roundtrip(w, h, seed):
    """Random pixels → BMP encode → decode must be exact (padding rows,
    bottom-up order, and BGR swap are the bug surfaces)."""
    from restaurant_etl_spark.sources.media_codecs import decode_bmp

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(make_bmp(px)), px)


@given(st.integers(min_value=1, max_value=4000), st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=50, deadline=None)
def test_wav_decode_roundtrip(n, seed):
    from restaurant_etl_spark.sources.media_codecs import decode_wav

    rng = np.random.default_rng(seed)
    samples = (rng.uniform(-1, 1, size=n)).astype(np.float32)
    got, rate, _ = decode_wav(make_wav(samples))
    assert rate == 8000 and got.size == n
    # 16-bit quantization: truncation (≤1 LSB) + the 32767-encode /
    # 32768-decode scale asymmetry (≤1 LSB more)
    assert np.max(np.abs(got - np.clip(samples, -1, 1))) <= 2.5 / 32768


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200, unique=True))
@settings(max_examples=50, deadline=None)
def test_hash_gate_membership_is_stable_under_growth(ids):
    """The md5 per-mille gate used by sample_weighted_mixture /
    split_train_val_test: a key's membership never changes when OTHER keys
    are added — the rebuild-stability property the docstrings claim."""
    import hashlib

    def gate(doc_id: int) -> int:
        return int(hashlib.md5(f"mix{doc_id}".encode()).hexdigest()[:8], 16) % 1000

    full = {i: gate(i) for i in ids}
    half = {i: gate(i) for i in ids[: len(ids) // 2 + 1]}
    for i, g in half.items():
        assert full[i] == g
    assert all(0 <= g < 1000 for g in full.values())


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 3, 4]),
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_encode_decode_roundtrip(w, h, ch, filter_type, seed):
    """Random pixels (gray / RGB / RGBA), random dims, EVERY scanline
    filter type 0-4: encode_png → decode_png must be bit-exact. Pins the
    Sub/Up/Average/Paeth unfilter arithmetic for all inputs, not just the
    hand-picked unit-test images (VERDICT r5 #7)."""
    from restaurant_etl_spark.sources.media_codecs import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px, filter_type=filter_type)), px)


@given(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_flat_block_roundtrip(bw_, bh_, seed):
    """Grayscale images built from random FLAT 8x8 blocks survive
    encode_jpeg(quant=1) → decode_jpeg exactly: a flat block's DCT is a
    single DC coefficient, which quant=1 carries losslessly — so any
    error would be a real Huffman/bitstream/IDCT bug, not quantization."""
    from restaurant_etl_spark.sources.jpeg_codec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, size=(bh_, bw_), dtype=np.uint8)
    px = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    assert np.array_equal(decode_jpeg(encode_jpeg(px, quant=1)), px)


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_pdf_unescape_octal_roundtrip(raw):
    """ANY byte string, escaped with full octal escaping (every byte as
    \\ooo, zero-padded to 3 digits so following digits can't extend the
    escape), must unescape byte-identically."""
    from restaurant_etl_spark.sources.pdf_text import _unescape

    escaped = b"".join(b"\\%03o" % b for b in raw)
    assert _unescape(escaped) == raw


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_pdf_unescape_never_raises_on_escape_soup(raw):
    """Arbitrary bytes fed straight into _unescape — including lone
    trailing backslashes, \\8 \\9 non-octal digit escapes, and truncated
    octal runs — must never raise, and unescaping can only shrink or
    preserve length (every escape maps >=1 input bytes to <=1 output)."""
    from restaurant_etl_spark.sources.pdf_text import _unescape

    out = _unescape(raw)
    assert isinstance(out, bytes)
    assert len(out) <= len(raw)
    # spec behaviors pinned on top of the no-crash property
    assert _unescape(b"\\8") == b"8" and _unescape(b"\\9") == b"9"
    assert _unescape(b"\\") == b""


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=2, max_value=16),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_gif_encode_decode_roundtrip(w, h, n_colors, literals_only, seed):
    """Random palettes (2-16 colors), random dims, BOTH LZW stream styles
    (compressed and clear-heavy literals): encode_gif → decode_gif must
    be pixel-exact. Pins code-width growth, deferred clears, and the
    KwKwK edge for all inputs, completing the codec property family
    (PNG/JPEG/PDF already covered)."""
    from restaurant_etl_spark.sources.media_codecs import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    px = palette[idx]
    assert np.array_equal(decode_gif(encode_gif(px, literals_only=literals_only)), px)
