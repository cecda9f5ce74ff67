"""Text-layer PDF extraction (sources/pdf_text.py): real PDFs are built
byte-for-byte in the test (header, content stream, xref) so the extractor
is exercised on genuine PDF structure with zero library dependencies —
both directly and through the Spark binaryFile → mapInPandas path."""

from __future__ import annotations

import zlib

from restaurant_etl_spark.sources.pdf_text import extract_pdf_text


def _pdf_bytes(content_stream: bytes, compress: bool) -> bytes:
    """A minimal single-page PDF around the given content stream."""
    if compress:
        data = zlib.compress(content_stream)
        filt = b"/Filter /FlateDecode "
    else:
        data = content_stream
        filt = b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length " + str(len(data)).encode() + b" >>\nstream\n"
        + data + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


MENU_STREAM = (
    b"BT /F1 12 Tf 72 720 Td (SNACKS) Tj "
    b"0 -14 Td (Samosa \\(spicy\\) ... $5.00) Tj "
    b"0 -14 Td [(Tea) ( $2) (.00)] TJ "
    b"T* (Chai \\100 home) Tj ET"
)

EXPECTED = "SNACKS\nSamosa (spicy) ... $5.00\nTea $2.00\nChai @ home"


def test_extracts_flate_compressed_text_layer():
    assert extract_pdf_text(_pdf_bytes(MENU_STREAM, compress=True)) == EXPECTED


def test_extracts_uncompressed_text_layer():
    assert extract_pdf_text(_pdf_bytes(MENU_STREAM, compress=False)) == EXPECTED


def test_scanned_pdf_has_no_text_layer():
    # an image-only page: no BT/ET text operators anywhere
    scanned = _pdf_bytes(b"q 612 0 0 792 0 0 cm /Im0 Do Q", compress=True)
    assert extract_pdf_text(scanned) == ""


def test_garbage_and_non_pdf_rejected():
    assert extract_pdf_text(b"not a pdf at all") == ""
    # CID-style garbage text layer: unprintable glyph codes → printable gate
    garbage = _pdf_bytes(b"BT (\x01\x02\x03\x04\x05\x06\x07\x08) Tj ET", compress=True)
    assert extract_pdf_text(garbage) == ""


def test_spark_pipeline_uses_native_pdf_path(spark, tmp_path):
    from restaurant_etl_spark.sources.binary import (
        OCR_FALLBACK_CHARS,
        extract_binary_text,
        read_binary_dir,
        with_format,
    )

    # text layer long enough to clear the S4 threshold
    long_stream = b"BT " + b" ".join(
        b"(Dish number %d costs $%d.00) Tj 0 -14 Td" % (i, i) for i in range(10)
    ) + b" ET"
    (tmp_path / "menu_real.pdf").write_bytes(_pdf_bytes(long_stream, compress=True))
    (tmp_path / "scan.pdf").write_bytes(_pdf_bytes(b"q /Im0 Do Q", compress=True))

    rows = {
        r["path"].rsplit("/", 1)[1]: r
        for r in extract_binary_text(with_format(read_binary_dir(spark, str(tmp_path)))).collect()
    }
    real = rows["menu_real.pdf"]
    assert real["success"] and real["extraction_method"] == "pdf_native_text"
    assert "Dish number 3 costs $3.00" in real["text"]
    assert real["char_count"] >= OCR_FALLBACK_CHARS
    scan = rows["scan.pdf"]
    assert scan["success"] and scan["extraction_method"] == "pdf_ocr_fallback"
    assert "STUB pdf" in scan["text"]  # OCR engine stubbed in this environment


def test_quote_operators_start_new_lines():
    """' and \" are move-to-next-line-then-show (PDF spec): each must open
    a fresh output line, not concatenate onto the previous one."""
    stream = b"BT (line1) Tj (line2) ' (line3) \" ET"
    pdf = _pdf_bytes(stream, compress=True)
    assert extract_pdf_text(pdf, min_printable_ratio=0.0) == "line1\nline2\nline3"


def test_non_octal_digit_escapes_drop_backslash():
    r"""\8 and \9 are NOT octal starts: the PDF spec says an unknown escape
    drops the backslash and keeps the character. A naive isdigit() gate
    collects zero octal digits and crashes on int(b'', 8) — this page must
    extract, not become a pdf_error row (ADVICE r4)."""
    stream = b"BT (v\\8.1 build\\9 \\101ok) Tj ET"
    pdf = _pdf_bytes(stream, compress=True)
    # \101 IS octal (= 'A'); \8 \9 keep the digit
    assert extract_pdf_text(pdf, min_printable_ratio=0.0) == "v8.1 build9 Aok"


def test_trailing_backslash_does_not_crash():
    stream = b"BT (tail\\) Tj (x\\\\) Tj ET"
    pdf = _pdf_bytes(stream, compress=True)
    # first string: trailing backslash escapes the ')' so the string
    # actually extends — extractor must not raise either way
    out = extract_pdf_text(pdf, min_printable_ratio=0.0)
    assert "x\\" in out


def test_operator_keywords_inside_literals_do_not_end_block():
    """'ET' (or 'BT') inside a shown string must not terminate the BT/ET
    block: the block matcher treats literal strings as opaque. Found by
    hypothesis (test_properties.py) in r6."""
    stream = b"BT (ET) Tj (net BT gross) Tj ET"
    pdf = _pdf_bytes(stream, compress=True)
    assert extract_pdf_text(pdf, min_printable_ratio=0.0) == "ETnet BT gross"
