"""S6 Azure-OCR variant: real response parsing over synthetic
prebuilt-read payloads; network is the only stub (injectable transport)."""

from __future__ import annotations

import pytest

from restaurant_etl_spark.sources.ocr import (
    no_network_transport,
    ocr_extract,
    parse_read_result,
)

READ_RESULT = {
    "analyzeResult": {
        "pages": [
            {
                "words": [
                    {"content": "SNACKS", "confidence": 0.99, "span": {"offset": 0, "length": 6}},
                    {"content": "Samosa", "confidence": 0.95, "span": {"offset": 7, "length": 6}},
                    {"content": "$5.00", "confidence": 0.93, "span": {"offset": 14, "length": 5}},
                    {"content": "smudge", "confidence": 0.21, "span": {"offset": 20, "length": 6}},
                ],
                "lines": [
                    {"content": "SNACKS", "spans": [{"offset": 0, "length": 6}]},
                    {"content": "Samosa $5.00", "spans": [{"offset": 7, "length": 12}]},
                    {"content": "smudge", "spans": [{"offset": 20, "length": 6}]},
                ],
            },
            {"words": [], "lines": [{"content": "Tea $2.00"}]},
        ]
    }
}


def test_parse_matches_reference_traversal():
    # azure_ocr_extractor.py:33-39 — all pages' lines' content, "\n"-joined
    assert parse_read_result(READ_RESULT) == "SNACKS\nSamosa $5.00\nsmudge\nTea $2.00"


def test_word_confidence_gate_drops_low_confidence_lines():
    text = parse_read_result(READ_RESULT, min_word_confidence=0.6)
    assert text == "SNACKS\nSamosa $5.00\nTea $2.00"  # the 0.21 smudge line dropped


def test_injected_transport_and_error_isolation():
    text, err = ocr_extract(b"fake scan", transport=lambda content: READ_RESULT)
    assert err is None and text.startswith("SNACKS")

    def broken(content):
        raise ConnectionError("boom")

    text, err = ocr_extract(b"fake scan", transport=broken)
    assert text == "" and "ConnectionError" in err


def test_default_transport_refuses_instead_of_faking():
    with pytest.raises(NotImplementedError):
        no_network_transport(b"scan")
    # and through ocr_extract: captured as an error, not raised
    text, err = ocr_extract(b"scan")
    assert text == "" and "NotImplementedError" in err


def test_spark_extraction_with_injected_ocr_transport(spark, tmp_path):
    """Through the full binaryFile → mapInPandas path: a scanned PDF and an
    image both OCR through the injected transport; the text-layer PDF does
    NOT touch OCR (native path wins)."""
    from restaurant_etl_spark.sources.binary import (
        extract_binary_text,
        read_binary_dir,
        with_format,
    )
    from tests.test_pdf_text import _pdf_bytes

    long_stream = b"BT " + b" ".join(
        b"(Dish number %d costs $%d.00) Tj 0 -14 Td" % (i, i) for i in range(10)
    ) + b" ET"
    (tmp_path / "textlayer.pdf").write_bytes(_pdf_bytes(long_stream, compress=True))
    (tmp_path / "scan.pdf").write_bytes(_pdf_bytes(b"q /Im0 Do Q", compress=True))
    (tmp_path / "photo.jpg").write_bytes(b"\xff\xd8\xff fake jpeg")

    rows = {
        r["path"].rsplit("/", 1)[1]: r
        for r in extract_binary_text(
            with_format(read_binary_dir(spark, str(tmp_path))),
            ocr_transport=lambda content: READ_RESULT,
        ).collect()
    }
    assert rows["textlayer.pdf"]["extraction_method"] == "pdf_native_text"
    scan = rows["scan.pdf"]
    assert scan["extraction_method"] == "pdf_azure_ocr" and scan["success"]
    assert scan["text"] == "SNACKS\nSamosa $5.00\nTea $2.00"  # conf-gated lines
    photo = rows["photo.jpg"]
    assert photo["extraction_method"] == "image_azure_ocr"
    assert photo["text"].startswith("SNACKS")
