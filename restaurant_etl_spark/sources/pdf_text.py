"""Minimal text-layer PDF extraction in pure stdlib (zlib + re) — the real
S3 native-PDF path for this environment (ref pdf_extractor.py:28-54 uses
pdfplumber; no PDF/imaging libraries are installed here, but a PDF's text
layer is just content streams of BT/ET blocks with Tj/TJ/'/" show-text
operators, which need no library to read).

Scope, stated honestly:
  * handles uncompressed and FlateDecode content streams (the two forms
    the overwhelming majority of text-layer generators emit);
  * literal `(...)` strings with the standard escapes incl. octal, and
    `[...] TJ` arrays (kerning numbers dropped);
  * assumes a standard single-byte font encoding (Latin-1 superset).
    Subsetted/CID fonts decode to the wrong glyph codes — a printable-ratio
    gate rejects such output so the caller falls through to its OCR path,
    exactly like a scanned page;
  * no page-tree walk: text is recovered in stream order, newline-separated
    per text-positioning operator (Td/TD/T*), page boundaries not marked.

Scanned PDFs (no text operators at all) yield "" — the caller's
OCR-fallback threshold (sources/binary.py, S4) then takes over.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(?P<dict>.*?)>>\s*stream\r?\n(?P<data>.*?)endstream", re.S)

#: show-text and line-advance operators inside a BT/ET block, in order.
#: ' and " are "move to next line, then show" per the PDF spec — they get
#: their own group so the extractor emits the line break they imply.
_TOKEN_RE = re.compile(
    rb"\((?P<nllit>(?:\\.|[^\\()])*)\)\s*(?:'|\")"
    rb"|\((?P<lit>(?:\\.|[^\\()])*)\)\s*Tj"
    rb"|\[(?P<arr>(?:\((?:\\.|[^\\()])*\)|[^\]\\]|\\.)*)\]\s*TJ"
    rb"|(?P<nl>T\*|-?[\d.]+\s+-?[\d.]+\s+T[dD])"
)
_ARR_STR_RE = re.compile(rb"\((?P<lit>(?:\\.|[^\\()])*)\)")
#: block body treats well-formed literal strings as opaque units so an
#: "ET" (or "BT") INSIDE a shown string can't terminate the block early —
#: `BT (ET) Tj ET` must extract "ET", not "" (found by hypothesis, r6).
#: The bare `\(` fallback keeps malformed strings (e.g. an escaped-away
#: closing paren) from failing the whole block: they degrade to
#: char-by-char scanning, the pre-fix behavior.
_BT_ET_RE = re.compile(
    rb"BT(?P<body>(?:\((?:\\.|[^\\()])*\)|\(|[^(])*?)ET", re.S
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        # octal escapes are \0-\7 starts only: \8 and \9 are UNKNOWN escapes
        # per the PDF spec (drop the backslash), and nxt can be empty for a
        # trailing backslash — both must miss this branch or int(b"", 8) raises
        if nxt and nxt in b"01234567":
            j = i + 1
            digits = b""
            while j < len(raw) and len(digits) < 3 and raw[j : j + 1] in b"01234567":
                digits += raw[j : j + 1]
                j += 1
            out.append(int(digits, 8) & 0xFF)
            i = j
        elif nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
        else:  # unknown escape: PDF spec says drop the backslash
            out += nxt
            i += 2
    return bytes(out)


def _decode_stream(dict_bytes: bytes, data: bytes) -> bytes:
    data = data.rstrip(b"\r\n")
    if b"FlateDecode" in dict_bytes:
        for attempt in (data, data + b"\n"):
            try:
                return zlib.decompress(attempt)
            except zlib.error:
                try:
                    return zlib.decompressobj().decompress(attempt)
                except zlib.error:
                    continue
        return b""
    return data


def _printable_ratio(text: str) -> float:
    if not text:
        return 0.0
    ok = sum(1 for ch in text if ch.isprintable() or ch in "\n\r\t ")
    return ok / len(text)


def extract_pdf_text(content: bytes, min_printable_ratio: float = 0.8) -> str:
    """Text layer of a PDF as a newline-joined string; "" when there is no
    (decodable) text layer — scanned pages, CID-subsetted fonts (rejected
    by the printable gate), or broken files all land there so the caller's
    OCR fallback applies uniformly."""
    if not content.startswith(b"%PDF"):
        return ""
    pieces: list[str] = []
    for m in _STREAM_RE.finditer(content):
        stream = _decode_stream(m.group("dict"), m.group("data"))
        if not stream:
            continue
        for block in _BT_ET_RE.finditer(stream):
            line: list[bytes] = []
            lines: list[bytes] = []
            for tok in _TOKEN_RE.finditer(block.group("body")):
                if tok.group("nl") is not None:
                    if line:
                        lines.append(b"".join(line))
                        line = []
                elif tok.group("nllit") is not None:  # ' / " = T* then show
                    if line:
                        lines.append(b"".join(line))
                        line = []
                    line.append(_unescape(tok.group("nllit")))
                elif tok.group("lit") is not None:
                    line.append(_unescape(tok.group("lit")))
                elif tok.group("arr") is not None:
                    for s in _ARR_STR_RE.finditer(tok.group("arr")):
                        line.append(_unescape(s.group("lit")))
            if line:
                lines.append(b"".join(line))
            if lines:
                pieces.append(b"\n".join(lines).decode("latin-1"))
    text = "\n".join(pieces).strip()
    if _printable_ratio(text) < min_printable_ratio:
        return ""
    return text
