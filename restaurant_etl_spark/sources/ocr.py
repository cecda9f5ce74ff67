"""S6 — Azure Document Intelligence OCR variant with an injectable
transport (ref BetterVersion/azure_ocr_extractor.py:22-39: the
``prebuilt-read`` model, text = page lines' content joined by newline).

Like operators/llm_parse.py, the NETWORK is the only stub: ``transport``
is any callable ``bytes -> analyze-result JSON`` (the public REST
response shape of the Document Intelligence Read API). Everything after
the wire — pages/lines traversal, optional word-confidence filtering,
newline join, per-document error isolation — is real and tested against
synthetic response payloads. On a real cluster, pass a transport that
POSTs to ``{endpoint}/documentintelligence/documentModels/
prebuilt-read:analyze`` with the account key; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Callable

#: bytes -> parsed JSON of the analyze result (transport handles POST,
#: polling, and auth on a real deployment)
OcrTransport = Callable[[bytes], dict]


def no_network_transport(content: bytes) -> dict:
    """Default transport: this environment has no network and no Azure
    credentials — calling OCR without injecting a transport is an error,
    not a silent fake (the extraction stub path covers fakes)."""
    raise NotImplementedError(
        "No OCR transport configured: inject transport=... (see sources/ocr.py)"
    )


def parse_read_result(result: dict, min_word_confidence: float | None = None) -> str:
    """analyze-result JSON → text, the reference's exact traversal: every
    page's lines' ``content``, newline-joined (azure_ocr_extractor.py:33-39).

    ``min_word_confidence`` adds the P3-style confidence gate the
    reference's other OCR paths apply (pdf_extractor.py:85): a line is
    dropped when its words' mean confidence falls below the cutoff
    (lines without word spans pass — prebuilt-read puts confidence on
    words, not lines)."""
    analyze = result.get("analyzeResult", result)
    lines_out: list[str] = []
    for page in analyze.get("pages", []):
        words = page.get("words", [])
        for line in page.get("lines", []):
            content = line.get("content", "")
            spans = line.get("spans", [])
            # the gate only applies where attribution is possible: a line
            # without spans passes (we cannot tell which words are its
            # own — attributing the whole page's words would let one bad
            # word elsewhere drop every line)
            if min_word_confidence is not None and words and spans:
                confs = [
                    w["confidence"]
                    for w in words
                    if "confidence" in w and _word_in_spans(w, spans)
                ]
                if confs and sum(confs) / len(confs) < min_word_confidence:
                    continue
            if content:
                lines_out.append(content)
    return "\n".join(lines_out)


def _word_in_spans(word: dict, spans: list[dict]) -> bool:
    """A word belongs to a line only when its offset provably falls inside
    one of the line's spans; a word with no offset belongs to NO line."""
    off = (word.get("span") or {}).get("offset")
    if off is None:
        return False
    return any(
        s.get("offset", 0) <= off < s.get("offset", 0) + s.get("length", 0) for s in spans
    )


def ocr_extract(
    content: bytes,
    transport: OcrTransport = no_network_transport,
    min_word_confidence: float | None = None,
) -> tuple[str, str | None]:
    """One document through the OCR path: (text, error). Errors are
    captured per document (the caller emits success=false rows), never
    raised across the batch — same isolation contract as extract_binary_text."""
    try:
        return parse_read_result(transport(content), min_word_confidence), None
    except Exception as e:  # noqa: BLE001 - per-doc isolation
        return "", f"{type(e).__name__}: {e}"
