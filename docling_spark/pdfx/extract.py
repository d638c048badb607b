"""PDF text extraction entry point (pure Python — no native PDF libs in env).

The full layout path (object/xref parsing, content-stream interpretation,
text-cell clustering, reading-order sort) lives in sibling modules; this is
the per-document facade used by the Spark UDF.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass
class PdfResult:
    status: str
    text: Optional[str] = None
    error: Optional[str] = None
    pages: Optional[list] = None  # per-page cell lists


def extract_pdf_text(blob: bytes) -> PdfResult:
    """bytes → reading-ordered text. Never raises."""
    try:
        from .parser import PdfDocument
        from .layout import page_cells_to_text

        pdf = PdfDocument(blob)
        if pdf.trailer.get("Encrypt") is not None:
            return PdfResult(status="failure", error="encrypted PDF")
        page_texts = []
        needs_ocr_pages = 0
        pages_meta = []
        for page in pdf.pages():
            cells = page.text_cells()
            pages_meta.append(len(cells))
            if not cells:
                needs_ocr_pages += 1
                continue
            page_texts.append(page_cells_to_text(cells))
        if not pages_meta:
            return PdfResult(status="failure", error="no pages found")
        if needs_ocr_pages == len(pages_meta):
            return PdfResult(status="needs_ocr", text="", pages=pages_meta)
        status = "partial_success" if needs_ocr_pages else "success"
        return PdfResult(status=status, text="\n\n".join(page_texts), pages=pages_meta)
    except Exception as e:  # noqa: BLE001
        return PdfResult(status="failure", error=f"{type(e).__name__}: {e}"[:500])
