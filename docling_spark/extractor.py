"""Structured-extraction API shape (DocumentExtractor parity).

Reference: DocumentExtractor.extract → ExtractionResult with per-page
``ExtractedPageData(page_no, extracted_data, raw_text, errors)``
(/root/reference/docling/document_extractor.py:90-120,
/root/reference/docling/datamodel/extraction.py:11-35). The reference
fills ``extracted_data`` with a VLM pipeline (NN, out of contract); here
the deterministic remainder is exposed with the same result shape:
per-page ``raw_text`` from the PDF layout path, page-scoped ``errors``,
and the document-level status calculus. ``extracted_data`` stays None
until a non-NN template engine exists — the field is kept so downstream
schemas match.

Spark surface: :func:`extract_structured` fans a pages table out to one
row per (url, page_no) with the same fields — the relational form of
``ExtractionResult.pages``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame


@dataclass
class ExtractedPageData:
    """Mirror of the reference model (extraction.py:11-22)."""

    page_no: int  # 1-indexed
    extracted_data: Optional[dict] = None
    raw_text: Optional[str] = None
    errors: list = field(default_factory=list)


@dataclass
class ExtractionResult:
    """Mirror of the reference model (extraction.py:25-35), minus the
    pydantic InputDocument handle (url/filename stands in)."""

    source: str
    status: str = "pending"
    errors: list = field(default_factory=list)
    pages: list = field(default_factory=list)


def extract_document(
    blob: bytes,
    source: str = "stream",
    password: str = "",
    page_range: "tuple[int, int]" = (1, 2**31 - 1),
    max_num_pages: Optional[int] = None,
) -> ExtractionResult:
    """One document → per-page extraction result. Never raises."""
    from .pdfx.extract import extract_pdf_text

    res = ExtractionResult(source=source)
    try:
        if blob[:5] == b"%PDF-":
            pr = extract_pdf_text(
                blob,
                password=password,
                page_range=page_range,
                max_num_pages=max_num_pages,
                with_page_texts=True,
            )
            if pr.status in ("failure",):
                res.status = "failure"
                res.errors.append(pr.error or "extraction failed")
                return res
            res.status = (
                "success" if pr.status == "success" else "partial_success"
            )
            if pr.error:
                res.errors.append(pr.error)
            start = page_range[0]
            texts = pr.page_texts or []
            counts = pr.pages or []
            ti = 0
            for i, n_cells in enumerate(counts):
                page_no = start + i
                if n_cells == 0:
                    res.pages.append(
                        ExtractedPageData(
                            page_no=page_no,
                            raw_text=None,
                            errors=["page has no text cells (needs OCR)"],
                        )
                    )
                else:
                    res.pages.append(
                        ExtractedPageData(
                            page_no=page_no, raw_text=texts[ti]
                        )
                    )
                    ti += 1
            return res
        # image inputs: reference routes these to the VLM extractor; the
        # deterministic engine reports the page with an explicit error
        res.status = "partial_success"
        res.pages.append(
            ExtractedPageData(
                page_no=1,
                errors=["image extraction requires a VLM (not in contract)"],
            )
        )
        return res
    except Exception as e:  # noqa: BLE001 — per-document containment
        res.status = "failure"
        res.errors.append(f"{type(e).__name__}: {e}"[:500])
        return res


EXTRACT_STRUCTURED_SCHEMA = (
    "url string, status string, page_no int, raw_text string, "
    "errors array<string>"
)


def extract_structured(
    pages: DataFrame, password: str = ""
) -> DataFrame:
    """pages(url, html binary, ...) → one row per (url, page_no), the
    relational ExtractionResult.pages. Vectorized mapInPandas fan-out —
    same batch shape as the conversion UDF, no per-row Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for url, blob in zip(b["url"], b["html"]):
                r = extract_document(
                    bytes(blob), source=url, password=password
                )
                if not r.pages:
                    rows.append((url, r.status, None, None, r.errors))
                for p in r.pages:
                    rows.append(
                        (url, r.status, p.page_no, p.raw_text, p.errors)
                    )
            yield pd.DataFrame(
                rows, columns=["url", "status", "page_no", "raw_text", "errors"]
            )

    return pages.select("url", "html").mapInPandas(
        run, schema=EXTRACT_STRUCTURED_SCHEMA
    )
