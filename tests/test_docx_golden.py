"""DOCX backend golden parity: byte-identical md + itxt (and structural
json) vs all 16 reference DOCX fixtures
(/root/reference/docling/backend/msword_backend.py semantics; goldens under
tests/data/groundtruth/docling_v2/*.docx.*).

textbox.docx is excluded exactly as upstream excludes it: its golden
predates the reference's DrawingML rendering feature and the fixture is
marked flaky/xfail there (tests/test_backend_msword.py:108-121).

JSON comparison normalizes two things the environment cannot reproduce:
embedded picture payloads (PIL-decoded base64 images in the goldens; the
item tree around them must still match) and the docling-core version string
(goldens are a mix of 1.7.0 / 1.8.0 generations)."""

from __future__ import annotations

import copy
import json
from pathlib import Path

import pytest

from docling_spark.docxx import extract_docx
from docling_spark.serialize import to_itxt, to_markdown
from docling_spark.serialize_json import to_docling_dict

DATA = Path("/root/reference/tests/data/docx")
GT = DATA.parent / "groundtruth" / "docling_v2"
FLAKY = {"textbox"}  # upstream xfail — stale golden
FIXTURES = sorted(p for p in DATA.glob("*.docx") if p.stem not in FLAKY)
MIME = (
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
)


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_docx_md_golden(path: Path):
    assert len(FIXTURES) == 15
    doc = extract_docx(path.read_bytes(), name=path.stem)
    assert to_markdown(doc) == (GT / f"{path.name}.md").read_text().rstrip()


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_docx_itxt_golden(path: Path):
    doc = extract_docx(path.read_bytes(), name=path.stem)
    assert to_itxt(doc, 70) == (GT / f"{path.name}.itxt").read_text()


def _normalize(d: dict) -> dict:
    d = copy.deepcopy(d)
    d["version"] = "X"
    for p in d.get("pictures", []):
        p.pop("image", None)
    return d


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_docx_json_golden(path: Path):
    raw = path.read_bytes()
    doc = extract_docx(raw, name=path.stem)
    ours = _normalize(to_docling_dict(doc, path.name, raw, mimetype=MIME))
    gt = _normalize(json.loads((GT / f"{path.name}.json").read_text()))
    assert ours == gt


def test_docx_html_export_golden():
    """The reference ships exactly one export_to_html golden
    (word_tables.docx.html, checked by test_backend_msword.py:99-104);
    our to_html matches it byte-for-byte — head template, page div,
    tbody-wrapped tables with row/colspans, empty <p></p> paragraphs."""
    from docling_spark.serialize_html import to_html

    path = DATA / "word_tables.docx"
    doc = extract_docx(path.read_bytes(), name=path.stem)
    assert to_html(doc) == (GT / "word_tables.docx.html").read_text()


@pytest.mark.xfail(
    strict=False, reason="upstream-flaky fixture with stale golden"
)
def test_docx_textbox_flaky():
    path = DATA / "textbox.docx"
    doc = extract_docx(path.read_bytes(), name=path.stem)
    assert to_markdown(doc) == (GT / f"{path.name}.md").read_text().rstrip()


def test_docx_textbox_content_extracted():
    """Upstream's non-flaky assertion: a known textbox string IS present
    (test_backend_msword.py:123-132)."""
    path = DATA / "textbox.docx"
    doc = extract_docx(path.read_bytes(), name=path.stem)
    texts = [it.text for it in doc.items if it.kind == "text"]
    assert any("Suggested Reportable Symptoms" in (t or "") for t in texts)


def test_docx_spark_dispatch_and_extraction():
    import datetime

    from pyspark.sql import SparkSession

    from docling_spark.job import extract_pages
    from docling_spark.schema import PAGES_SCHEMA

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    ts = datetime.datetime(2024, 1, 1)
    # urls WITHOUT the .docx extension: dispatch must work from the zip
    # content sniff (PK magic + word/document.xml member name)
    rows = [
        (f"https://t/{p.stem}", ts, p.read_bytes(), None, "en")
        for p in FIXTURES
    ]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    out = {r.url: r for r in extract_pages(pages).collect()}
    for p in FIXTURES:
        r = out[f"https://t/{p.stem}"]
        assert r.content_type == "docx", p.name
        assert r.status == "success", (p.name, r.error)
        assert r.extracted_text == (
            GT / f"{p.name}.md"
        ).read_text().rstrip(), p.name
