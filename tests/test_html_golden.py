"""Golden-file parity: every reference HTML fixture must serialize
byte-identically (mirrors /root/reference/tests/test_backend_html.py:225-249).
"""

from pathlib import Path

import pytest

from docling_spark.htmlx.extract import extract_html
from docling_spark.serialize import to_itxt, to_markdown

DATA = Path("/root/reference/tests/data/html")
GT = Path("/root/reference/tests/data/groundtruth/docling_v2")

FIXTURES = sorted(DATA.glob("*.html")) if DATA.exists() else []


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.name)
def test_markdown_golden(path: Path):
    doc = extract_html(path.read_bytes(), base_uri="None", name=path.stem)
    gt = (GT / f"{path.name}.md").read_text(encoding="utf-8")
    assert to_markdown(doc) == gt


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.name)
def test_itxt_golden(path: Path):
    doc = extract_html(path.read_bytes(), base_uri="None", name=path.stem)
    gt = (GT / f"{path.name}.itxt").read_text(encoding="utf-8")
    assert to_itxt(doc, max_text_len=70) == gt
