"""DoclingJSON backend (reference: docling_json_backend.py): deserialize →
SpanDoc. Two bars: (a) exact inverse of our serializer over the whole
fixture corpus; (b) parsing the REFERENCE's own golden .json files and
re-serializing to markdown reproduces the reference's golden .md."""

from __future__ import annotations

from pathlib import Path

import pytest

from docling_spark.csvx import extract_csv
from docling_spark.htmlx.extract import extract_html
from docling_spark.jsonx import parse_docling_json
from docling_spark.serialize import to_itxt, to_markdown
from docling_spark.serialize_json import to_docling_json

HTML = sorted(Path("/root/reference/tests/data/html").glob("*.html"))
CSV = sorted(Path("/root/reference/tests/data/csv").glob("*.csv"))
GT = Path("/root/reference/tests/data/groundtruth/docling_v2")


@pytest.mark.parametrize("path", HTML, ids=lambda p: p.stem)
def test_roundtrip_html(path: Path):
    raw = path.read_bytes()
    doc = extract_html(raw, base_uri="None", name=path.stem)
    j = to_docling_json(doc, path.name, raw)
    doc2 = parse_docling_json(j)
    assert to_markdown(doc2) == to_markdown(doc)
    assert to_itxt(doc2, 70) == to_itxt(doc, 70)
    assert to_docling_json(doc2, path.name, raw) == j


@pytest.mark.parametrize("path", CSV, ids=lambda p: p.stem)
def test_roundtrip_csv(path: Path):
    raw = path.read_bytes()
    doc = extract_csv(raw, name=path.stem)
    j = to_docling_json(doc, path.name, raw, mimetype="text/csv")
    assert to_docling_json(parse_docling_json(j), path.name, raw, mimetype="text/csv") == j


@pytest.mark.parametrize(
    "g",
    sorted(p for p in GT.glob("*.html.json") if (GT / (p.name[:-5] + ".md")).exists()
           and not p.name.startswith("example_01_images")),
    ids=lambda p: p.stem,
)
def test_reference_golden_json_deserializes_to_golden_md(g: Path):
    doc = parse_docling_json(g.read_bytes())
    assert to_markdown(doc) == (GT / (g.name[:-5] + ".md")).read_text()


def test_rejects_non_docling_json():
    with pytest.raises(Exception):
        parse_docling_json(b'{"hello": "world"}')
