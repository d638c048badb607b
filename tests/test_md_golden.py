"""Markdown backend golden parity: byte-identical export_to_markdown vs all
9 reference md fixtures (/root/reference/docling/backend/md_backend.py
semantics; goldens under tests/data/groundtruth/docling_v2/*.md.md, compared
rstrip'd exactly like /root/reference/tests/test_backend_markdown.py:63-66).

Covers: ATX/setext headings, tight+nested (tab-indented) lists, empty
items/headings/code blocks, indented + fenced code, pipe tables (incl. a
doc that ends mid-table), emphasis/strong/both, code spans, links, escaped
characters + entities, underscore-sequence shortening, and the raw-HTML
delegation path (export to HTML → marker strip → HTML backend reparse,
which applies the furniture rule: mixed_without_h1 loses its pre-heading
paragraph exactly as the reference does)."""

from __future__ import annotations

from pathlib import Path

import pytest

from docling_spark.mdx import extract_markdown
from docling_spark.serialize import to_markdown

DATA = Path("/root/reference/tests/data/md")
GT = DATA.parent / "groundtruth" / "docling_v2"
FIXTURES = sorted(DATA.glob("*.md"))
DELEGATED = {"escaped_characters", "mixed", "mixed_without_h1", "nested"}


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_md_golden(path: Path):
    assert len(FIXTURES) == 9
    doc = extract_markdown(path.read_bytes(), name=path.stem)
    gt = (GT / f"{path.name}.md").read_text().rstrip()
    assert to_markdown(doc) == gt


def test_furniture_rule_via_delegation():
    """mixed_without_h1 contains an HTML comment block → whole doc round-
    trips through the HTML backend → leading paragraph becomes furniture."""
    path = DATA / "mixed_without_h1.md"
    doc = extract_markdown(path.read_bytes(), name=path.stem)
    furn = [it.text for it in doc.items if it.content_layer == "furniture"]
    assert any("Content before first heading" in (t or "") for t in furn)


def test_md_spark_dispatch_and_extraction():
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
    rows = [
        (f"https://t/{p.name}", ts, p.read_bytes(), None, "en")
        for p in FIXTURES
    ]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    out = {r.url: r for r in extract_pages(pages).collect()}
    for p in FIXTURES:
        r = out[f"https://t/{p.name}"]
        assert r.content_type == "md", p.name
        assert r.status == "success", p.name
        assert r.extracted_text == (
            GT / f"{p.name}.md"
        ).read_text().rstrip(), p.name


def test_md_cli_convert(tmp_path):
    from docling_spark.__main__ import main

    src = DATA / "duck.md"
    rc = main(["convert", str(src), "--to", "md", "--output", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "duck.md").read_text() == (
        GT / "duck.md.md"
    ).read_text().rstrip()


def test_html_roundtrip_serializer():
    """to_html must round-trip through the HTML backend: serialize every md
    fixture's SpanDoc, re-extract, and compare markdown output — the
    OutputFormat.HTML contract (delegated fixtures already round-trip by
    construction; this pins the non-delegated ones too)."""
    from docling_spark.htmlx.extract import HtmlExtractor, clean_unicode
    from docling_spark.serialize_html import to_html

    for path in FIXTURES:
        if path.stem in DELEGATED or path.stem == "inline_and_formatting":
            # delegated fixtures round-trip by construction;
            # inline_and_formatting: the HTML heading path flattens per-
            # fragment formatting (reference-faithful html-backend behavior)
            continue
        doc = extract_markdown(path.read_bytes(), name=path.stem)
        html = to_html(doc)
        doc2 = HtmlExtractor(base_uri="None").convert(html.encode())
        md1 = to_markdown(doc)
        md2 = to_markdown(doc2, layers=frozenset({"body"}))
        # the round-trip legitimately applies (a) the HTML furniture rule to
        # content before the first heading and (b) _clean_unicode — exactly
        # what the reference's own export→reparse composition does
        if md1 != md2:
            first_heading = md1.find("#")
            expect = clean_unicode(
                md1[first_heading:].strip() if first_heading >= 0 else md1
            )
            assert md2 == expect, (path.name, md2[:200])
