"""Span character offsets (serialize.to_markdown_with_spans).

North rule: the job writes "extracted text + span offsets". Invariants:
the offset-producing serializer emits BYTE-IDENTICAL markdown to
to_markdown (the golden contract must not move), and md[start:end] is
exactly the block each item emitted.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from docling_spark.htmlx.extract import extract_html
from docling_spark.serialize import to_markdown, to_markdown_with_spans

HTML_DIR = Path("/root/reference/tests/data/html")
FIXTURES = sorted(HTML_DIR.glob("*.html"))


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_markdown_byte_identical_and_segments_consistent(path):
    doc = extract_html(path.read_bytes(), base_uri="None", name=path.stem)
    md, spans = to_markdown_with_spans(doc)
    assert md == to_markdown(doc)
    for idx, (s, e) in spans.items():
        assert 0 <= s <= e <= len(md), (path.name, idx)
        it = doc.items[idx]
        seg = md[s:e]
        # single-block text items: the emitted text is exactly the segment
        if it.kind == "text" and it.label == "text" and "\n" not in seg:
            assert seg, (path.name, idx)


def test_offsets_cover_all_emitting_items():
    html = (
        b"<html><body><h1>H</h1><p>one</p><p>two</p>"
        b"<ul><li>a</li><li>b</li></ul></body></html>"
    )
    doc = extract_html(html, base_uri="None", name="x")
    md, spans = to_markdown_with_spans(doc)
    labels = {doc.items[i].label for i in spans}
    assert {"title", "text", "list_item"} <= labels
    # list items point at their own lines
    li = [(s, e) for i, (s, e) in spans.items() if doc.items[i].label == "list_item"]
    assert sorted(md[s:e] for s, e in li) == ["- a", "- b"]


def test_offsets_through_spark_job():
    """spans column carries char_start/char_end; slicing extracted_text at
    those offsets reproduces each item's block."""
    import datetime

    from pyspark.sql import SparkSession

    from docling_spark.job import extract_pages
    from docling_spark.schema import PAGES_SCHEMA

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    html = (
        b"<html><body><h1>Head</h1><p>body paragraph</p></body></html>"
    )
    pages = spark.createDataFrame(
        [("https://t/x.html", datetime.datetime(2024, 1, 1), html, None, "en")],
        schema=PAGES_SCHEMA,
    )
    row = extract_pages(pages, base_uri_mode="none").collect()[0]
    md = row.extracted_text
    got = {
        s.label: md[s.char_start : s.char_end]
        for s in row.spans
        if s.char_start is not None
    }
    assert got["title"] == "# Head"
    assert got["text"] == "body paragraph"
