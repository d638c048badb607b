"""Chunker unit semantics: the one-pass heading fold (ops/chunker.py).

Reference parity: HierarchicalChunker walks the DoclingDocument tree with
UNBOUNDED ancestry (docling/chunking/__init__.py:7-13); the fold must
resolve the nearest heading ancestor at any depth."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.chunker import chunk_spans

SPAN_FIELDS = (
    "idx int, parent int, kind string, label string, text string, "
    "content_layer string"
)


@pytest.fixture(scope="module")
def spark():
    yield (
        SparkSession.builder.master("local[4]")
        .appName("chunker-unit-test")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )


def _run(spark, spans):
    df = spark.createDataFrame(
        [("u", spans)], schema=f"url string, spans array<struct<{SPAN_FIELDS}>>"
    )
    return {r.span_idx: r.heading for r in chunk_spans(df).collect()}


def _n(idx, parent, label, text, kind="text", layer="body"):
    return (idx, parent, kind, label, text, layer)


def test_deep_chain(spark):
    """A 100-deep group chain under a heading — far past the old 16-step
    walk bound — resolves to the right heading (fold is unbounded)."""
    spans = [_n(0, -1, "section_header", "H")]
    for i in range(1, 101):
        spans.append(_n(i, i - 1, "unspecified", None, kind="group"))
    spans.append(_n(101, 100, "text", "leaf"))
    assert _run(spark, spans) == {101: "H"}


def test_nearest_heading_not_document_order(spark):
    """A sibling subtree's heading must NOT leak: ancestry, not recency."""
    spans = [
        _n(0, -1, "section_header", "A"),
        _n(1, 0, "text", "under A"),
        _n(2, -1, "section_header", "B"),  # sibling of A
        _n(3, 0, "text", "still under A"),  # later in doc order, parent=A
    ]
    assert _run(spark, spans) == {1: "A", 3: "A"}


def test_no_heading_yields_null(spark):
    spans = [
        _n(0, -1, "unspecified", None, kind="group"),
        _n(1, 0, "text", "orphan"),
    ]
    assert _run(spark, spans) == {1: None}


def test_intermediate_heading_shadows_outer(spark):
    spans = [
        _n(0, -1, "title", "Doc"),
        _n(1, 0, "section_header", "Sec"),
        _n(2, 1, "text", "body"),
        _n(3, 0, "text", "top-level body"),
    ]
    assert _run(spark, spans) == {2: "Sec", 3: "Doc"}
