"""Hierarchical chunker over the extracted span model (RAG-prep stage).

Reference parity: docling re-exports HierarchicalChunker/HybridChunker
(/root/reference/docling/chunking/__init__.py:7-13) which walk the
DoclingDocument tree and emit one chunk per body text item with its heading
context. Our span model is the flattened (idx, parent) encoding and the
whole tree of one document lives inside ONE row's spans array — so heading
ancestry is resolved per row with higher-order functions (a map built from
the array + two parent lookups), not with self-joins.

Scale notes: one explode, ZERO joins, ZERO added shuffles — the round-1
shape (explode + two (url, idx) equi-joins) recomputed the upstream
extraction UDF per join branch and paid two shuffles; this plan is a
single narrow pass over the extraction output (see
tests/test_plans.py::test_chunk_spans_no_joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEADINGS = ("title", "section_header")
_CHUNK_LABELS = ("text", "list_item", "code", "formula")


def chunk_spans(extracted: DataFrame) -> DataFrame:
    """extracted (url, spans) → one row per chunk:
    (url, span_idx, heading, chunk_text)."""

    def is_heading(node):
        return node.label.isin(*_HEADINGS)

    # idx → (parent, label, text) lookup map, built once per document row
    node_map = F.map_from_entries(
        F.transform(
            "spans",
            lambda s: F.struct(
                s.idx.alias("key"),
                F.struct(
                    s.parent.alias("parent"),
                    s.label.alias("label"),
                    s.text.alias("text"),
                ).alias("value"),
            ),
        )
    )
    chunkable = F.filter(
        "spans",
        lambda s: (s.kind == "text")
        & s.label.isin(*_CHUNK_LABELS)
        & (s.content_layer == "body")
        & (F.length(F.coalesce(s.text, F.lit(""))) > 0),
    )
    out = extracted.select(
        "url", node_map.alias("_m"), F.explode(chunkable).alias("s")
    )
    p1 = F.element_at("_m", F.col("s.parent"))
    p2 = F.element_at("_m", p1["parent"])
    heading = F.coalesce(
        F.when(is_heading(p1), p1["text"]),
        F.when(is_heading(p2), p2["text"]),
    )
    return out.select(
        "url",
        F.col("s.idx").alias("span_idx"),
        heading.alias("heading"),
        F.col("s.text").alias("chunk_text"),
    )


def pack_chunks(chunks: DataFrame, budget_tokens: int = 64) -> DataFrame:
    """Token-aware packing (HybridChunker analog: reference re-exports a
    tokenizer-budget chunk merger, docling/chunking/__init__.py:7-13).

    Consecutive chunks of a document are grouped into packs by cumulative
    whitespace-token count: pack_id = floor((cumsum - 1) / budget). One
    window cumsum + one groupBy — no Python, deterministic, and the pack
    boundary rule is engine-independent (value-oracle-able)."""
    from pyspark.sql.window import Window

    toks = F.size(F.split(F.col("chunk_text"), " "))
    w = (
        Window.partitionBy("url")
        .orderBy("span_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_pack = (
        chunks.withColumn("n_tokens", toks)
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "pack_id",
            F.floor((F.col("cum") - 1) / F.lit(budget_tokens)).cast("int"),
        )
    )
    return (
        with_pack.groupBy("url", "pack_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("span_idx", "chunk_text"))
                    ),
                    lambda s: s.chunk_text,
                ),
                " ",
            ).alias("packed_text"),
        )
    )
