"""Hierarchical chunker over the extracted span model (RAG-prep stage).

Reference parity: docling re-exports HierarchicalChunker/HybridChunker
(/root/reference/docling/chunking/__init__.py:7-13) which walk the
DoclingDocument tree and emit one chunk per body text item with its heading
context. Our span model is the flattened (idx, parent) encoding, so the
tree walk becomes RELATIONAL: explode the spans array, then resolve heading
ancestry with bounded self-joins (depth ≤ 3 covers title → group → item,
the deepest chain the HTML backend emits for text content).

Scale notes: the explode is a narrow transform; the self-joins are per-url
equi-joins on (url, idx) — co-partitioned by the explode's parent
partitioning, so AQE turns them into local joins; no global shuffle beyond
the url hash the pipeline already has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEADINGS = ("title", "section_header")
_CHUNK_LABELS = ("text", "list_item", "code", "formula")


def chunk_spans(extracted: DataFrame) -> DataFrame:
    """extracted (url, spans) → one row per chunk:
    (url, span_idx, heading, chunk_text)."""
    s = (
        extracted.select("url", F.explode("spans").alias("s"))
        .select(
            "url",
            F.col("s.idx").alias("idx"),
            F.col("s.parent").alias("parent"),
            F.col("s.kind").alias("kind"),
            F.col("s.label").alias("label"),
            F.col("s.text").alias("text"),
            F.col("s.content_layer").alias("layer"),
        )
    )
    items = s.filter(
        (F.col("kind") == "text")
        & F.col("label").isin(*_CHUNK_LABELS)
        & (F.col("layer") == "body")
        & (F.length(F.coalesce("text", F.lit(""))) > 0)
    )
    # parent / grandparent heading lookup (bounded ancestry)
    p1 = s.select(
        F.col("url").alias("p1_url"),
        F.col("idx").alias("p1_idx"),
        F.col("parent").alias("p1_parent"),
        F.when(F.col("label").isin(*_HEADINGS), F.col("text")).alias("p1_head"),
    )
    p2 = s.select(
        F.col("url").alias("p2_url"),
        F.col("idx").alias("p2_idx"),
        F.when(F.col("label").isin(*_HEADINGS), F.col("text")).alias("p2_head"),
    )
    joined = (
        items.join(
            p1,
            (items.url == p1.p1_url) & (items.parent == p1.p1_idx),
            "left",
        )
        .join(
            p2,
            (F.col("p1_url") == p2.p2_url) & (F.col("p1_parent") == p2.p2_idx),
            "left",
        )
    )
    return joined.select(
        "url",
        F.col("idx").alias("span_idx"),
        F.coalesce("p1_head", "p2_head").alias("heading"),
        F.col("text").alias("chunk_text"),
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
