"""Hierarchical chunker over the extracted span model (RAG-prep stage).

Reference parity: docling re-exports HierarchicalChunker/HybridChunker
(/root/reference/docling/chunking/__init__.py:7-13) which walk the
DoclingDocument tree and emit one chunk per body text item with its heading
context. Our span model is the flattened (idx, parent) encoding and the
whole tree of one document lives inside ONE row's spans array — so heading
ancestry is resolved per row with higher-order functions (a map built from
the array + a bounded ``aggregate`` ancestor walk), not with self-joins.
The walk matches the reference chunker's unbounded ancestry traversal for
any tree up to ``_MAX_ANCESTRY`` deep (16 — deepest real span trees are
~10 levels; a deeper chain would simply yield heading=NULL, never a wrong
heading).

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
_MAX_ANCESTRY = 16  # walk bound; deepest real span trees are ~10 levels


def chunk_spans(extracted: DataFrame) -> DataFrame:
    """extracted (url, spans) → one row per chunk:
    (url, span_idx, heading, chunk_text)."""

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
    # full heading ancestry: walk parent links until a title/section_header
    # (or the root) — an in-row fold over a constant sequence, still zero
    # joins/shuffles. State: (cur ancestor idx, heading found so far); once
    # the heading is found or the chain ends (cur=-1 → map miss → NULL node)
    # the remaining iterations are constant-cost no-ops.
    def _walk_step(acc, _):
        # Spark's If evaluates branches lazily: once the walk is done
        # (cur < 0, meaning heading found or chain exhausted) the remaining
        # iterations skip the O(|spans|) map probe entirely
        node = F.element_at(F.col("_m"), acc["cur"])
        advanced = F.struct(
            F.when(
                node["label"].isin(*_HEADINGS) | node["parent"].isNull(),
                F.lit(-1),
            )
            .otherwise(node["parent"])
            .alias("cur"),
            F.when(node["label"].isin(*_HEADINGS), node["text"]).alias(
                "heading"
            ),
        )
        return F.when(acc["cur"] < 0, acc).otherwise(advanced)

    heading = F.aggregate(
        F.sequence(F.lit(1), F.lit(_MAX_ANCESTRY)),
        F.struct(
            F.col("s.parent").alias("cur"),
            F.lit(None).cast("string").alias("heading"),
        ),
        _walk_step,
    )["heading"]
    return out.select(
        "url",
        F.col("s.idx").alias("span_idx"),
        heading.alias("heading"),
        F.col("s.text").alias("chunk_text"),
    )


# GPT-2-style pretokenizer (public BPE pretokenization grammar): leading
# contraction suffixes, space-prefixed letter runs, digit runs, punctuation
# runs, residual whitespace. Uses only syntax shared by Java regex (Spark)
# and RE2 (DuckDB) so the SAME pattern drives both the operator and its
# value oracle.
BPE_LITE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_col(text_col, tokenizer: str = "whitespace"):
    """Pluggable token counter (all JVM-side, no UDF):

    - ``whitespace``: single-space split (the packing oracle's original
      rule; counts empty fragments like str.split(" ") does)
    - ``bpe_lite``: count of BPE pre-tokens under :data:`BPE_LITE_PATTERN`
      — a realistic budget proxy for byte-pair-encoded LLM tokenizers
      (every real BPE token boundary is a sub-split of these pre-tokens)

    A real vocab-merge BPE would slot in here as another branch (e.g. a
    broadcast-merges Pandas UDF); the seam is the tokenizer name."""
    if tokenizer == "whitespace":
        return F.size(F.split(text_col, " "))
    if tokenizer == "bpe_lite":
        return F.regexp_count(text_col, F.lit(BPE_LITE_PATTERN))
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def pack_chunks(
    chunks: DataFrame,
    budget_tokens: int = 64,
    tokenizer: str = "whitespace",
) -> DataFrame:
    """Token-aware packing (HybridChunker analog: reference re-exports a
    tokenizer-budget chunk merger, docling/chunking/__init__.py:7-13).

    Consecutive chunks of a document are grouped into packs by cumulative
    token count: pack_id = floor((cumsum - 1) / budget). One window cumsum
    + one groupBy — no Python, deterministic, and the pack boundary rule is
    engine-independent (value-oracle-able). ``tokenizer`` picks the counter
    (see :func:`token_count_col`)."""
    from pyspark.sql.window import Window

    toks = token_count_col(F.col("chunk_text"), tokenizer)
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
