"""Hierarchical chunker over the extracted span model (RAG-prep stage).

Reference parity: docling re-exports HierarchicalChunker/HybridChunker
(/root/reference/docling/chunking/__init__.py:7-13) which walk the
DoclingDocument tree and emit one chunk per body text item with its heading
context. Our span model is the flattened (idx, parent) encoding and the
whole tree of one document lives inside ONE row's spans array — so heading
ancestry is resolved per row with higher-order functions (a single
``aggregate`` fold that propagates the nearest heading down the tree in
construction order), not with self-joins. The fold matches the reference
chunker's unbounded ancestry traversal at ANY depth.

Scale notes: one explode, ZERO joins, ZERO added shuffles — the round-1
shape (explode + two (url, idx) equi-joins) recomputed the upstream
extraction UDF per join branch and paid two shuffles; this plan is a
single narrow pass over the extraction output (see
tests/test_plans.py::test_chunk_spans_no_joins).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves "pd.Series" hints
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEADINGS = ("title", "section_header")
_CHUNK_LABELS = ("text", "list_item", "code", "formula")


def chunk_spans(extracted: DataFrame) -> DataFrame:
    """extracted (url, spans) → one row per chunk:
    (url, span_idx, heading, chunk_text).

    Heading ancestry in ONE forward pass per document: the span model
    appends items in construction order, so a parent idx always precedes
    its children — folding the array once builds idx → nearest heading
    ancestor-or-self for EVERY node (heading item → its own text, other
    item → its parent's entry). Per-chunk heading is then a single map
    lookup. Versus the round-3 shape (a 16-step bounded parent walk per
    chunk row) this is O(|spans|) instead of O(chunks x depth) per doc,
    and the ancestry depth is genuinely UNBOUNDED — a 100-deep chain
    resolves exactly (the old ``_MAX_ANCESTRY`` cap is gone)."""

    # idx → nearest heading ancestor-or-self, one fold over the array.
    # A forward reference (parent idx after child — impossible in the span
    # model) would miss the lookup and yield heading=NULL, never a wrong
    # heading.
    hmap = F.aggregate(
        "spans",
        F.map_from_arrays(
            F.array().cast("array<int>"), F.array().cast("array<string>")
        ),
        lambda acc, s: F.map_concat(
            acc,
            F.map_from_arrays(
                F.array(s.idx),
                F.array(
                    F.when(s.label.isin(*_HEADINGS), s.text).otherwise(
                        F.try_element_at(acc, s.parent)
                    )
                ),
            ),
        ),
    )
    chunkable = F.filter(
        "spans",
        lambda s: (s.kind == "text")
        & s.label.isin(*_CHUNK_LABELS)
        & (s.content_layer == "body")
        & (F.length(F.coalesce(s.text, F.lit(""))) > 0),
    )
    out = extracted.select(
        "url", hmap.alias("_h"), F.explode(chunkable).alias("s")
    )
    # chunk items are never headings (filtered to _CHUNK_LABELS), so the
    # item's own map entry IS its nearest strict-ancestor heading
    return out.select(
        "url",
        F.col("s.idx").alias("span_idx"),
        F.try_element_at(F.col("_h"), F.col("s.idx")).alias("heading"),
        F.col("s.text").alias("chunk_text"),
    )


# GPT-2-style pretokenizer (public BPE pretokenization grammar): leading
# contraction suffixes, space-prefixed letter runs, digit runs, punctuation
# runs, residual whitespace. Uses only syntax shared by Java regex (Spark)
# and RE2 (DuckDB) so the SAME pattern drives both the operator and its
# value oracle.
BPE_LITE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def pack_stats(
    extracted: DataFrame,
    budget_tokens: int = 64,
    tokenizer: str = "whitespace",
    key_cols: tuple = ("url",),
) -> DataFrame:
    """Per-document chunk/pack accounting computed ENTIRELY in-row:
    (url, n_chunks, n_tokens, n_packs) — the doc-grain summary of
    :func:`chunk_spans` + :func:`pack_chunks` without their per-chunk
    fan-out or the ``Window.partitionBy(url)`` shuffle. The pack count
    replicates pack_chunks' boundary rule exactly (pack_id =
    floor((cumsum-1)/budget), counted as DISTINCT ids because an
    over-budget chunk skips ids): one filter + two folds over the spans
    array, zero exchanges — the shape a composed pipeline wants so the
    text/spans columns never re-shuffle for accounting.

    JVM tokenizers only (``whitespace`` / ``bpe_lite``): the counter runs
    inside array lambdas, which cannot host the ``bpe_full`` pandas UDF."""
    if tokenizer == "bpe_full":
        raise ValueError(
            "pack_stats supports JVM tokenizers only; use pack_chunks for"
            " bpe_full"
        )
    chunk_texts = F.transform(
        F.filter(
            "spans",
            lambda s: (s.kind == "text")
            & s.label.isin(*_CHUNK_LABELS)
            & (s.content_layer == "body")
            & (F.length(F.coalesce(s.text, F.lit(""))) > 0),
        ),
        lambda s: s.text,
    )
    toks = F.transform(
        chunk_texts, lambda t: token_count_col(t, tokenizer).cast("long")
    )
    cums = F.aggregate(
        toks,
        F.array().cast("array<long>"),
        lambda acc, x: F.concat(
            acc, F.array(F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0)) + x)
        ),
    )
    pack_ids = F.transform(
        cums, lambda c: F.floor((c - 1) / F.lit(budget_tokens))
    )
    # null spans (a failed extraction row) → zero counts, never -1/null
    return extracted.select(
        *key_cols,
        F.greatest(F.size(chunk_texts), F.lit(0)).alias("n_chunks"),
        F.coalesce(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + x),
            F.lit(0).cast("long"),
        ).alias("n_tokens"),
        F.greatest(F.size(F.array_distinct(pack_ids)), F.lit(0)).alias(
            "n_packs"
        ),
    )


def token_count_col(text_col, tokenizer: str = "whitespace"):
    """Pluggable token counter (all JVM-side, no UDF):

    - ``whitespace``: single-space split (the packing oracle's original
      rule; counts empty fragments like str.split(" ") does)
    - ``bpe_lite``: count of BPE pre-tokens under :data:`BPE_LITE_PATTERN`
      — a realistic budget proxy for byte-pair-encoded LLM tokenizers
      (every real BPE token boundary is a sub-split of these pre-tokens)
    - ``bpe_full``: REAL vocab-merge BPE (ops/bpe.py: frozen in-repo
      merges table, HF-style lowest-rank-pair application) counted in a
      vectorized Pandas UDF with a per-worker pre-token cache — the one
      tokenizer branch that crosses into Python, because merge loops are
      not expressible as JVM column functions."""
    if tokenizer == "whitespace":
        return F.size(F.split(text_col, " "))
    if tokenizer == "bpe_lite":
        return F.regexp_count(text_col, F.lit(BPE_LITE_PATTERN))
    if tokenizer == "bpe_full":
        from pyspark.sql.functions import pandas_udf

        from .bpe import token_count as _bpe_count

        @pandas_udf("int")
        def _count(texts: pd.Series) -> pd.Series:
            return texts.map(
                lambda t: _bpe_count(t) if t is not None else 0
            ).astype("int32")

        return _count(text_col)
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
