"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship: full HTML-extraction pipeline over a synthesized
               Common-Crawl-shaped pages table (sf0.001).
``queries``  — one entry per implemented operator (SURVEY.md §2 + the
               training-data ops suite); each (spark, sf_dir) → DataFrame.
``oracle_sql`` — DuckDB-runnable ANSI equivalents (value-level oracles),
               including a full value oracle for the extraction UDF path via
               the deterministic synth template (ops/corpus.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_spark.job import extract_pages, with_content_type
from docling_spark.ops import ann, cc, dedup, textstats
from docling_spark.ops.corpus import SYNTH_MD_SQL, synth_pages

SF_DEFAULT = "/root/testdata/sf0.001"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _with_dups(docs: DataFrame) -> DataFrame:
    """documents ∪ exact copies of doc_id<50 (deterministic dup injection)."""
    copies = docs.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return docs.unionByName(copies)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synth pages → content dispatch → vectorized extraction."""
    pages = synth_pages(spark, SF_DEFAULT)
    out = extract_pages(pages, base_uri_mode="none")
    return out.select("url", "status", "content_type", "doc_hash", "n_chars")


# --------------------------------------------------------------------- queries
def q_extract_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = synth_pages(spark, sf_dir)
    out = extract_pages(pages, base_uri_mode="none")
    return out.select("url", "status", "extracted_text", "n_chars", "doc_hash")


def q_format_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = synth_pages(spark, sf_dir)
    return with_content_type(pages).select("url", "content_type")


def q_doc_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("doc_hash")
    )


def q_size_limits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input validation: the job's REAL max_bytes oversize routing — the
    gate exercises extract_pages(max_bytes=...) end-to-end (reference
    max_file_size analog, document.py:152-192): oversize rows are routed to
    content_type='oversize' / status='skipped', the rest extract normally."""
    pages = synth_pages(spark, sf_dir)
    out = extract_pages(pages, base_uri_mode="none", max_bytes=500)
    return out.select("url", "content_type", "status")


def q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF layout path: synth digital-born PDFs → parse → cells → reading
    order → text (value-level oracle via the deterministic template)."""
    from docling_spark.ops.corpus import synth_pages_pdf

    pages = synth_pages_pdf(spark, sf_dir)
    # text-only consumer: skip the structural labeler (grid detection +
    # heading ranking) — span consumers (pdf_struct_spans, pdf_chunks)
    # keep with_structure=True
    out = extract_pages(pages, base_uri_mode="none", with_structure=False)
    return out.select("url", "status", "extracted_text", "n_chars")


def q_pdf_encrypted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encrypted-PDF password path (standard security handler, pdfx/crypt):
    the same RC4-locked corpus extracted WITH the password must byte-match
    the plaintext PDFs' text, and WITHOUT it must fail row-by-row with the
    explicit encrypted error — never crash a task."""
    from docling_spark.ops.corpus import synth_pages_pdf_encrypted

    pages = synth_pages_pdf_encrypted(spark, sf_dir, password="sesame")
    with_pw = extract_pages(
        pages, base_uri_mode="none", with_structure=False,
        pdf_password="sesame",
    ).select(
        "url",
        F.lit("with_password").alias("attempt"),
        "status",
        "extracted_text",
        "error",
    )
    without_pw = extract_pages(
        pages, base_uri_mode="none", with_structure=False
    ).select(
        "url",
        F.lit("no_password").alias("attempt"),
        "status",
        "extracted_text",
        "error",
    )
    return with_pw.unionByName(without_pw)


def q_structured_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DocumentExtractor result shape (docling_spark/extractor.py): one row
    per (url, page_no) with raw_text + page errors — the deterministic
    slice of the reference's VLM extraction API."""
    from docling_spark.extractor import extract_structured
    from docling_spark.ops.corpus import synth_pages_pdf

    out = extract_structured(synth_pages_pdf(spark, sf_dir))
    return out.select(
        "url", "status", "page_no", "raw_text", F.size("errors").alias("n_errors")
    )


def q_structured_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic structured-extraction TEMPLATE engine
    (docling_spark/extractor.py compile_template/apply_template — the
    non-NN analog of the reference's ExtractionTemplateType,
    extraction.py:38-39): named typed regex fields over per-page raw_text
    of an invoice-style corpus; every extracted field is value-checked."""
    from docling_spark.extractor import extract_structured
    from docling_spark.ops.corpus import synth_pages_pdf_invoice

    template = {
        "inv_no": {"pattern": r"Invoice\s+INV-(\d+)", "type": "int"},
        "inv_date": {
            "pattern": r"Date:\s+(\d{4}-\d{2}-\d{2})",
            "type": "date",
        },
        "total": {"pattern": r"Total:\s+([\d,.]+)\s+USD", "type": "float"},
        "paid": {"pattern": r"Paid:\s+(\w+)", "type": "bool"},
        "missing": {"pattern": r"Discount:\s+(\d+)", "type": "int"},
    }
    out = extract_structured(
        synth_pages_pdf_invoice(spark, sf_dir), template=template
    )
    j = F.col("extracted_data")
    return out.select(
        "url",
        "status",
        "page_no",
        F.get_json_object(j, "$.inv_no").cast("int").alias("inv_no"),
        F.get_json_object(j, "$.inv_date").alias("inv_date"),
        F.get_json_object(j, "$.total").cast("double").alias("total"),
        F.get_json_object(j, "$.paid").cast("boolean").alias("paid"),
        F.get_json_object(j, "$.missing").cast("int").alias("missing"),
    )


def q_pdf_doctags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Located DocTags from the deterministic PDF path (the reference's VLM
    pipelines emit exactly this format): structural blocks → SpanDoc →
    doctags, loc tokens quantizing REAL block geometry. The oracle checks
    the tag/text stream with loc tokens stripped (geometry is pinned by the
    pdfx unit tests; encoded coordinates are layout-engine specific)."""
    from docling_spark.ops.corpus import synth_pages_pdf_structured

    out = extract_pages(
        synth_pages_pdf_structured(spark, sf_dir),
        base_uri_mode="none",
        with_doctags=True,
    )
    return out.select(
        "url",
        "status",
        F.regexp_replace("doctags", r"<loc_\d+>", "").alias("doctags_nolocs"),
    )


def q_mixed_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML ∪ PDF ∪ extensionless-CSV corpus → content sniffing →
    per-branch counts. The CSV rows carry NO url extension, so the csv
    count proves the content-level sniff (job._csv_sniff)."""
    from docling_spark.ops.corpus import synth_pages_csv, synth_pages_pdf

    pages = (
        synth_pages(spark, sf_dir)
        .unionByName(synth_pages_pdf(spark, sf_dir))
        .unionByName(synth_pages_csv(spark, sf_dir))
    )
    return (
        with_content_type(pages)
        .groupBy("content_type")
        .agg(F.count("*").alias("n"))
    )


def q_csv_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extensionless CSV through the FULL job: content-sniffed to the csv
    backend (csvx.py — Sniffer dialect, first row = header), exported as a
    github table."""
    from docling_spark.ops.corpus import synth_pages_csv

    out = extract_pages(synth_pages_csv(spark, sf_dir), base_uri_mode="none")
    return out.select("url", "status", "content_type", "extracted_text")


def q_spans_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-model fidelity: full (idx, parent, kind, label, text, layer)
    tree per url, value-checked against the synth template's expected tree
    (the relational form of the reference's export_to_dict JSON golden)."""
    pages = synth_pages(spark, sf_dir)
    out = extract_pages(pages, base_uri_mode="none")
    s = out.select("url", F.explode("spans").alias("s"))
    return s.select(
        "url",
        F.col("s.idx").alias("idx"),
        F.col("s.parent").alias("parent"),
        F.col("s.kind").alias("kind"),
        F.col("s.label").alias("label"),
        F.col("s.text").alias("text"),
        F.col("s.content_layer").alias("layer"),
    )


def q_span_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character offsets of each span in extracted_text (north rule:
    "extracted text + span offsets", serialize.to_markdown_with_spans).
    The oracle recomputes every offset arithmetically from the synth
    template — any drift in block placement or separators breaks it."""
    pages = synth_pages(spark, sf_dir)
    out = extract_pages(pages, base_uri_mode="none")
    sp = out.select("url", F.explode("spans").alias("s")).filter(
        F.col("s.char_start").isNotNull()
    )
    return sp.select(
        "url",
        F.col("s.idx").alias("idx"),
        F.col("s.label").alias("label"),
        F.col("s.char_start").alias("char_start"),
        F.col("s.char_end").alias("char_end"),
    )


def q_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical chunker: spans tree → (heading, chunk_text) rows.
    Input is the shallow corpus UNION the deep-nesting corpus (3-level
    nested lists, heading 6 parent links away) so the oracle pins the FULL
    ancestry walk, not just 2 hops."""
    from docling_spark.ops.chunker import chunk_spans
    from docling_spark.ops.corpus import synth_pages_deep

    pages = synth_pages(spark, sf_dir).unionByName(
        synth_pages_deep(spark, sf_dir)
    )
    return chunk_spans(extract_pages(pages, base_uri_mode="none"))


def q_doc_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoclingDocument JSON fidelity column: extract with with_doc_json=True
    and project JSON fields; the oracle predicts them independently from
    doc_id (so the whole json build+parse round-trip is value-checked)."""
    pages = synth_pages(spark, sf_dir)
    out = extract_pages(pages, base_uri_mode="none", with_doc_json=True)
    j = F.col("doc_json")
    return out.select(
        "url",
        F.get_json_object(j, "$.schema_name").alias("schema_name"),
        F.get_json_object(j, "$.version").alias("version"),
        F.get_json_object(j, "$.name").alias("doc_name"),
        F.get_json_object(j, "$.origin.filename").alias("filename"),
        F.get_json_object(j, "$.texts[1].text").alias("h1_text"),
        F.json_array_length(F.get_json_object(j, "$.texts")).alias("n_texts"),
        F.json_array_length(F.get_json_object(j, "$.tables")).alias("n_tables"),
        F.json_array_length(F.get_json_object(j, "$.groups")).alias("n_groups"),
    )


def q_doctags_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DocTags output format (reference OutputFormat.DOCTAGS, byte-pinned by
    the 12 *.doctags.txt goldens in tests/test_doctags_golden.py): extract
    with with_doctags=True; the oracle reconstructs the full tag stream."""
    pages = synth_pages(spark, sf_dir)
    out = extract_pages(pages, base_uri_mode="none", with_doctags=True)
    return out.select("url", "status", "doctags")


def q_table_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table reconstruction fidelity: cell grid values + header flags pulled
    from the DoclingDocument JSON, value-checked against the synth template."""
    pages = synth_pages(spark, sf_dir)
    out = extract_pages(pages, base_uri_mode="none", with_doc_json=True)
    j = F.col("doc_json")
    return out.select(
        "url",
        F.get_json_object(j, "$.tables[0].data.num_rows").cast("int").alias("num_rows"),
        F.get_json_object(j, "$.tables[0].data.num_cols").cast("int").alias("num_cols"),
        F.get_json_object(j, "$.tables[0].data.grid[0][0].text").alias("c00"),
        F.get_json_object(j, "$.tables[0].data.grid[0][1].text").alias("c01"),
        F.get_json_object(j, "$.tables[0].data.grid[1][0].text").alias("c10"),
        F.get_json_object(j, "$.tables[0].data.grid[1][1].text").alias("c11"),
        F.get_json_object(j, "$.tables[0].data.grid[0][0].column_header")
        .cast("boolean").alias("h00"),
        F.get_json_object(j, "$.tables[0].data.grid[1][0].column_header")
        .cast("boolean").alias("h10"),
    )


def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC source round-trip: each page wrapped in a WARC response record
    (gzip member), parsed back through the WARC reader, then extracted —
    value-checked against the same oracle as the direct HTML path."""
    import pandas as pd

    from docling_spark.sources.warc import build_warc, warc_to_rows

    pages = synth_pages(spark, sf_dir)

    def roundtrip(batches):
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for b in batches:
            rows = []
            for url, ts, html in zip(b["url"], b["warc_ts"], b["html"]):
                blob = build_warc(
                    [(url, ts.strftime("%Y-%m-%dT%H:%M:%SZ"), bytes(html))],
                    gzip_members=True,
                )
                rows.extend(warc_to_rows(blob))
            df = pd.DataFrame(rows, columns=cols)
            yield df

    parsed = pages.mapInPandas(
        roundtrip,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = extract_pages(parsed, base_uri_mode="none")
    return out.select("url", "status", "extracted_text", "doc_hash")


def q_pdf_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF branch span model: structural labels from the font-geometry
    heuristics (pdfx/structure.py) — the 18pt title block becomes a level-1
    section_header and the body paragraph parents under it."""
    from docling_spark.ops.corpus import synth_pages_pdf

    pages = synth_pages_pdf(spark, sf_dir)
    out = extract_pages(pages, base_uri_mode="none")
    s = out.select("url", F.explode("spans").alias("s"))
    return s.select(
        "url",
        F.col("s.idx").alias("idx"),
        F.col("s.parent").alias("parent"),
        F.col("s.text").alias("text"),
        F.col("s.label").alias("label"),
        F.col("s.level").alias("level"),
    )


def q_pdf_pictures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded-image regions from the PDF content stream: /Image XObject
    placements mapped through the CTM (pdfx/content.py Do handler) — the
    deterministic analog of the reference's PictureItem clusters (on the
    reference's own picture_classification.pdf these bboxes land within a
    few points of its NN-layout groundtruth; tests/test_pdf_pictures.py
    pins IoU > 0.9). Corpus PDFs embed REAL baseline-JPEG (/DCTDecode)
    and /FlateDecode gray rasters."""
    import pandas as pd

    from docling_spark.ops.corpus import synth_pages_pdf_images
    from docling_spark.pdfx.extract import extract_pdf_text

    pages = synth_pages_pdf_images(spark, sf_dir)

    def run(batches):
        for b in batches:
            rows = []
            for doc_id, blob in zip(b["doc_id"], b["html"]):
                r = extract_pdf_text(bytes(blob), with_pictures=True)
                for k, p in enumerate(r.pictures or []):
                    x0, y0, x1, y1 = p["bbox"]
                    rows.append(
                        (
                            int(doc_id), k, p["page"],
                            float(x0), float(y0), float(x1), float(y1),
                            p["width"], p["height"],
                            (p["filters"] or [None])[0],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "pic_idx", "page", "x0", "y0", "x1", "y1",
                    "px_width", "px_height", "filter",
                ],
            )

    return pages.select("doc_id", "html").mapInPandas(
        run,
        schema=(
            "doc_id long, pic_idx int, page int, x0 double, y0 double, "
            "x1 double, y1 double, px_width int, px_height int, "
            "filter string"
        ),
    )


def q_pdf_struct_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full PDF structural labeler: heading hierarchy (18pt→L1, 14pt→L2),
    bullet list items with markers, a 2×2 grid-detected TableItem, and the
    body paragraph — all labeled + parented deterministically."""
    from docling_spark.ops.corpus import synth_pages_pdf_structured

    pages = synth_pages_pdf_structured(spark, sf_dir)
    out = extract_pages(pages, base_uri_mode="none")
    s = out.select("url", F.explode("spans").alias("s"))
    return s.select(
        "url",
        F.col("s.idx").alias("idx"),
        F.col("s.parent").alias("parent"),
        F.col("s.kind").alias("kind"),
        F.col("s.label").alias("label"),
        F.col("s.level").alias("level"),
        F.col("s.marker").alias("marker"),
        F.col("s.num_rows").alias("num_rows"),
        F.col("s.num_cols").alias("num_cols"),
        F.col("s.text").alias("text"),
    )


def q_md_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown backend through the full Spark job (synth md sources)."""
    from docling_spark.ops.corpus import synth_pages_md

    out = extract_pages(synth_pages_md(spark, sf_dir), base_uri_mode="none")
    return out.select("url", "status", "content_type", "extracted_text")


def q_doctags_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DocTags as INPUT (docling_spark/doctagsx.py — the VLM-interchange
    parse, exact inverse of the serializer): synth doctags blobs through
    the full job, md value-checked."""
    from docling_spark.ops.corpus import synth_pages_doctags

    out = extract_pages(
        synth_pages_doctags(spark, sf_dir), base_uri_mode="none"
    )
    return out.select("url", "status", "content_type", "extracted_text")


def q_ofd_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFD backend (GB/T 33190 zip, ofdx.py) through the full Spark job."""
    from docling_spark.ops.corpus import synth_pages_ofd

    out = extract_pages(synth_pages_ofd(spark, sf_dir), base_uri_mode="none")
    return out.select("url", "status", "content_type", "extracted_text")


def q_asciidoc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AsciiDoc backend through the full Spark job."""
    from docling_spark.ops.corpus import synth_pages_asciidoc

    out = extract_pages(
        synth_pages_asciidoc(spark, sf_dir), base_uri_mode="none"
    )
    return out.select("url", "status", "content_type", "extracted_text")


def q_docx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOCX backend through the full Spark job (zip-content dispatch)."""
    from docling_spark.ops.corpus import synth_pages_docx

    out = extract_pages(synth_pages_docx(spark, sf_dir), base_uri_mode="none")
    return out.select("url", "status", "content_type", "extracted_text")


def q_xlsx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XLSX backend through the full Spark job (zip-content dispatch)."""
    from docling_spark.ops.corpus import synth_pages_xlsx

    out = extract_pages(synth_pages_xlsx(spark, sf_dir), base_uri_mode="none")
    return out.select("url", "status", "content_type", "extracted_text")


def q_uspto_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USPTO patent backend through the full Spark job (DTD content sniff)."""
    from docling_spark.ops.corpus import synth_pages_uspto

    out = extract_pages(
        synth_pages_uspto(spark, sf_dir), base_uri_mode="none"
    )
    return out.select("url", "status", "content_type", "extracted_text")


def q_pdf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical chunker over STRUCTURED PDF rows: list items + body
    text chunk under their section heading (was impossible with the round-1
    flat span model)."""
    from docling_spark.ops.chunker import chunk_spans
    from docling_spark.ops.corpus import synth_pages_pdf_structured

    pages = synth_pages_pdf_structured(spark, sf_dir)
    return chunk_spans(extract_pages(pages, base_uri_mode="none"))


def q_chunk_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget chunk packing over the spans chunker."""
    from docling_spark.ops.chunker import chunk_spans, pack_chunks

    pages = synth_pages(spark, sf_dir)
    return pack_chunks(chunk_spans(extract_pages(pages)), budget_tokens=16)


def q_chunk_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing under the BPE-lite pre-tokenizer (ops/chunker.token_count_col,
    pluggable tokenizer seam). Chunks are decorated with punctuation,
    contractions and digits so BPE-lite counts genuinely diverge from
    whitespace counts — the oracle recomputes them with the SAME regex in
    DuckDB (RE2) as Spark (Java regex)."""
    from docling_spark.ops.chunker import chunk_spans, pack_chunks

    chunks = chunk_spans(extract_pages(synth_pages(spark, sf_dir)))
    decorated = chunks.withColumn(
        "chunk_text",
        F.concat(
            F.col("chunk_text"),
            F.lit(", it's #"),
            F.col("span_idx").cast("string"),
        ),
    )
    return pack_chunks(decorated, budget_tokens=16, tokenizer="bpe_lite")


def q_chunk_pack_bpe_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing under the REAL vocab-merge BPE (ops/bpe.py: frozen in-repo
    merges, HF-style lowest-rank-pair application in a vectorized Pandas
    UDF). The oracle re-implements the SAME merge semantics as a DuckDB
    recursive CTE over the distinct pre-tokens — an independent evaluator,
    so the counts are value-checked merge-for-merge."""
    from docling_spark.ops.chunker import chunk_spans, pack_chunks

    chunks = chunk_spans(extract_pages(synth_pages(spark, sf_dir)))
    decorated = chunks.withColumn(
        "chunk_text",
        F.concat(
            F.col("chunk_text"),
            F.lit(", it's #"),
            F.col("span_idx").cast("string"),
        ),
    )
    return pack_chunks(decorated, budget_tokens=16, tokenizer="bpe_full")


def q_mm_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from docling_spark.ops import multimodal as mm

    return mm.decode_image_meta(mm.synth_media(spark, sf_dir))


def q_mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from docling_spark.ops import multimodal as mm

    return mm.image_features(mm.synth_media(spark, sf_dir))


def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from docling_spark.ops import multimodal as mm

    return mm.resize_image(mm.synth_media(spark, sf_dir), factor=2).drop(
        "resized"
    )


def q_mm_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVERY real from-scratch codec in ONE driver row per doc, joined on
    doc_id so each codec's decoded VALUES gate the row: PNG (ops/png.py:
    zlib + all five filters — meta, pixel features, nearest-neighbor
    resize), baseline JPEG (ops/jpeg.py: huffman entropy decode + IDCT
    over genuinely entropy-coded scans — block-constant unit-quant law
    px(x)=(doc_id+16*(x//8))%%256 makes the decode bit-exact), RIFF/WAVE
    (parse_wav meta + PCM16 mean/peak/RMS features), animated GIF
    (ops/gif.py LZW — frame sampling aggregated per doc), animated PNG
    (ops/apng.py acTL/fcTL/fdAT zlib frames — same aggregation), multi-
    page TIFF (ops/tiff.py: Deflate strips + Predictor 2 undo, page
    fan-out aggregated), and the BMP + WebP header sniffs
    (ops/png.image_meta: BITMAPINFOHEADER, VP8/VP8L/VP8X)."""
    from docling_spark.ops import multimodal as mm

    media = mm.synth_media(spark, sf_dir)
    meta = mm.decode_image_meta(media, col="png")
    feats = mm.image_features(media, col="png").select(
        "doc_id",
        F.col("mean_px").alias("f_mean_px"),
        F.col("min_px").alias("f_min_px"),
        F.col("max_px").alias("f_max_px"),
    )
    rez = mm.resize_image(media, factor=2, col="png").select(
        "doc_id",
        F.col("width").alias("r_width"),
        F.col("height").alias("r_height"),
        F.col("mean_px").alias("r_mean_px"),
    )
    jm = mm.decode_image_meta(media, col="jpeg_full").select(
        "doc_id",
        F.col("width").alias("j_width"),
        F.col("height").alias("j_height"),
        F.col("n_bytes").alias("j_bytes"),
    )
    jf = mm.image_features(media, col="jpeg_full").select(
        "doc_id",
        F.col("mean_px").alias("j_mean_px"),
        F.col("min_px").alias("j_min_px"),
        F.col("max_px").alias("j_max_px"),
    )
    wav = mm.audio_meta(media, col="wav")
    wavf = mm.audio_features(media, col="wav").select(
        "doc_id",
        F.col("mean_amp").alias("a_mean"),
        F.col("peak").alias("a_peak"),
        F.col("rms").alias("a_rms"),
    )
    gif = (
        mm.sample_frames(media, every_k=2, col="gif_video")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("g_frames"),
            F.sum("frame_bytes").alias("g_bytes"),
            F.min(F.when(F.col("frame_idx") == 0, F.col("first_px"))).alias(
                "g_px0"
            ),
        )
    )
    apng = (
        mm.sample_frames(media, every_k=2, col="apng_video")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("ap_frames"),
            F.sum("frame_bytes").alias("ap_bytes"),
            F.min(F.when(F.col("frame_idx") == 0, F.col("first_px"))).alias(
                "ap_px0"
            ),
        )
    )
    tif = (
        mm.tiff_pages(media, col="tiff")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("t_pages"),
            F.min("width").alias("t_width"),
            F.min("height").alias("t_height"),
            F.min(F.when(F.col("page") == 0, F.col("mean_px"))).alias(
                "t_mean0"
            ),
            F.round(F.sum("mean_px"), 6).alias("t_mean_sum"),
        )
    )
    bmp = mm.sniff_image_meta(media, col="bmp").select(
        "doc_id",
        F.col("width").alias("s_bmp_width"),
        F.col("height").alias("s_bmp_height"),
        F.col("channels").alias("s_bmp_channels"),
    )
    webp = mm.sniff_image_meta(media, col="webp").select(
        "doc_id",
        F.col("width").alias("s_webp_width"),
        F.col("height").alias("s_webp_height"),
        F.col("channels").alias("s_webp_channels"),
    )
    mp4 = mm.mp4_meta(media, col="mp4").select(
        "doc_id",
        F.col("brand").alias("m_brand"),
        F.col("duration_ms").alias("m_duration_ms"),
        F.col("width").alias("m_width"),
        F.col("height").alias("m_height"),
        F.col("n_tracks").alias("m_tracks"),
    )
    # round-5: REAL in-container sample decode for uncompressed ('twos')
    # PCM tracks — stsd/stsc/stsz/stco chunk walk (ops/mp4.py); only
    # compressed codecs (avc1/mp4a) remain behind the ffmpeg-class seam
    pcm = mm.mp4_audio_features(media, col="mp4_pcm").select(
        "doc_id",
        F.col("rate").alias("p_rate"),
        F.col("n_samples").alias("p_n"),
        F.col("mean_amp").alias("p_mean"),
        F.col("peak").alias("p_peak"),
        F.col("rms").alias("p_rms"),
    )
    out = meta
    for d in (feats, rez, jm, jf, wav, wavf, gif, apng, tif, bmp, webp, mp4,
              pcm):
        out = out.join(d, "doc_id")
    return out


def q_mm_png_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG codec end-to-end in ONE driver row: decode metadata +
    pixel features + nearest-neighbor resize (ops/png.py: zlib + all five
    filter reconstructions — every synth PNG uses filter doc_id %% 5),
    joined on doc_id so each sub-operator's values gate the row."""
    from docling_spark.ops import multimodal as mm

    media = mm.synth_media(spark, sf_dir)
    meta = mm.decode_image_meta(media, col="png")
    feats = mm.image_features(media, col="png").select(
        "doc_id",
        F.col("mean_px").alias("f_mean_px"),
        F.col("min_px").alias("f_min_px"),
        F.col("max_px").alias("f_max_px"),
    )
    rez = mm.resize_image(media, factor=2, col="png").select(
        "doc_id",
        F.col("width").alias("r_width"),
        F.col("height").alias("r_height"),
        F.col("mean_px").alias("r_mean_px"),
    )
    return meta.join(feats, "doc_id").join(rez, "doc_id")


def q_mm_png_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode (ops/png.py: zlib + filter reconstruction — every
    synth PNG uses filter type doc_id %% 5, so all five reconstruction
    paths are exercised under the oracle)."""
    from docling_spark.ops import multimodal as mm

    return mm.decode_image_meta(mm.synth_media(spark, sf_dir), col="png")


def q_mm_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel stats over genuinely decoded PNG payloads (gradient rows —
    wrong filter reconstruction would shift every value)."""
    from docling_spark.ops import multimodal as mm

    return mm.image_features(mm.synth_media(spark, sf_dir), col="png")


def q_mm_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real nearest-neighbor downsample on decoded PNG pixels."""
    from docling_spark.ops import multimodal as mm

    return mm.resize_image(
        mm.synth_media(spark, sf_dir), factor=2, col="png"
    ).drop("resized")


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from docling_spark.ops import multimodal as mm

    return mm.sample_frames(mm.synth_media(spark, sf_dir), every_k=2)


def q_mm_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over REAL animated GIFs (ops/gif.py: genuine
    variable-width LZW decode + frame compositing) — every sampled pixel
    rides through the actual codec, same deterministic law as the FVID
    twin so the oracle is format-independent."""
    from docling_spark.ops import multimodal as mm

    return mm.sample_frames(
        mm.synth_media(spark, sf_dir), every_k=2, col="gif_video"
    )


def q_mm_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from docling_spark.ops import multimodal as mm

    return mm.audio_meta(mm.synth_media(spark, sf_dir))


def q_mm_sniff_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-only REAL metadata across raster formats (PNG IHDR, JPEG SOF
    walk, GIF descriptor, BMP info header): one row per (doc, format)."""
    from docling_spark.ops import multimodal as mm

    media = mm.synth_media(spark, sf_dir)
    parts = [
        mm.sniff_image_meta(media, col) for col in ("png", "jpeg", "gif", "bmp")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_mm_wav_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RIFF/WAVE decode (ops/multimodal.parse_wav): rate/sample/
    duration recovered from genuine PCM16 containers, not the FAUD fake."""
    from docling_spark.ops import multimodal as mm

    return mm.audio_meta(mm.synth_media(spark, sf_dir), col="wav")


def q_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline (ops/curate.py): extraction → dedup →
    lang gate → length gate with per-document reason codes. Input is the
    x2-variant corpus so the exact-dedup branch genuinely fires."""
    from docling_spark.ops.curate import curate

    pages = synth_pages(spark, sf_dir, variants=2)
    return curate(extract_pages(pages, base_uri_mode="none"))


def _webtext_oracle_sql() -> str:
    from docling_spark.ops.webtext import SIGNALS_ORACLE_SQL

    return SIGNALS_ORACLE_SQL


def _c4_oracle(kind: str) -> str:
    from docling_spark.ops import c4
    from docling_spark.ops.webtext import WEBTEXT_CTE_SQL

    fn = {
        "clean": c4.clean_oracle_sql,
        "span": c4.span_oracle_sql,
        "removal": c4.removal_oracle_sql,
    }[kind]
    return fn(WEBTEXT_CTE_SQL)


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning (ops/c4.py, Raffel et al. 1910.10683 §2.2): terminal
    punctuation / min-words / javascript line filters, lorem-ipsum /
    brace / sentence-count page gates — in-row JVM, zero shuffles."""
    from docling_spark.ops.c4 import c4_clean
    from docling_spark.ops.webtext import synth_webtext

    return c4_clean(synth_webtext(spark, sf_dir))


def q_c4_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 three-sentence-span dedup: in-row span hashing + one global
    hash exchange for the first-occurrence flag."""
    from docling_spark.ops.c4 import c4_span_dedup
    from docling_spark.ops.webtext import synth_webtext

    return c4_span_dedup(synth_webtext(spark, sf_dir))


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE Gopher repetition/quality gate (ops/webtext.py):
    duplicate line+paragraph fractions and char fractions, top-{2,3,4}-gram
    coverage, dup-{5..10}-gram char fractions, bullet/ellipsis ratios,
    symbol ratio, alpha fraction, mean word length, stop-word gate and
    word-count bounds — all in-row JVM higher-order functions, zero
    shuffles — plus the published-threshold first-failing-rule keep/reject
    with reason codes (Rae et al. 2112.11446 A1.1; the filter stage the
    reference stops short of). Every rule family is observable on the
    synthetic corpus and every signal column is value-checked."""
    from docling_spark.ops.webtext import (
        gopher_filter,
        repetition_signals,
        synth_webtext,
    )

    return gopher_filter(repetition_signals(synth_webtext(spark, sf_dir)))


def _pii_oracle() -> str:
    from docling_spark.ops.pii import pii_oracle_sql
    from docling_spark.ops.webtext import WEBTEXT_CTE_SQL

    return pii_oracle_sql(WEBTEXT_CTE_SQL)


def q_c4_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full C4 span-dedup semantics: duplicated 3-sentence spans REMOVED
    from the text (global first occurrence kept). One hash exchange +
    doc_id agg + join back; rebuild is an in-row indexed lambda filter."""
    from docling_spark.ops.c4 import c4_remove_dup_spans
    from docling_spark.ops.webtext import synth_webtext

    return c4_remove_dup_spans(synth_webtext(spark, sf_dir))


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-text normalization (ops/normalize.py): mojibake repair
    (cp1252 double-encoding table, the deterministic core of ftfy),
    control/zero-width strip with counts, CRLF fold, NBSP and
    whitespace canonicalization — one in-row JVM projection, zero
    shuffles, zero Python; clean text itself value-checked."""
    from docling_spark.ops.normalize import normalize_text, synth_dirty_text

    return normalize_text(synth_dirty_text(spark, sf_dir))


def _normalize_oracle() -> str:
    from docling_spark.ops.normalize import DIRTY_CTE_SQL, normalize_oracle_sql

    return normalize_oracle_sql(DIRTY_CTE_SQL)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII hygiene (ops/pii.py): email/phone/IPv4 redaction to typed
    placeholders with per-type counts — chained JVM regexp ops, zero
    shuffles; scrubbed text and counts value-checked."""
    from docling_spark.ops.pii import pii_scrub, synth_pii_text

    return pii_scrub(synth_pii_text(spark, sf_dir))


def q_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (ops/substrdedup.py, Lee et al. 2107.06499
    ExactSubstr): every duplicated 8-token window — cross- or
    intra-document — is excised, global first occurrence kept; merged
    removal islands counted. In-row gram hashing, ONE gram-key
    exchange, doc_id partial agg, one join back, in-row rebuild."""
    from docling_spark.ops.substrdedup import substr_dedup, synth_boiler_text

    return substr_dedup(synth_boiler_text(spark, sf_dir))


def _substr_oracle() -> str:
    from docling_spark.ops.substrdedup import BOILER_CTE_SQL, substr_oracle_sql

    return substr_oracle_sql(BOILER_CTE_SQL)


def _semdedup_oracle() -> str:
    from docling_spark.ops.semdedup import semdedup_oracle_sql

    return semdedup_oracle_sql()


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (ops/dsir.py, Xie et al. 2302.03169):
    hashed unigram+bigram bag models on the trusted lang='en' slice vs
    the raw pool, dyadic-quantized log importance ratios (bit-identical
    sums across engines and reduction orders), stateless-hash Gumbel
    top-25% resample. Bucket-keyed partial aggs + broadcast ratio dim +
    one doc_id agg; the exact-rank tail is a slim global window
    (production form: approx-quantile threshold cut, see docstring)."""
    from docling_spark.ops.dsir import dsir_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dsir_weights(docs, target_filter=F.col("lang") == "en")


def _dsir_oracle() -> str:
    from docling_spark.ops.dsir import dsir_oracle_sql

    return dsir_oracle_sql(
        "wt AS (SELECT doc_id, text AS wtext, lang FROM documents)",
        "lang = 'en'",
    )


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap (ops/curate.domain_cap): synth multi-domain crawl
    frame in the north-rule shape (url, warc_ts), keep <= 3 docs per host
    preferring the latest crawl — one window exchange on domain."""
    from docling_spark.ops.curate import domain_cap

    crawl = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .select(
            F.concat(
                F.lit("https://d"),
                F.col("doc_id") % 23,
                F.lit(".example.org/p/"),
                F.col("doc_id"),
            ).alias("url"),
            F.expr(
                "timestamp '2024-01-01 00:00:00'"
                " + (doc_id % 97) * INTERVAL '1' HOUR"
            ).alias("warc_ts"),
        )
    )
    return domain_cap(crawl, k=3)


def q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level curation (ops/urlfilter.py): deterministic synth URLs →
    suffix-explode + broadcast blocklist equi-join (subdomain-safe, the
    UT1-list scale shape) + hard/soft keyword, spam-query and path-depth
    gates with first-failing-reason attribution."""
    from docling_spark.ops import urlfilter

    urls = urlfilter.synth_urls(_docs(spark, sf_dir).select("doc_id"))
    return urlfilter.url_filter(urls, urlfilter.blocked_domains(spark))


def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-aware fetch schedule (ops/frontier.py): host-sticky
    fetcher-slot assignment via the engine-exact md5-Horner hash, a
    per-host politeness queue index (one window exchange on host — the
    irreducible shuffle, since per-host sequencing IS the politeness
    semantics) and the earliest feasible start time per url."""
    from docling_spark.ops import urlfilter
    from docling_spark.ops.frontier import schedule_frontier

    urls = urlfilter.synth_urls(_docs(spark, sf_dir).select("doc_id"))
    return schedule_frontier(urls, fetchers=16, delay_s=1.0)


def q_frontier_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fetcher-slot load audit of the frontier schedule: the
    politeness bound (largest host queue, serial at one request per
    delay) vs the bandwidth bound (total requests / fetcher rate) and
    their max — the slot's earliest finish. The giant-host skew report
    a crawl operator re-shards on."""
    from docling_spark.ops import urlfilter
    from docling_spark.ops.frontier import frontier_load

    urls = urlfilter.synth_urls(_docs(spark, sf_dir).select("doc_id"))
    return frontier_load(urls, fetchers=16, delay_s=1.0, rate_rps=10.0)


def q_mix_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang x source) token accounting (ops/sampling.mix_matrix): the
    drill-down behind the mix weights — where each language's tokens
    live, with lang and corpus shares. One map-side agg + broadcast
    totals."""
    from docling_spark.ops.sampling import mix_matrix

    return mix_matrix(_docs(spark, sf_dir).select("lang", "source", "text"))


def q_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixing arithmetic (ops/sampling.epoch_schedule):
    per-source target tokens, repeat epochs capped at 4 (Muennighoff
    2305.16264), explicit token deficits. Weight dim by law: weight =
    1 + src_index % 4. One map-side agg over the corpus + broadcast
    dim; engine-exact doubles, no rounding."""
    from docling_spark.ops.sampling import epoch_schedule

    docs = _docs(spark, sf_dir).select("source", "text")
    weights = (
        _docs(spark, sf_dir)
        .select("source")
        .distinct()
        .select(
            "source",
            (
                F.lit(1.0)
                + (
                    F.substring(F.col("source"), 4, 10).cast("long") % 4
                ).cast("double")
            ).alias("weight"),
        )
    )
    return epoch_schedule(docs, weights, token_budget=500_000.0, max_epochs=4.0)


def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output sharding audit (ops/sampling.shard_plan): data-derived
    shard count, retry/engine-stable hash assignment, per-shard
    evenness report. One total agg + one map-side shard agg."""
    from docling_spark.ops.sampling import shard_plan

    return shard_plan(
        _docs(spark, sf_dir).select("doc_id", "text"), target_bytes=16384.0
    )


def q_domain_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head/middle/tail domain composition (ops/curate.domain_buckets):
    coverage-ranked count LEVELS (the only window runs over distinct
    count values — thousands of rows at any scale; never a per-domain
    sort), level buckets broadcast back by count. Zipf-shaped synth
    corpus: 3 giant portals + a long small-host tail exercises all
    three buckets."""
    from docling_spark.ops.curate import domain_buckets

    hid = F.when(F.col("doc_id") % 97 < 60, F.col("doc_id") % 3).otherwise(
        F.col("doc_id") % 211
    )
    urls = _docs(spark, sf_dir).select(
        F.concat(
            F.lit("https://h"),
            hid.cast("string"),
            F.lit(".test/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    return domain_buckets(urls, head_frac=0.5, mid_frac=0.75)


def q_robotstxt_allow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt (REP) evaluation (ops/robotstxt.py): RFC 9309 group
    parsing (one window over host,line), group selection (specific
    agent beats *), longest-prefix-match with allow-wins-ties, REP
    default allowed. Rules are a hosts-sized broadcast dim against the
    URL frontier; zero Python."""
    from docling_spark.ops import robotstxt as rt
    from docling_spark.ops import urlfilter

    robots = rt.synth_robots(spark, list(urlfilter._HOSTS))
    urls = rt.synth_probe_urls(
        _docs(spark, sf_dir).select("doc_id"), list(urlfilter._HOSTS)
    )
    return rt.robots_allowed(urls, robots, agent="doclingbot")


def q_robotstxt_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host Crawl-delay from the applicable robots.txt group —
    the number that feeds the frontier scheduler's delay_s."""
    from docling_spark.ops import robotstxt as rt
    from docling_spark.ops import urlfilter

    robots = rt.synth_robots(spark, list(urlfilter._HOSTS))
    return rt.crawl_delays(robots, agent="doclingbot")


def q_charset_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset/BOM audit (ops/charset.py): binary BOM probes + the
    declared meta charset from the 8 KB lenient-decoded head, BOM-wins
    precedence mirroring htmlx/dom.decode_bytes — the mislabel/
    transcoding-lane dashboard, computed before any Python runs. The
    oracle derives expectations from the synthesis law, so the Spark
    BYTE path (real BOMs, a genuinely UTF-16LE body) is value-checked
    end-to-end."""
    from docling_spark.ops.charset import charset_sniff, synth_charset_pages

    pages = synth_charset_pages(spark, _docs(spark, sf_dir).select("doc_id"))
    return charset_sniff(pages)


def q_wet_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET conversion-record export (ops/wet.py): the Common Crawl
    interchange format as a pure string projection — CRLF headers,
    deterministic urn:md5 record id, byte-exact Content-Length. Zero
    shuffles, zero Python; the record column rides the normal chunked
    sink."""
    from docling_spark.ops.wet import wet_records

    return wet_records(synth_pages(spark, sf_dir).select("url", "warc_ts", "text"))


def q_recrawl_due(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publisher-hint recrawl scheduling (ops/sitemap.recrawl_due):
    changefreq->interval law, lastmod elapsed-days check, protocol
    default priority — the refresh-crawl frontier next to the
    content-hash CDC. Pure in-row date arithmetic."""
    from docling_spark.ops import urlfilter
    from docling_spark.ops.sitemap import (
        parse_sitemaps,
        recrawl_due,
        synth_sitemaps,
    )

    entries = parse_sitemaps(synth_sitemaps(spark, list(urlfilter._HOSTS)))
    return recrawl_due(entries, asof="2026-06-15")


def q_sitemap_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap discovery from robots.txt (ops/robotstxt.sitemap_urls):
    the group-independent Sitemap: directives that seed the discovery
    crawl — the link from the REP gate to the sitemap parser."""
    from docling_spark.ops import robotstxt as rt
    from docling_spark.ops import urlfilter

    return rt.sitemap_urls(rt.synth_robots(spark, list(urlfilter._HOSTS)))


def q_sitemap_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap parsing (ops/sitemap.py): urlset leaves AND sitemapindex
    files into typed entries (loc entity-unescaped, lastmod date
    try-cast, priority double) — the discovery feed of the frontier.
    One regexp_extract_all + posexplode per blob, zero Python."""
    from docling_spark.ops import urlfilter
    from docling_spark.ops.sitemap import parse_sitemaps, synth_sitemaps

    return parse_sitemaps(synth_sitemaps(spark, list(urlfilter._HOSTS)))


def q_frontier_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC → frontier composition: only the snapshot delta (added +
    changed urls, ops/snapshot.delta_worklist) enters the politeness
    schedule — the refresh crawl fetches O(delta), never O(corpus),
    and each delta row carries its CDC status through the plan. The
    worklist's single synth host makes the queue one politeness
    sequence; at production host mix the same plan fans out per host."""
    from docling_spark.ops.frontier import schedule_frontier
    from docling_spark.ops.snapshot import delta_worklist, synth_snapshots

    old, new = synth_snapshots(spark, sf_dir)
    wl = delta_worklist(old, new).select(
        F.regexp_extract(F.col("url"), r"/page/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        "url",
        "status",
    )
    sched = schedule_frontier(
        wl.select("doc_id", "url"), fetchers=8, delay_s=1.0
    )
    return sched.join(wl.select("doc_id", "status"), "doc_id")


def q_crawl_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed crawl layer in ONE plan (ops/frontier.crawl_plan):
    robots.txt REP gate → per-host Crawl-delay → host-sticky politeness
    schedule. Rule/delay tables are hosts-sized broadcast dims; the one
    frontier-sized exchange is the irreducible per-host sequence
    window. Oracle composes the robots_allowed and crawl_delays oracle
    texts as CTEs."""
    from docling_spark.ops import robotstxt as rt
    from docling_spark.ops import urlfilter
    from docling_spark.ops.frontier import crawl_plan

    hosts = list(urlfilter._HOSTS)
    robots = rt.synth_robots(spark, hosts)
    urls = rt.synth_probe_urls(_docs(spark, sf_dir).select("doc_id"), hosts)
    return crawl_plan(
        urls, robots, agent="doclingbot", fetchers=16, default_delay_s=1.0
    )


def q_url_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL template mining (ops/urlnorm.url_patterns): digit/hex runs
    collapse to {n}/{h}, per-host pattern counts, spider-trap flag
    (many urls at high depth). Synth corpus: a calendar trap host, a
    hex-session host, and normal per-host pages."""
    from docling_spark.ops.urlnorm import url_patterns

    d = F.col("doc_id")
    url = (
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit("https://trap.test/archive/"),
                (2000 + d % 25).cast("string"),
                F.lit("/"),
                (1 + d % 12).cast("string"),
                F.lit("/"),
                (1 + d % 28).cast("string"),
                F.lit("/index.html"),
            ),
        )
        .when(
            d % 11 == 1,
            F.concat(
                F.lit("https://sess.test/s/deadbeef"),
                F.lpad((d * 7).cast("string"), 8, "0"),
                F.lit("/view"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://site"),
                (d % 5).cast("string"),
                F.lit(".test/page-"),
                d.cast("string"),
            )
        )
    )
    urls = _docs(spark, sf_dir).select(url.alias("url"))
    return url_patterns(urls, trap_min_urls=100, trap_min_depth=4)


def q_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + crawl-snapshot dedup (ops/urlnorm.py):
    fragment/tracking-param/default-port/case/path normalization as one
    in-row JVM projection, then keep-latest-snapshot per canonical key —
    ONE hash exchange + shared-sort window. The cheap, certain layer of
    web dedup that runs before any shingling."""
    from docling_spark.ops.urlnorm import canonical_dedup, synth_messy_urls

    return canonical_dedup(
        synth_messy_urls(_docs(spark, sf_dir).select("doc_id"))
    )


def _canonical_dedup_oracle() -> str:
    from docling_spark.ops.urlnorm import canonical_dedup_oracle_sql

    return canonical_dedup_oracle_sql()


def q_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperlink extraction from raw HTML bytes (ops/linkgraph.py):
    regexp_extract_all over the decoded blob, bounded explode, relative/
    protocol-relative resolution against the page URL, mailto/js/
    fragment drops — zero Python — then per-node in/out degree +
    dangling flag. The oracle derives the edge set INDEPENDENTLY from
    the anchor law (doc_id arithmetic, never touching HTML), so regex
    extraction and resolution are value-checked end-to-end."""
    from docling_spark.ops.linkgraph import link_degrees, web_edges

    return link_degrees(web_edges(spark, sf_dir))


def _degree_histogram_oracle() -> str:
    from docling_spark.ops.linkgraph import link_degrees_oracle_sql

    def hist(col: str, direction: str) -> str:
        return f"""
          SELECT '{direction}' AS direction,
                 CASE WHEN {col} <= 0 THEN 0
                      ELSE CAST(length(bin(CAST({col} AS BIGINT))) AS INT)
                 END AS bucket,
                 count(*) AS n_nodes,
                 CAST(sum({col}) AS BIGINT) AS total_degree
          FROM deg
          GROUP BY 1, 2"""

    return f"""
        WITH deg AS ({link_degrees_oracle_sql()})
        {hist("in_degree", "in")}
        UNION ALL
        {hist("out_degree", "out")}
    """


def _link_graph_oracle() -> str:
    from docling_spark.ops.linkgraph import link_degrees_oracle_sql

    return link_degrees_oracle_sql()


def q_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-snapshot CDC (ops/snapshot.py): classify every url across
    two snapshots as added/removed/changed/unchanged by content hash.
    One full-outer join on url over slim (url, sha256, ts) projections —
    the blobs never enter the exchange. The incremental-processing
    primitive: downstream stages reprocess O(delta), never O(corpus)."""
    from docling_spark.ops.snapshot import snapshot_delta, synth_snapshots

    old, new = synth_snapshots(spark, sf_dir)
    return snapshot_delta(old, new)


def q_snapshot_worklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The delta WORK LIST (ops/snapshot.py): full-width new-snapshot
    rows that are added or changed — the only pages the extraction job
    must touch on an incremental crawl. The oracle value-checks the
    carried blob content (body_tag re-extracted from the html bytes),
    proving the right page VERSIONS moved through the join."""
    from docling_spark.ops.snapshot import delta_worklist, synth_snapshots

    old, new = synth_snapshots(spark, sf_dir)
    wl = delta_worklist(old, new)
    return wl.select(
        "url",
        "status",
        F.regexp_extract(
            F.decode(F.col("html"), "UTF-8"), r"(page-\d+-v\d)", 1
        ).alias("body_tag"),
    )


def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots-directive compliance gate (ops/robots.py): in-row JVM
    regexps over the bounded 8 KB head extract noindex/nofollow/none
    meta directives (both attribute orders, any case) and the
    rel=canonical target; pages whose authors opted out are rejected
    with a reason code. Zero shuffles, zero Python."""
    from docling_spark.ops.robots import robots_gate, synth_robots_pages

    return robots_gate(synth_robots_pages(spark, sf_dir)).select(
        "url", "noindex", "nofollow", "canonical_url", "keep", "reason"
    )


def q_anchor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation (ops/linkgraph.py): extract (src, dst,
    anchor-text) triples from raw HTML — href and text pulled by the
    SAME regex so they zip positionally — then per-target reference
    count + sorted-distinct anchor profile (the classic target-side
    relevance signal). The oracle re-derives every anchor string from
    the doc_id law, value-checking extraction, resolution, and the
    collect_set aggregation end-to-end."""
    from docling_spark.ops.linkgraph import (
        anchor_stats,
        extract_links_text,
        synth_linked_pages,
    )

    return anchor_stats(extract_links_text(synth_linked_pages(spark, sf_dir)))


def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-template boilerplate strip (ops/boilerplate.py): lines that
    recur on >= tau of a DOMAIN's pages (nav bars, footers, cookie
    banners) are removed from every page — first occurrence included —
    while rare cross-page repeats survive. Complementary to para_dedup's
    keep-first global law. Counting is one (domain, hash) exchange with
    map-side combine; the template set folds to one row per domain and
    the rebuild is an in-row lambda filter. The corpus law pins the
    tau boundary exactly (a 50% promo line at tau=0.5 with >=) and the
    oracle value-checks the rebuilt text itself."""
    from docling_spark.ops.boilerplate import (
        strip_boilerplate,
        synth_domain_corpus,
    )

    return strip_boilerplate(synth_domain_corpus(spark, sf_dir))


def _boilerplate_oracle() -> str:
    from docling_spark.ops.boilerplate import strip_boilerplate_oracle_sql

    return strip_boilerplate_oracle_sql()


def _snapshot_delta_oracle() -> str:
    from docling_spark.ops.snapshot import snapshot_delta_oracle_sql

    return snapshot_delta_oracle_sql()


def _snapshot_worklist_oracle() -> str:
    from docling_spark.ops.snapshot import delta_worklist_oracle_sql

    return delta_worklist_oracle_sql()


def _robots_gate_oracle() -> str:
    from docling_spark.ops.robots import robots_gate_oracle_sql

    return robots_gate_oracle_sql()


def _anchor_stats_oracle() -> str:
    from docling_spark.ops.linkgraph import anchor_stats_oracle_sql

    return anchor_stats_oracle_sql()


def q_para_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level global dedup (ops/paradedup.py, the Dolma /
    RefinedWeb boilerplate killer): every non-first global paragraph
    occurrence removed, text rebuilt. In-row hashing, ONE hash exchange
    for the first-occurrence window (AQE-skew-eligible — a cookie
    banner on 10^8 pages is exactly the key AQE splits), doc_id agg +
    join back, in-row rebuild. The pooled corpus law guarantees heavy
    cross-document duplication; the oracle value-checks the rebuilt
    text itself."""
    from docling_spark.ops.paradedup import paragraph_dedup, synth_para_corpus

    return paragraph_dedup(synth_para_corpus(spark, sf_dir))


def _para_dedup_oracle() -> str:
    from docling_spark.ops.paradedup import paragraph_dedup_oracle_sql

    return paragraph_dedup_oracle_sql()


def q_page_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT-style page-metadata pass (ops/pagemeta.py): title / meta
    description / og:title / html-lang pulled by in-row JVM regexps
    over the bounded 8 KB head — the snippeting + language-routing
    fields a crawl index carries next to every url. Zero shuffles,
    zero Python."""
    from docling_spark.ops.pagemeta import page_meta, synth_meta_pages

    return page_meta(synth_meta_pages(spark, sf_dir)).select(
        "url", "title", "meta_description", "og_title", "html_lang"
    )


def _page_meta_oracle() -> str:
    from docling_spark.ops.pagemeta import page_meta_oracle_sql

    return page_meta_oracle_sql()


def _code_switch_oracle() -> str:
    from docling_spark.ops.scriptmix import line_script_switches_oracle_sql

    return line_script_switches_oracle_sql()


def _lexicon_gate_oracle() -> str:
    from docling_spark.ops.webtext import lexicon_gate_oracle_sql

    docs = """
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 37 = 0 THEN ' casino bonus' ELSE '' END
               || CASE WHEN doc_id % 74 = 0 THEN ' xxx' ELSE '' END
               || CASE WHEN doc_id % 41 = 0 THEN ' maxxximum' ELSE '' END
                 AS text
        FROM documents"""
    return lexicon_gate_oracle_sql(docs)


def _script_mix_oracle() -> str:
    from docling_spark.ops.scriptmix import script_mix_oracle_sql

    return script_mix_oracle_sql()


def _readability_oracle() -> str:
    from docling_spark.ops.readability import readability_oracle_sql

    return readability_oracle_sql()


def q_pipeline_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL-crawl composition (ops/snapshot.py + job.py):
    two-snapshot CDC -> added/changed work list -> the real mapInPandas
    HTML extraction backend — the O(delta) reprocessing path a 10^12-row
    crawl pipeline runs nightly. The oracle predicts the extracted text
    of every work-list row from the snapshot law (the right page VERSION
    must have moved through the join AND through extraction), plus the
    delta status and extraction status."""
    from docling_spark.job import extract_pages
    from docling_spark.ops.snapshot import delta_worklist, synth_snapshots

    old, new = synth_snapshots(spark, sf_dir)
    wl = delta_worklist(old, new)
    tags = wl.select("url", F.col("status").alias("delta_status"))
    ex = extract_pages(wl.drop("status"))
    return ex.join(tags, "url").select(
        "url",
        "delta_status",
        F.col("status").alias("extract_status"),
        "extracted_text",
        "n_chars",
    )


def _pipeline_incremental_oracle() -> str:
    from docling_spark.ops.snapshot import _DELTA_CTE, _URL

    return f"""
    WITH {_DELTA_CTE},
    wl AS (
        SELECT doc_id, status,
               'page-' || CAST(doc_id AS VARCHAR) || '-v'
                   || CASE WHEN doc_id % 3 = 0 THEN '2' ELSE '1' END AS body
        FROM classified WHERE status IN ('added', 'changed')
    )
    SELECT
        '{_URL}' || CAST(doc_id AS VARCHAR) AS url,
        status AS delta_status,
        'success' AS extract_status,
        body AS extracted_text,
        CAST(length(body) AS INTEGER) AS n_chars
    FROM wl
    """


_BM25_TERMS = ["spark", "window", "merge", "vector"]


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 sparse retrieval (ops/bm25.py), the lexical half of the
    retrieval stack next to ops/ann.py: in-row tokenize + per-term tf,
    ONE tiny stats aggregation broadcast back, TakeOrderedAndProject
    top-k — the corpus is scanned twice and never shuffled. idf (the
    single transcendental) is dyadically quantized so scores and the
    top-k cut agree bit-for-bit across engines."""
    from docling_spark.ops.bm25 import bm25_scores

    return bm25_scores(_docs(spark, sf_dir), _BM25_TERMS, k=100)


def _bm25_oracle() -> str:
    from docling_spark.ops.bm25 import bm25_oracle_sql

    return bm25_oracle_sql(_BM25_TERMS, k=100)


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (ops/hybrid.py): reciprocal-rank fusion of the
    BM25 lexical top-50 and the dense cosine top-50 — the standard RRF
    law over the two retrieval families the engine ships. Fusion
    operates on 2k bounded rows (rank windows + one full-outer join),
    never the corpus; integer ranks + fixed-order IEEE sums make the
    fused scores and the final cut bit-identical across engines."""
    from docling_spark.ops import ann
    from docling_spark.ops.bm25 import bm25_scores
    from docling_spark.ops.hybrid import rrf_fuse

    lex = bm25_scores(_docs(spark, sf_dir), _BM25_TERMS, k=50).select(
        "doc_id", "score"
    )
    dense = ann.cosine_topk(_emb(spark, sf_dir), query_id=0, k=50)
    return rrf_fuse(lex, dense, k=20)


def _hybrid_oracle() -> str:
    from docling_spark.ops.bm25 import bm25_oracle_sql
    from docling_spark.ops.hybrid import rrf_oracle_sql

    lex = f"""
        SELECT doc_id, score FROM ({bm25_oracle_sql(_BM25_TERMS, k=50)})
    """
    dense = """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_dot_product(embedding, qv) /
                     (sqrt(list_dot_product(embedding, embedding)) *
                      sqrt(list_dot_product(qv, qv))), 4) AS cosine
        FROM embeddings, q WHERE vec_id != 0
        ORDER BY cosine DESC, vec_id LIMIT 50
    """
    return rrf_oracle_sql(lex, dense, k=20)


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction (ops/tfidf.py): top-3 characteristic
    terms per document — explode + map-side tf/df partial aggs, a
    term-keyed AQE-skew-eligible join with a max-df stop-word gate (the
    hot keys are pruned before they join), doc-bounded top-k window.
    idf dyadically quantized so scores and the cut match cross-engine."""
    from docling_spark.ops.tfidf import tfidf_top_terms

    # max_df 0.9: the synthetic corpus draws from a ~31-word vocabulary,
    # so the production-sane 0.5 default would prune nearly every term;
    # 0.9 keeps the stop-word gate observable (dfs span 5%-80% of docs)
    # while every doc still gets its 3 keywords
    return tfidf_top_terms(_docs(spark, sf_dir), k=3, max_df_frac=0.9)


def _tfidf_oracle() -> str:
    from docling_spark.ops.tfidf import tfidf_oracle_sql

    return tfidf_oracle_sql(k=3, max_df_frac=0.9)


def q_entropy_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy gibberish gate (ops/entropy.py): char- and
    word-unigram entropy + distinct counts, pure in-row JVM (sorted-
    distinct symbol arrays, dyadically quantized -p*ln(p) terms so the
    float sums match DuckDB bit-for-bit). The compression-proxy signal
    that catches unstructured mash the Gopher repetition ladders
    miss."""
    from docling_spark.ops.entropy import entropy_signals

    return entropy_signals(_docs(spark, sf_dir))


def _entropy_oracle() -> str:
    from docling_spark.ops.entropy import entropy_oracle_sql

    return entropy_oracle_sql()


def q_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup (ops/dedup.lsh_incremental_dups): a new crawl
    batch probed against the PERSISTED history LSH index — history is
    touched only through (band_id, band_key) equi-joins, never rescanned
    and never all-pairs; within-batch collisions resolve earlier-id-wins.
    The near-dup companion to the Bloom exact incremental probe."""
    docs = _docs(spark, sf_dir)
    d = F.col("doc_id")
    history = docs.filter(d < 100)
    new = (
        docs.filter(d < 30)
        .withColumn("doc_id", d + 100000)
        .unionByName(docs.filter((d >= 100) & (d < 150)))
    )
    hist_bands = dedup.lsh_bands(history, k=8, seeds=[1, 2, 3, 4], band_size=2)
    return dedup.lsh_incremental_dups(
        new, hist_bands, k=8, seeds=[1, 2, 3, 4], band_size=2
    )


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (ops/hits.py) over the EXTRACTED link
    graph: an engine-exact 4-round trajectory — dyadic quantization
    after every L1 normalize makes all sums exact and order-independent
    (the qclassifier GD idiom), so every hub/auth score value-checks
    against the oracle's unrolled CTEs. Edge list persisted twice
    (pre-partitioned by src and by dst — the two join keys); each round
    shuffles only slim (node, score) frames."""
    from docling_spark.ops.hits import hits
    from docling_spark.ops.linkgraph import web_edges

    edges = web_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    return hits(nodes, edges, iters=4)


def _hits_oracle() -> str:
    from docling_spark.ops.hits import hits_oracle_sql
    from docling_spark.ops.linkgraph import LINKED_EDGES_CTE_SQL

    edges_cte = (
        LINKED_EDGES_CTE_SQL
        + """,
        hits_edges AS MATERIALIZED (SELECT src, dst FROM edges),
        hits_nodes AS MATERIALIZED (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM hits_edges
                UNION SELECT dst AS node FROM hits_edges
            )
        )"""
    )
    return hits_oracle_sql(edges_cte.lstrip(), "", iters=4).replace(
        "WITH \n,", "WITH "
    )


def q_link_coupling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bibliographic coupling over the extracted link graph
    (ops/linksim.py): source pairs sharing >= 2 out-link targets — the
    classic related-pages candidate generator. One equi-join on the
    shared endpoint with the jaccard_pairs hot-key cap (broadcast
    anti-join) defusing the quadratic footer-link case."""
    from docling_spark.ops.linkgraph import web_edges
    from docling_spark.ops.linksim import bibliographic_coupling

    return bibliographic_coupling(web_edges(spark, sf_dir), min_shared=2)


def _link_coupling_oracle() -> str:
    from docling_spark.ops.linkgraph import LINKED_EDGES_CTE_SQL

    return f"""
    WITH {LINKED_EDGES_CTE_SQL},
    deg AS (SELECT dst, count(*) AS d FROM edges GROUP BY dst),
    e AS (SELECT edges.* FROM edges JOIN deg USING (dst) WHERE d <= 1000)
    SELECT a.src AS page_a, b.src AS page_b, count(*) AS n_shared
    FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
    GROUP BY a.src, b.src HAVING count(*) >= 2
    """


def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided training-context windows (ops/windows.py): fixed-size
    token slices with overlap so every token sees a full context — the
    LM-pretraining chunking discipline next to the heading-aware packer.
    All in-row (tokenize once, arithmetic window count, slice+join,
    bounded posexplode); zero joins, zero Python."""
    from docling_spark.ops.windows import sliding_windows

    return sliding_windows(_docs(spark, sf_dir), size=32, stride=24)


def _sliding_windows_oracle() -> str:
    from docling_spark.ops.windows import sliding_windows_oracle_sql

    return sliding_windows_oracle_sql(size=32, stride=24)


def q_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM with stupid backoff (ops/lm_quality.py, Brants'07 —
    the web-scale counting LM): seen bigram scores by context-relative
    frequency, unseen backs off to alpha*unigram; first token scores by
    unigram alone. Same corpus law as lm_quality (originals + OOV-junk
    copies), same dyadic-quantization exactness — every logprob is
    train-time quantized so doc sums are order-independent and the
    whole model value-checks cross-engine."""
    from docling_spark.ops import lm_quality as lmq

    docs = _docs(spark, sf_dir)
    ref = docs.filter(F.col("doc_id") < 300)
    uni = lmq.train_unigram_lm(ref)
    bi = lmq.train_bigram_lm(ref)
    junk = F.repeat(
        F.lit(" zq9x vv3k zzp1"), ((F.length("text") + 29) / 30).cast("int")
    )
    noisy = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat("text", junk).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(noisy)
    return lmq.bigram_score(corpus, bi, uni, head=3.35, tail=6.5)


def _lm_bigram_oracle() -> str:
    from docling_spark.ops.lm_quality import BACKOFF_NLL

    return f"""
    WITH ref AS (SELECT * FROM documents WHERE doc_id < 300),
    reft AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS toks
        FROM ref),
    rw AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS token
        FROM ref),
    c AS (SELECT token, count(*) AS cnt FROM rw GROUP BY token),
    t AS (SELECT sum(cnt) AS total FROM c),
    uni AS (SELECT token, round(ln(total / cnt) * 1024) / 1024 AS nll1
            FROM c, t),
    pairs AS (
        SELECT toks[i] AS prev, toks[i + 1] AS cur
        FROM reft, UNNEST(range(1, len(toks))) AS g(i)),
    c12 AS (SELECT prev, cur, count(*) AS c12 FROM pairs GROUP BY 1, 2),
    c1 AS (SELECT prev, sum(c12) AS c1 FROM c12 GROUP BY 1),
    bi AS (SELECT c12.prev, c12.cur,
                  round(ln(CAST(c1 AS DOUBLE) / c12) * 1024) / 1024 AS nll2
           FROM c12 JOIN c1 USING (prev)),
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 200000 AS doc_id,
               text || repeat(' zq9x vv3k zzp1',
                              CAST((length(text) + 29) // 30 AS INTEGER))
        FROM documents WHERE doc_id % 3 = 0),
    corpt AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS toks
        FROM corpus),
    items AS (
        SELECT doc_id,
               CASE WHEN i > 1 THEN toks[i - 1] END AS prev,
               toks[i] AS cur
        FROM corpt, UNNEST(range(1, len(toks) + 1)) AS g(i)),
    scoredrows AS (
        SELECT items.doc_id,
               CASE WHEN items.prev IS NULL
                    THEN coalesce(uni.nll1, 16.0)
                    ELSE coalesce(bi.nll2,
                                  {BACKOFF_NLL} + coalesce(uni.nll1, 16.0))
               END AS nll
        FROM items
        LEFT JOIN bi ON bi.prev = items.prev AND bi.cur = items.cur
        LEFT JOIN uni ON uni.token = items.cur),
    s AS (SELECT doc_id, count(*) AS n_tokens, sum(nll) AS sum_nll
          FROM scoredrows GROUP BY doc_id)
    SELECT doc_id, n_tokens, sum_nll / n_tokens AS avg_nll,
           CASE WHEN sum_nll / n_tokens < 3.35 THEN 'head'
                WHEN sum_nll / n_tokens < 6.5 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM s
    """


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected triangle enumeration over the extracted link graph
    (ops/linksim.py): the clustering-structure primitive (link-farm
    cliques are triangle-dense). Two-join edge-iterator with the capped
    hot-node semantics shared by the pair ops."""
    from docling_spark.ops.linkgraph import web_edges
    from docling_spark.ops.linksim import triangles

    return triangles(web_edges(spark, sf_dir))


def _triangles_oracle() -> str:
    from docling_spark.ops.linkgraph import LINKED_EDGES_CTE_SQL

    return f"""
    WITH {LINKED_EDGES_CTE_SQL},
    und0 AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst
    ),
    deg AS (
        SELECT node, count(*) AS d FROM (
            SELECT a AS node FROM und0 UNION ALL SELECT b AS node FROM und0
        ) GROUP BY node
    ),
    hot AS (SELECT node FROM deg WHERE d > 1000),
    und AS (
        SELECT * FROM und0
        WHERE a NOT IN (SELECT node FROM hot)
          AND b NOT IN (SELECT node FROM hot)
    )
    SELECT e1.a AS a, e1.b AS b, e2.b AS c
    FROM und e1
    JOIN und e2 ON e1.b = e2.a
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """


def q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality buckets (ops/lm_quality.py): unigram LM
    trained on a trusted slice (doc_id < 300), broadcast to score a
    mixed corpus (originals + OOV-junk-degraded copies), head/middle/
    tail buckets on mean token NLL. Logprobs quantized to 1/1024 so
    score sums are exact dyadic arithmetic in both engines."""
    from docling_spark.ops import lm_quality as lmq

    docs = _docs(spark, sf_dir)
    lm = lmq.train_unigram_lm(docs.filter(F.col("doc_id") < 300))
    junk = F.repeat(
        F.lit(" zq9x vv3k zzp1"), ((F.length("text") + 29) / 30).cast("int")
    )
    noisy = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat("text", junk).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(noisy)
    return lmq.lm_score(corpus, lm, head=3.5, tail=6.0)


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality classifier (ops/qclassifier.py, the GPT-3 /
    FineWeb-Edu gate): full-batch logistic regression on hashed
    bag-of-words, trained ON THE CLUSTER over originals (label 1) vs
    junk-degraded copies (label 0, the lm_quality corpus law), then
    scoring every doc. The whole GD trajectory is engine-exact (dyadic
    per-term quantization + half-away rounding), so the TRAINED MODEL's
    outputs — margin, p, pred_keep — are value-checked cross-engine; the
    oracle unrolls the same rounds as CTEs (the pagerank pattern)."""
    from docling_spark.ops.qclassifier import quality_classifier_scores

    docs = _docs(spark, sf_dir)
    junk = F.repeat(
        F.lit(" zq9x vv3k zzp1"), ((F.length("text") + 29) / 30).cast("int")
    )
    noisy = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat("text", junk).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(noisy)
    return quality_classifier_scores(corpus, F.col("doc_id") < 200000)


def _qclassifier_oracle() -> str:
    from docling_spark.ops.qclassifier import qclassifier_oracle_sql

    corpus = """wt AS (
              SELECT doc_id, text AS wtext FROM documents
              UNION ALL
              SELECT doc_id + 200000 AS doc_id,
                     text || repeat(' zq9x vv3k zzp1',
                                    CAST((length(text) + 29) // 30 AS INTEGER))
                     AS wtext
              FROM documents WHERE doc_id % 3 = 0)"""
    return qclassifier_oracle_sql(corpus, "doc_id < 200000")


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mix construction (ops/sampling.py):
    per-lang stratified hash sampling from a broadcast rate dim with
    1/rate loss weights, then hash-stable train/val/test assignment —
    zero shuffles beyond the broadcast, reproducible on any cluster."""
    from docling_spark.ops import sampling

    docs = _docs(spark, sf_dir)
    rates = sampling.mix_rates(spark, {"en": 1.0, "de": 0.5, "fr": 0.25})
    sampled = sampling.stratified_rates(docs, "doc_id", "lang", rates)
    return sampling.assign_splits(sampled, "doc_id").select(
        "doc_id", "lang", "rate", "weight", "split"
    )


def q_lang_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced language mix (ops/sampling.
    rebalance_temperature, the mT5/XLM-R alpha=1/2 practice): rates are
    COMPUTED from per-lang counts — sqrt (IEEE correctly-rounded, so
    both engines agree bit-for-bit) + dyadic floor-quantized weights
    (exact integer normalizing sum, order-free across partitions) +
    a fixed-shape double chain for the rate. One slim lang agg, rates
    broadcast back, filter-only on the fact table."""
    from docling_spark.ops import sampling

    return sampling.rebalance_temperature(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        "doc_id",
        "lang",
        target_total=200,
    ).select("doc_id", "lang", "rate", "weight")


def q_curate_web(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed RefinedWeb-shaped pipeline in ONE plan: URL gate
    (blocklist + keyword/spam/depth) → Gopher repetition/quality gate →
    LM perplexity bucket, with stage-prefixed first-failing reasons.
    Per-stage verdicts are slim (doc_id, reason) frames joined on the
    key — at scale three co-partitioned exchanges of verdict rows, never
    a second pass over the text."""
    from docling_spark.ops import lm_quality as lmq
    from docling_spark.ops import urlfilter
    from docling_spark.ops.webtext import (
        gopher_filter,
        repetition_signals,
        synth_webtext,
    )

    wt = synth_webtext(spark, sf_dir)
    gq = gopher_filter(repetition_signals(wt)).select(
        "doc_id", F.col("reject_reason").alias("gopher_reason")
    )
    uf = urlfilter.url_filter(
        urlfilter.synth_urls(wt.select("doc_id")), urlfilter.blocked_domains(spark)
    ).select("doc_id", F.col("reason").alias("url_reason"))
    lm = lmq.train_unigram_lm(
        wt.filter(F.col("doc_id") < 300), text_col="wtext"
    )
    lb = lmq.lm_score(wt, lm, text_col="wtext", head=3.3, tail=9.0).select(
        "doc_id", "bucket"
    )
    out = uf.join(gq, "doc_id").join(lb, "doc_id")
    reason = (
        F.when(F.col("url_reason") != "keep", F.concat(F.lit("url:"), "url_reason"))
        .when(
            F.col("gopher_reason") != "keep",
            F.concat(F.lit("gopher:"), "gopher_reason"),
        )
        .when(F.col("bucket") == "tail", "lm_tail")
        .otherwise("keep")
    )
    return out.select(
        "doc_id", reason.alias("reason"), (reason == "keep").alias("keep")
    )


def q_gate_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-gate ablation over the curate_web stages: how many docs
    each gate rejects, and how many it UNIQUELY rejects (the docs only
    it catches) — the table a curation team reads before removing or
    re-tuning a gate; first-failing reasons cannot answer it, so the
    independent stage verdicts are aggregated directly. One agg row
    exploded into one row per gate; stage frames are the same slim
    verdict joins as curate_web."""
    from docling_spark.ops import lm_quality as lmq
    from docling_spark.ops import urlfilter
    from docling_spark.ops.webtext import (
        gopher_filter,
        repetition_signals,
        synth_webtext,
    )

    wt = synth_webtext(spark, sf_dir)
    gq = gopher_filter(repetition_signals(wt)).select(
        "doc_id", (F.col("reject_reason") != "keep").alias("r_gopher")
    )
    uf = urlfilter.url_filter(
        urlfilter.synth_urls(wt.select("doc_id")),
        urlfilter.blocked_domains(spark),
    ).select("doc_id", (F.col("reason") != "keep").alias("r_url"))
    lm = lmq.train_unigram_lm(
        wt.filter(F.col("doc_id") < 300), text_col="wtext"
    )
    lb = lmq.lm_score(wt, lm, text_col="wtext", head=3.3, tail=9.0).select(
        "doc_id", (F.col("bucket") == "tail").alias("r_lm")
    )
    j = uf.join(gq, "doc_id").join(lb, "doc_id")
    i = lambda c: c.cast("int")
    agg = j.agg(
        F.count("*").alias("n_docs"),
        F.sum(i(F.col("r_url"))).alias("url_rej"),
        F.sum(i(F.col("r_url") & ~F.col("r_gopher") & ~F.col("r_lm"))).alias(
            "url_uniq"
        ),
        F.sum(i(F.col("r_gopher"))).alias("gopher_rej"),
        F.sum(i(F.col("r_gopher") & ~F.col("r_url") & ~F.col("r_lm"))).alias(
            "gopher_uniq"
        ),
        F.sum(i(F.col("r_lm"))).alias("lm_rej"),
        F.sum(i(F.col("r_lm") & ~F.col("r_url") & ~F.col("r_gopher"))).alias(
            "lm_uniq"
        ),
        F.sum(i(~F.col("r_url") & ~F.col("r_gopher") & ~F.col("r_lm"))).alias(
            "n_pass_all"
        ),
    )
    rows = F.array(
        F.struct(
            F.lit("url").alias("gate"),
            F.col("url_rej").alias("n_rejected"),
            F.col("url_uniq").alias("n_unique_rejected"),
        ),
        F.struct(
            F.lit("gopher").alias("gate"),
            F.col("gopher_rej").alias("n_rejected"),
            F.col("gopher_uniq").alias("n_unique_rejected"),
        ),
        F.struct(
            F.lit("lm").alias("gate"),
            F.col("lm_rej").alias("n_rejected"),
            F.col("lm_uniq").alias("n_unique_rejected"),
        ),
    )
    return agg.select(
        F.explode(rows).alias("g"), "n_docs", "n_pass_all"
    ).select(
        "g.gate", "g.n_rejected", "g.n_unique_rejected", "n_docs", "n_pass_all"
    )


def q_domain_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain reputation rollup (the RefinedWeb/FineWeb domain-prior
    table): the composed curate_web verdicts aggregated by crawl host —
    docs, keeps, keep rate, per-stage reject counts. The allow/deny-list
    builder a 10^12-doc pipeline maintains per crawl. Scale shape: the
    slim (doc_id, reason, keep) verdict frame joins the (doc_id, host)
    law and collapses in ONE map-side-combinable groupBy on host (#hosts
    << #docs); keep_rate is an exactly-rounded IEEE division, so the
    whole report is cross-engine bit-exact."""
    from docling_spark.ops import urlfilter

    cw = q_curate_web(spark, sf_dir)
    hosts = urlfilter.synth_urls(
        _docs(spark, sf_dir).select("doc_id")
    ).select("doc_id", urlfilter.url_host(F.col("url")).alias("host"))
    j = cw.join(hosts, "doc_id")
    return j.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        (
            F.sum(F.col("keep").cast("long")).cast("double")
            / F.count("*").cast("double")
        ).alias("keep_rate"),
        F.sum(F.col("reason").startswith("url:").cast("long")).alias(
            "n_url_rejects"
        ),
        F.sum(F.col("reason").startswith("gopher:").cast("long")).alias(
            "n_gopher_rejects"
        ),
        F.sum((F.col("reason") == "lm_tail").cast("long")).alias(
            "n_lm_rejects"
        ),
    )


def _domain_reputation_oracle() -> str:
    from docling_spark.ops.urlfilter import _HOSTS

    hosts = "[" + ", ".join(f"'{h}'" for h in _HOSTS) + "]"
    return f"""
    WITH cw AS ({_curate_web_oracle()}),
    urls AS (
        SELECT doc_id,
               list_extract({hosts}, CAST(doc_id % 12 + 1 AS INTEGER)) AS host
        FROM documents
    )
    SELECT host,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS keep_rate,
           CAST(sum(CASE WHEN reason LIKE 'url:%' THEN 1 ELSE 0 END) AS BIGINT) AS n_url_rejects,
           CAST(sum(CASE WHEN reason LIKE 'gopher:%' THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_rejects,
           CAST(sum(CASE WHEN reason = 'lm_tail' THEN 1 ELSE 0 END) AS BIGINT) AS n_lm_rejects
    FROM cw JOIN urls USING (doc_id)
    GROUP BY host
    """


def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL RefinedWeb/Dolma-shaped training-data pipeline in one
    composed plan: extraction → Gopher curation on the extracted text →
    MinHash-LSH + connected-components dedup keep-list → GPT-3-style
    benchmark decontamination → deterministic stratified mix + splits →
    in-row chunk/pack accounting.

    The input carries REAL duplicates (variants=2: every doc is crawled
    under two urls with identical bytes), so the dedup stage resolves
    genuine 2-cliques from the LSH pair graph. One extraction pass is
    persisted; every stage exchanges only slim (doc_id, verdict) frames
    joined back on the key — the text/spans columns are computed once and
    never re-shuffled between stages (plan-pinned in
    tests/test_pipeline_e2e.py). keep_final = passed curation AND
    canonical cluster rep AND uncontaminated AND sampled into the mix.

    Oracle: the per-stage oracles composed as CTEs over the same
    documents law (signals SQL, minhash banding + RECURSIVE reachability,
    13-gram dim, hash-fraction mix, chunk-law pack arithmetic)."""
    from docling_spark.ops import cc, decontam, dedup, sampling
    from docling_spark.ops.chunker import pack_stats
    from docling_spark.ops.webtext import gopher_filter, repetition_signals

    # corpus cap mirrors the other composed rows (dedup_clusters < 100,
    # decontam < 200): bounded pair-graph/reachability work at any SF,
    # no-op at the sf0.01 gate (500 docs); the filter sits BEFORE the
    # extraction UDF so capped rows are never extracted
    pages = synth_pages(spark, sf_dir, variants=2).filter(
        F.regexp_extract("url", r"/doc/(\d+)", 1).cast("long") < 1500
    )
    ex = extract_pages(pages, base_uri_mode="none")
    rid = (
        F.regexp_extract("url", r"/doc/(\d+)", 1).cast("long") * 2
        + F.when(F.col("url").contains("-v1"), F.lit(1)).otherwise(F.lit(0))
    )
    exd = ex.select(
        rid.alias("doc_id"),
        F.col("extracted_text").alias("text"),
        "lang",
        "spans",
    ).persist()

    gate = gopher_filter(
        repetition_signals(exd.select("doc_id", F.col("text").alias("wtext")))
    ).select("doc_id", F.col("reject_reason").alias("curate_reason"))
    pairs = dedup.lsh_candidate_pairs(
        exd, k=8, seeds=[1, 2, 3, 4], band_size=2
    )
    clusters = cc.dedup_assignments(exd, pairs)
    bench = decontam.benchmark_grams(
        _docs(spark, sf_dir).filter(F.col("doc_id") % 37 == 0)
    )
    dec = decontam.decontaminate(exd, bench).select("doc_id", "contaminated")
    mix = sampling.assign_splits(
        sampling.stratified_rates(
            exd.select("doc_id", "lang"),
            "doc_id",
            "lang",
            sampling.mix_rates(spark, {"en": 1.0, "de": 0.5, "fr": 0.25}),
        ),
        "doc_id",
    ).select("doc_id", "rate", "weight", "split")
    packs = pack_stats(exd, budget_tokens=16, key_cols=("doc_id",))

    out = (
        gate.join(clusters, "doc_id")
        .join(dec, "doc_id")
        .join(mix, "doc_id", "left")
        .join(packs, "doc_id")
    )
    return out.select(
        "doc_id",
        "curate_reason",
        "component",
        "is_canonical",
        "contaminated",
        "rate",
        "weight",
        "split",
        "n_chunks",
        "n_tokens",
        "n_packs",
        (
            (F.col("curate_reason") == "keep")
            & F.col("is_canonical")
            & ~F.col("contaminated")
            & F.col("split").isNotNull()
        ).alias("keep_final"),
    )


def q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (ops/decontam.py): GPT-3-style 13-gram
    overlap flags vs an eval-set dim (docs with doc_id % 37 == 0) over
    the duplicated corpus — exact copies of contaminated docs flag too.
    Explode → broadcast join → map-side re-collapse; one slim exchange."""
    from docling_spark.ops import decontam

    docs = _docs(spark, sf_dir)
    bench = decontam.benchmark_grams(docs.filter(F.col("doc_id") % 37 == 0))
    corpus = _with_dups(docs.filter(F.col("doc_id") < 200))
    return decontam.decontaminate(corpus, bench)


def q_decontam_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination (ops/decontam.scrub_contaminated_spans):
    tokens under any benchmark-overlapping 13-gram window are excised and
    the text rebuilt — the keep-the-doc alternative to dropping it."""
    from docling_spark.ops import decontam

    docs = _docs(spark, sf_dir)
    bench = decontam.benchmark_grams(docs.filter(F.col("doc_id") % 37 == 0))
    corpus = _with_dups(docs.filter(F.col("doc_id") < 200))
    return decontam.scrub_contaminated_spans(corpus, bench)


def q_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter incremental dedup (ops/bloom.py): fold the historical
    slice (doc_id < 300) into a set-bit table, then flag a NEW batch
    (200 ≤ doc_id < 500; 200-299 are true dups) by broadcast membership —
    history is never rescanned. No false negatives by construction."""
    from docling_spark.ops import bloom

    docs = _docs(spark, sf_dir)
    filt = bloom.bloom_build(docs.filter(F.col("doc_id") < 300), "text")
    batch = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 500))
    return bloom.bloom_maybe_dup(batch, filt, "text")


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph PageRank (ops/graph.py): deterministic hyperlink law →
    10 power iterations, each materialized by an eager localCheckpoint
    (lazy composition would triple the plan per iteration — see the
    module docstring). Full value oracle: DuckDB unrolls the same 10
    iterations as chained CTEs — every rank value-checked to 6 dp."""
    from docling_spark.ops import graph

    docs = _docs(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").alias("node"))
    return graph.pagerank(nodes, graph.synth_links(docs), iters=10)


def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ compressed ANN (ops/pq.py): deterministic per-subspace Lloyd
    codebooks → int codes (32x smaller than the float corpus) → literal
    ADC-LUT scan, pure JVM, top-10. Rows-only at the driver gate
    (iterative Lloyd, same adjudication as ivf_kmeans_search); recall
    floor + determinism pinned in tests/test_pq.py."""
    from docling_spark.ops import pq

    emb = _emb(spark, sf_dir)
    cb = pq.fit_pq_codebooks(emb)
    codes = pq.pq_encode(emb, cb)
    query = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    return pq.pq_search(codes, cb, list(query), k=10)


def q_ivf_kmeans_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k under the sampled-Lloyd k-means codebook
    (ops/ann.fit_codebook — deterministic spherical k-means on a bounded
    driver-side sample). No DuckDB oracle: Lloyd iterations are not
    SQL-expressible; the driver records the rows-only check, and
    tests/test_ann_kmeans.py pins determinism + recall-vs-seeded."""
    return ann.ivf_search(
        _emb(spark, sf_dir), query_id=3, k=10, n_centroids=16, nprobe=4,
        codebook="kmeans",
    )


def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", F.col("event_id").alias("latest_event_id"))
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_duplicates(_with_dups(_docs(spark, sf_dir)))


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    return dedup.minhash_signatures(docs, k=8, seeds=[1, 2, 3, 4])


def q_lsh_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_dups(_docs(spark, sf_dir).filter(F.col("doc_id") < 100))
    return dedup.lsh_candidate_pairs(docs, k=8, seeds=[1, 2, 3, 4], band_size=2)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_dups(_docs(spark, sf_dir).filter(F.col("doc_id") < 40))
    return dedup.jaccard_pairs(docs, k=8, threshold=0.8)


def q_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation by CMS inner product (ops/cms.cms_join_size,
    Cormode-Muthukrishnan §4.2): planner telemetry — estimate the pair
    count of an equi-join from two <= d*w counter tables without
    touching the keys, never underestimating; the exact inner product
    joins alongside as the collision audit. Sides: events.user_id vs
    orders.o_custkey (a realistic fact-fact key overlap)."""
    from docling_spark.ops.cms import cms_join_size

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.col("user_id").cast("string").alias("k"))
    )
    od = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_custkey").cast("string").alias("k"))
    )
    return cms_join_size(ev, od, "k", d=4, w=256)


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus dashboard: the scalars an operator reads before
    anything ships — doc count, token/vocab totals (the vocab_stats
    \\s+ law), exact-dup group count and docs-in-groups (the
    dedup_exact law), English share, mean Flesch (the readability
    law, rounded: a 500-term double sum agrees across engines far
    below 4 dp). Four 1-row aggregates crossJoined — each is a
    map-side-combining corpus pass; no per-doc rows leave the
    executors."""
    docs = _docs(spark, sf_dir)
    basic = docs.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg((F.col("lang") == "en").cast("double")), 6).alias(
            "pct_en"
        ),
    )
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).where(F.length("tok") > 0)
    vocab = toks.agg(
        F.count("*").alias("total_tokens"),
        F.count_distinct("tok").alias("vocab_size"),
    )
    dups = (
        docs.groupBy(F.md5("text").alias("digest"))
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias(
                "dup_groups"
            ),
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias(
                "docs_in_dup_groups"
            ),
        )
    )
    from docling_spark.ops.readability import readability

    fl = readability(docs).agg(
        F.round(F.avg("flesch"), 4).alias("mean_flesch")
    )
    return (
        basic.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(dups))
        .crossJoin(F.broadcast(fl))
        .select(
            "n_docs",
            "total_tokens",
            "vocab_size",
            "dup_groups",
            "docs_in_dup_groups",
            "pct_en",
            "mean_flesch",
        )
    )


def q_canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-based cluster canonicals (ops/cc.canonical_by): the same
    LSH+chain component assignment as dedup_clusters, but the kept
    copy is the LONGEST text (n_chars as the quality proxy) with
    doc_id tie-break — the RefinedWeb keep-best policy replacing
    min-id. One doc_id join + cluster-sized windows."""
    from docling_spark.ops.cc import canonical_by

    docs = _with_dups(_docs(spark, sf_dir).filter(F.col("doc_id") < 100))
    pairs = dedup.lsh_candidate_pairs(docs, k=8, seeds=[1, 2, 3, 4], band_size=2)
    chain = (
        _docs(spark, sf_dir)
        .filter((F.col("doc_id") < 99) & (F.col("doc_id") % 10 != 9))
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 1).alias("doc_b"),
        )
    )
    asn = cc.dedup_assignments(docs, pairs.unionByName(chain))
    scores = docs.select("doc_id", F.col("n_chars").cast("double").alias("q"))
    return canonical_by(asn, scores, score_col="q")


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram novelty (ops/dedup.ngram_novelty): fraction of a
    doc's distinct 8-grams seen in no other document — the Dolma-style
    originality scalar between whole-doc dedup and span excision.
    Corpus includes exact copies (novelty 0.0 on both twins)."""
    docs = _with_dups(_docs(spark, sf_dir).filter(F.col("doc_id") < 80))
    return dedup.ngram_novelty(docs, k=8)


def q_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-exact Count-Min Sketch (ops/cms.py): token-frequency
    point estimates with the exact count alongside — est is never an
    underestimate, and the overestimate column IS the collision-mass
    audit. Building the sketch is one map-side-combining (row, col)
    agg whose shuffle carries <= d*w counter rows regardless of corpus
    size; probes broadcast the counter table."""
    from docling_spark.ops.cms import cms_estimates

    toks = _docs(spark, sf_dir).select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).where(F.length("tok") > 0)
    probes = spark.createDataFrame(
        [("the",), ("value",), ("table",), ("spark",), ("zzz-absent",)],
        "tok string",
    )
    return cms_estimates(toks, probes, "tok", d=4, w=512)


def q_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL merge law VALUE-CHECKED in the gate: union the register
    tables of two disjoint halves (bucketwise max) and the estimate
    must equal the whole-corpus sketch bit-for-bit — the property that
    makes the sketch shard/day/micro-batch composable."""
    from docling_spark.ops.hll import (
        hll_estimate_from_registers,
        hll_registers,
    )

    urls = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("https://u"), (F.col("doc_id") % 311).cast("string")
        ).alias("url"),
    )
    ra = hll_registers(urls.filter(F.col("doc_id") % 2 == 0), "url", b=10)
    rb = hll_registers(urls.filter(F.col("doc_id") % 2 == 1), "url", b=10)
    merged = (
        ra.unionByName(rb).groupBy("bucket").agg(F.max("reg").alias("reg"))
    )
    em = hll_estimate_from_registers(merged, b=10).select(
        F.col("estimate").alias("merged_estimate")
    )
    ew = hll_estimate_from_registers(
        hll_registers(urls, "url", b=10), b=10
    ).select(F.col("estimate").alias("whole_estimate"))
    return em.crossJoin(F.broadcast(ew)).select(
        "merged_estimate",
        "whole_estimate",
        (F.col("merged_estimate") == F.col("whole_estimate")).alias(
            "merge_law_holds"
        ),
    )


def q_hll_host_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-exact HyperLogLog (ops/hll.py): per-host distinct-URL
    estimates from md5-register sketches — the scale-telemetry
    primitive exact count(distinct) cannot provide at 10^12 rows; the
    register agg combines map-side so the shuffle carries <= m rows
    per host. Fully value-oracled (unlike approx_count_distinct,
    whose HLL++ hashing is engine-private)."""
    from docling_spark.ops.hll import hll_cardinality

    urls = _docs(spark, sf_dir).select(
        F.concat(
            F.lit("h"), (F.col("doc_id") % 5).cast("string"), F.lit(".test")
        ).alias("host"),
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".test/p"),
            (F.col("doc_id") % 137).cast("string"),
        ).alias("url"),
    )
    return hll_cardinality(urls, "url", group_cols=["host"], b=10)


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing passage-overlap candidates (ops/winnow.py, the MOSS
    algorithm): min-hash-per-sliding-window fingerprint selection with
    the coverage guarantee (any shared substring of length >= w+k-1
    shares a fingerprint), then the capped inverted-index pair join.
    The third dedup family next to MinHash and ExactSubstr."""
    from docling_spark.ops.winnow import winnow_pairs

    docs = _with_dups(_docs(spark, sf_dir).filter(F.col("doc_id") < 60))
    return winnow_pairs(docs, k=5, w=4, min_shared=5)


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix (ops/dedup.source_overlap):
    pairwise distinct-shingle Jaccard + Szymkiewicz-Simpson overlap
    between corpus sources — the mirror/subset-dump detector behind
    mix planning. Output is a sources^2-row matrix."""
    return dedup.source_overlap(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
            "source", "text"
        ),
        k=8,
    )


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment (ops/dedup.containment_pairs):
    the syndication/quotation signal — a doc living INSIDE a bigger one
    has low pair Jaccard but ~1.0 one-sided containment. Corpus:
    originals + exact copies (near_exact rows) + prefix halves
    (b_in_a rows with containment_b = 1.0 exactly, since every k-gram
    of a prefix is a k-gram of the full text)."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    )
    copies = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    halves = docs.filter(F.col("doc_id") >= 50).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.substring(
            F.col("text"),
            F.lit(1),
            F.floor(F.length("text") / 2).cast("int"),
        ).alias("text"),
    )
    return dedup.containment_pairs(
        docs.unionByName(copies).unionByName(halves), k=8, threshold=0.5
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-resolved dedup keep-list: LSH candidate pairs ∪ deterministic
    chain edges (paths of 10 docs — forces multi-round convergence) →
    large-star/small-star connected components (ops/cc.py) → per-doc
    (component, is_canonical). The stage that turns pair output into the
    one-doc-per-cluster decision a 100 TB dedup actually ships."""
    docs = _with_dups(_docs(spark, sf_dir).filter(F.col("doc_id") < 100))
    pairs = dedup.lsh_candidate_pairs(docs, k=8, seeds=[1, 2, 3, 4], band_size=2)
    chain = (
        _docs(spark, sf_dir)
        .filter((F.col("doc_id") < 99) & (F.col("doc_id") % 10 != 9))
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 1).alias("doc_b"),
        )
    )
    return cc.dedup_assignments(docs, pairs.unionByName(chain))


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph degree distribution (ops/linkgraph.degree_histogram):
    log2 buckets via binary-string length over the per-node degrees —
    the power-law/skew telemetry before every graph stage."""
    from docling_spark.ops.linkgraph import (
        degree_histogram,
        link_degrees,
        web_edges,
    )

    return degree_histogram(link_degrees(web_edges(spark, sf_dir)))


def q_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure, don't guess — the LSH candidate generator EVALUATED
    against exact n-gram Jaccard ground truth on the capped corpus:
    one row with true-pair count, candidate count, hits, recall,
    precision. The production path's quality as a value-checked gate
    row, not a property-test footnote."""
    docs = _with_dups(_docs(spark, sf_dir).filter(F.col("doc_id") < 40))
    truth = dedup.jaccard_pairs(docs, k=8, threshold=0.8).select(
        "doc_a", "doc_b"
    )
    cand = dedup.lsh_candidate_pairs(
        docs, k=8, seeds=[1, 2, 3, 4], band_size=2
    )
    hits = truth.join(cand, ["doc_a", "doc_b"]).agg(
        F.count("*").alias("n_hits")
    )
    nt = truth.agg(F.count("*").alias("n_true"))
    nc = cand.agg(F.count("*").alias("n_candidates"))
    return (
        nt.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(hits))
        .select(
            "n_true",
            "n_candidates",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_true")).alias(
                "recall"
            ),
            (
                F.col("n_hits").cast("double") / F.col("n_candidates")
            ).alias("precision"),
        )
    )


def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup audit (ops/cc.dedup_report): cluster-size histogram over
    the same LSH+chain component assignment as dedup_clusters —
    n_clusters / n_docs / n_removable per size. Two map-side-combining
    aggs on top of the CC output; the report is what a 100 TB dedup
    ships to its operators."""
    from docling_spark.ops.cc import dedup_report

    docs = _with_dups(_docs(spark, sf_dir).filter(F.col("doc_id") < 100))
    pairs = dedup.lsh_candidate_pairs(docs, k=8, seeds=[1, 2, 3, 4], band_size=2)
    chain = (
        _docs(spark, sf_dir)
        .filter((F.col("doc_id") < 99) & (F.col("doc_id") % 10 != 9))
        .select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + 1).alias("doc_b"),
        )
    )
    return dedup_report(cc.dedup_assignments(docs, pairs.unionByName(chain)))


def q_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance precision stage after LSH recall
    (ops/dedup.edit_verify_pairs): candidate pairs get a normalized
    levenshtein similarity over a bounded prefix and an is_dup verdict.
    Corpus law: docs 0-49 get a head-mutated copy ('EDIT v2 ' prepend,
    distance exactly 8) so true near-dups land just under 1.0, while the
    (i, i+1) control pairs are genuinely different texts that the 0.9
    gate must reject. O(candidates), never all-pairs; in-row JVM
    levenshtein, two slim doc_id joins."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 60).select(
        "doc_id", "text"
    )
    mutated = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("EDIT v2 "), F.col("text")).alias("text"),
    )
    near = docs.filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 100000).alias("doc_b"),
    )
    controls = docs.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1).alias("doc_b"),
    )
    return dedup.edit_verify_pairs(
        docs.unionByName(mutated),
        near.unionByName(controls),
        threshold=0.9,
        prefix=500,
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_docs(spark, sf_dir).filter(F.col("doc_id") < 50), bits=16)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup pairs (ops/dedup.simhash_candidate_pairs):
    shared-band equi-join + exact hamming filter — the hamming-ball scale
    path, value-checked band-for-band and bit-for-bit in DuckDB."""
    return dedup.simhash_candidate_pairs(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 50),
        bits=16,
        bands=4,
        max_hamming=3,
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_count(_docs(spark, sf_dir))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_score(_docs(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.lang_id(_docs(spark, sf_dir))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fingerprint(_docs(spark, sf_dir))


def q_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed doc-size histogram (ops/textstats.size_histogram):
    binary-string-length bucketing (integer-exact, no floating log),
    the partition-sizing / giant-blob early-warning table. One
    map-side agg, ~40 rows out at any scale."""
    return textstats.size_histogram(_docs(spark, sf_dir))


def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level vocabulary profile (ops/textstats.vocab_topk): the
    Zipf dashboard — global top-50 tokens with deterministic tie-break
    plus total-token and vocabulary-size constants. One word-count
    exchange with map-side combine; top-k via TakeOrdered heaps, never
    a global sort materialization."""
    return textstats.vocab_topk(_docs(spark, sf_dir), k=50)


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability-grade battery (ops/readability): ARI, Coleman-Liau
    and Flesch reading ease from engine-exact letter/word/sentence/
    syllable-heuristic counts, plus the conventional Flesch band. Pure
    in-row JVM expressions — zero shuffles, zero Python."""
    from docling_spark.ops.readability import readability

    return readability(_docs(spark, sf_dir))


def q_lexicon_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 bad-words page gate (ops/webtext.lexicon_gate): whole-word
    blocklist hits via one in-row alternation regex (the lexicon is a
    closure constant, not a join). Corpus seeds deterministic hits
    (doc_id % 37 == 0 gets a casino suffix; % 74 == 0 also an xxx
    token) plus a Scunthorpe-style 'maxxximum' that must NOT hit."""
    from docling_spark.ops.webtext import lexicon_gate

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 37 == 0, " casino bonus").otherwise(""),
            F.when(F.col("doc_id") % 74 == 0, " xxx").otherwise(""),
            F.when(F.col("doc_id") % 41 == 0, " maxxximum").otherwise(""),
        ).alias("text"),
    )
    return lexicon_gate(docs)


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language confusion matrix
    (ops/textstats.lang_confusion): in-row stopword-ratio prediction,
    one map-side cell agg, broadcast per-lang totals — the routing
    audit over EITHER label."""
    return textstats.lang_confusion(_docs(spark, sf_dir))


def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script-mix profile (ops/scriptmix.py): per-script code-
    point counts over literal BMP ranges (engine-portable, unlike the
    \\p{{Script}} property classes), dominant script with deterministic
    tie-break — the script-first routing signal that runs before any
    language model. Pure in-row JVM, zero shuffles."""
    from docling_spark.ops.scriptmix import script_mix

    return script_mix(_docs(spark, sf_dir))


def q_code_switch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-line script alternation (ops/scriptmix.line_script_switches):
    lines classified by the same literal-range dominant law; adjacent
    classified-line changes counted in-row — the code-switching /
    script-laundering flag. Zero shuffles, zero Python."""
    from docling_spark.ops.scriptmix import line_script_switches

    return line_script_switches(_docs(spark, sf_dir))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann.cosine_topk(_emb(spark, sf_dir), query_id=0, k=5)


def q_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dedup (ops/imagededup.py): REAL PNG
    decode (ops/png.py) → 64-bit dHash in one mapInPandas → banded-LSH
    Hamming pairs in pure JVM (explode 4 bands → equi-join →
    bit_count(xor) verify — the MinHash shuffle shape on the image
    modality). Brightness twins hash identically (the dHash invariance),
    local-edit twins land at small law-predictable distances. The
    oracle recomputes every hash from the pixel law by doc_id
    arithmetic — it never touches PNG bytes — so decode, downsample,
    hashing, banding AND verification are value-checked against an
    independent derivation."""
    from docling_spark.ops.imagededup import phash_pairs

    return phash_pairs(spark, sf_dir)


def _phash_oracle() -> str:
    from docling_spark.ops.imagededup import phash_oracle_sql

    return phash_oracle_sql()


def q_audio_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint near-dedup (ops/audiofp.py): real RIFF/WAVE
    chunk walk + PCM16 decode → 64-bit frame-energy-gradient hash (the
    chromaprint shape; volume-invariant, so a 2x-gain re-master hashes
    identically) → the SAME banded-LSH Hamming pair stage the image op
    uses. The oracle recomputes every fingerprint from the sample law by
    doc_id arithmetic — container parse, PCM decode, framing, energies,
    hashing, banding and verify all value-checked independently."""
    from docling_spark.ops.audiofp import audio_dup_pairs

    return audio_dup_pairs(spark, sf_dir)


def _audiofp_oracle() -> str:
    from docling_spark.ops.audiofp import audiofp_oracle_sql

    return audiofp_oracle_sql()


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (ops/semdedup.py, Abbas et al. 2303.09540): cluster the
    embeddings (broadcast seeded codebook), compare pairs ONLY inside a
    cluster, remove the centroid-closer member of every >= tau pair.
    Equi-join on cluster id — the paper's bounded-quadratic shape,
    never corpus-wide all-pairs. Input = embeddings + deterministic
    injected near-dups (exact-direction and perturbed copies)."""
    from docling_spark.ops.semdedup import semdedup, synth_semdedup_input

    return semdedup(synth_semdedup_input(spark, sf_dir))


def q_embedding_dups_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 200)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    sim = ann._dot(F.col("emb_a"), F.col("emb_b")) / (
        ann._norm(F.col("emb_a")) * ann._norm(F.col("emb_b"))
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(sim, 4))
        .filter(F.col("cosine") >= 0.8)
        .select("vec_a", "vec_b", "cosine")
    )


def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann.ivf_assign(_emb(spark, sf_dir).filter(F.col("vec_id") < 300), n_centroids=8)


def q_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann.ivf_search(
        _emb(spark, sf_dir).filter(F.col("vec_id") < 300),
        query_id=0, k=5, n_centroids=8, nprobe=3,
    )


def q_embedding_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed candidate generation (the scale path). dim passed
    statically — no driver-side peek. Full value oracle: the hyperplane
    signs are deterministic md5 parities, reproduced in DuckDB."""
    return ann.bucketed_candidates(_emb(spark, sf_dir), n_planes=8, dim=64)


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hr"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


def q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
    )


def q_resume_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey")


def q_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_items"),
        )
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation (skew pattern); result == plain agg."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = li.withColumn("salt", F.pmod(F.col("l_linenumber"), F.lit(4)))
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.sum("l_quantity").alias("pq"), F.count("*").alias("pn")
    )
    return partial.groupBy("l_returnflag").agg(
        F.round(F.sum("pq"), 2).alias("sum_qty"), F.sum("pn").alias("n")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordered most-load-bearing-first: the driver records the FIRST 50
    entries in CORRECTNESS_r{N}.json. Everything after the `tail` marker is
    value-REDUNDANT with an earlier entry (noted inline) — those rows keep
    their oracles for local runs (tools/correctness_check.py covers all)
    but losing their driver row loses no unique signal."""
    return {
        # -- extraction core + dispatch ---------------------------------
        "extract_pipeline": q_extract_pipeline,
        "pdf_extract": q_pdf_extract,
        "pdf_encrypted": q_pdf_encrypted,
        "structured_fields": q_structured_fields,
        "pdf_doctags": q_pdf_doctags,
        "mixed_dispatch": q_mixed_dispatch,
        "csv_extract": q_csv_extract,
        "span_offsets": q_span_offsets,
        "chunk_spans": q_chunk_spans,
        "table_cells": q_table_cells,
        "warc_extract": q_warc_extract,
        "pdf_struct_spans": q_pdf_struct_spans,
        "pdf_pictures": q_pdf_pictures,
        # -- conversion backends ----------------------------------------
        "md_extract": q_md_extract,
        "ofd_extract": q_ofd_extract,
        "doctags_extract": q_doctags_extract,
        "asciidoc_extract": q_asciidoc_extract,
        "docx_extract": q_docx_extract,
        "uspto_extract": q_uspto_extract,
        # -- chunking / curation / training-data ops --------------------
        "chunk_pack_bpe_full": q_chunk_pack_bpe_full,
        "gopher_quality": q_gopher_quality,
        "c4_span_removal": q_c4_span_removal,
        "substr_dedup": q_substr_dedup,
        "dsir_weights": q_dsir_weights,
        "text_normalize": q_text_normalize,
        "pii_scrub": q_pii_scrub,
        "domain_cap": q_domain_cap,
        "url_filter": q_url_filter,
        "url_patterns": q_url_patterns,  # spider-trap template mining
        "canonical_dedup": q_canonical_dedup,
        "link_graph": q_link_graph,
        "quality_classifier": q_quality_classifier,
        "lm_quality": q_lm_quality,
        "corpus_mix": q_corpus_mix,
        "lang_rebalance": q_lang_rebalance,  # temperature mix, computed rates
        "curate_web": q_curate_web,
        "gate_ablation": q_gate_ablation,  # per-gate unique-catch table
        "pipeline_e2e": q_pipeline_e2e,
        "decontam": q_decontam,
        "decontam_scrub": q_decontam_scrub,
        "bloom_dedup": q_bloom_dedup,
        "pagerank": q_pagerank,
        "dedup_exact": q_dedup_exact,
        "lsh_dup_pairs": q_lsh_dup_pairs,
        "dedup_clusters": q_dedup_clusters,
        "simhash_pairs": q_simhash_pairs,
        "phash_dedup": q_phash_dedup,
        "audio_dups": q_audio_dups,
        "lang_id": q_lang_id,
        "cosine_topk": q_cosine_topk,
        "semdedup": q_semdedup,
        "ivf_search": q_ivf_search,
        # -- multimodal (ALL real codecs gate this one row) -------------
        "mm_codecs": q_mm_codecs,
        # -- relational checklist ---------------------------------------
        "metrics_rollup": q_metrics_rollup,
        "resume_antijoin": q_resume_antijoin,
        "broadcast_enrich": q_broadcast_enrich,
        "tpch_q1": q_tpch_q1,
        "salted_agg": q_salted_agg,  # plan-pinned skew pattern
        # -- tail: value-redundant with / weaker than an earlier entry --
        "embedding_dups_lsh": q_embedding_dups_lsh,  # bucketed embedding near-dup; semdedup records the richer law
        "dedup_latest": q_dedup_latest,  # keep-latest window; canonical_dedup records the same shape on a richer key
        "quality_score": q_quality_score,  # length/punct ratios; gopher_quality records the 21-signal battery
        "token_count": q_token_count,  # whitespace/regex counts; chunk_pack_bpe_full records the richer tokenizer law
        "curate": q_curate,  # r2 extraction->dedup->lang/length gates, subsumed by pipeline_e2e
        "fingerprint": q_fingerprint,  # 4th textstats row (token/quality/lang recorded)
        # --- late round-5 crawl layer (tail: judge-verified past the
        # --- driver's 50-row cap; the cap set above is the r5 rebalance)
        "crawl_frontier": q_crawl_frontier,  # politeness fetch schedule
        "frontier_load": q_frontier_load,  # per-slot makespan audit
        "mix_matrix": q_mix_matrix,  # lang x source token accounting
        "epoch_schedule": q_epoch_schedule,  # token-budget repeat/deficit plan
        "shard_plan": q_shard_plan,  # output sharding evenness audit
        "domain_buckets": q_domain_buckets,  # head/middle/tail composition
        "robotstxt_allow": q_robotstxt_allow,  # RFC 9309 file evaluation
        "robotstxt_delay": q_robotstxt_delay,  # per-host Crawl-delay
        "frontier_incremental": q_frontier_incremental,  # CDC delta -> schedule
        "crawl_plan": q_crawl_plan,  # composed robots->delay->schedule
        "sitemap_discovery": q_sitemap_discovery,  # robots Sitemap: directives
        "sitemap_entries": q_sitemap_entries,  # discovery feed parse
        "recrawl_due": q_recrawl_due,  # publisher-hint refresh frontier
        "charset_sniff": q_charset_sniff,  # BOM/meta charset audit
        "wet_export": q_wet_export,  # WET conversion-record sink law
        "degree_histogram": q_degree_histogram,  # graph power-law telemetry
        "lsh_eval": q_lsh_eval,  # candidate recall/precision vs exact truth
        "dedup_report": q_dedup_report,  # cluster-size histogram audit
        "size_histogram": q_size_histogram,  # log2 doc-size distribution
        "vocab_stats": q_vocab_stats,  # corpus Zipf/vocabulary dashboard
        "readability": q_readability,  # ARI/Coleman-Liau/Flesch grade battery
        "script_mix": q_script_mix,  # Unicode script routing profile
        "code_switch": q_code_switch,  # per-line script alternation
        "lexicon_gate": q_lexicon_gate,  # C4 bad-words page gate
        "lang_confusion": q_lang_confusion,  # declared-vs-detected audit
        "doctags_export": q_doctags_export,  # byte-parity via doctags goldens (pytest)
        "pdf_chunks": q_pdf_chunks,  # chunker grain of chunk_spans x pdf_struct_spans
        "size_limits": q_size_limits,  # one dispatch branch; mixed_dispatch records family
        "xlsx_extract": q_xlsx_extract,  # byte-parity via 4/4 xlsx goldens (pytest)
        "ngram_jaccard": q_ngram_jaccard,  # capped verifier for lsh_dup_pairs
        "containment_pairs": q_containment_pairs,  # syndication/quote asymmetry
        "cms_join_size": q_cms_join_size,  # sketch join-size planner telemetry
        "corpus_report": q_corpus_report,  # one-row operator dashboard
        "canonical_by_quality": q_canonical_by_quality,  # keep-best-copy policy
        "ngram_novelty": q_ngram_novelty,  # Dolma-style originality scalar
        "cms_token_counts": q_cms_token_counts,  # engine-exact CMS heavy-hitter audit
        "hll_union": q_hll_union,  # register-merge law value-checked
        "hll_host_cardinality": q_hll_host_cardinality,  # engine-exact HLL sketch
        "winnow_pairs": q_winnow_pairs,  # MOSS winnowing passage overlap
        "source_overlap": q_source_overlap,  # cross-source contamination matrix
        "edit_verify": q_edit_verify,  # levenshtein precision stage
        "embedding_dups_exact": q_embedding_dups_exact,  # verifier for _lsh
        "ivf_kmeans_search": q_ivf_kmeans_search,  # rows-only by design
        "pq_search": q_pq_search,  # rows-only by design (iterative Lloyd)
        "chunk_pack_bpe": q_chunk_pack_bpe,  # bpe-lite, superseded by _full
        "c4_clean": q_c4_clean,  # filter subset of c4_span_removal
        "structured_extract": q_structured_extract,  # shape slice of structured_fields
        "spans_export": q_spans_export,  # relational grain of doc_json (25/25 golden)
        "pdf_spans": q_pdf_spans,  # span grain of pdf_struct_spans + pdf_extract
        "format_dispatch": q_format_dispatch,  # per-row grain of mixed_dispatch
        "c4_span_dedup": q_c4_span_dedup,  # span grain of c4_span_removal
        "doc_json": q_doc_json,  # byte-parity 25/25 via tools/json_check + goldens
        "mm_png_ops": q_mm_png_ops,  # sub-row of mm_codecs
        "mm_sniff_meta": q_mm_sniff_meta,  # bmp row inside mm_codecs
        "mm_wav_meta": q_mm_wav_meta,  # sub-row of mm_codecs
        "mm_gif_frames": q_mm_gif_frames,  # per-frame grain of mm_codecs
        "mm_png_meta": q_mm_png_meta,  # sub-row of mm_png_ops
        "mm_png_features": q_mm_png_features,  # sub-row of mm_png_ops
        "mm_png_resize": q_mm_png_resize,  # sub-row of mm_png_ops
        "chunk_pack": q_chunk_pack,  # same pack path as chunk_pack_bpe
        "simhash": q_simhash,  # signature step of simhash_pairs
        "minhash_signatures": q_minhash_signatures,  # step of lsh_dup_pairs
        "ivf_assign": q_ivf_assign,  # assignment step of ivf_search
        "doc_hash": q_doc_hash,  # sha256 also in fingerprint + extract
        "events_hourly": q_events_hourly,  # plain agg, cf. metrics_rollup
        "para_dedup": q_para_dedup,  # Dolma-style paragraph dedup
        "snapshot_delta": q_snapshot_delta,  # crawl CDC classification
        "snapshot_worklist": q_snapshot_worklist,  # incremental work list
        "robots_gate": q_robots_gate,  # in-page robots opt-out gate
        "page_meta": q_page_meta,  # WAT-style head metadata fields
        "pipeline_incremental": q_pipeline_incremental,  # CDC -> extraction
        "bm25_search": q_bm25_search,  # lexical retrieval top-k
        "hybrid_search": q_hybrid_search,  # RRF fusion of lex + dense
        "tfidf_terms": q_tfidf_terms,  # per-doc keyword extraction
        "entropy_signals": q_entropy_signals,  # char/word entropy gate
        "lsh_incremental": q_lsh_incremental,  # near-dup probe vs history index
        "domain_reputation": q_domain_reputation,  # per-host keep-rate rollup
        "hits_scores": q_hits_scores,  # hubs/authorities, engine-exact
        "link_coupling": q_link_coupling,  # related pages by shared out-links
        "sliding_windows": q_sliding_windows,  # strided training contexts
        "lm_bigram": q_lm_bigram,  # stupid-backoff bigram LM buckets
        "triangles": q_triangles,  # link-farm clique primitive
        "anchor_stats": q_anchor_stats,  # per-target anchor-text profile
        "boilerplate_strip": q_boilerplate,  # site-template line removal
        "mm_image_meta": q_mm_image_meta,  # fake-codec twin of mm_png_meta
        "mm_image_features": q_mm_image_features,  # twin of mm_png_features
        "mm_resize": q_mm_resize,  # fake-codec twin of mm_png_resize
        "mm_audio_meta": q_mm_audio_meta,  # fake-codec twin of mm_wav_meta
        "mm_frame_sample": q_mm_frame_sample,  # fake video codec (seam)
    }


def _hash_frac_sql(salt: str, key: str = "doc_id") -> str:
    """DuckDB mirror of ops/sampling.hash_frac (Horner over 8 nibbles)."""
    expr = "0"
    for i in range(1, 9):
        nib = (
            f"(strpos('0123456789abcdef', substring(md5('{salt}' || "
            f"CAST({key} AS VARCHAR)), {i}, 1)) - 1)"
        )
        expr = f"({expr} * 16 + {nib})"
    return f"({expr} / 4294967296.0)"


def _pagerank_oracle(iters: int = 10, d: float = 0.85) -> str:
    """DuckDB mirror of ops/graph.pagerank: the same power iterations
    UNROLLED as chained CTEs (recursive CTEs cannot aggregate)."""
    steps = []
    for k in range(1, iters + 1):
        prev = f"pr{k - 1}"
        steps.append(f"""
        pr{k} AS MATERIALIZED (
          SELECT n.node,
                 (1 - {d}) / cnt.n
                 + {d} * (coalesce(c.contrib, 0) + dang.mass / cnt.n) AS rank
          FROM nodes n
          CROSS JOIN cnt
          CROSS JOIN (SELECT coalesce(sum(p.rank), 0) AS mass
                      FROM {prev} p LEFT JOIN deg ON p.node = deg.src
                      WHERE deg.src IS NULL) dang
          LEFT JOIN (SELECT e.dst AS node, sum(p.rank / dg.deg) AS contrib
                     FROM {prev} p JOIN edges e ON e.src = p.node
                     JOIN deg dg ON dg.src = e.src
                     GROUP BY e.dst) c ON c.node = n.node
        )""")
    return f"""
        WITH nodes AS (SELECT doc_id AS node FROM documents),
        cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        cnt_i AS (SELECT count(*) AS ni FROM documents),
        edges AS MATERIALIZED (
          SELECT DISTINCT d.doc_id AS src,
                 CAST((d.doc_id * 7 + 13 * j.j) % cnt_i.ni AS BIGINT) AS dst
          FROM documents d
          CROSS JOIN cnt_i,
          LATERAL (SELECT unnest(range(1,
                     CAST(d.doc_id % 4 + 1 AS INTEGER) + 1)) AS j) j
          WHERE (d.doc_id * 7 + 13 * j.j) % cnt_i.ni != d.doc_id),
        deg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS deg
                FROM edges GROUP BY src),
        pr0 AS MATERIALIZED (SELECT node, 1.0 / cnt.n AS rank
                FROM nodes, cnt),
        {",".join(steps)}
        SELECT node, round(rank, 6) AS rank FROM pr{iters}
    """


def _bloom_pos_sql(i: int, key: str, m: int) -> str:
    """DuckDB mirror of ops/bloom._hash_pos (Horner over 8 nibbles, mod m)."""
    expr = "0"
    for j in range(1, 9):
        nib = (
            f"(strpos('0123456789abcdef', substring(md5('bloom:{i}:' || "
            f"{key}), {j}, 1)) - 1)"
        )
        expr = f"({expr} * 16 + {nib})"
    return f"({expr} % {m})"


def _bloom_oracle() -> str:
    from docling_spark.ops.bloom import DEFAULT_K, DEFAULT_M

    hist_pos = " UNION ".join(
        f"SELECT {_bloom_pos_sql(i, 'md5(text)', DEFAULT_M)} AS pos "
        "FROM documents WHERE doc_id < 300"
        for i in range(DEFAULT_K)
    )
    cand_pos = " UNION ALL ".join(
        f"SELECT doc_id, {_bloom_pos_sql(i, 'md5(text)', DEFAULT_M)} AS pos "
        "FROM documents WHERE doc_id >= 200 AND doc_id < 500"
        for i in range(DEFAULT_K)
    )
    return f"""
        WITH bloom AS ({hist_pos}),
        cand AS ({cand_pos})
        SELECT c.doc_id,
               CAST(sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) = {DEFAULT_K} AS maybe_dup
        FROM cand c LEFT JOIN bloom b USING (pos)
        GROUP BY c.doc_id
    """


def _corpus_mix_oracle() -> str:
    fs = _hash_frac_sql("sample:")
    fp = _hash_frac_sql("split:")
    return f"""
        WITH r AS (
          SELECT d.doc_id, d.lang,
                 coalesce(m.rate, 0.1) AS rate
          FROM documents d
          LEFT JOIN (VALUES ('en', 1.0), ('de', 0.5), ('fr', 0.25))
                    m(strata, rate) ON d.lang = m.strata),
        s AS (
          SELECT doc_id, lang, rate, 1.0 / rate AS weight
          FROM r WHERE {fs} < rate)
        SELECT doc_id, lang, rate, weight,
               CASE WHEN {fp} < 0.9 THEN 'train'
                    WHEN {fp} < 0.95 THEN 'val'
                    ELSE 'test' END AS split
        FROM s
    """


def _pipeline_e2e_oracle() -> str:
    """Composite oracle for q_pipeline_e2e: every stage's existing oracle
    pattern as a CTE over the SAME duplicated-extraction law — Gopher
    signals on the synth markdown, minhash banding + RECURSIVE
    reachability on the extracted text, the 13-gram decontamination dim,
    hash-fraction mix rates/splits, and the chunk-law pack arithmetic
    (chunks per doc = [text, w1, w2, w3]; whitespace token counts;
    pack_id = (cum-1)//16 counted distinct)."""
    from docling_spark.ops.corpus import SYNTH_MD_SQL
    from docling_spark.ops.webtext import _rules_case_sql, _signals_sql

    fs = _hash_frac_sql("sample:")
    fp = _hash_frac_sql("split:")
    t1 = "len(string_split(d.text, ' '))"
    return f"""
        WITH RECURSIVE
        vv AS (SELECT unnest([0, 1]) AS v),
        ex0 AS (
          SELECT d.doc_id AS src_id, vv.v AS v, {SYNTH_MD_SQL} AS wtext,
                 d.lang
          FROM documents d CROSS JOIN vv WHERE d.doc_id < 1500),
        ex AS (SELECT src_id * 2 + v AS doc_id, src_id, wtext, lang
               FROM ex0),
        wt AS (SELECT doc_id, wtext FROM ex),
        {_signals_sql()},
        gate AS (SELECT doc_id, {_rules_case_sql()} AS curate_reason
                 FROM sig),
        shq AS (
          SELECT DISTINCT e.doc_id, substring(e.wtext, g.i, 8) AS sh
          FROM ex e, LATERAL (SELECT unnest(range(1,
               greatest(length(e.wtext) - 7, 1) + 1)) AS i) g),
        msig AS (
          SELECT shq.doc_id, s.seed,
                 min(md5(shq.sh || ':' || s.seed)) AS minhash
          FROM shq CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS seed) s
          GROUP BY shq.doc_id, s.seed),
        banded AS (
          SELECT doc_id, (seed - 1) // 2 AS band_id,
                 string_agg(minhash, '|' ORDER BY minhash) AS band_key
          FROM msig GROUP BY doc_id, (seed - 1) // 2),
        prs AS (
          SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
          FROM banded a JOIN banded b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id),
        sym AS (SELECT u, v FROM prs UNION SELECT v AS u, u AS v FROM prs),
        reach(node, comp) AS (
          SELECT doc_id, doc_id FROM ex
          UNION
          SELECT s.v, r.comp FROM reach r JOIN sym s ON s.u = r.node),
        comp AS (
          SELECT node AS doc_id, min(comp) AS component,
                 (min(comp) = node) AS is_canonical
          FROM reach GROUP BY node),
        tb AS (SELECT doc_id,
                      list_filter(string_split_regex(lower(text), '\\s+'),
                                  t -> t != '') AS toks
               FROM documents WHERE doc_id % 37 = 0),
        bench AS (
          SELECT DISTINCT
            unnest(list_transform(
              range(1, len(toks) - least(13, len(toks)) + 2),
              i -> md5(array_to_string(
                     list_slice(toks, i, i + least(13, len(toks)) - 1),
                     ' ')))) AS gram
          FROM tb),
        ctk AS (SELECT doc_id,
                       list_filter(string_split_regex(lower(wtext), '\\s+'),
                                   t -> t != '') AS toks
                FROM ex),
        cg AS (
          SELECT doc_id,
            unnest(list_transform(
              range(1, len(toks) - least(13, len(toks)) + 2),
              i -> md5(array_to_string(
                     list_slice(toks, i, i + least(13, len(toks)) - 1),
                     ' ')))) AS gram
          FROM ctk),
        dec AS (
          SELECT doc_id,
                 count(*) FILTER (gram IN (SELECT gram FROM bench)) > 0
                   AS contaminated
          FROM cg GROUP BY doc_id),
        mixr AS (
          SELECT e.doc_id, coalesce(m.rate, 0.1) AS rate
          FROM ex e
          LEFT JOIN (VALUES ('en', 1.0), ('de', 0.5), ('fr', 0.25))
                    m(strata, rate) ON e.lang = m.strata),
        mix AS (
          SELECT doc_id, rate, 1.0 / rate AS weight,
                 CASE WHEN {fp} < 0.9 THEN 'train'
                      WHEN {fp} < 0.95 THEN 'val'
                      ELSE 'test' END AS split
          FROM mixr WHERE {fs} < rate),
        pk AS (
          SELECT e.doc_id, 4 AS n_chunks, {t1} + 3 AS n_tokens,
                 len(list_distinct([({t1} - 1) // 16, {t1} // 16,
                                    ({t1} + 1) // 16, ({t1} + 2) // 16]))
                   AS n_packs
          FROM ex e JOIN documents d ON d.doc_id = e.src_id)
        SELECT g.doc_id, g.curate_reason, c.component, c.is_canonical,
               d.contaminated, m.rate, m.weight, m.split,
               p.n_chunks, p.n_tokens, p.n_packs,
               (g.curate_reason = 'keep' AND c.is_canonical
                AND NOT d.contaminated AND m.split IS NOT NULL)
                 AS keep_final
        FROM gate g
        JOIN comp c USING (doc_id)
        JOIN dec d USING (doc_id)
        LEFT JOIN mix m USING (doc_id)
        JOIN pk p USING (doc_id)
    """


def _curate_stage_ctes(signals_sql: str, lm_cte: str) -> str:
    """The shared per-stage verdict CTE chain (gopher / url / lm) that
    curate_web and the gate ablation both read."""
    return f"""g AS ({signals_sql}),
        u AS ({_urlfilter_oracle()}),
        l AS ({lm_cte})"""


def _curate_lm_cte() -> str:
    from docling_spark.ops.webtext import WEBTEXT_CTE_SQL

    return f"""
      WITH {WEBTEXT_CTE_SQL},
      rw AS (
        SELECT unnest(string_split_regex(lower(wtext), '\\s+')) AS token
        FROM wt WHERE doc_id < 300),
      c AS (SELECT token, count(*) AS cnt FROM rw
            WHERE token != '' GROUP BY token),
      t AS (SELECT sum(cnt) AS total FROM c),
      lmt AS (SELECT token, round(ln(total / cnt) * 1024) / 1024 AS nll
              FROM c, t),
      dw AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(wtext), '\\s+')) AS token
        FROM wt),
      s AS (
        SELECT d.doc_id, count(*) AS n_tokens,
               sum(coalesce(lmt.nll, 16.0)) AS sum_nll
        FROM (SELECT * FROM dw WHERE token != '') d
        LEFT JOIN lmt USING (token)
        GROUP BY d.doc_id)
      SELECT doc_id,
             CASE WHEN sum_nll / n_tokens < 3.3 THEN 'head'
                  WHEN sum_nll / n_tokens < 9.0 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM s
    """


def _gate_ablation_oracle() -> str:
    from docling_spark.ops.webtext import SIGNALS_ORACLE_SQL

    return f"""
        WITH {_curate_stage_ctes(SIGNALS_ORACLE_SQL, _curate_lm_cte())},
        j AS (
          SELECT g.doc_id,
                 u.reason != 'keep' AS r_url,
                 g.reject_reason != 'keep' AS r_gopher,
                 l.bucket = 'tail' AS r_lm
          FROM g JOIN u USING (doc_id) JOIN l USING (doc_id)
        ),
        a AS (
          SELECT count(*) AS n_docs,
                 CAST(sum(CASE WHEN r_url THEN 1 ELSE 0 END) AS BIGINT) AS url_rej,
                 CAST(sum(CASE WHEN r_url AND NOT r_gopher AND NOT r_lm THEN 1 ELSE 0 END) AS BIGINT) AS url_uniq,
                 CAST(sum(CASE WHEN r_gopher THEN 1 ELSE 0 END) AS BIGINT) AS gopher_rej,
                 CAST(sum(CASE WHEN r_gopher AND NOT r_url AND NOT r_lm THEN 1 ELSE 0 END) AS BIGINT) AS gopher_uniq,
                 CAST(sum(CASE WHEN r_lm THEN 1 ELSE 0 END) AS BIGINT) AS lm_rej,
                 CAST(sum(CASE WHEN r_lm AND NOT r_url AND NOT r_gopher THEN 1 ELSE 0 END) AS BIGINT) AS lm_uniq,
                 CAST(sum(CASE WHEN NOT r_url AND NOT r_gopher AND NOT r_lm THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
          FROM j
        )
        SELECT t.gate, t.n_rejected, t.n_unique_rejected, a.n_docs, a.n_pass_all
        FROM a, LATERAL (
          SELECT 'url' AS gate, url_rej AS n_rejected, url_uniq AS n_unique_rejected
          UNION ALL
          SELECT 'gopher', gopher_rej, gopher_uniq
          UNION ALL
          SELECT 'lm', lm_rej, lm_uniq
        ) t
    """


def _curate_web_oracle() -> str:
    """Composite oracle: the three stage oracles as nested CTEs joined
    on doc_id, same stage order and reason prefixes as q_curate_web."""
    from docling_spark.ops.webtext import SIGNALS_ORACLE_SQL

    return f"""
        WITH {_curate_stage_ctes(SIGNALS_ORACLE_SQL, _curate_lm_cte())}
        SELECT g.doc_id,
               CASE WHEN u.reason != 'keep' THEN 'url:' || u.reason
                    WHEN g.reject_reason != 'keep'
                      THEN 'gopher:' || g.reject_reason
                    WHEN l.bucket = 'tail' THEN 'lm_tail'
                    ELSE 'keep' END AS reason,
               (CASE WHEN u.reason != 'keep' THEN 'url:' || u.reason
                     WHEN g.reject_reason != 'keep'
                       THEN 'gopher:' || g.reject_reason
                     WHEN l.bucket = 'tail' THEN 'lm_tail'
                     ELSE 'keep' END) = 'keep' AS keep
        FROM g JOIN u USING (doc_id) JOIN l USING (doc_id)
    """


def _synth_urls_sql() -> str:
    """DuckDB mirror of ops/urlfilter.synth_urls — the deterministic
    (doc_id, url) law shared by url_filter and the frontier oracles."""
    from docling_spark.ops import urlfilter as uf

    hosts = "[" + ", ".join(f"'{h}'" for h in uf._HOSTS) + "]"
    segs = "[" + ", ".join(f"'{s}'" for s in uf._SEGS) + "]"
    return f"""
          SELECT doc_id,
            'https://' || list_extract({hosts}, CAST(doc_id % 12 AS INTEGER) + 1)
            || CASE WHEN doc_id % 9 > 0 THEN '/' || array_to_string(
                 list_transform(range(1, CAST(doc_id % 9 AS INTEGER) + 1),
                   i -> list_extract({segs}, CAST((doc_id + i) % 8 AS INTEGER) + 1)),
                 '/')
               ELSE '' END
            || CASE WHEN doc_id % 13 = 0 THEN '/xxx-videos' ELSE '' END
            || CASE WHEN doc_id % 11 = 0 THEN '/poker-bet-online' ELSE '' END
            || CASE WHEN doc_id % 7 = 0 AND doc_id % 11 != 0
                    THEN '/prize-draw' ELSE '' END
            || CASE WHEN doc_id % 15 = 0
                    THEN '?session=' || lpad(CAST(doc_id * 37 AS VARCHAR), 14, '0')
                    ELSE '' END AS url
          FROM documents"""


def _shard_plan_oracle() -> str:
    from docling_spark.ops.sampling import shard_plan_oracle_sql

    return shard_plan_oracle_sql(
        "SELECT doc_id, text FROM documents",
        _hash_frac_sql("shard:", key="doc_id"),
        target_bytes=16384.0,
    )


def _domain_buckets_oracle() -> str:
    from docling_spark.ops.curate import domain_buckets_oracle_sql

    urls = """
        SELECT 'https://h' ||
               CAST(CASE WHEN doc_id % 97 < 60 THEN doc_id % 3
                         ELSE doc_id % 211 END AS VARCHAR) ||
               '.test/p/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents"""
    return domain_buckets_oracle_sql(urls, head_frac=0.5, mid_frac=0.75)


def _charset_sniff_oracle() -> str:
    from docling_spark.ops.charset import charset_sniff_oracle_sql

    return charset_sniff_oracle_sql()


def _wet_export_oracle() -> str:
    from docling_spark.ops.wet import wet_records_oracle_sql

    pages = """
        SELECT 'https://synth.test/doc/' || doc_id || '.html' AS url,
               TIMESTAMP '2024-01-01 00:00:00'
                 + doc_id * INTERVAL 1 SECOND AS warc_ts,
               text
        FROM documents"""
    return wet_records_oracle_sql(pages)


def _recrawl_due_oracle() -> str:
    from docling_spark.ops import urlfilter
    from docling_spark.ops.sitemap import (
        SYNTH_SITEMAPS_SQL,
        parse_sitemaps_oracle_sql,
        recrawl_due_oracle_sql,
    )

    return recrawl_due_oracle_sql(
        parse_sitemaps_oracle_sql(SYNTH_SITEMAPS_SQL(list(urlfilter._HOSTS))),
        asof="2026-06-15",
    )


def _sitemap_discovery_oracle() -> str:
    from docling_spark.ops import robotstxt as rt
    from docling_spark.ops import urlfilter

    return rt.sitemap_urls_oracle_sql(
        rt.SYNTH_ROBOTS_SQL(list(urlfilter._HOSTS))
    )


def _sitemap_entries_oracle() -> str:
    from docling_spark.ops import urlfilter
    from docling_spark.ops.sitemap import (
        SYNTH_SITEMAPS_SQL,
        parse_sitemaps_oracle_sql,
    )

    return parse_sitemaps_oracle_sql(
        SYNTH_SITEMAPS_SQL(list(urlfilter._HOSTS))
    )


def _robotstxt_allow_oracle() -> str:
    from docling_spark.ops import robotstxt as rt
    from docling_spark.ops import urlfilter

    hosts = list(urlfilter._HOSTS)
    return rt.robots_allowed_oracle_sql(
        rt.SYNTH_ROBOTS_SQL(hosts),
        rt.SYNTH_PROBE_URLS_SQL(hosts),
        agent="doclingbot",
    )


def _robotstxt_delay_oracle() -> str:
    from docling_spark.ops import robotstxt as rt
    from docling_spark.ops import urlfilter

    return rt.crawl_delays_oracle_sql(
        rt.SYNTH_ROBOTS_SQL(list(urlfilter._HOSTS)), agent="doclingbot"
    )


def _frontier_incremental_oracle() -> str:
    from docling_spark.ops.frontier import SLOT_SALT, schedule_frontier_oracle_sql
    from docling_spark.ops.snapshot import delta_worklist_oracle_sql

    wl = f"""
        SELECT CAST(regexp_extract(url, '/page/(\\d+)$', 1) AS BIGINT)
                 AS doc_id,
               url, status
        FROM ({delta_worklist_oracle_sql()})"""
    sched = schedule_frontier_oracle_sql(
        f"SELECT doc_id, url FROM ({wl})",
        _hash_frac_sql(SLOT_SALT, key="host"),
        fetchers=8,
        delay_s=1.0,
    )
    return f"""
        WITH sched AS ({sched}),
        wl AS ({wl})
        SELECT s.doc_id, s.url, s.host, s.slot, s.seq, s.start_s, w.status
        FROM sched s JOIN wl w ON s.doc_id = w.doc_id
    """


def _crawl_plan_oracle() -> str:
    from docling_spark.ops.frontier import SLOT_SALT, crawl_plan_oracle_sql

    return crawl_plan_oracle_sql(
        _robotstxt_allow_oracle(),
        _robotstxt_delay_oracle(),
        _hash_frac_sql(SLOT_SALT, key="a.host"),
        fetchers=16,
        default_delay_s=1.0,
    )


def _cms_join_size_oracle() -> str:
    from docling_spark.ops.cms import cms_join_size_oracle_sql

    return cms_join_size_oracle_sql(
        "SELECT CAST(user_id AS VARCHAR) AS k FROM events",
        "SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders",
        key="k",
        d=4,
        w=256,
    )


def _cms_oracle() -> str:
    from docling_spark.ops.cms import cms_estimates_oracle_sql

    keys = """
        SELECT t.tok
        FROM documents d,
             UNNEST(string_split_regex(lower(d.text), '\\s+')) AS t(tok)
        WHERE length(t.tok) > 0"""
    probes = (
        "SELECT unnest(['the', 'value', 'table', 'spark', 'zzz-absent'])"
        " AS tok"
    )
    return cms_estimates_oracle_sql(keys, probes, key="tok", d=4, w=512)


def _hll_union_oracle() -> str:
    from docling_spark.ops.hll import hll_union_oracle_sql

    u = ("SELECT doc_id, 'https://u' || CAST(doc_id % 311 AS VARCHAR)"
         " AS url FROM documents")
    return hll_union_oracle_sql(
        f"SELECT url FROM ({u}) WHERE doc_id % 2 = 0",
        f"SELECT url FROM ({u}) WHERE doc_id % 2 = 1",
        f"SELECT url FROM ({u})",
        key="url",
        b=10,
    )


def _hll_oracle() -> str:
    from docling_spark.ops.hll import hll_cardinality_oracle_sql

    docs = """
        SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) || '.test' AS host,
               'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.test/p'
                 || CAST(doc_id % 137 AS VARCHAR) AS url
        FROM documents"""
    return hll_cardinality_oracle_sql(docs, "url", group_cols=["host"], b=10)


def _winnow_pairs_oracle() -> str:
    from docling_spark.ops.winnow import winnow_pairs_oracle_sql

    docs = (
        "SELECT doc_id, text FROM documents WHERE doc_id < 60 "
        "UNION ALL SELECT doc_id + 100000, text FROM documents "
        "WHERE doc_id < 50"
    )
    return winnow_pairs_oracle_sql(docs, k=5, w=4, min_shared=5)


def _url_patterns_oracle() -> str:
    return """
        WITH u AS (
          SELECT CASE
            WHEN doc_id % 3 = 0 THEN
              'https://trap.test/archive/' || CAST(2000 + doc_id % 25 AS VARCHAR)
              || '/' || CAST(1 + doc_id % 12 AS VARCHAR)
              || '/' || CAST(1 + doc_id % 28 AS VARCHAR) || '/index.html'
            WHEN doc_id % 11 = 1 THEN
              'https://sess.test/s/deadbeef'
              || lpad(CAST(doc_id * 7 AS VARCHAR), 8, '0') || '/view'
            ELSE 'https://site' || CAST(doc_id % 5 AS VARCHAR)
                 || '.test/page-' || CAST(doc_id AS VARCHAR)
          END AS url
          FROM documents
        ),
        p AS (
          SELECT lower(regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
                 regexp_replace(regexp_replace(
                   regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1),
                   '[0-9a-fA-F]{8,}', '{h}', 'g'),
                   '[0-9]+', '{n}', 'g') AS pattern
          FROM u
        ),
        d AS (
          SELECT host, pattern,
                 CAST(len(list_filter(string_split(
                   regexp_extract(pattern, '^([^?]*)', 1), '/'),
                   s -> s != '')) AS INT) AS depth
          FROM p
        )
        SELECT host, pattern, depth,
               count(*) AS n_urls,
               (count(*) >= 100 AND depth >= 4) AS is_trap
        FROM d GROUP BY host, pattern, depth
    """


def _crawl_frontier_oracle() -> str:
    from docling_spark.ops.frontier import (
        SLOT_SALT,
        schedule_frontier_oracle_sql,
    )

    return schedule_frontier_oracle_sql(
        _synth_urls_sql(),
        _hash_frac_sql(SLOT_SALT, key="host"),
        fetchers=16,
        delay_s=1.0,
    )


def _frontier_load_oracle() -> str:
    from docling_spark.ops.frontier import SLOT_SALT, frontier_load_oracle_sql

    return frontier_load_oracle_sql(
        _synth_urls_sql(),
        _hash_frac_sql(SLOT_SALT, key="host"),
        fetchers=16,
        delay_s=1.0,
        rate_rps=10.0,
    )


def _urlfilter_oracle() -> str:
    """DuckDB mirror of ops/urlfilter: same URL law, same gate order."""
    from docling_spark.ops import urlfilter as uf

    blocked = " OR ".join(
        f"host = '{d}' OR host LIKE '%.{d}'" for d in uf.DEFAULT_BLOCKED
    )
    hard = " + ".join(f"len(regexp_extract_all(lu, '{k}'))" for k in uf.HARD_KEYWORDS)
    soft = " + ".join(f"len(regexp_extract_all(lu, '{k}'))" for k in uf.SOFT_KEYWORDS)
    return f"""
        WITH u AS ({_synth_urls_sql()}),
        f AS (
          SELECT doc_id, url, lower(url) AS lu,
                 regexp_extract(lower(url),
                   '^[a-z]+://(?:[^/?#@]*@)?([^/?#:]+)', 1) AS host
          FROM u),
        g AS (
          SELECT doc_id, url, host,
            ({blocked}) AS blocked,
            {hard} AS hard,
            {soft} AS soft,
            len(list_filter(string_split(
              regexp_extract(lu, '^[a-z]+://[^/?#]+([^?#]*)', 1), '/'),
              s -> s != '')) AS depth,
            regexp_matches(lu, '\\d{{{uf.SPAM_DIGIT_RUN},}}') AS spam
          FROM f),
        r AS (
          SELECT doc_id, url, host,
            CASE WHEN url IS NULL OR host = '' THEN 'invalid_url'
                 WHEN blocked THEN 'blocked_domain'
                 WHEN hard >= 1 THEN 'hard_keyword'
                 WHEN soft >= 2 THEN 'soft_keywords'
                 WHEN spam THEN 'spam_query'
                 WHEN depth > {uf.MAX_PATH_DEPTH} THEN 'too_deep'
                 ELSE 'keep' END AS reason
          FROM g)
        SELECT doc_id, url, host, reason, reason = 'keep' AS keep FROM r
    """


# ------------------------------------------------------------------ oracles
_DUPS_CTE = (
    "WITH docs2 AS (SELECT * FROM documents UNION ALL "
    "SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars "
    "FROM documents WHERE doc_id < 50)"
)

_SHINGLE_SIG = """
SELECT d.doc_id, s.seed,
       min(md5(substring(d.text, g.i, 8) || ':' || s.seed)) AS minhash
FROM {src} d
CROSS JOIN (SELECT unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i, doc_id AS did
            FROM {src}) g
JOIN (SELECT unnest([{seeds}]) AS seed) s ON TRUE
WHERE g.did = d.doc_id
GROUP BY d.doc_id, s.seed
"""


def _minhash_sql(src: str, seeds: str) -> str:
    # distinct shingles per doc, then min(md5(sh||':'||seed)) per seed
    return f"""
WITH sh AS (
  SELECT DISTINCT d.doc_id, substring(d.text, g.i, 8) AS sh
  FROM {src} d, LATERAL (SELECT unnest(range(1, greatest(length(d.text) - 7, 1) + 1)) AS i) g
)
SELECT sh.doc_id, s.seed, min(md5(sh.sh || ':' || s.seed)) AS minhash
FROM sh CROSS JOIN (SELECT unnest([{seeds}]) AS seed) s
GROUP BY sh.doc_id, s.seed
"""


_SIMHASH_SQL = """
WITH words AS (
  SELECT DISTINCT d.doc_id, w.w
  FROM (SELECT * FROM documents WHERE doc_id < 50) d,
       LATERAL (SELECT unnest(string_split(d.text, ' ')) AS w) w
), h AS (SELECT doc_id, md5(w) AS h FROM words)
SELECT doc_id, {bits} AS simhash FROM h GROUP BY doc_id
"""


def _simhash_bits_sql(bits: int = 16) -> str:
    parts = []
    for b in range(bits):
        nib = f"strpos('0123456789abcdef', substring(h, {1 + b // 4}, 1)) - 1"
        bit = f"(CAST(floor(({nib}) / {2 ** (3 - b % 4)}) AS INTEGER) % 2)"
        parts.append(
            f"CASE WHEN sum(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) > 0 "
            f"THEN '1' ELSE '0' END"
        )
    return _SIMHASH_SQL.format(bits=" || ".join(parts))


def _lsh_bucket_sql(n_planes: int = 8, dim: int = 64) -> str:
    """DuckDB reconstruction of ann.hyperplane_buckets: the ±1 hyperplane
    weights are md5 parities (deterministic), precomputed here and inlined
    as literal DOUBLE[] lists; bucket bit p = sign of the signed sum."""
    import hashlib

    bits = []
    for p in range(n_planes):
        signs = [
            "1.0"
            if int(
                hashlib.md5(f"plane:{p}:{i}".encode()).hexdigest()[0], 16
            ) % 2 == 0
            else "-1.0"
            for i in range(dim)
        ]
        arr = "[" + ", ".join(signs) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
            f"CAST({arr} AS DOUBLE[])) >= 0 THEN '1' ELSE '0' END)"
        )
    bucket = " || ".join(bits)
    return f"""
        WITH b AS (SELECT vec_id, {bucket} AS bucket FROM embeddings)
        SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, a.bucket AS bucket
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    """


_STOP_HITS = " + ".join(
    "CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' {w} ', '')))"
    " / {n} AS BIGINT)".format(w=w, n=len(w) + 2)
    for w in textstats.STOPWORDS
)

_LANG_CONFUSION_SQL = f"""
    WITH pred AS (
      SELECT lang,
             CASE WHEN round(CAST({_STOP_HITS} AS DOUBLE)
                  / len(string_split(text, ' ')), 4) >= 0.05
                  THEN 'en' ELSE 'unknown' END AS lang_pred
      FROM documents
    ),
    cell AS (
      SELECT lang, lang_pred, count(*) AS n
      FROM pred GROUP BY lang, lang_pred
    ),
    tot AS (SELECT lang, sum(n) AS lang_total FROM cell GROUP BY lang)
    SELECT c.lang, c.lang_pred, c.n,
           CAST(c.n AS DOUBLE) / CAST(t.lang_total AS DOUBLE) AS rate
    FROM cell c JOIN tot t ON c.lang = t.lang
"""


def oracle_sql() -> dict[str, str]:
    synth_url = "'https://synth.test/doc/' || doc_id || '.html'"
    synth_url_deep = "'https://synth.test/doc/' || doc_id || '-deep.html'"
    from docling_spark.ops.bpe import merges_sql_values
    from docling_spark.ops.chunker import BPE_LITE_PATTERN

    bpe_sql = BPE_LITE_PATTERN.replace("'", "''")
    bpe_merges = merges_sql_values()
    synth_html = (
        "'<html><head><title>Doc ' || doc_id || '</title></head><body>' || chr(10) || "
        "'<h1>Document ' || doc_id || '</h1>' || chr(10) || "
        "'<p>' || text || '</p>' || chr(10) || "
        "'<ul><li>' || split_part(text, ' ', 1) || '</li><li>' || "
        "split_part(text, ' ', 2) || '</li><li>' || split_part(text, ' ', 3) || "
        "'</li></ul>' || chr(10) || "
        "'<table><tr><th>K</th><th>V</th></tr><tr><td>k' || "
        "lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '</td><td>v' || "
        "lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '</td></tr></table>' || "
        "chr(10) || '</body></html>'"
    )
    out = {
        "extract_pipeline": f"""
            SELECT {synth_url} AS url,
                   'success' AS status,
                   {SYNTH_MD_SQL} AS extracted_text,
                   length({SYNTH_MD_SQL}) AS n_chars,
                   sha256({synth_html}) AS doc_hash
            FROM documents
        """,
        "pdf_extract": """
            SELECT 'https://synth.test/doc/' || doc_id || '.pdf' AS url,
                   'success' AS status,
                   'Document ' || doc_id || chr(10) || chr(10) || text AS extracted_text,
                   length('Document ' || doc_id || chr(10) || chr(10) || text) AS n_chars
            FROM documents
        """,
        "pdf_encrypted": """
            SELECT 'https://synth.test/doc/' || doc_id || '-enc.pdf' AS url,
                   'with_password' AS attempt,
                   'success' AS status,
                   'Document ' || doc_id || chr(10) || chr(10) || text
                       AS extracted_text,
                   NULL AS error
            FROM documents
            UNION ALL
            SELECT 'https://synth.test/doc/' || doc_id || '-enc.pdf',
                   'no_password', 'failure', NULL,
                   'encrypted PDF: wrong or missing password'
            FROM documents
        """,
        "pdf_doctags": """
            SELECT 'https://synth.test/doc/' || doc_id || '-struct.pdf' AS url,
                   'success' AS status,
                   '<doctag><section_header_level_1>Document ' || doc_id
                   || '</section_header_level_1>' || chr(10)
                   || '<section_header_level_2>Section '
                   || split_part(text, ' ', 1)
                   || '</section_header_level_2>' || chr(10)
                   || '<unordered_list><list_item>'
                   || split_part(text, ' ', 1) || '</list_item>' || chr(10)
                   || '<list_item>' || split_part(text, ' ', 2)
                   || '</list_item>' || chr(10)
                   || '<list_item>' || split_part(text, ' ', 3)
                   || '</list_item>' || chr(10) || '</unordered_list>'
                   || chr(10)
                   || '<otsl><fcel>K<fcel>V<nl><fcel>k'
                   || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                   || '<fcel>v' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                   || '<nl></otsl>' || chr(10)
                   || '<text>' || text || '</text>' || chr(10)
                   || '</doctag>' AS doctags_nolocs
            FROM documents
        """,
        "structured_extract": """
            SELECT 'https://synth.test/doc/' || doc_id || '.pdf' AS url,
                   'success' AS status, 1 AS page_no,
                   'Document ' || doc_id || chr(10) || chr(10) || text
                       AS raw_text,
                   0 AS n_errors
            FROM documents
        """,
        "structured_fields": """
            SELECT 'https://synth.test/inv/' || doc_id || '.pdf' AS url,
                   'success' AS status, 1 AS page_no,
                   CAST(doc_id AS INTEGER) AS inv_no,
                   '2024-02-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                       AS inv_date,
                   CAST(CAST((doc_id * 37) % 9000 AS VARCHAR) || '.' ||
                        lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                        AS DOUBLE) AS total,
                   (doc_id % 2 = 0) AS paid,
                   CAST(NULL AS INTEGER) AS missing
            FROM documents
        """,
        "mixed_dispatch": """
            SELECT 'html' AS content_type, count(*) AS n FROM documents
            UNION ALL
            SELECT 'pdf' AS content_type, count(*) AS n FROM documents
            UNION ALL
            SELECT 'csv' AS content_type, count(*) AS n FROM documents
        """,
        "csv_extract": """
            SELECT 'https://synth.test/data/' || doc_id AS url,
                   'success' AS status, 'csv' AS content_type,
                   '| K   | V   |' || chr(10) || '|-----|-----|' || chr(10)
                   || '| k' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                   || ' | v' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                   || ' |' AS extracted_text
            FROM documents
        """,
        "format_dispatch": f"""
            SELECT {synth_url} AS url, 'html' AS content_type FROM documents
        """,
        "doc_hash": "SELECT doc_id, sha256(text) AS doc_hash FROM documents",
        "size_limits": f"""
            SELECT {synth_url} AS url,
                   CASE WHEN octet_length(encode({synth_html})) > 500
                        THEN 'oversize' ELSE 'html' END AS content_type,
                   CASE WHEN octet_length(encode({synth_html})) > 500
                        THEN 'skipped' ELSE 'success' END AS status
            FROM documents
        """,
        "spans_export": f"""
            WITH rows(idx, parent, kind, label, txt_kind, layer) AS (VALUES
              (0, -1, 'group', 'unspecified', 'none', 'body'),
              (1,  0, 'text',  'title',       'doc',  'furniture'),
              (2,  0, 'text',  'title',       'document', 'body'),
              (3,  2, 'text',  'text',        'fulltext', 'body'),
              (4,  2, 'group', 'list',        'none', 'body'),
              (5,  4, 'text',  'list_item',   'w1',   'body'),
              (6,  4, 'text',  'list_item',   'w2',   'body'),
              (7,  4, 'text',  'list_item',   'w3',   'body'),
              (8,  2, 'table', 'table',       'none', 'body'))
            SELECT {synth_url} AS url, r.idx, r.parent, r.kind, r.label,
                   CASE r.txt_kind
                     WHEN 'doc' THEN 'Doc ' || d.doc_id
                     WHEN 'document' THEN 'Document ' || d.doc_id
                     WHEN 'fulltext' THEN d.text
                     WHEN 'w1' THEN split_part(d.text, ' ', 1)
                     WHEN 'w2' THEN split_part(d.text, ' ', 2)
                     WHEN 'w3' THEN split_part(d.text, ' ', 3)
                     ELSE NULL END AS text,
                   r.layer
            FROM documents d CROSS JOIN rows r
        """,
        "span_offsets": f"""
            WITH m AS (
              SELECT doc_id, text,
                     length(CAST(doc_id AS VARCHAR)) AS L,
                     length(text) AS T,
                     length(split_part(text, ' ', 1)) AS W1,
                     length(split_part(text, ' ', 2)) AS W2,
                     length(split_part(text, ' ', 3)) AS W3
              FROM documents
            ),
            rows AS (
              SELECT doc_id, 2 AS idx, 'title' AS label,
                     0 AS s, 11 + L AS e FROM m
              UNION ALL
              SELECT doc_id, 3, 'text', 13 + L, 13 + L + T FROM m
              UNION ALL
              SELECT doc_id, 5, 'list_item', 15 + L + T,
                     15 + L + T + 2 + W1 FROM m
              UNION ALL
              SELECT doc_id, 6, 'list_item', 18 + L + T + W1,
                     18 + L + T + W1 + 2 + W2 FROM m
              UNION ALL
              SELECT doc_id, 7, 'list_item', 21 + L + T + W1 + W2,
                     21 + L + T + W1 + W2 + 2 + W3 FROM m
              UNION ALL
              -- github table: both columns pad to width 3 (K/V vs kNN/vNN),
              -- three 13-char lines + 2 newlines = 41 chars
              SELECT doc_id, 8, 'table', 25 + L + T + W1 + W2 + W3,
                     25 + L + T + W1 + W2 + W3 + 41 FROM m
            )
            SELECT {synth_url} AS url, idx, label,
                   CAST(s AS INTEGER) AS char_start,
                   CAST(e AS INTEGER) AS char_end
            FROM rows
        """,
        "chunk_spans": f"""
            SELECT {synth_url} AS url, 3 AS span_idx,
                   'Document ' || doc_id AS heading, text AS chunk_text
            FROM documents
            UNION ALL
            SELECT {synth_url}, CAST(4 + g.k AS INTEGER), 'Document ' || doc_id,
                   split_part(text, ' ', g.k)
            FROM documents, LATERAL (SELECT unnest(range(1, 4)) AS k) g
            UNION ALL
            -- deep-nesting corpus: body text under the h1 title...
            SELECT {synth_url_deep}, 3, 'Document ' || doc_id, text
            FROM documents
            UNION ALL
            -- ...and 3-level nested list items whose nearest heading is the
            -- h2 section, 2/4/6 parent links up (span idxs 6, 8, 10)
            SELECT {synth_url_deep}, CAST(4 + 2 * g.k AS INTEGER),
                   'Section ' || doc_id, split_part(text, ' ', g.k)
            FROM documents, LATERAL (SELECT unnest(range(1, 4)) AS k) g
        """,
        "doctags_export": f"""
            SELECT {synth_url} AS url,
                   'success' AS status,
                   '<doctag><title>Doc ' || doc_id || '</title>' || chr(10) ||
                   '<title>Document ' || doc_id || '</title>' || chr(10) ||
                   '<text>' || text || '</text>' || chr(10) ||
                   '<unordered_list><list_item>' || split_part(text, ' ', 1) ||
                   '</list_item>' || chr(10) ||
                   '<list_item>' || split_part(text, ' ', 2) || '</list_item>' ||
                   chr(10) ||
                   '<list_item>' || split_part(text, ' ', 3) || '</list_item>' ||
                   chr(10) || '</unordered_list>' || chr(10) ||
                   '<otsl><ched>K<ched>V<nl><fcel>k' ||
                   lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '<fcel>v' ||
                   lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
                   '<nl></otsl>' || chr(10) || '</doctag>' AS doctags
            FROM documents
        """,
        "doc_json": f"""
            SELECT {synth_url} AS url,
                   'DoclingDocument' AS schema_name,
                   '1.7.0' AS version,
                   CAST(doc_id AS VARCHAR) AS doc_name,
                   doc_id || '.html' AS filename,
                   'Document ' || doc_id AS h1_text,
                   6 AS n_texts,
                   1 AS n_tables,
                   1 AS n_groups
            FROM documents
        """,
        "table_cells": f"""
            SELECT {synth_url} AS url,
                   2 AS num_rows, 2 AS num_cols,
                   'K' AS c00, 'V' AS c01,
                   'k' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS c10,
                   'v' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS c11,
                   TRUE AS h00, FALSE AS h10
            FROM documents
        """,
        "warc_extract": f"""
            SELECT {synth_url} AS url,
                   'success' AS status,
                   {SYNTH_MD_SQL} AS extracted_text,
                   sha256({synth_html}) AS doc_hash
            FROM documents
        """,
        "pdf_pictures": """
            -- image k of doc: placed at (72+20k, 100+30k), display size
            -- (100+10k, 50+5k), pixel dims (8*(1+(doc_id+k)%4), 8),
            -- alternating DCTDecode (real JPEG) / FlateDecode
            SELECT d.doc_id,
                   CAST(k.k AS INTEGER) AS pic_idx,
                   1 AS page,
                   CAST(72 + 20 * k.k AS DOUBLE) AS x0,
                   CAST(100 + 30 * k.k AS DOUBLE) AS y0,
                   CAST(172 + 30 * k.k AS DOUBLE) AS x1,
                   CAST(150 + 35 * k.k AS DOUBLE) AS y1,
                   CAST(8 * (1 + (d.doc_id + k.k) % 4) AS INTEGER)
                       AS px_width,
                   8 AS px_height,
                   CASE WHEN k.k % 2 = 0 THEN 'DCTDecode'
                        ELSE 'FlateDecode' END AS filter
            FROM documents d,
                 LATERAL (SELECT unnest(range(0, 1 + d.doc_id % 3)) AS k) k
        """,
        "pdf_spans": """
            SELECT 'https://synth.test/doc/' || doc_id || '.pdf' AS url,
                   0 AS idx, -1 AS parent, 'Document ' || doc_id AS text,
                   'section_header' AS label, 1 AS level
            FROM documents
            UNION ALL
            SELECT 'https://synth.test/doc/' || doc_id || '.pdf',
                   1, 0, text, 'text', NULL
            FROM documents
        """,
        "pdf_struct_spans": """
            WITH rows(idx, parent, kind, label, level, marker,
                      num_rows, num_cols, tkind) AS (VALUES
              (0, -1, 'text',  'section_header', 1,    NULL, NULL, NULL, 'doc'),
              (1,  0, 'text',  'section_header', 2,    NULL, NULL, NULL, 'sec'),
              (2,  1, 'text',  'list_item',      NULL, '-',  NULL, NULL, 'w1'),
              (3,  1, 'text',  'list_item',      NULL, '-',  NULL, NULL, 'w2'),
              (4,  1, 'text',  'list_item',      NULL, '-',  NULL, NULL, 'w3'),
              (5,  1, 'table', 'table',          NULL, NULL, 2,    2,    'tbl'),
              (6,  1, 'text',  'text',           NULL, NULL, NULL, NULL, 'body'))
            SELECT 'https://synth.test/doc/' || d.doc_id || '-struct.pdf' AS url,
                   r.idx, r.parent, r.kind, r.label, r.level, r.marker,
                   r.num_rows, r.num_cols,
                   CASE r.tkind
                     WHEN 'doc' THEN 'Document ' || d.doc_id
                     WHEN 'sec' THEN 'Section ' || split_part(d.text, ' ', 1)
                     WHEN 'w1'  THEN split_part(d.text, ' ', 1)
                     WHEN 'w2'  THEN split_part(d.text, ' ', 2)
                     WHEN 'w3'  THEN split_part(d.text, ' ', 3)
                     WHEN 'tbl' THEN 'K V k' || lpad(CAST(d.doc_id % 100 AS VARCHAR), 2, '0')
                                  || ' v' || lpad(CAST(d.doc_id % 100 AS VARCHAR), 2, '0')
                     WHEN 'body' THEN d.text END AS text
            FROM documents d CROSS JOIN rows r
        """,
        "md_extract": """
            SELECT 'https://synth.test/doc/' || doc_id || '.md' AS url,
                   'success' AS status, 'md' AS content_type,
                   '# Document ' || doc_id || chr(10) || chr(10) || text
                   || chr(10) || chr(10)
                   || '- ' || split_part(text, ' ', 1) || chr(10)
                   || '- ' || split_part(text, ' ', 2) || chr(10)
                   || '- ' || split_part(text, ' ', 3) AS extracted_text
            FROM documents
        """,
        "doctags_extract": """
            SELECT 'https://synth.test/doc/' || doc_id || '.doctags.txt' AS url,
                   'success' AS status, 'doctags' AS content_type,
                   '# Document ' || doc_id || chr(10) || chr(10) || text
                   || chr(10) || chr(10)
                   || '- ' || split_part(text, ' ', 1) || chr(10)
                   || '- ' || split_part(text, ' ', 2) || chr(10)
                   || '- ' || split_part(text, ' ', 3) || chr(10) || chr(10)
                   || '| K   | V   |' || chr(10) || '|-----|-----|' || chr(10)
                   || '| k' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                   || ' | v' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                   || ' |' AS extracted_text
            FROM documents
        """,
        "ofd_extract": """
            -- last paragraph is GLYPH-ENCODED in the container (PUA
            -- TextCode + CGTransform glyph ids through the embedded font):
            -- its presence here value-checks the ofd_glyphs cmap decode
            SELECT 'https://synth.test/doc/' || doc_id || '.ofd' AS url,
                   'success' AS status, 'ofd' AS content_type,
                   '# Document ' || doc_id || chr(10) || chr(10) || text
                   || chr(10) || chr(10) || 'sealed v'
                   || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                       AS extracted_text
            FROM documents
        """,
        "asciidoc_extract": """
            SELECT 'https://synth.test/doc/' || doc_id || '.adoc' AS url,
                   'success' AS status, 'asciidoc' AS content_type,
                   '# Document ' || doc_id || chr(10) || chr(10) || text
                   || chr(10) || chr(10)
                   || '- ' || split_part(text, ' ', 1) || chr(10)
                   || '- ' || split_part(text, ' ', 2) AS extracted_text
            FROM documents
        """,
        "docx_extract": """
            SELECT 'https://synth.test/doc/' || doc_id || '.docx' AS url,
                   'success' AS status, 'docx' AS content_type,
                   '# Document ' || doc_id || chr(10) || chr(10) || text
                       AS extracted_text
            FROM documents
        """,
        "xlsx_extract": """
            SELECT 'https://synth.test/doc/' || doc_id || '.xlsx' AS url,
                   'success' AS status, 'xlsx' AS content_type,
                   '| K   | V   |' || chr(10) || '|-----|-----|' || chr(10)
                   || '| k' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                   || ' | v' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                   || ' |' AS extracted_text
            FROM documents
        """,
        "uspto_extract": """
            SELECT 'https://synth.test/doc/' || doc_id || '.uspto.xml' AS url,
                   'success' AS status, 'uspto' AS content_type,
                   '# DOCUMENT ' || doc_id || chr(10) || chr(10)
                   || '### ABSTRACT' || chr(10) || chr(10) || text
                   || chr(10) || chr(10) || '### CLAIMS' || chr(10) || chr(10)
                   || split_part(text, ' ', 1) || ' claim' AS extracted_text
            FROM documents
        """,
        "pdf_chunks": """
            WITH ch(span_idx, tkind) AS (VALUES
              (2, 'w1'), (3, 'w2'), (4, 'w3'), (6, 'body'))
            SELECT 'https://synth.test/doc/' || d.doc_id || '-struct.pdf' AS url,
                   c.span_idx,
                   'Section ' || split_part(d.text, ' ', 1) AS heading,
                   CASE c.tkind
                     WHEN 'w1' THEN split_part(d.text, ' ', 1)
                     WHEN 'w2' THEN split_part(d.text, ' ', 2)
                     WHEN 'w3' THEN split_part(d.text, ' ', 3)
                     WHEN 'body' THEN d.text END AS chunk_text
            FROM documents d CROSS JOIN ch c
        """,
        "chunk_pack": f"""
            WITH chunks AS (
              SELECT {synth_url} AS url, 3 AS span_idx, text AS chunk_text
              FROM documents
              UNION ALL
              SELECT {synth_url}, 4 + g.k, split_part(text, ' ', g.k)
              FROM documents, LATERAL (SELECT unnest(range(1, 4)) AS k) g
            ),
            t AS (
              SELECT url, span_idx, chunk_text,
                     len(string_split(chunk_text, ' ')) AS n_tokens
              FROM chunks),
            c AS (
              SELECT *, sum(n_tokens) OVER (PARTITION BY url ORDER BY span_idx
                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
            SELECT url, CAST((cum0 - 1) // 16 AS INTEGER) AS pack_id,
                   count(*) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   string_agg(chunk_text, ' ' ORDER BY span_idx) AS packed_text
            FROM (SELECT *, cum AS cum0 FROM c)
            GROUP BY url, CAST((cum0 - 1) // 16 AS INTEGER)
        """,
        "chunk_pack_bpe_full": f"""
            WITH RECURSIVE
            chunks AS (
              SELECT {synth_url} AS url, 3 AS span_idx,
                     text || ', it''s #3' AS chunk_text
              FROM documents
              UNION ALL
              SELECT {synth_url}, 4 + g.k,
                     split_part(text, ' ', g.k) || ', it''s #' || (4 + g.k)
              FROM documents, LATERAL (SELECT unnest(range(1, 4)) AS k) g
            ),
            pt AS (
              SELECT url, span_idx,
                     unnest(regexp_extract_all(chunk_text, '{bpe_sql}')) AS tok
              FROM chunks
            ),
            words AS (SELECT DISTINCT tok FROM pt),
            -- the frozen merges table (DATA: deterministic function of the
            -- in-repo seed corpus, ops/bpe.py FROZEN_MERGES)
            m(a, b, rank) AS (SELECT * FROM (VALUES {bpe_merges}) t(a, b, rank)),
            seed AS (
              SELECT tok,
                     list_transform(range(1, length(tok) + 1),
                                    i -> substr(tok, CAST(i AS INTEGER), 1))
                         AS toks
              FROM words
            ),
            -- HF-style BPE application, independently re-evaluated: each
            -- step merges the LEFTMOST occurrence of the LOWEST-RANK
            -- adjacent pair; fixpoint when no adjacent pair is in m
            bpe AS (
              SELECT tok, toks FROM seed
              UNION ALL
              SELECT b.tok,
                     list_slice(b.toks, 1, best.i - 1)
                     || [b.toks[best.i] || b.toks[best.i + 1]]
                     || list_slice(b.toks, best.i + 2, len(b.toks))
              FROM bpe b, LATERAL (
                 SELECT p.i AS i
                 FROM (SELECT unnest(range(1, len(b.toks))) AS i) p
                 JOIN m ON m.a = b.toks[p.i] AND m.b = b.toks[p.i + 1]
                 ORDER BY m.rank, p.i
                 LIMIT 1
              ) best
            ),
            counts AS (SELECT tok, min(len(toks)) AS n FROM bpe GROUP BY tok),
            t AS (
              SELECT ch.url, ch.span_idx, any_value(ch.chunk_text) AS chunk_text,
                     CAST(sum(c.n) AS BIGINT) AS n_tokens
              FROM (SELECT url, span_idx,
                           unnest(regexp_extract_all(chunk_text, '{bpe_sql}')) AS tok,
                           chunk_text
                    FROM chunks) ch
              JOIN counts c ON c.tok = ch.tok
              GROUP BY ch.url, ch.span_idx
            ),
            c AS (
              SELECT *, sum(n_tokens) OVER (PARTITION BY url ORDER BY span_idx
                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
            SELECT url, CAST((cum - 1) // 16 AS INTEGER) AS pack_id,
                   count(*) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   string_agg(chunk_text, ' ' ORDER BY span_idx) AS packed_text
            FROM c
            GROUP BY url, CAST((cum - 1) // 16 AS INTEGER)
        """,
        "chunk_pack_bpe": f"""
            WITH chunks AS (
              SELECT {synth_url} AS url, 3 AS span_idx,
                     text || ', it''s #3' AS chunk_text
              FROM documents
              UNION ALL
              SELECT {synth_url}, 4 + g.k,
                     split_part(text, ' ', g.k) || ', it''s #' || (4 + g.k)
              FROM documents, LATERAL (SELECT unnest(range(1, 4)) AS k) g
            ),
            t AS (
              SELECT url, span_idx, chunk_text,
                     len(regexp_extract_all(chunk_text, '{bpe_sql}')) AS n_tokens
              FROM chunks),
            c AS (
              SELECT *, sum(n_tokens) OVER (PARTITION BY url ORDER BY span_idx
                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
            SELECT url, CAST((cum - 1) // 16 AS INTEGER) AS pack_id,
                   count(*) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   string_agg(chunk_text, ' ' ORDER BY span_idx) AS packed_text
            FROM c
            GROUP BY url, CAST((cum - 1) // 16 AS INTEGER)
        """,
        "mm_image_meta": """
            SELECT doc_id,
                   CAST(16 + doc_id % 32 AS INTEGER) AS width,
                   CAST(8 + doc_id % 16 AS INTEGER) AS height,
                   CAST(1 + doc_id % 3 AS INTEGER) AS channels,
                   (16 + doc_id % 32) * (8 + doc_id % 16) * (1 + doc_id % 3) AS n_bytes
            FROM documents
        """,
        "mm_image_features": """
            SELECT doc_id,
                   CAST(doc_id % 251 AS DOUBLE) AS mean_px,
                   CAST(doc_id % 251 AS INTEGER) AS min_px,
                   CAST(doc_id % 251 AS INTEGER) AS max_px
            FROM documents
        """,
        "mm_resize": """
            SELECT doc_id,
                   CAST(greatest((16 + doc_id % 32) // 2, 1) AS INTEGER) AS width,
                   CAST(greatest((8 + doc_id % 16) // 2, 1) AS INTEGER) AS height,
                   CAST(doc_id % 251 AS DOUBLE) AS mean_px
            FROM documents
        """,
        "mm_codecs": """
            -- PNG pixel law: px(x,y) = (doc_id + x) % 256 (rows identical)
            -- JPEG pixel law: px(x,y) = (doc_id + 16 * (x // 8)) % 256
            -- GIF: frames k=0,2,..; frame_px0 = (doc_id + k) % 256
            SELECT d.doc_id,
                   CAST(16 + d.doc_id % 32 AS INTEGER) AS width,
                   CAST(8 + d.doc_id % 16 AS INTEGER) AS height,
                   1 AS channels,
                   (16 + d.doc_id % 32) * (8 + d.doc_id % 16) AS n_bytes,
                   (SELECT avg((d.doc_id + x.k) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x
                   ) AS f_mean_px,
                   CAST((SELECT min((d.doc_id + x.k) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x
                   ) AS INTEGER) AS f_min_px,
                   CAST((SELECT max((d.doc_id + x.k) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x
                   ) AS INTEGER) AS f_max_px,
                   CAST(greatest((16 + d.doc_id % 32) // 2, 1) AS INTEGER)
                       AS r_width,
                   CAST(greatest((8 + d.doc_id % 16) // 2, 1) AS INTEGER)
                       AS r_height,
                   (SELECT avg((d.doc_id + 2 * x.k) % 256)
                    FROM (SELECT unnest(range(0,
                           greatest((16 + d.doc_id % 32) // 2, 1))) AS k) x
                   ) AS r_mean_px,
                   CAST(16 + d.doc_id % 32 AS INTEGER) AS j_width,
                   CAST(8 + d.doc_id % 16 AS INTEGER) AS j_height,
                   (16 + d.doc_id % 32) * (8 + d.doc_id % 16) AS j_bytes,
                   (SELECT avg((d.doc_id + 16 * (x.k // 8)) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x
                   ) AS j_mean_px,
                   CAST((SELECT min((d.doc_id + 16 * (x.k // 8)) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x
                   ) AS INTEGER) AS j_min_px,
                   CAST((SELECT max((d.doc_id + 16 * (x.k // 8)) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x
                   ) AS INTEGER) AS j_max_px,
                   CAST(8000 + (d.doc_id % 3) * 4000 AS INTEGER) AS rate,
                   CAST(1000 + (d.doc_id % 97) * 100 AS INTEGER) AS n_samples,
                   round((1000 + (d.doc_id % 97) * 100) * 1000.0
                         / (8000 + (d.doc_id % 3) * 4000), 4) AS duration_ms,
                   -- PCM16 sample law: s_i = ((doc_id*7 + i) % 2001) - 1000
                   (SELECT avg(((d.doc_id * 7 + i.i) % 2001) - 1000)
                    FROM (SELECT unnest(range(0,
                           1000 + (d.doc_id % 97) * 100)) AS i) i
                   ) AS a_mean,
                   CAST((SELECT max(abs(((d.doc_id * 7 + i.i) % 2001) - 1000))
                    FROM (SELECT unnest(range(0,
                           1000 + (d.doc_id % 97) * 100)) AS i) i
                   ) AS INTEGER) AS a_peak,
                   round((SELECT sqrt(avg(
                           (((d.doc_id * 7 + i.i) % 2001) - 1000)
                           * (((d.doc_id * 7 + i.i) % 2001) - 1000)))
                    FROM (SELECT unnest(range(0,
                           1000 + (d.doc_id % 97) * 100)) AS i) i
                   ), 6) AS a_rms,
                   CAST((4 + d.doc_id % 12 + 1) // 2 AS INTEGER) AS g_frames,
                   ((4 + d.doc_id % 12 + 1) // 2)
                       * (8 + d.doc_id % 8) * (8 + (d.doc_id // 2) % 8)
                       AS g_bytes,
                   CAST(d.doc_id % 256 AS INTEGER) AS g_px0,
                   -- APNG twin: same _vid_params + pixel law as the GIF
                   CAST((4 + d.doc_id % 12 + 1) // 2 AS INTEGER) AS ap_frames,
                   ((4 + d.doc_id % 12 + 1) // 2)
                       * (8 + d.doc_id % 8) * (8 + (d.doc_id // 2) % 8)
                       AS ap_bytes,
                   CAST(d.doc_id % 256 AS INTEGER) AS ap_px0,
                   CAST(1 + d.doc_id % 3 AS INTEGER) AS t_pages,
                   CAST(16 + d.doc_id % 32 AS INTEGER) AS t_width,
                   CAST(8 + d.doc_id % 16 AS INTEGER) AS t_height,
                   (SELECT avg((d.doc_id + x.k + y.j) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x,
                         (SELECT unnest(range(0, 8 + d.doc_id % 16)) AS j) y
                   ) AS t_mean0,
                   round((SELECT sum(sub.pm) FROM (
                      SELECT (SELECT avg((d.doc_id + x.k + y.j + 128 * pp.p)
                                         % 256)
                              FROM (SELECT unnest(range(0, 16 + d.doc_id % 32))
                                    AS k) x,
                                   (SELECT unnest(range(0, 8 + d.doc_id % 16))
                                    AS j) y) AS pm
                      FROM (SELECT unnest(range(0, 1 + d.doc_id % 3)) AS p) pp
                    ) sub), 6) AS t_mean_sum,
                   CAST(16 + d.doc_id % 32 AS INTEGER) AS s_bmp_width,
                   CAST(8 + d.doc_id % 16 AS INTEGER) AS s_bmp_height,
                   3 AS s_bmp_channels,
                   CAST(16 + d.doc_id % 32 AS INTEGER) AS s_webp_width,
                   CAST(8 + d.doc_id % 16 AS INTEGER) AS s_webp_height,
                   CAST(3 + d.doc_id % 2 AS INTEGER) AS s_webp_channels,
                   -- MP4 law (ops/mp4.py): ts 600, dur units
                   -- 600*(3+id%27)+id%7, trak dims, brand cycle
                   list_extract(['isom', 'mp42', 'avc1'],
                                CAST(d.doc_id % 3 AS INTEGER) + 1) AS m_brand,
                   (600 * (3 + d.doc_id % 27) + d.doc_id % 7) * 1000 // 600
                       AS m_duration_ms,
                   CAST(160 + 16 * (d.doc_id % 20) AS INTEGER) AS m_width,
                   CAST(120 + 16 * (d.doc_id % 15) AS INTEGER) AS m_height,
                   CAST(1 + d.doc_id % 2 AS INTEGER) AS m_tracks,
                   -- r5 PCM-in-MP4 law (ops/mp4.build_mp4_pcm): rate 8000,
                   -- n = 64 + id%64, s_i = ((id*31 + i*7) % 65536) - 32768
                   8000 AS p_rate,
                   CAST(64 + d.doc_id % 64 AS INTEGER) AS p_n,
                   (SELECT avg(((d.doc_id * 31 + i.i * 7) % 65536) - 32768)
                    FROM (SELECT unnest(range(0, 64 + d.doc_id % 64)) AS i) i
                   ) AS p_mean,
                   CAST((SELECT max(abs(((d.doc_id * 31 + i.i * 7) % 65536)
                                        - 32768))
                    FROM (SELECT unnest(range(0, 64 + d.doc_id % 64)) AS i) i
                   ) AS INTEGER) AS p_peak,
                   round((SELECT sqrt(avg(
                           CAST(((d.doc_id * 31 + i.i * 7) % 65536) - 32768
                                AS DOUBLE)
                           * (((d.doc_id * 31 + i.i * 7) % 65536) - 32768)))
                    FROM (SELECT unnest(range(0, 64 + d.doc_id % 64)) AS i) i
                   ), 6) AS p_rms
            FROM documents d
        """,
        "mm_png_ops": """
            SELECT d.doc_id,
                   CAST(16 + d.doc_id % 32 AS INTEGER) AS width,
                   CAST(8 + d.doc_id % 16 AS INTEGER) AS height,
                   1 AS channels,
                   (16 + d.doc_id % 32) * (8 + d.doc_id % 16) AS n_bytes,
                   (SELECT avg((d.doc_id + x.k) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x
                   ) AS f_mean_px,
                   CAST((SELECT min((d.doc_id + x.k) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x
                   ) AS INTEGER) AS f_min_px,
                   CAST((SELECT max((d.doc_id + x.k) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x
                   ) AS INTEGER) AS f_max_px,
                   CAST(greatest((16 + d.doc_id % 32) // 2, 1) AS INTEGER)
                       AS r_width,
                   CAST(greatest((8 + d.doc_id % 16) // 2, 1) AS INTEGER)
                       AS r_height,
                   (SELECT avg((d.doc_id + 2 * x.k) % 256)
                    FROM (SELECT unnest(range(0,
                           greatest((16 + d.doc_id % 32) // 2, 1))) AS k) x
                   ) AS r_mean_px
            FROM documents d
        """,
        "mm_png_meta": """
            SELECT doc_id,
                   CAST(16 + doc_id % 32 AS INTEGER) AS width,
                   CAST(8 + doc_id % 16 AS INTEGER) AS height,
                   1 AS channels,
                   (16 + doc_id % 32) * (8 + doc_id % 16) AS n_bytes
            FROM documents
        """,
        "mm_png_features": """
            -- pixel(x,y) = (doc_id + x) % 256, rows identical
            SELECT d.doc_id,
                   (SELECT avg((d.doc_id + x.k) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x
                   ) AS mean_px,
                   CAST((SELECT min((d.doc_id + x.k) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x
                   ) AS INTEGER) AS min_px,
                   CAST((SELECT max((d.doc_id + x.k) % 256)
                    FROM (SELECT unnest(range(0, 16 + d.doc_id % 32)) AS k) x
                   ) AS INTEGER) AS max_px
            FROM documents d
        """,
        "mm_png_resize": """
            -- nearest-neighbor keeps columns 0,2,4,... -> (doc_id + 2k) % 256
            SELECT d.doc_id,
                   CAST(greatest((16 + d.doc_id % 32) // 2, 1) AS INTEGER)
                       AS width,
                   CAST(greatest((8 + d.doc_id % 16) // 2, 1) AS INTEGER)
                       AS height,
                   (SELECT avg((d.doc_id + 2 * x.k) % 256)
                    FROM (SELECT unnest(range(0,
                           greatest((16 + d.doc_id % 32) // 2, 1))) AS k) x
                   ) AS mean_px
            FROM documents d
        """,
        "mm_gif_frames": """
            SELECT d.doc_id,
                   CAST(k.k AS INTEGER) AS frame_idx,
                   (8 + d.doc_id % 8) * (8 + (d.doc_id // 2) % 8) AS frame_bytes,
                   CAST((d.doc_id + k.k) % 256 AS INTEGER) AS first_px
            FROM documents d,
                 LATERAL (SELECT unnest(range(0, 4 + d.doc_id % 12, 2)) AS k) k
        """,
        "mm_frame_sample": """
            SELECT d.doc_id,
                   CAST(k.k AS INTEGER) AS frame_idx,
                   (8 + d.doc_id % 8) * (8 + (d.doc_id // 2) % 8) AS frame_bytes,
                   CAST((d.doc_id + k.k) % 256 AS INTEGER) AS first_px
            FROM documents d,
                 LATERAL (SELECT unnest(range(0, 4 + d.doc_id % 12, 2)) AS k) k
        """,
        "mm_audio_meta": """
            SELECT doc_id,
                   CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS rate,
                   CAST(1000 + (doc_id % 97) * 100 AS INTEGER) AS n_samples,
                   round((1000 + (doc_id % 97) * 100) * 1000.0
                         / (8000 + (doc_id % 3) * 4000), 4) AS duration_ms
            FROM documents
        """,
        "mm_sniff_meta": """
            SELECT d.doc_id, f.fmt AS format,
                   CAST(16 + d.doc_id % 32 AS INTEGER) AS width,
                   CAST(8 + d.doc_id % 16 AS INTEGER) AS height,
                   CAST(CASE WHEN f.fmt = 'png' THEN 1 ELSE 3 END AS INTEGER)
                       AS channels
            FROM documents d,
                 (SELECT unnest(['png', 'jpeg', 'gif', 'bmp']) AS fmt) f
        """,
        "mm_wav_meta": """
            SELECT doc_id,
                   CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS rate,
                   CAST(1000 + (doc_id % 97) * 100 AS INTEGER) AS n_samples,
                   round((1000 + (doc_id % 97) * 100) * 1000.0
                         / (8000 + (doc_id % 3) * 4000), 4) AS duration_ms
            FROM documents
        """,
        "curate": f"""
            WITH paired AS (
              SELECT {synth_url} AS url, doc_id, lang, text, 0 AS v
              FROM documents
              UNION ALL
              SELECT 'https://synth.test/doc/' || doc_id || '-v1.html',
                     doc_id, lang, text, 1
              FROM documents
            ),
            t AS (
              SELECT url, lang,
                     len(string_split({SYNTH_MD_SQL}, ' ')) AS n_tokens,
                     row_number() OVER (PARTITION BY doc_id ORDER BY url)
                         AS rn
              FROM paired
            )
            SELECT url,
                   (CASE WHEN rn > 1 THEN 'duplicate'
                         WHEN lang <> 'en' THEN 'wrong_lang'
                         WHEN n_tokens < 35 THEN 'too_short'
                         ELSE 'ok' END) = 'ok' AS keep,
                   CASE WHEN rn > 1 THEN 'duplicate'
                        WHEN lang <> 'en' THEN 'wrong_lang'
                        WHEN n_tokens < 35 THEN 'too_short'
                        ELSE 'ok' END AS reason,
                   CAST(n_tokens AS INTEGER) AS n_tokens
            FROM t
        """,
        "gopher_quality": _webtext_oracle_sql(),
        "c4_clean": _c4_oracle("clean"),
        "c4_span_dedup": _c4_oracle("span"),
        "c4_span_removal": _c4_oracle("removal"),
        "substr_dedup": _substr_oracle(),
        "dsir_weights": _dsir_oracle(),
        "text_normalize": _normalize_oracle(),
        "pii_scrub": _pii_oracle(),
        "domain_cap": """
            WITH c AS (
              SELECT 'https://d' || (doc_id % 23) || '.example.org/p/'
                     || doc_id AS url,
                     TIMESTAMP '2024-01-01 00:00:00'
                     + (doc_id % 97) * INTERVAL 1 HOUR AS warc_ts
              FROM documents),
            r AS (
              SELECT url,
                     regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS domain,
                     row_number() OVER (
                       PARTITION BY regexp_extract(url, '^[a-z]+://([^/]+)', 1)
                       ORDER BY warc_ts DESC, url) AS rank
              FROM c)
            SELECT url, domain, rank, rank <= 3 AS kept FROM r
        """,
        "url_filter": _urlfilter_oracle(),
        "url_patterns": _url_patterns_oracle(),
        "crawl_frontier": _crawl_frontier_oracle(),
        "frontier_load": _frontier_load_oracle(),
        "mix_matrix": """
            WITH cell AS (
              SELECT lang, source, count(*) AS n_docs,
                     CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
              FROM documents GROUP BY lang, source
            ),
            lt AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT)
                     AS lang_tokens FROM cell GROUP BY lang),
            ct AS (SELECT CAST(sum(n_tokens) AS BIGINT)
                     AS corpus_tokens FROM cell)
            SELECT c.lang, c.source, c.n_docs, c.n_tokens,
                   CAST(c.n_tokens AS DOUBLE) / lt.lang_tokens
                     AS share_of_lang,
                   CAST(c.n_tokens AS DOUBLE) / ct.corpus_tokens
                     AS share_of_corpus
            FROM cell c JOIN lt ON c.lang = lt.lang, ct
        """,
        "epoch_schedule": """
            WITH w AS (
              SELECT source,
                     1.0 + CAST(CAST(substring(source, 4, 10) AS BIGINT) % 4
                                AS DOUBLE) AS weight
              FROM (SELECT DISTINCT source FROM documents)
            ),
            ws AS (SELECT sum(weight) AS wsum FROM w),
            dim AS (SELECT source, weight / wsum AS weight_norm FROM w, ws),
            supply AS (
              SELECT source, count(*) AS n_docs,
                     CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
              FROM documents GROUP BY source
            )
            SELECT s.source, s.n_docs, s.n_tokens, d.weight_norm,
                   500000.0 * d.weight_norm AS target_tokens,
                   least(500000.0 * d.weight_norm
                           / CAST(s.n_tokens AS DOUBLE), 4.0) AS epochs,
                   CAST(s.n_tokens AS DOUBLE)
                     * least(500000.0 * d.weight_norm
                               / CAST(s.n_tokens AS DOUBLE), 4.0)
                     AS tokens_served,
                   greatest(500000.0 * d.weight_norm
                     - CAST(s.n_tokens AS DOUBLE)
                       * least(500000.0 * d.weight_norm
                                 / CAST(s.n_tokens AS DOUBLE), 4.0),
                     0.0) AS token_deficit
            FROM supply s JOIN dim d ON s.source = d.source
        """,
        "shard_plan": _shard_plan_oracle(),
        "domain_buckets": _domain_buckets_oracle(),
        "robotstxt_allow": _robotstxt_allow_oracle(),
        "robotstxt_delay": _robotstxt_delay_oracle(),
        "frontier_incremental": _frontier_incremental_oracle(),
        "crawl_plan": _crawl_plan_oracle(),
        "sitemap_discovery": _sitemap_discovery_oracle(),
        "sitemap_entries": _sitemap_entries_oracle(),
        "recrawl_due": _recrawl_due_oracle(),
        "charset_sniff": _charset_sniff_oracle(),
        "wet_export": _wet_export_oracle(),
        "canonical_dedup": _canonical_dedup_oracle(),
        "link_graph": _link_graph_oracle(),
        "degree_histogram": _degree_histogram_oracle(),
        "para_dedup": _para_dedup_oracle(),
        "snapshot_delta": _snapshot_delta_oracle(),
        "snapshot_worklist": _snapshot_worklist_oracle(),
        "robots_gate": _robots_gate_oracle(),
        "page_meta": _page_meta_oracle(),
        "pipeline_incremental": _pipeline_incremental_oracle(),
        "bm25_search": _bm25_oracle(),
        "hybrid_search": _hybrid_oracle(),
        "tfidf_terms": _tfidf_oracle(),
        "entropy_signals": _entropy_oracle(),
        "lsh_incremental": """
            WITH hist AS (SELECT * FROM documents WHERE doc_id < 100),
            newb AS (
              SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 30
              UNION ALL
              SELECT doc_id, text FROM documents WHERE doc_id >= 100 AND doc_id < 150
            ),
            sh_h AS (
              SELECT DISTINCT d.doc_id, substring(d.text, g.i, 8) AS sh
              FROM hist d, LATERAL (SELECT unnest(range(1, greatest(length(d.text) - 7, 1) + 1)) AS i) g
            ),
            sig_h AS (
              SELECT sh.doc_id, s.seed, min(md5(sh.sh || ':' || s.seed)) AS minhash
              FROM sh_h sh CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS seed) s
              GROUP BY sh.doc_id, s.seed
            ),
            banded_h AS (
              SELECT doc_id, (seed - 1) // 2 AS band_id,
                     string_agg(minhash, '|' ORDER BY minhash) AS band_key
              FROM sig_h GROUP BY doc_id, (seed - 1) // 2
            ),
            sh_n AS (
              SELECT DISTINCT d.doc_id, substring(d.text, g.i, 8) AS sh
              FROM newb d, LATERAL (SELECT unnest(range(1, greatest(length(d.text) - 7, 1) + 1)) AS i) g
            ),
            sig_n AS (
              SELECT sh.doc_id, s.seed, min(md5(sh.sh || ':' || s.seed)) AS minhash
              FROM sh_n sh CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS seed) s
              GROUP BY sh.doc_id, s.seed
            ),
            banded_n AS (
              SELECT doc_id, (seed - 1) // 2 AS band_id,
                     string_agg(minhash, '|' ORDER BY minhash) AS band_key
              FROM sig_n GROUP BY doc_id, (seed - 1) // 2
            ),
            hh AS (
              SELECT n.doc_id, count(DISTINCT h.doc_id) AS n_hist_hits
              FROM banded_n n JOIN banded_h h
                ON n.band_id = h.band_id AND n.band_key = h.band_key
               AND n.doc_id <> h.doc_id
              GROUP BY n.doc_id
            ),
            bh AS (
              SELECT a.doc_id, count(DISTINCT b.doc_id) AS n_batch_hits
              FROM banded_n a JOIN banded_n b
                ON a.band_id = b.band_id AND a.band_key = b.band_key
               AND a.doc_id > b.doc_id
              GROUP BY a.doc_id
            )
            SELECT newb.doc_id,
                   coalesce(n_hist_hits, 0) AS n_hist_hits,
                   coalesce(n_batch_hits, 0) AS n_batch_hits,
                   coalesce(n_hist_hits, 0) > 0 OR coalesce(n_batch_hits, 0) > 0
                       AS maybe_dup
            FROM newb LEFT JOIN hh USING (doc_id) LEFT JOIN bh USING (doc_id)
""",
        "domain_reputation": _domain_reputation_oracle(),
        "hits_scores": _hits_oracle(),
        "link_coupling": _link_coupling_oracle(),
        "sliding_windows": _sliding_windows_oracle(),
        "lm_bigram": _lm_bigram_oracle(),
        "triangles": _triangles_oracle(),
        "anchor_stats": _anchor_stats_oracle(),
        "boilerplate_strip": _boilerplate_oracle(),
        "quality_classifier": _qclassifier_oracle(),
        "corpus_mix": _corpus_mix_oracle(),
        "lang_rebalance": f"""
            WITH counts AS (
              SELECT lang, count(*) AS c FROM documents GROUP BY lang
            ),
            ws AS (
              SELECT lang, c,
                     CAST(floor(sqrt(c) * 1048576) AS BIGINT) AS wq
              FROM counts
            ),
            tot AS (SELECT sum(wq) AS tw FROM ws),
            rates AS (
              SELECT lang,
                     least(1.0, CAST(200 AS DOUBLE) * wq / tw / c) AS rate
              FROM ws, tot
            )
            SELECT d.doc_id, d.lang, r.rate, 1.0 / r.rate AS weight
            FROM documents d JOIN rates r USING (lang)
            WHERE {_hash_frac_sql('rebal:')} < r.rate
        """,
        "curate_web": _curate_web_oracle(),
        "gate_ablation": _gate_ablation_oracle(),
        "pipeline_e2e": _pipeline_e2e_oracle(),
        "decontam": f"""
            WITH {_DUPS_CTE[5:]},
            corpus AS (SELECT * FROM docs2
                       WHERE doc_id < 200 OR doc_id >= 100000),
            tb AS (SELECT doc_id,
                          list_filter(string_split_regex(lower(text), '\\s+'),
                                      t -> t != '') AS toks
                   FROM documents WHERE doc_id % 37 = 0),
            bench AS (
              SELECT DISTINCT
                unnest(list_transform(
                  range(1, len(toks) - least(13, len(toks)) + 2),
                  i -> md5(array_to_string(
                         list_slice(toks, i, i + least(13, len(toks)) - 1),
                         ' ')))) AS gram
              FROM tb),
            tc AS (SELECT doc_id,
                          list_filter(string_split_regex(lower(text), '\\s+'),
                                      t -> t != '') AS toks
                   FROM corpus),
            g AS (
              SELECT doc_id,
                unnest(list_transform(
                  range(1, len(toks) - least(13, len(toks)) + 2),
                  i -> md5(array_to_string(
                         list_slice(toks, i, i + least(13, len(toks)) - 1),
                         ' ')))) AS gram
              FROM tc)
            SELECT g.doc_id, count(*) AS n_grams,
                   CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_contaminated,
                   sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
                     AS contaminated
            FROM g LEFT JOIN bench b USING (gram)
            GROUP BY g.doc_id
        """,
        "bloom_dedup": _bloom_oracle(),
        "pagerank": _pagerank_oracle(),
        "decontam_scrub": f"""
            WITH {_DUPS_CTE[5:]},
            corpus AS (SELECT * FROM docs2
                       WHERE doc_id < 200 OR doc_id >= 100000),
            tb AS (SELECT doc_id,
                          list_filter(string_split_regex(lower(text), '\\s+'),
                                      t -> t != '') AS toks
                   FROM documents WHERE doc_id % 37 = 0),
            bench AS (
              SELECT DISTINCT
                unnest(list_transform(
                  range(1, len(toks) - least(13, len(toks)) + 2),
                  i -> md5(array_to_string(
                         list_slice(toks, i, i + least(13, len(toks)) - 1),
                         ' ')))) AS gram
              FROM tb),
            tc AS (SELECT doc_id,
                          list_filter(string_split_regex(lower(text), '\\s+'),
                                      t -> t != '') AS toks
                   FROM corpus),
            g AS (
              SELECT tc.doc_id, r.i - 1 AS pos,
                     md5(array_to_string(
                       list_slice(tc.toks, r.i,
                                  r.i + least(13, len(tc.toks)) - 1),
                       ' ')) AS gram
              FROM tc, LATERAL (
                SELECT unnest(range(1,
                  len(tc.toks) - least(13, len(tc.toks)) + 2)) AS i) r),
            h AS (SELECT g.doc_id, list(g.pos) AS starts
                  FROM g JOIN bench b USING (gram) GROUP BY g.doc_id),
            j AS (SELECT tc.doc_id, tc.toks,
                         least(13, len(tc.toks)) AS n_eff,
                         coalesce(h.starts, []) AS starts
                  FROM tc LEFT JOIN h USING (doc_id)),
            k AS (SELECT doc_id, toks,
                         list_filter(toks, (t, jj) ->
                           len(list_filter(starts, s ->
                             s <= jj - 1 AND jj - 1 < s + n_eff)) = 0)
                           AS kept
                  FROM j)
            SELECT doc_id,
                   coalesce(array_to_string(kept, ' '), '') AS clean_text,
                   CAST(len(toks) - len(kept) AS INTEGER) AS n_removed
            FROM k
        """,
        "lm_quality": """
            WITH ref AS (SELECT * FROM documents WHERE doc_id < 300),
            rw AS (
              SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
              FROM ref),
            c AS (SELECT token, count(*) AS cnt FROM rw
                  WHERE token != '' GROUP BY token),
            t AS (SELECT sum(cnt) AS total FROM c),
            lm AS (SELECT token, round(ln(total / cnt) * 1024) / 1024 AS nll
                   FROM c, t),
            corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 200000 AS doc_id,
                     text || repeat(' zq9x vv3k zzp1',
                                    CAST((length(text) + 29) // 30 AS INTEGER))
              FROM documents WHERE doc_id % 3 = 0),
            dw AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\\s+')) AS token
              FROM corpus),
            s AS (
              SELECT d.doc_id, count(*) AS n_tokens,
                     sum(coalesce(lm.nll, 16.0)) AS sum_nll
              FROM (SELECT * FROM dw WHERE token != '') d
              LEFT JOIN lm USING (token)
              GROUP BY d.doc_id)
            SELECT doc_id, n_tokens, sum_nll / n_tokens AS avg_nll,
                   CASE WHEN sum_nll / n_tokens < 3.5 THEN 'head'
                        WHEN sum_nll / n_tokens < 6.0 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM s
        """,
        "dedup_latest": """
            SELECT user_id, latest_event_id FROM (
              SELECT user_id, event_id AS latest_event_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1
        """,
        "dedup_exact": f"""
            {_DUPS_CTE}
            SELECT md5(text) AS digest, min(doc_id) AS canonical_id,
                   count(*) AS dup_count
            FROM docs2 GROUP BY md5(text) HAVING count(*) > 1
        """,
        "minhash_signatures": _minhash_sql(
            "(SELECT * FROM documents WHERE doc_id < 100)", "1, 2, 3, 4"
        ),
        "lsh_dup_pairs": f"""
            {_DUPS_CTE},
            base AS (SELECT * FROM docs2 WHERE doc_id < 100 OR doc_id >= 100000),
            sh AS (
              SELECT DISTINCT d.doc_id, substring(d.text, g.i, 8) AS sh
              FROM base d, LATERAL (SELECT unnest(range(1, greatest(length(d.text) - 7, 1) + 1)) AS i) g
            ),
            sig AS (
              SELECT sh.doc_id, s.seed, min(md5(sh.sh || ':' || s.seed)) AS minhash
              FROM sh CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS seed) s
              GROUP BY sh.doc_id, s.seed
            ),
            banded AS (
              SELECT doc_id, (seed - 1) // 2 AS band_id,
                     string_agg(minhash, '|' ORDER BY minhash) AS band_key
              FROM sig GROUP BY doc_id, (seed - 1) // 2
            )
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        """,
        # transitive closure of the same pair graph + chain edges: recursive
        # min-label reachability == large-star/small-star fixpoint (ops/cc.py)
        "dedup_clusters": f"""
            {_DUPS_CTE.replace("WITH ", "WITH RECURSIVE ", 1)},
            base AS (SELECT * FROM docs2 WHERE doc_id < 100 OR doc_id >= 100000),
            sh AS (
              SELECT DISTINCT d.doc_id, substring(d.text, g.i, 8) AS sh
              FROM base d, LATERAL (SELECT unnest(range(1, greatest(length(d.text) - 7, 1) + 1)) AS i) g
            ),
            sig AS (
              SELECT sh.doc_id, s.seed, min(md5(sh.sh || ':' || s.seed)) AS minhash
              FROM sh CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS seed) s
              GROUP BY sh.doc_id, s.seed
            ),
            banded AS (
              SELECT doc_id, (seed - 1) // 2 AS band_id,
                     string_agg(minhash, '|' ORDER BY minhash) AS band_key
              FROM sig GROUP BY doc_id, (seed - 1) // 2
            ),
            pairs AS (
              SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
              FROM banded a JOIN banded b
                ON a.band_id = b.band_id AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
            ),
            chain AS (
              SELECT doc_id AS u, doc_id + 1 AS v FROM documents
              WHERE doc_id < 99 AND doc_id % 10 != 9
            ),
            edges AS (SELECT u, v FROM pairs UNION SELECT u, v FROM chain),
            sym AS (SELECT u, v FROM edges
                    UNION SELECT v AS u, u AS v FROM edges),
            reach(node, comp) AS (
              SELECT doc_id, doc_id FROM base
              UNION
              SELECT s.v, r.comp FROM reach r JOIN sym s ON s.u = r.node
            )
            SELECT node AS doc_id, min(comp) AS component,
                   (min(comp) = node) AS is_canonical
            FROM reach GROUP BY node
        """,
        "ngram_jaccard": f"""
            {_DUPS_CTE},
            base AS (SELECT * FROM docs2 WHERE doc_id < 40 OR doc_id >= 100000),
            sh0 AS (
              SELECT DISTINCT d.doc_id, substring(d.text, g.i, 8) AS sh
              FROM base d, LATERAL (SELECT unnest(range(1, greatest(length(d.text) - 7, 1) + 1)) AS i) g
            ),
            -- document-frequency cap (mirrors jaccard_pairs max_doc_freq):
            -- shingles in >1000 docs drop from join AND sizes
            hot AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) > 1000),
            sh AS (SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            common AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT doc_a, doc_b,
                   round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.8
        """,
"ngram_novelty": f"""
            {_DUPS_CTE},
            base AS (SELECT * FROM docs2 WHERE doc_id < 80 OR doc_id >= 100000),
            sh AS (
              SELECT DISTINCT d.doc_id, substring(d.text, g.i, 8) AS sh
              FROM base d, LATERAL (SELECT unnest(range(1, greatest(length(d.text) - 7, 1) + 1)) AS i) g
            ),
            dfc AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
            per_doc AS (
              SELECT s.doc_id, count(*) AS n_shingles,
                     CAST(sum(CASE WHEN c.df >= 2 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_shared
              FROM sh s JOIN dfc c ON s.sh = c.sh
              GROUP BY s.doc_id
            )
            SELECT doc_id, n_shingles, n_shared,
                   1.0 - CAST(n_shared AS DOUBLE) / n_shingles AS novelty
            FROM per_doc
        """,
        "cms_join_size": _cms_join_size_oracle(),
        "cms_token_counts": _cms_oracle(),
        "hll_union": _hll_union_oracle(),
        "hll_host_cardinality": _hll_oracle(),
        "winnow_pairs": _winnow_pairs_oracle(),
        "source_overlap": """
            WITH sh AS (
              SELECT DISTINCT d.source, substring(d.text, g.i, 8) AS sh
              FROM (SELECT source, text FROM documents WHERE doc_id < 200) d,
                   LATERAL (SELECT unnest(range(1, greatest(length(d.text) - 7, 1) + 1)) AS i) g
            ),
            sizes AS (SELECT source, count(*) AS sz FROM sh GROUP BY source),
            common AS (
              SELECT a.source AS source_a, b.source AS source_b,
                     count(*) AS inter
              FROM sh a JOIN sh b
                ON a.sh = b.sh AND a.source < b.source
              GROUP BY a.source, b.source
            )
            SELECT source_a, source_b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
                   inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard,
                   inter / CAST(least(sa.sz, sb.sz) AS DOUBLE)
                     AS overlap_coef
            FROM common
            JOIN sizes sa ON sa.source = source_a
            JOIN sizes sb ON sb.source = source_b
        """,
        "containment_pairs": """
            WITH docs3 AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 100
              UNION ALL
              SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
              UNION ALL
              SELECT doc_id + 200000,
                     substring(text, 1,
                               CAST(floor(length(text) / 2.0) AS INT))
              FROM documents WHERE doc_id >= 50 AND doc_id < 100
            ),
            sh0 AS (
              SELECT DISTINCT d.doc_id, substring(d.text, g.i, 8) AS sh
              FROM docs3 d, LATERAL (SELECT unnest(range(1, greatest(length(d.text) - 7, 1) + 1)) AS i) g
            ),
            hot AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) > 1000),
            sh AS (SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            common AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT doc_a, doc_b, inter,
                   sa.sz AS sz_a, sb.sz AS sz_b,
                   inter / CAST(sa.sz AS DOUBLE) AS containment_a,
                   inter / CAST(sb.sz AS DOUBLE) AS containment_b,
                   inter / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard,
                   CASE WHEN inter / CAST(sa.sz + sb.sz - inter AS DOUBLE)
                             >= 0.9 THEN 'near_exact'
                        WHEN inter / CAST(sa.sz AS DOUBLE) >= 0.9
                          THEN 'a_in_b'
                        WHEN inter / CAST(sb.sz AS DOUBLE) >= 0.9
                          THEN 'b_in_a'
                        ELSE 'partial_overlap' END AS relation
            FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE greatest(inter / CAST(sa.sz AS DOUBLE),
                           inter / CAST(sb.sz AS DOUBLE)) >= 0.5
        """,
        "edit_verify": """
            WITH base AS (
              SELECT doc_id, substring(text, 1, 500) AS t
              FROM documents WHERE doc_id < 60
            ),
            mut AS (
              SELECT doc_id + 100000 AS doc_id,
                     substring('EDIT v2 ' || text, 1, 500) AS t
              FROM documents WHERE doc_id < 50
            ),
            alldocs AS (SELECT * FROM base UNION ALL SELECT * FROM mut),
            pairs AS (
              SELECT doc_id AS doc_a, doc_id + 100000 AS doc_b
              FROM documents WHERE doc_id < 50
              UNION ALL
              SELECT doc_id AS doc_a, doc_id + 1 AS doc_b
              FROM documents WHERE doc_id < 20
            )
            SELECT p.doc_a, p.doc_b,
                   levenshtein(a.t, b.t) AS edit_dist,
                   round(1.0 - levenshtein(a.t, b.t)
                             / greatest(length(a.t), length(b.t), 1),
                         6) AS edit_sim,
                   edit_sim >= 0.9 AS is_dup
            FROM pairs p
            JOIN alldocs a ON a.doc_id = p.doc_a
            JOIN alldocs b ON b.doc_id = p.doc_b
        """,
        "simhash": _simhash_bits_sql(16),
        "simhash_pairs": f"""
            WITH sigs AS ({_simhash_bits_sql(16)}),
            banded AS (
              SELECT doc_id, simhash, b.band,
                     substring(simhash, 1 + b.band * 4, 4) AS band_bits
              FROM sigs, LATERAL (SELECT unnest(range(0, 4)) AS band) b
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.simhash AS sa, b.simhash AS sb
              FROM banded a
              JOIN banded b
                ON a.band = b.band AND a.band_bits = b.band_bits
               AND a.doc_id < b.doc_id
            )
            SELECT id_a, id_b,
                   CAST(len(list_filter(range(1, 17),
                        i -> substring(sa, i, 1) <> substring(sb, i, 1)))
                        AS INTEGER) AS hamming
            FROM cand
            WHERE len(list_filter(range(1, 17),
                  i -> substring(sa, i, 1) <> substring(sb, i, 1))) <= 3
        """,
        "token_count": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
            FROM documents
        """,
        "quality_score": """
            SELECT doc_id, n_chars,
                   len(string_split(text, ' ')) AS n_tokens,
                   round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                         / len(string_split(text, ' ')), 4) AS distinct_ratio,
                   round(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                         / len(string_split(text, ' ')), 4) AS avg_word_len
            FROM documents
        """,
        "lang_id": f"""
            SELECT doc_id,
                   {_STOP_HITS} AS stop_hits,
                   round(CAST({_STOP_HITS} AS DOUBLE)
                         / len(string_split(text, ' ')), 4) AS stop_ratio,
                   CASE WHEN round(CAST({_STOP_HITS} AS DOUBLE)
                        / len(string_split(text, ' ')), 4) >= 0.05
                        THEN 'en' ELSE 'unknown' END AS lang_pred
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id, md5(text) AS fp_md5, sha256(text) AS fp_sha256,
                   md5(substring(text, 1, 64)) AS fp_prefix64
            FROM documents
        """,
        "size_histogram": """
            WITH bk AS (
              SELECT CASE WHEN n_chars <= 0 THEN 0
                          ELSE length(bin(CAST(n_chars AS BIGINT))) END
                       AS bucket,
                     n_chars
              FROM documents
            )
            SELECT bucket,
                   CASE WHEN bucket = 0 THEN 0
                        ELSE CAST(power(2, bucket - 1) AS BIGINT) END
                     AS lo_chars,
                   CASE WHEN bucket = 0 THEN 0
                        ELSE CAST(power(2, bucket) AS BIGINT) - 1 END
                     AS hi_chars,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM bk GROUP BY bucket
        """,
        "vocab_stats": """
            WITH toks AS (
              SELECT t.tok
              FROM documents d,
                   UNNEST(string_split_regex(lower(d.text), '\\s+')) AS t(tok)
              WHERE length(t.tok) > 0
            ),
            tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
            consts AS (
              SELECT CAST(sum(tf) AS BIGINT) AS total_tokens,
                     count(*) AS vocab_size
              FROM tf
            ),
            top AS (
              SELECT tok, tf,
                     row_number() OVER (ORDER BY tf DESC, tok) AS rank
              FROM tf ORDER BY tf DESC, tok LIMIT 50
            )
            SELECT rank, tok, tf, total_tokens, vocab_size
            FROM top, consts
        """,
        "readability": _readability_oracle(),
        "script_mix": _script_mix_oracle(),
        "code_switch": _code_switch_oracle(),
        "lexicon_gate": _lexicon_gate_oracle(),
        "lang_confusion": f"""\n{_LANG_CONFUSION_SQL}\n""",
        "cosine_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_dot_product(embedding, qv) /
                         (sqrt(list_dot_product(embedding, embedding)) *
                          sqrt(list_dot_product(qv, qv))), 4) AS cosine
            FROM embeddings, q WHERE vec_id != 0
            ORDER BY cosine DESC, vec_id LIMIT 5
        """,
        "embedding_dups_exact": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_dot_product(a.embedding, b.embedding) /
                         (sqrt(list_dot_product(a.embedding, a.embedding)) *
                          sqrt(list_dot_product(b.embedding, b.embedding))), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 200 AND b.vec_id < 200
              AND round(list_dot_product(a.embedding, b.embedding) /
                        (sqrt(list_dot_product(a.embedding, a.embedding)) *
                         sqrt(list_dot_product(b.embedding, b.embedding))), 4) >= 0.8
        """,
        "ivf_assign": """
            WITH e AS (SELECT * FROM embeddings WHERE vec_id < 300),
            c AS (SELECT vec_id AS centroid_id, embedding AS centroid
                  FROM embeddings WHERE vec_id < 8),
            sims AS (
              SELECT e.vec_id, c.centroid_id,
                     round(list_dot_product(e.embedding, c.centroid) /
                           (sqrt(list_dot_product(e.embedding, e.embedding)) *
                            sqrt(list_dot_product(c.centroid, c.centroid))), 4) AS sim
              FROM e CROSS JOIN c),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                         ORDER BY sim DESC, centroid_id) AS rn FROM sims)
            SELECT vec_id, centroid_id, sim AS centroid_sim
            FROM ranked WHERE rn = 1
        """,
        "semdedup": _semdedup_oracle(),
        "phash_dedup": _phash_oracle(),
        "audio_dups": _audiofp_oracle(),
        "ivf_search": """
            WITH e AS (SELECT * FROM embeddings WHERE vec_id < 300),
            c AS (SELECT vec_id AS centroid_id, embedding AS centroid
                  FROM embeddings WHERE vec_id < 8),
            sims AS (
              SELECT e.vec_id, c.centroid_id,
                     round(list_dot_product(e.embedding, c.centroid) /
                           (sqrt(list_dot_product(e.embedding, e.embedding)) *
                            sqrt(list_dot_product(c.centroid, c.centroid))), 6) AS sim
              FROM e CROSS JOIN c),
            assign AS (
              SELECT vec_id, centroid_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                           ORDER BY sim DESC, centroid_id) AS rn FROM sims)
              WHERE rn = 1),
            q AS (SELECT embedding AS qv FROM e WHERE vec_id = 0),
            probed AS (
              SELECT c.centroid_id FROM c, q
              ORDER BY round(list_dot_product(c.centroid, q.qv) /
                        (sqrt(list_dot_product(c.centroid, c.centroid)) *
                         sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
                       c.centroid_id
              LIMIT 3)
            SELECT e.vec_id,
                   round(list_dot_product(e.embedding, q.qv) /
                         (sqrt(list_dot_product(e.embedding, e.embedding)) *
                          sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
            FROM e
            JOIN assign a ON a.vec_id = e.vec_id
            JOIN probed p ON p.centroid_id = a.centroid_id
            CROSS JOIN q
            WHERE e.vec_id != 0
            ORDER BY cosine DESC, e.vec_id LIMIT 5
        """,
        "events_hourly": """
            SELECT CAST(ts AS DATE) AS day, hour(ts) AS hr, event_type,
                   count(*) AS n, round(avg(value), 4) AS avg_value
            FROM events GROUP BY 1, 2, 3
        """,
        "metrics_rollup": """
            SELECT o_orderstatus, count(*) AS n,
                   round(avg(o_totalprice), 2) AS avg_price,
                   round(quantile_cont(o_totalprice, 0.5), 2) AS median_price
            FROM orders GROUP BY o_orderstatus
        """,
        "resume_antijoin": """
            SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "broadcast_enrich": """
            SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "salted_agg": """
            SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "embedding_dups_lsh": _lsh_bucket_sql(n_planes=8, dim=64),
    }
    # composed-on-composed entries that reuse another oracle's text
    docs2_body = _DUPS_CTE[5:].split("docs2 AS ", 1)[1]
    out["lsh_eval"] = f"""
        WITH truth AS (
          SELECT doc_a, doc_b FROM ({out["ngram_jaccard"]})
        ),
        cand AS ({out["lsh_dup_pairs"].replace(
            "WHERE doc_id < 100 OR doc_id >= 100000",
            "WHERE doc_id < 40 OR (doc_id >= 100000 AND doc_id < 100040)")}),
        h AS (SELECT count(*) AS n_hits
              FROM truth t JOIN cand c
                ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
        nt AS (SELECT count(*) AS n_true FROM truth),
        nc AS (SELECT count(*) AS n_candidates FROM cand)
        SELECT n_true, n_candidates, n_hits,
               CAST(n_hits AS DOUBLE) / n_true AS recall,
               CAST(n_hits AS DOUBLE) / n_candidates AS precision
        FROM nt, nc, h
    """
    out["corpus_report"] = f"""
        WITH rd AS ({out["readability"]}),
        basic AS (
          SELECT count(*) AS n_docs,
                 round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 6)
                   AS pct_en
          FROM documents
        ),
        toks AS (
          SELECT t.tok
          FROM documents d,
               UNNEST(string_split_regex(lower(d.text), '\\s+')) AS t(tok)
          WHERE length(t.tok) > 0
        ),
        vocab AS (
          SELECT CAST(count(*) AS BIGINT) AS total_tokens,
                 count(DISTINCT tok) AS vocab_size
          FROM toks
        ),
        dg AS (
          SELECT md5(text) AS digest, count(*) AS n
          FROM documents GROUP BY md5(text)
        ),
        dups AS (
          SELECT CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_groups,
                 CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
                   AS docs_in_dup_groups
          FROM dg
        ),
        fl AS (SELECT round(avg(flesch), 4) AS mean_flesch FROM rd)
        SELECT n_docs, total_tokens, vocab_size, dup_groups,
               docs_in_dup_groups, pct_en, mean_flesch
        FROM basic, vocab, dups, fl
    """
    out["canonical_by_quality"] = f"""
        WITH asn AS ({out["dedup_clusters"]}),
        scored AS (
          SELECT a.doc_id, a.component,
                 CAST(d.n_chars AS DOUBLE) AS score
          FROM asn a
          JOIN {docs2_body} d ON a.doc_id = d.doc_id
        )
        SELECT doc_id, component, score,
               row_number() OVER (
                 PARTITION BY component
                 ORDER BY score DESC NULLS LAST, doc_id ASC
               ) = 1 AS is_canonical
        FROM scored
    """
    out["dedup_report"] = f"""
        WITH asn AS ({out["dedup_clusters"]}),
        sizes AS (
          SELECT component, count(*) AS cluster_size
          FROM asn GROUP BY component
        )
        SELECT cluster_size,
               count(*) AS n_clusters,
               CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
               CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_removable
        FROM sizes GROUP BY cluster_size
    """
    return out
