"""Charset sniffing audit: BOM magic + declared meta charset, JVM-side.

The Python extraction path already decodes bytes per document
(``htmlx/dom.decode_bytes``: BOM → declared charset → utf-8 →
cp1252); this op surfaces the same decision as a cheap AUDIT column
computed before any Python runs — the dashboard that says what share
of a crawl segment is mislabeled (BOM contradicting the meta tag) or
undeclared, and which shard to route through the transcoding lane.

Law (mirrors decode_bytes precedence):

- BOM: ``EF BB BF`` → utf-8, ``FF FE`` → utf-16le, ``FE FF`` →
  utf-16be (checked on raw bytes, 3-byte probe first);
- declared: first ``charset=`` token in the leniently-decoded 8 KB
  head (meta charset / http-equiv content-type both match the single
  regex), lowercased;
- chosen: BOM wins over declaration; declaration over the utf-8
  default; ``bom_conflict`` flags a BOM contradicting the
  declaration — the classic mislabel.

Scale shape: two binary prefix compares + one bounded-window regex
per row — in-row JVM, zero shuffles, zero Python, same 8 KB probe
discipline as the dispatch chain (job.py). The DuckDB oracle derives
the expected columns INDEPENDENTLY from the synthesis law (doc_id
arithmetic — the ops/linkgraph idiom), never re-decoding bytes, so
the Spark byte path is value-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "charset_sniff",
    "synth_charset_pages",
    "charset_sniff_oracle_sql",
]

_DECLARED_RE = r"(?i)charset\s*=\s*[\"']?\s*([A-Za-z0-9_\-]+)"


def charset_sniff(
    pages: DataFrame, prefix_bytes: int = 8192
) -> DataFrame:
    """(doc_id, html binary) → (doc_id, bom, declared, chosen,
    bom_conflict)."""
    magic2 = F.substring(F.col("html"), 1, 2)
    magic3 = F.substring(F.col("html"), 1, 3)
    bom = (
        F.when(magic3 == F.lit(b"\xef\xbb\xbf"), "utf-8")
        .when(magic2 == F.lit(b"\xff\xfe"), "utf-16le")
        .when(magic2 == F.lit(b"\xfe\xff"), "utf-16be")
    )
    head = F.substring(F.col("html"), 1, prefix_bytes).cast("string")
    decl_raw = F.regexp_extract(head, _DECLARED_RE, 1)
    declared = F.when(decl_raw != "", F.lower(decl_raw))
    chosen = F.coalesce(bom, declared, F.lit("utf-8"))
    return pages.select(
        "doc_id",
        bom.alias("bom"),
        declared.alias("declared"),
        chosen.alias("chosen"),
        (
            bom.isNotNull()
            & declared.isNotNull()
            & (bom != declared)
        ).alias("bom_conflict"),
    )


# -------------------------------------------------- synthetic byte corpus
# doc_id % 4 law (mirrored in the oracle WITHOUT touching bytes):
#   0: UTF-8 BOM + meta charset=utf-8            -> bom+decl agree
#   1: no BOM, meta charset=windows-1252         -> declaration wins
#   2: UTF-16LE BOM, body junk for a utf-8 read  -> BOM wins, conflict
#      with a (garbled but regex-invisible) declaration -> declared NULL
#   3: no BOM, no declaration                    -> utf-8 default
_HTML_A = '<html><head><meta charset="utf-8"></head><body>a</body></html>'
_HTML_B = (
    "<html><head><meta http-equiv=\"Content-Type\" "
    "content=\"text/html; charset=windows-1252\"></head>"
    "<body>b</body></html>"
)
_HTML_D = "<html><head><title>d</title></head><body>d</body></html>"


def synth_charset_pages(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, html binary) under the % 4 law — real bytes, real
    BOMs (the UTF-16 variant is genuinely UTF-16LE-encoded)."""
    variant = (F.col("doc_id") % 4).cast("int")
    utf16 = ("﻿<html><body>c</body></html>").encode("utf-16-le")
    html = (
        F.when(variant == 0, F.lit(b"\xef\xbb\xbf" + _HTML_A.encode()))
        .when(variant == 1, F.lit(_HTML_B.encode()))
        .when(variant == 2, F.lit(utf16))
        .otherwise(F.lit(_HTML_D.encode()))
    )
    return docs.select("doc_id", html.alias("html"))


def charset_sniff_oracle_sql() -> str:
    """Expected columns straight from the % 4 law."""
    return """
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN 'utf-8'
                               WHEN 2 THEN 'utf-16le' END AS bom,
               CASE doc_id % 4 WHEN 0 THEN 'utf-8'
                               WHEN 1 THEN 'windows-1252' END AS declared,
               CASE doc_id % 4 WHEN 0 THEN 'utf-8'
                               WHEN 1 THEN 'windows-1252'
                               WHEN 2 THEN 'utf-16le'
                               ELSE 'utf-8' END AS chosen,
               FALSE AS bom_conflict
        FROM documents
    """
