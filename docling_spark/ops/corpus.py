"""Deterministic Common-Crawl-shaped corpus synthesis.

Builds the ``(url, warc_ts, html, text, lang)`` pages table (BASELINE.json
``input_hint``) from the driver-provided ``documents`` parquet — entirely with
JVM-side expressions so synthesis never bottlenecks the bench. The HTML
template is simple enough that the expected extraction output is expressible
in ANSI SQL (giving the whole UDF path a DuckDB value oracle) yet exercises
headings, paragraphs, lists and tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_pages(
    spark: SparkSession, sf_dir: str, variants: int = 1
) -> DataFrame:
    """documents.parquet → deterministic pages table (xN url variants)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if variants > 1:
        docs = docs.withColumn(
            "_v", F.explode(F.sequence(F.lit(0), F.lit(variants - 1)))
        )
    else:
        docs = docs.withColumn("_v", F.lit(0))

    id2 = F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0")
    html_str = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head><body>\n<h1>Document "),
        F.col("doc_id").cast("string"),
        F.lit("</h1>\n<p>"),
        F.col("text"),
        F.lit("</p>\n<ul><li>"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)),
        F.lit("</li><li>"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(2)),
        F.lit("</li><li>"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(3)),
        F.lit("</li></ul>\n<table><tr><th>K</th><th>V</th></tr><tr><td>k"),
        id2,
        F.lit("</td><td>v"),
        id2,
        F.lit("</td></tr></table>\n</body></html>"),
    )
    return docs.select(
        F.concat(
            F.lit("https://synth.test/doc/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("_v") > 0, F.concat(F.lit("-v"), F.col("_v").cast("string"))).otherwise(F.lit("")),
            F.lit(".html"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_id").cast("double"))
        ).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text").alias("text"),
        F.col("lang").alias("lang"),
    )


# The SQL (DuckDB-dialect-compatible ANSI) reconstruction of the expected
# markdown for the synth template above — the oracle for the full UDF path.
SYNTH_MD_SQL = (
    "'# Document ' || doc_id || chr(10) || chr(10) || text || chr(10) || chr(10) || "
    "'- ' || split_part(text, ' ', 1) || chr(10) || "
    "'- ' || split_part(text, ' ', 2) || chr(10) || "
    "'- ' || split_part(text, ' ', 3) || chr(10) || chr(10) || "
    "'| K   | V   |' || chr(10) || '|-----|-----|' || chr(10) || "
    "'| k' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || "
    "' | v' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' |'"
)
