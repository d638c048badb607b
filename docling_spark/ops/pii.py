"""PII scrubbing for training-data pipelines: emails, phone numbers and
IPv4 addresses redacted to typed placeholders, with per-type counts.

A crawl-extraction pipeline feeding model training must scrub obvious
PII before the text ships (see e.g. the C4/RefinedWeb data cards); the
reference stops at extraction, this op is the post-extraction hygiene
stage. All patterns avoid lookarounds so they behave identically under
Java regex (Spark) and RE2 (DuckDB).

Scale shape: three chained JVM regexp_replace + regexp_count per row —
scan -> project, zero shuffles, zero Python.

The synthetic corpus injects deterministic PII tokens into the webtext
corpus (``ops/webtext.synth_webtext``): an email on ``doc_id % 3 == 0``,
a phone on ``% 4 == 0``, an IP on ``% 5 == 0`` — so scrub counts and the
scrubbed text are both value-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, pattern, placeholder) — applied in order; chained replace means
# an earlier placeholder is never re-matched by a later pattern
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b555-[0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def synth_pii_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Webtext corpus + deterministic injected PII: (doc_id, ptext)."""
    from .webtext import synth_webtext

    d = F.col("doc_id")
    wt = synth_webtext(spark, sf_dir)
    email = F.when(
        d % 3 == 0, F.concat(F.lit(" contact user"), d, F.lit("@example.com"))
    ).otherwise("")
    phone = F.when(
        d % 4 == 0,
        F.concat(F.lit(" call 555-"), F.lpad((d % 10000).cast("string"), 4, "0")),
    ).otherwise("")
    ip = F.when(
        d % 5 == 0, F.concat(F.lit(" host 10."), d % 256, F.lit(".0.1"))
    ).otherwise("")
    return wt.select(
        "doc_id", F.concat(F.col("wtext"), email, phone, ip).alias("ptext")
    )


def pii_scrub(df: DataFrame, col: str = "ptext") -> DataFrame:
    """(doc_id, scrubbed, n_email, n_phone, n_ip) — counts are taken on
    the original text, replacements chain in PII_PATTERNS order."""
    t = F.col(col)
    counts = [
        F.regexp_count(t, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    scrubbed = t
    for _name, pat, ph in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, ph)
    return df.select("doc_id", scrubbed.alias("scrubbed"), *counts)


# ------------------------------------------------------------------ oracle
def pii_oracle_sql(corpus_cte: str) -> str:
    """DuckDB mirror over the given `wt AS (...)` corpus CTE."""
    email = (
        "CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id"
        " || '@example.com' ELSE '' END"
    )
    phone = (
        "CASE WHEN doc_id % 4 = 0 THEN ' call 555-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    )
    ip = (
        "CASE WHEN doc_id % 5 = 0 THEN ' host 10.' || (doc_id % 256)"
        " || '.0.1' ELSE '' END"
    )
    scrub = "ptext"
    for _name, pat, ph in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{ph}', 'g')"
    counts = ",\n       ".join(
        f"len(regexp_extract_all(ptext, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    return (
        "WITH "
        + corpus_cte
        + f""",
p AS (SELECT doc_id, wtext || {email} || {phone} || {ip} AS ptext FROM wt)
SELECT doc_id, {scrub} AS scrubbed,
       {counts}
FROM p"""
    )
