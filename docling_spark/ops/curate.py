"""Corpus curation: the composed training-data pipeline stage.

Chains the engine's pieces the way a real pretraining-data job does —
extract → language gate → length gate → exact dedup — in ONE declarative
plan (extraction UDF once, one window over doc_hash, the rest narrow
JVM expressions), emitting a keep/drop decision with a reason code per
document instead of silently filtering. Reason precedence mirrors common
curation pipelines: duplicate > wrong_lang > too_short.

Scale shape: the only exchange beyond extraction is the dedup window's
hash partition on doc_hash (uniform by construction — it's a sha256).
Every gate is a codegen expression over already-extracted columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate(
    extracted: DataFrame,
    keep_lang: str = "en",
    min_tokens: int = 35,
) -> DataFrame:
    """extracted (url, lang, doc_hash, status, extracted_text) →
    (url, keep, reason, n_tokens).

    - ``duplicate``: same doc_hash as an earlier url (first url by binary
      ordering survives — deterministic and engine-portable)
    - ``extraction_failed``: any non-success status
    - ``wrong_lang``: lang differs from ``keep_lang``
    - ``too_short``: whitespace tokens of the extracted text < min_tokens
    - ``ok``: kept
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_hash").orderBy("url")
    n_tokens = F.size(F.split(F.col("extracted_text"), " "))
    out = (
        extracted.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_tokens",
            F.when(F.col("extracted_text").isNotNull(), n_tokens).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "reason",
            F.when(F.col("_rn") > 1, F.lit("duplicate"))
            .when(F.col("status") != "success", F.lit("extraction_failed"))
            .when(F.col("lang") != keep_lang, F.lit("wrong_lang"))
            .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
            .otherwise(F.lit("ok")),
        )
    )
    return out.select(
        "url",
        (F.col("reason") == "ok").alias("keep"),
        "reason",
        "n_tokens",
    )


def domain_cap(
    df: DataFrame, k: int = 3, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Per-domain document cap (the RefinedWeb-style crawl curation gate):
    keep at most ``k`` documents per registered host, preferring the most
    recent crawl — (url, domain, rank, kept).

    Domain = the authority part of the url (regexp, no UDF). Rank is a
    window over (ts DESC, url) inside each domain — deterministic
    tie-break by url so reruns are stable. ONE exchange on domain; a hot
    domain (crawl skew is real: a few hosts dominate CC) is still a
    single partition, so at production scale run with AQE skew-join
    splitting or pre-aggregate counts — documented, same shape as the
    latest-crawl window dedup."""
    from pyspark.sql.window import Window

    domain = F.regexp_extract(F.col(url_col), "^[a-z]+://([^/]+)", 1)
    w = Window.partitionBy("domain").orderBy(
        F.col(ts_col).desc(), F.col(url_col)
    )
    return (
        df.select(url_col, ts_col, domain.alias("domain"))
        .withColumn("rank", F.row_number().over(w))
        .select(
            url_col,
            "domain",
            "rank",
            (F.col("rank") <= k).alias("kept"),
        )
    )
