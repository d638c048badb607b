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


def domain_buckets(
    urls: DataFrame, head_frac: float = 0.5, mid_frac: float = 0.9
) -> DataFrame:
    """RefinedWeb-style head/middle/tail domain buckets by coverage.

    Rank domains by page count (descending); the *head* is the set of
    top domains covering ``head_frac`` of all pages, the *middle* runs
    to ``mid_frac``, the rest is the *tail* — the standard crawl
    composition split (head = a few giant portals, tail = the long
    one-page remainder) used to stratify sampling and QA review.

    Granularity is the COUNT LEVEL, deliberately: all domains with the
    same page count share one bucket (a level straddling a boundary
    goes wholly to the earlier bucket, since its first domain starts
    before the cut). This removes any need to order domains *within* a
    level — which is exactly the window that cannot scale: the n=1
    level holds most of a real crawl's domains, so a per-level
    row_number would sort ~10^8 rows in one task. Instead the only
    window here runs over the DISTINCT COUNT VALUES (thousands of rows
    at any corpus size), and domains join their level's bucket back by
    count — one tiny global window, one broadcast join, map-side aggs
    everywhere else.

    Output: (host, n_docs, cum_before, bucket) where ``cum_before`` is
    the number of pages on strictly-higher-count levels.
    """
    from pyspark.sql.window import Window

    host = F.lower(
        F.regexp_extract(
            F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1
        )
    )
    counts = urls.select(host.alias("host")).groupBy("host").agg(
        F.count("*").alias("n_docs")
    )
    w = Window.orderBy(F.col("n_docs").desc())
    hist = (
        counts.groupBy("n_docs")
        .agg(F.count("*").alias("n_domains"))
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum(F.col("n_docs") * F.col("n_domains")).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("bigint"),
            ),
        )
    )
    total = counts.agg(F.sum("n_docs").alias("total"))
    hist = hist.crossJoin(F.broadcast(total)).select(
        "n_docs",
        "cum_before",
        F.when(
            F.col("cum_before")
            < F.lit(float(head_frac)) * F.col("total"),
            "head",
        )
        .when(
            F.col("cum_before") < F.lit(float(mid_frac)) * F.col("total"),
            "middle",
        )
        .otherwise("tail")
        .alias("bucket"),
    )
    return counts.join(F.broadcast(hist), "n_docs").select(
        "host", "n_docs", "cum_before", "bucket"
    )


def domain_buckets_oracle_sql(
    urls_cte: str, head_frac: float = 0.5, mid_frac: float = 0.9
) -> str:
    """DuckDB mirror of :func:`domain_buckets`."""
    return f"""
        WITH urls AS ({urls_cte}),
        counts AS (
          SELECT lower(regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
                 count(*) AS n_docs
          FROM urls GROUP BY 1
        ),
        hist AS (
          SELECT n_docs, count(*) AS n_domains
          FROM counts GROUP BY n_docs
        ),
        cum AS (
          SELECT n_docs,
                 CAST(coalesce(sum(n_docs * n_domains) OVER (
                        ORDER BY n_docs DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS cum_before
          FROM hist
        ),
        tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM counts)
        SELECT c.host, CAST(c.n_docs AS BIGINT) AS n_docs, m.cum_before,
               CASE WHEN m.cum_before < {head_frac!r} * t.total THEN 'head'
                    WHEN m.cum_before < {mid_frac!r} * t.total THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM counts c JOIN cum m ON c.n_docs = m.n_docs, tot t
    """
