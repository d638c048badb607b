"""Robots-directive gate: honor in-page ``<meta name="robots">`` opt-outs.

A curation-compliance stage for crawl corpora (the CCNet/RefinedWeb
practice of dropping pages whose authors opted out of indexing):
extract ``noindex`` / ``nofollow`` / ``none`` directives and the
``<link rel="canonical">`` target from the page head, and gate the
corpus on them. ``noindex`` (or ``none``) rejects the page;
``nofollow`` keeps the page but tells the link-graph stage
(ops/linkgraph) to skip its out-edges; a canonical link re-keys the
page for ops/urlnorm.canonical_dedup.

Scale shape: every signal is an in-row JVM regexp over a BOUNDED head
window (first 8 KB — directives live in <head>, same bound the format
dispatch uses, job.py:50) of the lenient-decoded blob. Zero shuffles,
zero Python, whole-stage codegen end to end.

Real-world scope note: the regex accepts both attribute orders
(name-then-content and content-then-name), single or double quotes,
and any-case directive tokens; an X-Robots-Tag HTTP header lives in
the WARC response headers, outside this table's columns — a deployment
carrying a ``headers`` column would OR one more in-row regexp, not
change the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "robots_signals",
    "robots_gate",
    "synth_robots_pages",
    "robots_gate_oracle_sql",
]

_HEAD_BYTES = 8192

# content value of a robots meta, either attribute order
_META_NC = (
    r'(?is)<meta\s[^>]*name\s*=\s*["\']robots["\'][^>]*'
    r'content\s*=\s*["\']([^"\']*)["\']'
)
_META_CN = (
    r'(?is)<meta\s[^>]*content\s*=\s*["\']([^"\']*)["\'][^>]*'
    r'name\s*=\s*["\']robots["\']'
)
_CANONICAL = (
    r'(?is)<link\s[^>]*rel\s*=\s*["\']canonical["\'][^>]*'
    r'href\s*=\s*["\']([^"\']*)["\']'
)


def _head(html: Column) -> Column:
    # lenient decode: crawl blobs may carry invalid UTF-8; the gate must
    # never throw (same posture as the dispatch probes, job.py)
    return F.substring(html, 1, _HEAD_BYTES).cast("string")


def robots_signals(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Add noindex / nofollow / canonical_url columns. In-row JVM only."""
    head = _head(F.col(html_col))
    directives = F.lower(
        F.coalesce(
            F.nullif(F.regexp_extract(head, _META_NC, 1), F.lit("")),
            F.nullif(F.regexp_extract(head, _META_CN, 1), F.lit("")),
            F.lit(""),
        )
    )
    has = lambda tok: directives.rlike(rf"(^|[\s,]){tok}([\s,]|$)")
    none = has("none")
    return pages.withColumns(
        {
            "noindex": has("noindex") | none,
            "nofollow": has("nofollow") | none,
            "canonical_url": F.nullif(
                F.regexp_extract(head, _CANONICAL, 1), F.lit("")
            ),
        }
    )


def robots_gate(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Keep/reject verdict: reject pages whose authors said noindex."""
    sig = robots_signals(pages, html_col)
    return sig.withColumns(
        {
            "keep": ~F.col("noindex"),
            "reason": F.when(F.col("noindex"), F.lit("robots:noindex"))
            .otherwise(F.lit("ok")),
        }
    )


# ------------------------------------------------------------ synthesis
# Law over doc_id (mirrored in the oracle, which re-derives verdicts
# from the arithmetic — never by regexing HTML in SQL):
#   m = doc_id % 13:
#     m == 0 -> <meta name="robots" content="noindex">          (reject)
#     m == 1 -> <meta content="NOINDEX, nofollow" name="robots"> (reject;
#               flipped attribute order + upper-case token)
#     m == 2 -> <meta name="robots" content="none">              (reject)
#     m == 3 -> <meta name="robots" content="nofollow">          (keep,
#               nofollow=true)
#     m == 4 -> <meta name="robots" content="index, follow">     (keep)
#     else   -> no robots meta                                   (keep)
#   doc_id % 4 == 0 -> <link rel="canonical"
#                       href="https://synth.test/page/<doc_id>">
_URL = "https://synth.test/page/"


def synth_robots_pages(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    m = d % 13
    meta = (
        F.when(m == 0, F.lit('<meta name="robots" content="noindex">'))
        .when(
            m == 1,
            F.lit('<meta content="NOINDEX, nofollow" name="robots">'),
        )
        .when(m == 2, F.lit('<meta name="robots" content="none">'))
        .when(m == 3, F.lit('<meta name="robots" content="nofollow">'))
        .when(m == 4, F.lit('<meta name="robots" content="index, follow">'))
        .otherwise(F.lit(""))
    )
    canonical = F.when(
        d % 4 == 0,
        F.concat(
            F.lit('<link rel="canonical" href="' + _URL),
            d.cast("string"),
            F.lit('">'),
        ),
    ).otherwise(F.lit(""))
    html_str = F.concat(
        F.lit("<html><head><title>p</title>"),
        meta,
        canonical,
        F.lit("</head><body>page "),
        d.cast("string"),
        F.lit("</body></html>"),
    )
    return docs.select(
        F.concat(F.lit(_URL), d.cast("string"), F.lit("?ref=crawl")).alias(
            "url"
        ),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=d.cast("double"))
        ).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def robots_gate_oracle_sql() -> str:
    return f"""
    SELECT
        '{_URL}' || CAST(doc_id AS VARCHAR) || '?ref=crawl' AS url,
        doc_id % 13 IN (0, 1, 2) AS noindex,
        doc_id % 13 IN (1, 2, 3) AS nofollow,
        CASE WHEN doc_id % 4 = 0
             THEN '{_URL}' || CAST(doc_id AS VARCHAR) END AS canonical_url,
        doc_id % 13 NOT IN (0, 1, 2) AS keep,
        CASE WHEN doc_id % 13 IN (0, 1, 2) THEN 'robots:noindex'
             ELSE 'ok' END AS reason
    FROM documents
    """
