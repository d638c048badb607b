"""Page-metadata extraction: the WAT-style head fields of a crawl row.

The lightweight metadata pass that runs long before full extraction:
``<title>``, ``<meta name="description">``, ``<meta property="og:title">``
and the ``<html lang=...>`` declaration — the fields used for snippeting,
language routing (cross-checked against detected lang, ops/textstats),
and title-based near-dup candidate keys.

Scale shape: four in-row JVM regexps over the bounded 8 KB head window
(same bound as the dispatch probes, job.py:50, and the robots gate,
ops/robots.py — head metadata lives in <head>). Zero shuffles, zero
Python, lenient decode so arbitrary crawl bytes never throw.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["page_meta", "synth_meta_pages", "page_meta_oracle_sql"]

_TITLE = r"(?is)<title[^>]*>([^<]*)</title>"


def _meta_res(attr: str, value: str) -> tuple[str, str]:
    """Both attribute orders for <meta {attr}="{value}" content="...">
    (the robots-gate posture, ops/robots.py — CMSes emit either)."""
    return (
        rf'(?is)<meta\s[^>]*{attr}\s*=\s*["\']{value}["\'][^>]*'
        rf'content\s*=\s*["\']([^"\']*)["\']',
        rf'(?is)<meta\s[^>]*content\s*=\s*["\']([^"\']*)["\'][^>]*'
        rf'{attr}\s*=\s*["\']{value}["\']',
    )


_DESC = _meta_res("name", "description")
_OG_TITLE = _meta_res("property", "og:title")
_HTML_LANG = r'(?is)<html\s[^>]*lang\s*=\s*["\']([^"\']*)["\']'


def page_meta(pages: DataFrame, html_col: str = "html") -> DataFrame:
    from .robots import _head  # the one bounded lenient head window

    head = _head(F.col(html_col))

    def grab(rx: str):
        return F.nullif(F.trim(F.regexp_extract(head, rx, 1)), F.lit(""))

    def grab_meta(res: tuple[str, str]):
        return F.coalesce(grab(res[0]), grab(res[1]))

    return pages.withColumns(
        {
            "title": grab(_TITLE),
            "meta_description": grab_meta(_DESC),
            "og_title": grab_meta(_OG_TITLE),
            "html_lang": grab(_HTML_LANG),
        }
    )


# ------------------------------------------------------------ synthesis
# Law over doc_id (mirrored in the oracle):
#   title      = 'Title <d>'                       always
#   description= 'Desc <d>'                        iff d % 3 != 2
#   og:title   = 'OG <d>'                          iff d % 5 == 0
#   html lang  = ['en','de','fr',NULL][d % 4]      (d%4==3 -> no attr)
_URL = "https://synth.test/page/"
_LANGS = ["en", "de", "fr"]


def synth_meta_pages(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    lang_attr = (
        F.when(d % 4 == 0, F.lit(' lang="en"'))
        .when(d % 4 == 1, F.lit(' lang="de"'))
        .when(d % 4 == 2, F.lit(' lang="fr"'))
        .otherwise(F.lit(""))
    )
    desc = F.when(
        d % 3 != 2,
        F.concat(
            F.lit('<meta name="description" content="Desc '),
            d.cast("string"),
            F.lit('">'),
        ),
    ).otherwise(F.lit(""))
    og = F.when(
        d % 5 == 0,
        F.concat(
            F.lit('<meta property="og:title" content="OG '),
            d.cast("string"),
            F.lit('">'),
        ),
    ).otherwise(F.lit(""))
    html_str = F.concat(
        F.lit("<html"),
        lang_attr,
        F.lit("><head><title>Title "),
        d.cast("string"),
        F.lit("</title>"),
        desc,
        og,
        F.lit("</head><body>p</body></html>"),
    )
    return docs.select(
        F.concat(F.lit(_URL), d.cast("string")).alias("url"),
        F.encode(html_str, "UTF-8").alias("html"),
    )


def page_meta_oracle_sql() -> str:
    return f"""
    SELECT
        '{_URL}' || CAST(doc_id AS VARCHAR) AS url,
        'Title ' || CAST(doc_id AS VARCHAR) AS title,
        CASE WHEN doc_id % 3 <> 2
             THEN 'Desc ' || CAST(doc_id AS VARCHAR) END AS meta_description,
        CASE WHEN doc_id % 5 = 0
             THEN 'OG ' || CAST(doc_id AS VARCHAR) END AS og_title,
        CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
             WHEN 2 THEN 'fr' END AS html_lang
    FROM documents
    """
