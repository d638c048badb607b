"""Site-template boilerplate removal: strip lines that repeat across a
domain's pages (the CCNet/boilerpipe observation — nav bars, cookie
banners, footers are LINES THAT RECUR SITE-WIDE, not content).

Complementary to ``ops/paradedup.py``: paragraph dedup keeps the single
global FIRST occurrence of a repeated block; template removal is
domain-scoped and frequency-thresholded — a line present on >= ``tau``
of a domain's pages is boilerplate and is removed from EVERY page,
first occurrence included (a nav bar is noise on page 1 too). Rare
cross-page repeats (a quoted sentence on 2 of 500 pages) survive.

Law: line ``l`` is boilerplate for domain ``d`` iff
  - domain ``d`` has >= ``min_docs`` pages (small sites give no
    frequency signal), and
  - the fraction of ``d``'s pages containing a line with ``l``'s
    normalized hash (lower+trim) is >= ``tau``.

Scale shape (the paradedup discipline): line split/hash are in-row JVM
expressions; candidate counting is distinct (doc, domain, hash) →
ONE (domain, hash) exchange with map-side combine (a banner on 10^8
pages of one site collapses per map task); per-domain page totals are a
slim (domain, n) agg; the boilerplate set folds to ONE ROW PER DOMAIN
(collect_set of template hashes — bounded by the template size, not the
corpus) and joins back on ``domain`` so the rebuild is an in-row lambda
filter against the broadcast-sized per-domain set. Zero Python, nothing
all-pairs, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "strip_boilerplate",
    "synth_domain_corpus",
    "DOMAIN_CTE_SQL",
    "strip_boilerplate_oracle_sql",
]

DEFAULT_TAU = 0.5
DEFAULT_MIN_DOCS = 3

_LINE_SPLIT = "\n"


def _line_hash(l: Column) -> Column:
    return F.md5(F.lower(F.trim(l)))


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "wtext",
    tau: float = DEFAULT_TAU,
    min_docs: int = DEFAULT_MIN_DOCS,
) -> DataFrame:
    """(doc_id, domain, <text_col>) -> (doc_id, domain, n_lines, n_kept,
    clean_text) with every site-template line removed from every page.

    Empty/whitespace-only lines are never counted and never removed (a
    blank separator is layout, not template content)."""
    base = df.select(
        "doc_id", "domain", F.split(F.col(text_col), _LINE_SPLIT).alias("lines")
    )
    # distinct (doc, domain, hash): a line repeated WITHIN one page counts
    # that page once toward the site-wide fraction
    ex = (
        base.select("doc_id", "domain", F.explode("lines").alias("l"))
        .where(F.length(F.trim("l")) > 0)
        .select("doc_id", "domain", _line_hash(F.col("l")).alias("h"))
        .distinct()
    )
    totals = base.groupBy("domain").agg(
        F.countDistinct("doc_id").alias("__n_docs")
    )
    bp = (
        ex.groupBy("domain", "h")
        .agg(F.count("*").alias("__n_with"))
        .join(totals, "domain")
        .where(
            (F.col("__n_docs") >= min_docs)
            & (F.col("__n_with") >= F.col("__n_docs") * tau)
        )
        # one row per domain: the template-hash set is bounded by the
        # site's template size, so the join back is slim however many
        # pages the domain has
        .groupBy("domain")
        .agg(F.collect_set("h").alias("__bp"))
    )
    joined = base.join(bp, "domain", "left")
    bp_set = F.coalesce(F.col("__bp"), F.array().cast("array<string>"))
    kept = F.filter(
        "lines",
        lambda l: (F.length(F.trim(l)) == 0)
        | ~F.array_contains(bp_set, _line_hash(l)),
    )
    return joined.select(
        "doc_id",
        "domain",
        F.size("lines").alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, _LINE_SPLIT).alias("clean_text"),
    )


# ------------------------------------------------------------ synthesis
# Domain-template law (mirrored in DOMAIN_CTE_SQL): doc d belongs to
# domain d % 7. Every page of a domain carries a nav line and a footer
# line (freq 1.0 -> boilerplate); pages with even doc_id carry a promo
# line (freq ~0.5 -> sits exactly at the tau=0.5 threshold, >= keeps it
# boilerplate — the law pins the boundary semantics); each page carries
# 1 + d % 3 unique content lines plus one blank separator (freq 1/n,
# never boilerplate; the blank is exempt by rule).
_N_DOMAINS = 7


def synth_domain_corpus(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    dom = F.concat(F.lit("site"), (d % _N_DOMAINS).cast("string"))
    content = F.transform(
        F.sequence(F.lit(0), (d % 3).cast("int")),
        lambda j: F.concat(
            F.lit("article "),
            d.cast("string"),
            F.lit(" body line "),
            j.cast("string"),
        ),
    )
    nav = F.concat(F.lit("Home | About | Contact — "), dom)
    footer = F.concat(F.lit("(c) 2026 "), dom, F.lit(" all rights reserved"))
    promo = F.concat(F.lit("SUBSCRIBE to the "), dom, F.lit(" newsletter!"))
    head = F.when(
        d % 2 == 0, F.array(nav, promo, F.lit(""))
    ).otherwise(F.array(nav, F.lit("")))
    lines = F.concat(head, content, F.array(footer))
    return docs.select(
        d.alias("doc_id"),
        dom.alias("domain"),
        F.array_join(lines, _LINE_SPLIT).alias("wtext"),
    )


DOMAIN_CTE_SQL = f"""
    dl AS (
        SELECT doc_id,
               'site' || CAST(doc_id % {_N_DOMAINS} AS VARCHAR) AS domain,
               list_concat(
                   CASE WHEN doc_id % 2 = 0 THEN [
                       'Home | About | Contact — site'
                           || CAST(doc_id % {_N_DOMAINS} AS VARCHAR),
                       'SUBSCRIBE to the site'
                           || CAST(doc_id % {_N_DOMAINS} AS VARCHAR)
                           || ' newsletter!',
                       ''
                   ] ELSE [
                       'Home | About | Contact — site'
                           || CAST(doc_id % {_N_DOMAINS} AS VARCHAR),
                       ''
                   ] END,
                   list_concat(
                       (SELECT list('article ' || CAST(doc_id AS VARCHAR)
                                    || ' body line ' || CAST(j AS VARCHAR)
                                    ORDER BY j)
                        FROM UNNEST(range(0, 1 + doc_id % 3)) AS t(j)),
                       ['(c) 2026 site'
                            || CAST(doc_id % {_N_DOMAINS} AS VARCHAR)
                            || ' all rights reserved']
                   )
               ) AS lines
        FROM documents
    )
"""


def strip_boilerplate_oracle_sql(
    tau: float = DEFAULT_TAU, min_docs: int = DEFAULT_MIN_DOCS
) -> str:
    return f"""
    WITH {DOMAIN_CTE_SQL},
    ex AS (
        SELECT DISTINCT doc_id, domain, md5(lower(trim(l))) AS h
        FROM dl, UNNEST(lines) AS t(l)
        WHERE length(trim(l)) > 0
    ),
    totals AS (
        SELECT domain, count(DISTINCT doc_id) AS n_docs FROM dl GROUP BY domain
    ),
    bp AS (
        SELECT domain, h
        FROM ex JOIN totals USING (domain)
        GROUP BY domain, h, n_docs
        HAVING n_docs >= {min_docs}
           AND count(*) >= n_docs * {tau}
    ),
    flat AS (
        SELECT dl.doc_id, dl.domain, lines[i] AS l, i,
               CASE WHEN length(trim(lines[i])) = 0 THEN FALSE
                    ELSE EXISTS (SELECT 1 FROM bp
                                 WHERE bp.domain = dl.domain
                                   AND bp.h = md5(lower(trim(lines[i]))))
               END AS is_bp
        FROM dl, UNNEST(range(1, len(lines) + 1)) AS t(i)
    )
    SELECT doc_id, domain,
           count(*) AS n_lines,
           count(*) FILTER (NOT is_bp) AS n_kept,
           coalesce(string_agg(l, chr(10) ORDER BY i) FILTER (NOT is_bp),
                    '') AS clean_text
    FROM flat GROUP BY doc_id, domain
    """
