"""URL-level curation: blocklist + soft keyword rules (UT1/FineWeb-style).

Crawl pipelines filter on the URL *before* paying for extraction:
a domain blocklist (the UT1 list in RefinedWeb/FineWeb is ~4M domains)
plus soft URL-keyword scoring (FineWeb: one hard adult term rejects,
two soft gambling/ads terms reject), spammy-query and path-depth gates.
The reference (docling) has no crawl stage — this belongs to the
training-data-pipeline contract, not reference parity.

Scale shape:
- host/path parsing is in-row regexp (JVM codegen, zero Python);
- blocklist matching must cover SUBDOMAINS (host `a.ads.example` hits
  blocked `ads.example`), which is a suffix match, not an equality.
  Implemented as: explode the host's label-suffix chain (≤ 8 rows/doc,
  bounded) → equi-join against the blocklist dim → groupBy doc. With a
  4M-row list the join side is a few hundred MB: broadcast it (done
  here), or bucket both sides on the suffix at 100 TB. No regex-per-
  blocklist-entry, no crossJoin;
- keyword/digit-run gates are single regexp_count/regexp_extract calls
  on the lowercased URL — scan → project, embarrassingly parallel.

The synthetic URL corpus is a deterministic law over ``doc_id`` (the
testdata documents table carries no url), expressible identically in
Spark SQL and DuckDB so the oracle rebuilds it byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Frozen demo blocklist (stand-in for UT1; swap for the real dim table).
DEFAULT_BLOCKED = [
    "ads.tracker.test",
    "casino-games.example",
    "bad.example",  # blocks malware.bad.example via suffix match
]

HARD_KEYWORDS = ["xxx", "porn"]
SOFT_KEYWORDS = ["poker", "bet", "casino", "prize"]

MAX_PATH_DEPTH = 6
SPAM_DIGIT_RUN = 12

_HOSTS = [
    "www.news.example",
    "blog.example.org",
    "en.wiki.test",
    "ads.tracker.test",
    "shop.example",
    "docs.spark.example",
    "casino-games.example",
    "forum.example.net",
    "malware.bad.example",
    "mail.example",
    "code.example.io",
    "data.example.gov",
]

_SEGS = ["page", "article", "item", "post", "topic", "entry", "view", "node"]


# ------------------------------------------------------------------ corpus
def synth_urls(docs: DataFrame) -> DataFrame:
    """(doc_id, url) by law: host = HOSTS[doc_id % 12]; path depth
    doc_id % 9 with segments SEGS[(doc_id + i) % 8]; hard keyword at
    %13, two soft keywords at %11, one soft at %7, digit-run query at
    %15. Mirrored in the DuckDB oracle (see __spark_entry__)."""
    host = F.element_at(
        F.array(*[F.lit(h) for h in _HOSTS]), (F.col("doc_id") % 12 + 1).cast("int")
    )
    depth = (F.col("doc_id") % 9).cast("int")
    path = F.concat_ws(
        "/",
        F.transform(
            F.sequence(F.lit(1), depth),
            lambda i: F.element_at(
                F.array(*[F.lit(s) for s in _SEGS]),
                ((F.col("doc_id") + i) % 8 + 1).cast("int"),
            ),
        ),
    )
    path = F.when(depth > 0, F.concat(F.lit("/"), path)).otherwise(F.lit(""))
    path = F.concat(
        path,
        F.when(F.col("doc_id") % 13 == 0, F.lit("/xxx-videos")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit("/poker-bet-online")).otherwise(
            F.lit("")
        ),
        F.when(
            (F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 11 != 0),
            F.lit("/prize-draw"),
        ).otherwise(F.lit("")),
    )
    query = F.when(
        F.col("doc_id") % 15 == 0,
        F.concat(F.lit("?session="), F.lpad((F.col("doc_id") * 37).cast("string"), 14, "0")),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(F.lit("https://"), host, path, query).alias("url")
    )


# ------------------------------------------------------------------ operator
def url_host(url: Column) -> Column:
    """Hostname only: scheme required, optional userinfo@ stripped,
    :port stripped — so `evil.example:8080` still matches a blocklisted
    `evil.example`."""
    return F.regexp_extract(url, r"^[a-z]+://(?:[^/?#@]*@)?([^/?#:]+)", 1)


def _suffixes(host: Column) -> Column:
    """All label suffixes of a host: a.b.c -> [a.b.c, b.c, c] (≤ 8)."""
    parts = F.slice(F.split(host, r"\."), 1, 8)
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(parts, i, n)),
    )


def blocked_domains(spark: SparkSession, blocked: list[str] | None = None) -> DataFrame:
    return spark.createDataFrame(
        [(b,) for b in (blocked if blocked is not None else DEFAULT_BLOCKED)],
        "domain string",
    )


def url_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Adds (host, reason, keep). First-failing-reason order:
    blocked_domain > hard_keyword > soft_keywords > spam_query >
    too_deep > keep (the curate.py convention)."""
    url = F.lower(F.col(url_col))
    df = df.withColumn("host", url_host(url))
    # Suffix-explode (≤ 8 rows/doc, same partition) → broadcast left join →
    # re-collapse. The partial HashAggregate merges a doc's rows MAP-SIDE,
    # so the one exchange carries ~1 slim row per doc — no second corpus
    # scan, no sort-merge join-back.
    # explode_outer: rows with a null/unparseable url must NOT vanish —
    # they surface as reason=invalid_url below
    sfx = df.select(
        "doc_id",
        F.col(url_col).alias("__url"),
        "host",
        F.explode_outer(_suffixes(F.col("host"))).alias("domain"),
    )
    df = (
        sfx.join(
            F.broadcast(blocklist.withColumn("__hit", F.lit(True))),
            "domain",
            "left",
        )
        .groupBy("doc_id", "__url", "host")
        .agg(F.max("__hit").alias("blocked"))
        .withColumnRenamed("__url", url_col)
    )
    hard = sum(
        (F.regexp_count(url, F.lit(k)) for k in HARD_KEYWORDS), F.lit(0)
    )
    soft = sum(
        (F.regexp_count(url, F.lit(k)) for k in SOFT_KEYWORDS), F.lit(0)
    )
    depth = F.size(F.filter(F.split(F.regexp_extract(url, r"^[a-z]+://[^/?#]+([^?#]*)", 1), "/"), lambda s: s != ""))
    spam = F.regexp_count(url, F.lit(r"\d{%d,}" % SPAM_DIGIT_RUN)) > 0
    reason = (
        F.when(
            F.col(url_col).isNull() | (F.col("host") == ""), "invalid_url"
        )
        .when(F.col("blocked").isNotNull(), "blocked_domain")
        .when(hard >= 1, "hard_keyword")
        .when(soft >= 2, "soft_keywords")
        .when(spam, "spam_query")
        .when(depth > MAX_PATH_DEPTH, "too_deep")
        .otherwise("keep")
    )
    return df.select(
        "doc_id",
        F.col(url_col),
        "host",
        reason.alias("reason"),
        (reason == "keep").alias("keep"),
    )
