"""Sitemap parsing: the crawl-discovery side of the frontier.

robots.txt (``ops/robotstxt.py``) says what a crawler may NOT fetch;
sitemaps (sitemaps.org protocol) say what it SHOULD — per-URL
``<loc>`` with optional ``<lastmod>``/``<changefreq>``/``<priority>``
hints that feed directly into frontier ordering (``ops/frontier.py``)
and recrawl scheduling (``ops/snapshot.py``'s CDC decides what changed;
lastmod is the publisher's claim of the same thing). This module
parses sitemap XML blobs — both ``<urlset>`` leaves and
``<sitemapindex>`` files pointing at child sitemaps — into a typed
entry table, entirely with JVM expressions.

Parsing law (regex-level, deliberately not a full XML parser — the
protocol's structure is flat and the law must be engine-portable):

- entries: non-greedy ``<url>…</url>`` / ``<sitemap>…</sitemap>``
  blocks (dotall);
- fields: first ``<loc>``, ``<lastmod>``, ``<changefreq>``,
  ``<priority>`` inside the block, trimmed;
- ``loc`` XML entities unescaped (&amp; &lt; &gt; &quot; &apos; — the
  five the protocol requires publishers to escape);
- ``lastmod_date``: the date prefix of the W3C datetime, try-cast
  (garbage → NULL, never an error); ``priority`` try-cast to double;
- entries without a ``<loc>`` are dropped (they address nothing).

Scale shape: one in-row ``regexp_extract_all`` + ``posexplode`` per
blob — the blow-up is bounded by entry count (the protocol caps a
sitemap at 50k URLs), and everything after the explode is narrow
per-row projection. Zero shuffles, zero Python. No reference
counterpart (docling has no crawl layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "parse_sitemaps",
    "synth_sitemaps",
    "SYNTH_SITEMAPS_SQL",
    "parse_sitemaps_oracle_sql",
]

_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_SM_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"
_CHANGEFREQ = r"(?s)<changefreq>\s*(.*?)\s*</changefreq>"
_PRIORITY = r"(?s)<priority>\s*(.*?)\s*</priority>"


def _unescape(col):
    out = col
    for ent, ch in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
    ]:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _entries(sitemaps: DataFrame, block_re: str, kind: str) -> DataFrame:
    blocks = F.regexp_extract_all(F.col("sitemap_xml"), F.lit(block_re), 1)
    e = sitemaps.select(
        "host", F.posexplode(blocks).alias("entry_idx", "block")
    )
    loc = F.regexp_extract(F.col("block"), _LOC, 1)
    lastmod = F.regexp_extract(F.col("block"), _LASTMOD, 1)
    return e.select(
        "host",
        "entry_idx",
        F.lit(kind).alias("kind"),
        _unescape(loc).alias("loc"),
        F.when(lastmod != "", lastmod).alias("lastmod"),
        F.when(lastmod != "", F.substring(lastmod, 1, 10))
        .try_cast("date")
        .cast("string")
        .alias("lastmod_date"),
        F.when(
            F.regexp_extract(F.col("block"), _CHANGEFREQ, 1) != "",
            F.regexp_extract(F.col("block"), _CHANGEFREQ, 1),
        ).alias("changefreq"),
        F.regexp_extract(F.col("block"), _PRIORITY, 1)
        .try_cast("double")
        .alias("priority"),
    ).filter(F.col("loc") != "")


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """(host, sitemap_xml) → typed entries: (host, entry_idx, kind
    'url'|'sitemap', loc, lastmod, lastmod_date, changefreq,
    priority)."""
    return _entries(sitemaps, _URL_BLOCK, "url").unionByName(
        _entries(sitemaps, _SM_BLOCK, "sitemap")
    )


# ------------------------------------------------------- synthetic corpus
def _synth_rows(hosts: list[str]) -> list[tuple[str, str]]:
    rows = []
    for h, host in enumerate(hosts):
        if h % 5 == 4:  # sitemap-index file
            body = "".join(
                f"<sitemap><loc>https://{host}/sitemap-{j}.xml</loc>"
                f"<lastmod>2026-0{1 + j}-01</lastmod></sitemap>"
                for j in range(2)
            )
            xml = f'<?xml version="1.0"?><sitemapindex>{body}</sitemapindex>'
        else:
            parts = []
            for i in range(3 + h % 4):
                fields = f"<loc> https://{host}/p{i}?a=1&amp;b=2 </loc>"
                if (h + i) % 2 == 0:
                    fields += f"<lastmod>2026-0{1 + i % 9}-1{i % 3}T10:00:00+00:00</lastmod>"
                if i % 3 == 0:
                    fields += f"<priority>0.{i % 10}</priority>"
                if i % 2 == 1:
                    fields += "<changefreq>weekly</changefreq>"
                if i == 2:
                    fields = "<loc></loc>" + "</url><url>" + fields
                parts.append(f"<url>{fields}</url>")
            xml = f'<?xml version="1.0"?><urlset>{"".join(parts)}</urlset>'
        rows.append((host, xml))
    return rows


def synth_sitemaps(spark: SparkSession, hosts: list[str]) -> DataFrame:
    return spark.createDataFrame(
        _synth_rows(hosts), "host string, sitemap_xml string"
    )


def SYNTH_SITEMAPS_SQL(hosts: list[str]) -> str:
    """DuckDB CTE body with the identical rows."""
    selects = []
    for host, xml in _synth_rows(hosts):
        esc = xml.replace("'", "''")
        selects.append(f"SELECT '{host}' AS host, '{esc}' AS sitemap_xml")
    return " UNION ALL ".join(selects)


def parse_sitemaps_oracle_sql(sitemaps_cte: str) -> str:
    """DuckDB mirror of :func:`parse_sitemaps`."""

    def entries(block_re: str, kind: str) -> str:
        return f"""
          SELECT host, g.i - 1 AS entry_idx, '{kind}' AS kind,
                 replace(replace(replace(replace(replace(
                   trim(regexp_extract(list_extract(
                     regexp_extract_all(sitemap_xml, '{block_re}', 1), g.i),
                     '(?s)<loc>\\s*(.*?)\\s*</loc>', 1)),
                   '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                   '&apos;', ''''), '&amp;', '&') AS loc,
                 nullif(trim(regexp_extract(list_extract(
                   regexp_extract_all(sitemap_xml, '{block_re}', 1), g.i),
                   '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1)), '')
                   AS lastmod,
                 CAST(TRY_CAST(substring(nullif(trim(regexp_extract(list_extract(
                   regexp_extract_all(sitemap_xml, '{block_re}', 1), g.i),
                   '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1)), ''), 1, 10)
                   AS DATE) AS VARCHAR) AS lastmod_date,
                 nullif(trim(regexp_extract(list_extract(
                   regexp_extract_all(sitemap_xml, '{block_re}', 1), g.i),
                   '(?s)<changefreq>\\s*(.*?)\\s*</changefreq>', 1)), '')
                   AS changefreq,
                 TRY_CAST(trim(regexp_extract(list_extract(
                   regexp_extract_all(sitemap_xml, '{block_re}', 1), g.i),
                   '(?s)<priority>\\s*(.*?)\\s*</priority>', 1))
                   AS DOUBLE) AS priority
          FROM sitemaps, LATERAL (
            SELECT unnest(range(1,
              len(regexp_extract_all(sitemap_xml, '{block_re}', 1)) + 1))
              AS i) g
          WHERE trim(regexp_extract(list_extract(
                  regexp_extract_all(sitemap_xml, '{block_re}', 1), g.i),
                  '(?s)<loc>\\s*(.*?)\\s*</loc>', 1)) != ''
        """

    return f"""
        WITH sitemaps AS ({sitemaps_cte})
        {entries("(?s)<url>(.*?)</url>", "url")}
        UNION ALL
        {entries("(?s)<sitemap>(.*?)</sitemap>", "sitemap")}
    """
