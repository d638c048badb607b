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


# changefreq → recrawl interval in days ('always'/'hourly' share the
# daily floor at corpus granularity; 'never' → no interval)
CHANGEFREQ_DAYS = [
    ("always", 1),
    ("hourly", 1),
    ("daily", 1),
    ("weekly", 7),
    ("monthly", 30),
    ("yearly", 365),
]
DEFAULT_INTERVAL_DAYS = 7


def recrawl_due(entries: DataFrame, asof: str) -> DataFrame:
    """Recrawl scheduling over parsed sitemap entries: which URLs are
    due as of ``asof`` (YYYY-MM-DD), and at what priority.

    Law (documented where the protocol is silent): ``changefreq`` maps
    to a day interval per CHANGEFREQ_DAYS (missing → 7-day default,
    ``never`` → no interval); a URL is DUE when its ``lastmod_date``
    is missing/unparseable (we know nothing — fetch) or when at least
    the interval has elapsed since it; ``never`` with a valid lastmod
    is not due. ``fetch_priority`` = declared priority, 0.5 default
    (the protocol's own default). The output joins straight into
    :func:`ops.frontier.schedule_frontier` as the frontier of a
    refresh crawl — the publisher-hint counterpart of the
    content-hash CDC in ``ops/snapshot.py``.

    Scale shape: pure in-row date arithmetic on the entry table —
    zero shuffles, zero Python.
    """
    interval = None
    for name, days in CHANGEFREQ_DAYS:
        cond = F.when(F.col("changefreq") == name, F.lit(days))
        interval = cond if interval is None else interval.when(
            F.col("changefreq") == name, F.lit(days)
        )
    interval = interval.otherwise(
        F.when(
            F.col("changefreq").isNull(), F.lit(DEFAULT_INTERVAL_DAYS)
        )
    )  # 'never' (or unknown values) fall through to NULL
    lastmod = F.col("lastmod_date").try_cast("date")
    days_since = F.datediff(F.lit(asof).cast("date"), lastmod)
    due = lastmod.isNull() | (
        interval.isNotNull() & (days_since >= interval)
    )
    return entries.filter(F.col("kind") == "url").select(
        "host",
        "loc",
        interval.cast("bigint").alias("interval_days"),
        days_since.cast("bigint").alias("days_since"),
        due.alias("due"),
        F.coalesce(F.col("priority"), F.lit(0.5)).alias("fetch_priority"),
    )


def recrawl_due_oracle_sql(entries_sql: str, asof: str) -> str:
    """DuckDB mirror over the parse_sitemaps oracle text."""
    freq_case = " ".join(
        f"WHEN changefreq = '{name}' THEN {days}"
        for name, days in CHANGEFREQ_DAYS
    )
    interval = (
        f"CASE {freq_case} "
        "WHEN changefreq IS NULL THEN "
        f"{DEFAULT_INTERVAL_DAYS} END"
    )
    return f"""
        WITH entries AS ({entries_sql}),
        urls AS (SELECT * FROM entries WHERE kind = 'url'),
        calc AS (
          SELECT host, loc,
                 {interval} AS interval_days,
                 date_diff('day', TRY_CAST(lastmod_date AS DATE),
                           DATE '{asof}') AS days_since,
                 TRY_CAST(lastmod_date AS DATE) IS NULL AS no_lastmod,
                 coalesce(priority, 0.5) AS fetch_priority
          FROM urls
        )
        SELECT host, loc,
               CAST(interval_days AS BIGINT) AS interval_days,
               CAST(days_since AS BIGINT) AS days_since,
               (no_lastmod OR (interval_days IS NOT NULL
                               AND days_since >= interval_days)) AS due,
               fetch_priority
        FROM calc
    """
