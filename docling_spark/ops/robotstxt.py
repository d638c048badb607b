"""robots.txt (REP) evaluation: group parsing + longest-prefix-match.

The companion to the in-page meta-robots gate (``ops/robots.py``): real
crawl compliance is decided by the host's ``/robots.txt`` file — RFC
9309's user-agent groups with allow/disallow rules. This module
evaluates a table of fetched robots.txt blobs against a URL frontier,
entirely with JVM expressions (no Python), and the whole law is
mirrored in a DuckDB oracle.

Implemented subset (documented, deterministic):

- line grammar: ``field: value`` with ``#`` comments stripped,
  case-insensitive field names, surrounding whitespace trimmed;
- grouping per RFC 9309 §2.1: consecutive ``User-agent`` lines stack
  onto ONE group; rules that precede any group header are ignored;
- group selection: if any group names the crawler's agent token
  (case-insensitive exact match), ALL such groups apply and ``*``
  groups are ignored; otherwise all ``*`` groups apply;
- rule matching: literal PATH-PREFIX match on path+query (the original
  1994 REP); the longest matched rule wins, and on a length tie
  ``allow`` beats ``disallow`` (RFC 9309 §2.2.2);
- empty ``Disallow:`` (the classic allow-all marker) and rules
  containing ``*`` or ``$`` wildcards contribute no rule — the
  wildcard grammar is out of this subset, and dropping a rule fails
  OPEN to the no-match default (allowed), matching how a prefix-only
  1994-REP crawler reads a 9309 file;
- ``Crawl-delay`` (non-standard but ubiquitous): the minimum numeric
  value across the applicable groups is reported per host, feeding
  straight into the frontier scheduler's ``delay_s``
  (``ops/frontier.py``).

Scale shape: parsing is one window over (host, line_no) — partitioned
by host, so state per task is one robots file, never the corpus. The
compiled per-host rule table is tiny next to the frontier (hosts ×
rules, not urls) and joins the URL table on the host equi-key; the
per-url winner is a (host,...) window over at most that host's rule
count. Zero Python anywhere. No reference counterpart (docling has no
crawl layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "parse_robots_rules",
    "sitemap_urls",
    "robots_allowed",
    "crawl_delays",
    "synth_robots",
    "synth_probe_urls",
    "SYNTH_ROBOTS_SQL",
    "SYNTH_PROBE_URLS_SQL",
    "robots_allowed_oracle_sql",
]

_FIELD_RE = r"^([A-Za-z-]+)\s*:"
_VALUE_RE = r"^[A-Za-z-]+\s*:\s*(.*)$"
# path+query of an absolute URL; empty path normalizes to "/"
_PATHQ_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)"


def _lines(robots: DataFrame) -> DataFrame:
    """(host, ln, field, value) for recognized directive lines, plus
    the group id each line belongs to (0 = before any group header)."""
    lines = robots.select(
        "host",
        F.posexplode(F.split(F.col("robots_txt"), r"\r\n|\r|\n")).alias(
            "ln", "raw"
        ),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), r"#.*$", ""))
    parsed = lines.select(
        "host",
        "ln",
        F.lower(F.regexp_extract(clean, _FIELD_RE, 1)).alias("field"),
        F.trim(F.regexp_extract(clean, _VALUE_RE, 1)).alias("value"),
    ).filter(
        F.col("field").isin(
        "user-agent", "allow", "disallow", "crawl-delay", "sitemap"
    )
    )
    w = Window.partitionBy("host").orderBy("ln")
    is_ua = (F.col("field") == "user-agent").cast("int")
    prev_ua = F.coalesce(F.lag(is_ua).over(w), F.lit(0))
    new_group = ((is_ua == 1) & (prev_ua == 0)).cast("int")
    return parsed.withColumn(
        "group_id",
        F.sum(new_group).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def parse_robots_rules(robots: DataFrame, agent: str) -> DataFrame:
    """Compile ``(host, robots_txt)`` into the applicable rule table for
    ``agent``: (host, rule_type, path, rule_len). Only groups selected
    per RFC 9309 survive; wildcard/empty rules are dropped (fail-open,
    see module doc)."""
    g = _lines(robots)
    agents = g.filter(F.col("field") == "user-agent").select(
        "host", "group_id", F.lower(F.col("value")).alias("agent")
    )
    specific = (
        agents.filter(F.col("agent") == agent.lower())
        .select("host", "group_id")
        .distinct()
    )
    star = (
        agents.filter(F.col("agent") == "*")
        .select("host", "group_id")
        .distinct()
    )
    hosts_with_specific = specific.select("host").distinct()
    chosen = specific.unionByName(
        star.join(hosts_with_specific, "host", "left_anti")
    )
    rules = (
        g.filter(
            F.col("field").isin("allow", "disallow")
            & (F.col("group_id") > 0)
            & (F.col("value") != "")
            & ~F.col("value").contains("*")
            & ~F.col("value").contains("$")
        )
        .join(chosen, ["host", "group_id"])
        .select(
            "host",
            F.col("field").alias("rule_type"),
            F.col("value").alias("path"),
            F.length("value").alias("rule_len"),
        )
        .distinct()
    )
    return rules


def crawl_delays(robots: DataFrame, agent: str) -> DataFrame:
    """(host, crawl_delay_s): min numeric Crawl-delay across the
    applicable groups (NULL when absent/unparseable)."""
    g = _lines(robots)
    agents = g.filter(F.col("field") == "user-agent").select(
        "host", "group_id", F.lower(F.col("value")).alias("agent")
    )
    specific = (
        agents.filter(F.col("agent") == agent.lower())
        .select("host", "group_id")
        .distinct()
    )
    star = (
        agents.filter(F.col("agent") == "*")
        .select("host", "group_id")
        .distinct()
    )
    chosen = specific.unionByName(
        star.join(specific.select("host").distinct(), "host", "left_anti")
    )
    return (
        g.filter(F.col("field") == "crawl-delay")
        .join(chosen, ["host", "group_id"])
        .groupBy("host")
        .agg(
            F.min(F.col("value").try_cast("double")).alias("crawl_delay_s")
        )
    )


def robots_allowed(
    urls: DataFrame, robots: DataFrame, agent: str = "doclingbot"
) -> DataFrame:
    """Per-url fetch decision: (doc_id, url, host, path, rule_type,
    rule, allowed). No matching rule → allowed (REP default); longest
    matched rule wins, allow beats disallow on a length tie."""
    rules = parse_robots_rules(robots, agent).select(
        "host",
        "rule_type",
        F.col("path").alias("rule"),
        "rule_len",
    )
    host = F.lower(
        F.regexp_extract(
            F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1
        )
    )
    pathq = F.regexp_extract(F.col("url"), _PATHQ_RE, 1)
    u = urls.select(
        "doc_id",
        "url",
        host.alias("host"),
        F.when(pathq == "", "/").otherwise(pathq).alias("path"),
    )
    # inner-join on host + prefix hit, take the winner per url, then
    # re-attach rule-less urls (REP default: allowed)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("rule_len").desc(), F.col("rule_type").asc(), F.col("rule").asc()
    )
    best = (
        u.join(F.broadcast(rules), "host")
        .filter(
            F.substring(F.col("path"), F.lit(1), F.col("rule_len"))
            == F.col("rule")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "rule_type", "rule")
    )
    return u.join(best, "doc_id", "left").select(
        "doc_id",
        "url",
        "host",
        "path",
        "rule_type",
        "rule",
        F.coalesce(F.col("rule_type") == "allow", F.lit(True)).alias(
            "allowed"
        ),
    )


# ------------------------------------------------------- synthetic corpus
# Deterministic robots.txt per host index (mirrored in SYNTH_ROBOTS_SQL):
#   every host:       a * group with "Disallow: /admin"
#   h % 2 == 0:       + "Disallow: /search"
#   h % 4 == 1:       + "Allow: /admin/public"
#   h % 3 == 0:       a DoclingBot group (Disallow /private, Allow
#                     /private/ok) listed BEFORE the * group — such
#                     hosts must ignore the * group entirely
#   h % 5 == 0:       "Crawl-delay: 1 + h % 7" inside the chosen group
#   h % 6 == 2:       a wildcard rule (dropped by the subset)
#   plus comments, blank lines, mixed-case field names throughout.


def synth_robots(spark: SparkSession, hosts: list[str]) -> DataFrame:
    rows = []
    for h, host in enumerate(hosts):
        parts = ["# synth robots for " + host, ""]
        if h % 3 == 0:
            parts += [
                "User-Agent: DoclingBot",
                "Disallow: /private",
                "Allow: /private/ok",
            ]
            if h % 5 == 0:
                parts.append(f"Crawl-delay: {1 + h % 7}")
            parts.append("")
        if h % 4 == 2:
            parts.append(f"Sitemap: https://{host}/sitemap.xml")
            if h % 8 == 2:
                parts.append(f"Sitemap: https://{host}/news-sitemap.xml")
        parts.append("User-agent: *")
        parts.append("Disallow: /admin")
        if h % 2 == 0:
            parts.append("Disallow: /search")
        if h % 4 == 1:
            parts.append("Allow: /admin/public")
        if h % 6 == 2:
            parts.append("Disallow: /*?session")
        if h % 5 == 0 and h % 3 != 0:
            parts.append(f"Crawl-delay: {1 + h % 7}")
        rows.append((host, "\n".join(parts) + "\n"))
    return spark.createDataFrame(rows, "host string, robots_txt string")


_PROBE_PATHS = [
    "/",
    "/admin",
    "/admin/public/x",
    "/search?q=1",
    "/private/doc",
    "/private/ok/page",
    "/blog/post-1",
    "/admin/secret",
]


def synth_probe_urls(docs: DataFrame, hosts: list[str]) -> DataFrame:
    """(doc_id, url): host = hosts[doc_id % len], path =
    _PROBE_PATHS[doc_id % 8] — engineered to hit every rule branch."""
    host = F.element_at(
        F.array(*[F.lit(h) for h in hosts]),
        (F.col("doc_id") % len(hosts) + 1).cast("int"),
    )
    path = F.element_at(
        F.array(*[F.lit(p) for p in _PROBE_PATHS]),
        (F.col("doc_id") % 8 + 1).cast("int"),
    )
    return docs.select(
        "doc_id", F.concat(F.lit("https://"), host, path).alias("url")
    )


def SYNTH_ROBOTS_SQL(hosts: list[str]) -> str:
    """DuckDB CTE body yielding (host, robots_txt) — the same law."""
    rows = []
    for h, host in enumerate(hosts):
        parts = ["# synth robots for " + host, ""]
        if h % 3 == 0:
            parts += [
                "User-Agent: DoclingBot",
                "Disallow: /private",
                "Allow: /private/ok",
            ]
            if h % 5 == 0:
                parts.append(f"Crawl-delay: {1 + h % 7}")
            parts.append("")
        if h % 4 == 2:
            parts.append(f"Sitemap: https://{host}/sitemap.xml")
            if h % 8 == 2:
                parts.append(f"Sitemap: https://{host}/news-sitemap.xml")
        parts.append("User-agent: *")
        parts.append("Disallow: /admin")
        if h % 2 == 0:
            parts.append("Disallow: /search")
        if h % 4 == 1:
            parts.append("Allow: /admin/public")
        if h % 6 == 2:
            parts.append("Disallow: /*?session")
        if h % 5 == 0 and h % 3 != 0:
            parts.append(f"Crawl-delay: {1 + h % 7}")
        txt = ("\n".join(parts) + "\n").replace("'", "''").replace(
            "\n", "' || chr(10) || '"
        )
        rows.append(f"SELECT '{host}' AS host, '{txt}' AS robots_txt")
    return " UNION ALL ".join(rows)


def SYNTH_PROBE_URLS_SQL(hosts: list[str]) -> str:
    """DuckDB CTE body yielding (doc_id, url) — the same probe law,
    driven off the documents table like the Spark side."""
    hl = "[" + ", ".join(f"'{h}'" for h in hosts) + "]"
    pl = "[" + ", ".join(f"'{p}'" for p in _PROBE_PATHS) + "]"
    return f"""
        SELECT doc_id,
               'https://' ||
               list_extract({hl}, CAST(doc_id % {len(hosts)} AS INTEGER) + 1) ||
               list_extract({pl}, CAST(doc_id % 8 AS INTEGER) + 1) AS url
        FROM documents"""


def _parse_ctes_sql(agent: str) -> str:
    """The shared DuckDB CTE chain robots → chosen groups (mirrors
    :func:`_lines` + group selection); expects a ``robots`` CTE."""
    return f"""lines0 AS (
          SELECT host, g.i - 1 AS ln,
                 trim(regexp_replace(
                   list_extract(string_split_regex(robots_txt,
                                                   '\\r\\n|\\r|\\n'), g.i),
                   '#.*$', '')) AS clean
          FROM robots, LATERAL (
            SELECT unnest(range(1,
              len(string_split_regex(robots_txt, '\\r\\n|\\r|\\n')) + 1)) AS i
          ) g
        ),
        parsed AS (
          SELECT host, ln,
                 lower(regexp_extract(clean, '^([A-Za-z-]+)\\s*:', 1))
                   AS field,
                 trim(regexp_extract(clean, '^[A-Za-z-]+\\s*:\\s*(.*)$', 1))
                   AS value
          FROM lines0
          WHERE lower(regexp_extract(clean, '^([A-Za-z-]+)\\s*:', 1))
                IN ('user-agent', 'allow', 'disallow', 'crawl-delay', 'sitemap')
        ),
        marks AS (
          SELECT host, ln, field, value,
                 CASE WHEN field = 'user-agent' AND coalesce(
                        lag(field) OVER (PARTITION BY host ORDER BY ln), '')
                        != 'user-agent' THEN 1 ELSE 0 END AS new_group
          FROM parsed
        ),
        grouped AS (
          SELECT host, ln, field, value,
                 sum(new_group) OVER (PARTITION BY host ORDER BY ln
                                      ROWS UNBOUNDED PRECEDING) AS group_id
          FROM marks
        ),
        agents AS (
          SELECT DISTINCT host, group_id, lower(value) AS agent
          FROM grouped WHERE field = 'user-agent'
        ),
        specific AS (
          SELECT DISTINCT host, group_id FROM agents
          WHERE agent = '{agent.lower()}'
        ),
        star AS (
          SELECT DISTINCT host, group_id FROM agents WHERE agent = '*'
        ),
        chosen AS (
          SELECT * FROM specific
          UNION
          SELECT s.* FROM star s
          WHERE s.host NOT IN (SELECT host FROM specific)
        )"""


def robots_allowed_oracle_sql(
    robots_cte: str, urls_cte: str, agent: str = "doclingbot"
) -> str:
    """DuckDB mirror of :func:`robots_allowed` over the two CTE bodies."""
    return f"""
        WITH robots AS ({robots_cte}),
        urls AS ({urls_cte}),
        {_parse_ctes_sql(agent)},
        rules AS (
          SELECT DISTINCT g.host, g.field AS rule_type, g.value AS path,
                 length(g.value) AS rule_len
          FROM grouped g JOIN chosen c
            ON g.host = c.host AND g.group_id = c.group_id
          WHERE g.field IN ('allow', 'disallow') AND g.group_id > 0
            AND g.value != '' AND g.value NOT LIKE '%*%'
            AND g.value NOT LIKE '%$%'
        ),
        u AS (
          SELECT doc_id, url,
                 lower(regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
                 CASE WHEN regexp_extract(url,
                        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1) = ''
                      THEN '/'
                      ELSE regexp_extract(url,
                        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1)
                 END AS path
          FROM urls
        ),
        best AS (
          SELECT doc_id, rule_type, path_rule AS rule FROM (
            SELECT u.doc_id, r.rule_type, r.path AS path_rule,
                   row_number() OVER (
                     PARTITION BY u.doc_id
                     ORDER BY r.rule_len DESC, r.rule_type ASC, r.path ASC
                   ) AS rn
            FROM u JOIN rules r
              ON u.host = r.host
             AND substring(u.path, 1, r.rule_len) = r.path
          ) WHERE rn = 1
        )
        SELECT u.doc_id, u.url, u.host, u.path,
               b.rule_type, b.rule,
               coalesce(b.rule_type = 'allow', TRUE) AS allowed
        FROM u LEFT JOIN best b ON u.doc_id = b.doc_id
    """

def crawl_delays_oracle_sql(robots_cte: str, agent: str = "doclingbot") -> str:
    """DuckDB mirror of :func:`crawl_delays`."""
    return f"""
        WITH robots AS ({robots_cte}),
        {_parse_ctes_sql(agent)}
        SELECT g.host,
               min(TRY_CAST(g.value AS DOUBLE)) AS crawl_delay_s
        FROM grouped g JOIN chosen c
          ON g.host = c.host AND g.group_id = c.group_id
        WHERE g.field = 'crawl-delay'
        GROUP BY g.host
    """


def sitemap_urls(robots: DataFrame) -> DataFrame:
    """Sitemap discovery: ``Sitemap:`` directives from robots.txt.

    Per the sitemaps.org robots extension the directive is
    group-INDEPENDENT — it applies regardless of user-agent, so no
    group selection runs here; every non-empty value is an absolute
    sitemap URL feeding :mod:`ops.sitemap`'s parser (note: a Sitemap
    line BETWEEN two consecutive User-agent headers does break their
    stacking into one group, as in most real parsers).

    Output: (host, sitemap_url), distinct.
    """
    return (
        _lines(robots)
        .filter((F.col("field") == "sitemap") & (F.col("value") != ""))
        .select("host", F.col("value").alias("sitemap_url"))
        .distinct()
    )


def sitemap_urls_oracle_sql(robots_cte: str) -> str:
    """DuckDB mirror of :func:`sitemap_urls`."""
    return f"""
        WITH robots AS ({robots_cte}),
        {_parse_ctes_sql("*")}
        SELECT DISTINCT host, value AS sitemap_url
        FROM parsed
        WHERE field = 'sitemap' AND value != ''
    """
