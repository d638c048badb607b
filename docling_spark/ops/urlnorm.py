"""URL canonicalization + crawl-snapshot dedup.

Common-Crawl-style corpora carry the same page many times: repeated
crawls (different ``warc_ts``), tracking-parameter variants
(``utm_*``/``gclid``/``fbclid``), fragment-only differences, case
differences in scheme/host, default ports, ``//`` path doubling and
``/index.html`` suffixes. Canonicalizing BEFORE content dedup collapses
the cheap, certain duplicates with a pure string projection — no
shingling, no pair generation — and gives MinHash/SimHash a smaller,
cleaner input. (The reference docling repo has no crawl stage; this op
belongs to the training-data-pipeline contract, like ops/urlfilter.)

Canonical form (the law, mirrored exactly in the DuckDB oracle):

1. drop the fragment (first ``#`` to end);
2. lowercase scheme and host; strip ``userinfo@``;
3. strip the scheme's default port (http:80, https:443); keep others;
4. path: collapse ``//+`` runs, strip a trailing ``/index.html`` to
   ``/``, strip one trailing slash (unless the path is just ``/``),
   empty path -> ``/``;
5. query: split on ``&``, drop empties and tracking params
   (``utm_*``, ``gclid``, ``fbclid``, ``ref``, ``sessionid``, ``sid``,
   ``phpsessid``), sort the survivors bytewise, rejoin; no survivors ->
   no ``?``.

Scale shape: canonicalization is an in-row JVM regexp/array projection
(zero Python, zero shuffles — whole-stage codegen). ``canonical_dedup``
is ONE hash exchange on the canonical key + a window top-1
(rank-pushdown keeps it map-side partial): exactly the shuffle a
content-hash dedup would pay anyway, on strictly fewer distinct keys.
At 10^12 rows the canonical key is far better distributed than host
alone (no per-domain hotspot), so no salting is needed; AQE skew-join
handles the residual head domains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TRACKING_RE = r"^(utm_[a-z0-9]+|gclid|fbclid|ref|sessionid|sid|phpsessid)="


def canonicalize_url(url: Column) -> Column:
    """The canonical form of ``url`` per the module law — a single
    in-row JVM expression tree (rlike/regexp_extract/array ops), no
    Python, usable inside any projection."""
    nf = F.split_part(url, F.lit("#"), F.lit(1))
    scheme = F.lower(F.regexp_extract(nf, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(nf, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?@]*@)?([^/?]+)", 1)
    )
    host = F.split_part(hostport, F.lit(":"), F.lit(1))
    port = F.when(
        hostport.contains(":"), F.split_part(hostport, F.lit(":"), F.lit(2))
    ).otherwise(F.lit(""))
    port = F.when(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))

    rest = F.regexp_extract(nf, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$", 1)
    path = F.split_part(rest, F.lit("?"), F.lit(1))
    # substring after the FIRST '?' (split_part would also cut at later
    # '?'s inside the query string)
    query = F.when(
        rest.contains("?"),
        F.substr(rest, F.instr(rest, "?") + F.lit(1)),
    ).otherwise(F.lit(""))

    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/index\.html$", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)

    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda kv: (kv != "") & ~kv.rlike(TRACKING_RE),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))

    # malformed input (no scheme://host) would otherwise canonicalize to
    # the SAME degenerate key ("://" + path) for every such row — a dedup
    # over that key would silently merge unrelated pages. Fall back to
    # the raw url: malformed rows stay themselves.
    return F.when(
        (scheme == "") | (host == ""), url
    ).otherwise(F.concat(scheme, F.lit("://"), host, port, path, qpart))


def canonical_dedup(pages: DataFrame) -> DataFrame:
    """Keep ONE row per canonical URL — the latest snapshot
    (max ``warc_ts``, ties broken by the bytewise-largest raw url) —
    and report how many raw rows collapsed into it.

    Plan: project canonical key (in-row) -> one hash exchange on the
    key -> window row_number + count (single pass, rank pushdown
    filters map-side partials). No join, no second shuffle.
    """
    canon = pages.withColumn("canonical_url", canonicalize_url(F.col("url")))
    w = Window.partitionBy("canonical_url").orderBy(
        F.col("warc_ts").desc(), F.col("url").desc()
    )
    return (
        canon.select(
            "canonical_url",
            "url",
            "warc_ts",
            F.row_number().over(w).alias("__rn"),
            F.count("*").over(Window.partitionBy("canonical_url")).alias(
                "n_snapshots"
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(
            "canonical_url",
            F.col("url").alias("kept_url"),
            F.col("warc_ts").alias("kept_ts"),
            F.col("n_snapshots").cast("long").alias("n_snapshots"),
        )
    )


# ------------------------------------------------------------------ corpus
_HOSTS = [  # mixed case on purpose: host lowering is part of the law
    "WWW.News.Example",
    "blog.example.org",
    "EN.wiki.test",
    "shop.Example",
    "docs.spark.example",
    "Forum.example.net",
]


def synth_messy_urls(docs: DataFrame) -> DataFrame:
    """Deterministic messy-URL law over the documents table, mirrored
    byte-for-byte in :func:`messy_urls_cte_sql`. Each doc yields
    ``1 + doc_id % 3`` crawl snapshots whose RAW urls differ (per-snap
    utm_campaign + fragment) but canonicalize identically, so the dedup
    has real work on every multi-snapshot doc."""
    d = F.col("doc_id")
    s = F.col("snap")
    host = F.element_at(F.array(*[F.lit(h) for h in _HOSTS]), (d % 6 + 1).cast("int"))
    scheme = F.when(d % 2 == 0, F.lit("https")).otherwise(F.lit("HTTP"))
    port = (
        F.when((d % 5 == 0) & (d % 2 == 0), F.lit(":443"))
        .when((d % 5 == 0), F.lit(":80"))
        .when(d % 7 == 0, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.when(d % 3 == 0, F.lit("/a//b")).otherwise(F.lit("/a/b")),
        F.lit("/item"),
        (d % 100).cast("string"),
        F.when(d % 4 == 0, F.lit("/index.html"))
        .when(d % 4 == 1, F.lit("/"))
        .otherwise(F.lit("")),
    )
    query = F.concat(
        F.lit("?b=2&a="),
        (d % 10).cast("string"),
        F.lit("&utm_source=feed&utm_campaign=c"),
        s.cast("string"),
        F.when(d % 9 == 0, F.lit("&fbclid=XYZ")).otherwise(F.lit("")),
    )
    frag = F.when(s % 2 == 1, F.concat(F.lit("#sec"), s.cast("string"))).otherwise(
        F.lit("")
    )
    return (
        docs.select("doc_id")
        .withColumn("snap", F.explode(F.sequence(F.lit(0), (d % 3).cast("int"))))
        .select(
            "doc_id",
            "snap",
            F.concat(scheme, F.lit("://"), host, port, path, query, frag).alias(
                "url"
            ),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(days=s, secs=d.cast("double"))
            ).alias("warc_ts"),
        )
    )


MESSY_URLS_CTE_SQL = """
    messy AS (
        SELECT
            doc_id,
            s AS snap,
            (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTP' END)
            || '://'
            || (CASE doc_id % 6
                  WHEN 0 THEN 'WWW.News.Example'
                  WHEN 1 THEN 'blog.example.org'
                  WHEN 2 THEN 'EN.wiki.test'
                  WHEN 3 THEN 'shop.Example'
                  WHEN 4 THEN 'docs.spark.example'
                  ELSE 'Forum.example.net' END)
            || (CASE WHEN doc_id % 5 = 0 AND doc_id % 2 = 0 THEN ':443'
                     WHEN doc_id % 5 = 0 THEN ':80'
                     WHEN doc_id % 7 = 0 THEN ':8080'
                     ELSE '' END)
            || (CASE WHEN doc_id % 3 = 0 THEN '/a//b' ELSE '/a/b' END)
            || '/item' || CAST(doc_id % 100 AS VARCHAR)
            || (CASE WHEN doc_id % 4 = 0 THEN '/index.html'
                     WHEN doc_id % 4 = 1 THEN '/'
                     ELSE '' END)
            || '?b=2&a=' || CAST(doc_id % 10 AS VARCHAR)
            || '&utm_source=feed&utm_campaign=c' || CAST(s AS VARCHAR)
            || (CASE WHEN doc_id % 9 = 0 THEN '&fbclid=XYZ' ELSE '' END)
            || (CASE WHEN s % 2 = 1 THEN '#sec' || CAST(s AS VARCHAR) ELSE '' END)
            AS url,
            TIMESTAMP '2024-01-01 00:00:00'
                + INTERVAL (s) DAY
                + INTERVAL (doc_id) SECOND AS warc_ts
        FROM documents, UNNEST(range(0, doc_id % 3 + 1)) AS t(s)
    )
"""


def canonical_dedup_oracle_sql(corpus_cte: str = MESSY_URLS_CTE_SQL) -> str:
    """DuckDB mirror of canonicalize_url + canonical_dedup over the
    synthetic corpus law above."""
    return f"""
    WITH {corpus_cte},
    parts AS (
        SELECT
            url,
            warc_ts,
            split_part(url, '#', 1) AS nf
        FROM messy
    ),
    comp AS (
        SELECT
            url,
            warc_ts,
            lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
            lower(regexp_extract(nf,
                '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?@]*@)?([^/?]+)', 1)) AS hostport,
            regexp_extract(nf,
                '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$', 1) AS rest
        FROM parts
    ),
    comp2 AS (
        SELECT
            url, warc_ts, scheme,
            split_part(hostport, ':', 1) AS host,
            CASE WHEN contains(hostport, ':')
                 THEN split_part(hostport, ':', 2) ELSE '' END AS rawport,
            split_part(rest, '?', 1) AS rawpath,
            CASE WHEN contains(rest, '?')
                 THEN substring(rest, instr(rest, '?') + 1) ELSE '' END AS rawq
        FROM comp
    ),
    comp3 AS (
        SELECT
            url, warc_ts, scheme, host,
            CASE WHEN (scheme = 'http' AND rawport = '80')
                   OR (scheme = 'https' AND rawport = '443')
                   OR rawport = ''
                 THEN '' ELSE ':' || rawport END AS port,
            CASE WHEN p3 = '' THEN '/'
                 WHEN length(p3) > 1 AND p3 LIKE '%/'
                 THEN left(p3, length(p3) - 1)
                 ELSE p3 END AS path,
            list_sort(list_filter(string_split(rawq, '&'),
                kv -> kv <> '' AND NOT regexp_matches(kv,
                    '^(utm_[a-z0-9]+|gclid|fbclid|ref|sessionid|sid|phpsessid)=')
            )) AS kept
        FROM (
            SELECT *,
                regexp_replace(
                    regexp_replace(rawpath, '/{{2,}}', '/', 'g'),
                    '/index\\.html$', '/') AS p3
            FROM comp2
        )
    ),
    canon AS (
        SELECT
            url, warc_ts,
            CASE WHEN scheme = '' OR host = '' THEN url
                 ELSE scheme || '://' || host || port || path ||
                      CASE WHEN len(kept) > 0
                           THEN '?' || array_to_string(kept, '&') ELSE '' END
            END AS canonical_url
        FROM comp3
    ),
    ranked AS (
        SELECT
            canonical_url, url, warc_ts,
            row_number() OVER (PARTITION BY canonical_url
                               ORDER BY warc_ts DESC, url DESC) AS rn,
            count(*) OVER (PARTITION BY canonical_url) AS n_snapshots
        FROM canon
    )
    SELECT
        canonical_url,
        url AS kept_url,
        warc_ts AS kept_ts,
        CAST(n_snapshots AS BIGINT) AS n_snapshots
    FROM ranked WHERE rn = 1
    """


def url_patterns(
    urls: DataFrame, trap_min_urls: int = 100, trap_min_depth: int = 4
) -> DataFrame:
    """URL template mining: collapse variable parts and count per-host
    patterns — the spider-trap / faceted-explosion detector.

    Crawl frontiers die on URL *templates*, not URLs: calendar pages
    (``/2026/08/19``), faceted search (``?page=913``), session paths —
    one template generating unbounded URLs. Collapsing digit runs to
    ``{n}`` and hex-ish runs (>= 8 hex chars) to ``{h}`` in the
    path+query turns millions of trap URLs into one counted pattern;
    a pattern with many URLs at high path depth is flagged for the
    frontier to cap (the ``ops/frontier.py`` per-host budget's natural
    refinement).

    Output per (host, pattern): n_urls, depth, is_trap. Scale shape:
    one in-row projection + one map-side-combining agg on
    (host, pattern) — the group count is bounded by TEMPLATE count,
    which is what makes this table small when the frontier is not.
    """
    host = F.lower(
        F.regexp_extract(
            F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1
        )
    )
    pathq = F.regexp_extract(
        F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1
    )
    pattern = F.regexp_replace(
        F.regexp_replace(pathq, r"[0-9a-fA-F]{8,}", "{h}"),
        r"[0-9]+",
        "{n}",
    )
    depth = F.size(
        F.filter(
            F.split(F.regexp_extract(pattern, r"^([^?]*)", 1), "/"),
            lambda s: F.length(s) > 0,
        )
    )
    agged = (
        urls.select(
            host.alias("host"), pattern.alias("pattern"), depth.alias("depth")
        )
        .groupBy("host", "pattern", "depth")
        .agg(F.count("*").alias("n_urls"))
    )
    return agged.select(
        "host",
        "pattern",
        "depth",
        "n_urls",
        (
            (F.col("n_urls") >= trap_min_urls)
            & (F.col("depth") >= trap_min_depth)
        ).alias("is_trap"),
    )
