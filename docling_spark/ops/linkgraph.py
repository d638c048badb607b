"""Hyperlink extraction from raw HTML -> web link graph.

The crawl-side companion to ops/graph (PageRank) and ops/urlfilter:
pull ``<a href>`` targets out of the raw ``html`` bytes, resolve them
against the page's own URL (absolute kept, ``//host/...``
protocol-relative and ``/path`` root-relative resolved, ``mailto:``/
``javascript:``/fragment-only dropped), and emit a ``(src, dst)`` edge
list ready for ops/graph.pagerank or in/out-degree analytics.

Scale shape: the whole extraction is in-row JVM work —
``regexp_extract_all`` over the decoded blob, a bounded ``explode``
(fan-out = links per page, tens), and string resolution — zero Python,
zero joins. The only exchange in ``link_degrees`` is the two
half-aggregations on ``src``/``dst`` (map-side partial first). At
10^12 pages the edge list never materializes beyond its shuffle
partitions; PageRank downstream reuses ops/graph's persisted
edge layout.

No reference counterpart (docling has no crawl stage); the HREF regex
deliberately mirrors what a WAT extraction would produce for plain
double-quoted anchors — the synthetic corpus only emits that shape, so
the law is exact for tests while the operator stays honest about
real-world HTML (single quotes / unquoted hrefs would extend the
regex, not the plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HREF_RE = r'<a\s[^>]*href="([^"]*)"'


def _origin(url: Column) -> Column:
    """scheme://host[:port] of a URL (for root-relative resolution)."""
    return F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1)


def _scheme(url: Column) -> Column:
    return F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)


def resolve_href(base_url: Column, href: Column) -> Column:
    """Resolve one href against its page URL; NULL for dropped schemes
    (mailto:, javascript:), fragment-only links and empty hrefs."""
    return (
        F.when(href.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), href)
        .when(href.startswith("//"), F.concat(_scheme(base_url), F.lit(":"), href))
        .when(href.startswith("/"), F.concat(_origin(base_url), href))
        .otherwise(F.lit(None).cast("string"))
    )


def extract_links(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> (src, dst) edge list, distinct, self-links
    dropped. Pure JVM: decode -> regexp_extract_all -> explode ->
    resolve -> filter."""
    hrefs = F.array_distinct(
        # lenient decode (invalid UTF-8 -> replacement chars): a hostile crawl
        # blob must degrade to zero edges, not throw (F.decode raises
        # MALFORMED_CHARACTER_CODING on arbitrary binary)
        F.regexp_extract_all(F.col("html").cast("string"), F.lit(HREF_RE), F.lit(1))
    )
    edges = (
        pages.select(F.col("url").alias("src"), F.explode(hrefs).alias("href"))
        .filter(~F.col("href").rlike(r"^(mailto|javascript):") & (F.col("href") != ""))
        .filter(~F.col("href").startswith("#"))
        .select("src", resolve_href(F.col("src"), F.col("href")).alias("dst"))
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    )
    return edges.distinct()


# a COMPLETE anchor element; groups: 1 = href, 2 = inner markup (lazy
# up to the first </a>, so nested <b>/<img>/<span> wrappers — most real
# anchors — are captured rather than dropped; tags are stripped from
# the text afterwards). The href and text arrays are extracted with the
# SAME regex (different group index), so they always zip positionally —
# no count-mismatch risk.
A_ELEM_RE = r'(?s)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def extract_links_text(pages: DataFrame) -> DataFrame:
    """(url, html:binary) -> (src, dst, anchor) with the link's visible
    anchor text, distinct triples, self-links dropped.

    Scale shape identical to :func:`extract_links`: in-row JVM regexps +
    a bounded explode, zero Python. The anchor text is the classic
    target-side relevance signal (what OTHER pages call this url) —
    aggregated per target by :func:`anchor_stats`.
    """
    body = F.col("html").cast("string")  # lenient decode, as extract_links
    pairs = F.arrays_zip(
        F.regexp_extract_all(body, F.lit(A_ELEM_RE), F.lit(1)).alias("href"),
        F.regexp_extract_all(body, F.lit(A_ELEM_RE), F.lit(2)).alias("anchor"),
    )
    return (
        pages.select(F.col("url").alias("src"), F.explode(pairs).alias("p"))
        .select("src", F.col("p.href").alias("href"), F.col("p.anchor").alias("anchor"))
        .filter(~F.col("href").rlike(r"^(mailto|javascript):") & (F.col("href") != ""))
        .filter(~F.col("href").startswith("#"))
        .select(
            "src",
            resolve_href(F.col("src"), F.col("href")).alias("dst"),
            # visible text: strip nested tags, collapse whitespace
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.col("anchor"), r"<[^>]*>", ""),
                    r"\s+",
                    " ",
                )
            ).alias("anchor"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .distinct()
    )


def anchor_stats(edges_text: DataFrame) -> DataFrame:
    """Per-target anchor-text profile: n_refs counts the distinct
    (src, anchor) references pointing at the url (one source page
    linking with two different texts contributes two), n_texts the
    distinct texts, anchors the sorted-distinct '|'-join (engine-
    portable, order-stable). Use count_distinct('src') instead if you
    want a per-page in-degree prior.

    One map-side-combinable groupBy on ``dst`` — at 10^12 edges this is
    a single slim-string exchange; collect_set is bounded by the
    distinct-anchor vocabulary per target (tiny in practice; a
    deployment worried about adversarial fan-in would cap it with
    slice(sort_array(...), 1, k))."""
    return edges_text.groupBy(F.col("dst").alias("url")).agg(
        F.count("*").alias("n_refs"),
        F.count_distinct(F.col("anchor")).alias("n_texts"),
        F.concat_ws("|", F.sort_array(F.collect_set("anchor"))).alias(
            "anchors"
        ),
    )


def link_degrees(edges: DataFrame) -> DataFrame:
    """Per-node in/out degree over the union of endpoints; dangling =
    a node that is linked to but has no outlinks (the PageRank
    mass-leak set)."""
    out = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_degree")
    )
    inn = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out.join(inn, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
        .withColumn("is_dangling", F.col("out_degree") == 0)
    )


# ------------------------------------------------------------------ corpus
def synth_linked_pages(spark, sf_dir: str) -> DataFrame:
    """North-rule-shaped pages whose body carries a deterministic anchor
    law over ``doc_id`` (mirrored in :func:`linked_pages_law_sql`):

    - ``1 + doc_id % 3`` internal links, target ``(doc_id*7 + 11*j) % n``
      for ``j = 1..``; even ``j`` absolute, odd ``j`` root-relative;
    - one protocol-relative external link when ``doc_id % 5 == 0``;
    - one mailto: (always) and one fragment-only link (always) that the
      extractor must drop.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.select(F.count("*").alias("n"))
    d = F.col("doc_id")
    targets = F.transform(
        F.sequence(F.lit(1), (d % 3 + 1).cast("int")),
        lambda j: (d * 7 + 11 * j) % F.col("n"),
    )
    anchors = F.concat_ws(
        "\n",
        F.transform(
            targets,
            lambda t, j: F.concat(
                F.lit('<a href="'),
                F.when(
                    j % 2 == 0,
                    F.concat(
                        F.lit("https://synth.test/doc/"),
                        t.cast("string"),
                        F.lit(".html"),
                    ),
                ).otherwise(
                    F.concat(F.lit("/doc/"), t.cast("string"), F.lit(".html"))
                ),
                # anchor text law: 'd<target>.<doc_id%7>' — varies by
                # source (mod 7) so a popular target accumulates several
                # distinct anchor texts for anchor_stats
                F.lit('">d'),
                t.cast("string"),
                F.lit("."),
                (d % 7).cast("string"),
                F.lit("</a>"),
            ),
        ),
    )
    ext = F.when(
        d % 5 == 0,
        F.concat(
            F.lit('\n<a class="x" href="//other.example/page'),
            d.cast("string"),
            F.lit('">x'),
            d.cast("string"),
            F.lit("</a>"),
        ),
    ).otherwise(F.lit(""))
    html_str = F.concat(
        F.lit("<html><body><h1>Doc "),
        d.cast("string"),
        F.lit("</h1>\n"),
        anchors,
        ext,
        F.lit('\n<a href="mailto:a@b.test">mail</a>'),
        F.lit('\n<a href="#top">top</a>'),
        F.lit("</body></html>"),
    )
    return docs.crossJoin(F.broadcast(n)).select(
        F.concat(
            F.lit("https://synth.test/doc/"), d.cast("string"), F.lit(".html")
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=d.cast("double"))
        ).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def web_edges(spark, sf_dir: str) -> DataFrame:
    return extract_links(synth_linked_pages(spark, sf_dir))


# The oracle derives the edge set INDEPENDENTLY from the law (straight
# from doc_id arithmetic, never touching HTML) — a stronger check than
# re-running the same regex in DuckDB.
LINKED_EDGES_CTE_SQL = """
    nn AS (SELECT count(*) AS n FROM documents),
    internal AS (
        SELECT
            'https://synth.test/doc/' || CAST(doc_id AS VARCHAR) || '.html' AS src,
            'https://synth.test/doc/'
                || CAST((doc_id * 7 + 11 * j) % n AS VARCHAR)
                || '.html' AS dst
        FROM documents, nn, UNNEST(range(1, doc_id % 3 + 2)) AS t(j)
    ),
    external AS (
        SELECT
            'https://synth.test/doc/' || CAST(doc_id AS VARCHAR) || '.html' AS src,
            'https://other.example/page' || CAST(doc_id AS VARCHAR) AS dst
        FROM documents WHERE doc_id % 5 = 0
    ),
    edges AS (
        SELECT DISTINCT src, dst
        FROM (SELECT * FROM internal UNION ALL SELECT * FROM external)
        WHERE src <> dst
    )
"""


# law-derived (src, dst, anchor) triples — the anchor text the synthetic
# page writes for each link, re-derived from doc_id arithmetic
LINKED_ANCHORS_CTE_SQL = """
    nn AS (SELECT count(*) AS n FROM documents),
    a_internal AS (
        SELECT
            'https://synth.test/doc/' || CAST(doc_id AS VARCHAR) || '.html' AS src,
            'https://synth.test/doc/'
                || CAST((doc_id * 7 + 11 * j) % n AS VARCHAR)
                || '.html' AS dst,
            'd' || CAST((doc_id * 7 + 11 * j) % n AS VARCHAR)
                || '.' || CAST(doc_id % 7 AS VARCHAR) AS anchor
        FROM documents, nn, UNNEST(range(1, doc_id % 3 + 2)) AS t(j)
    ),
    a_external AS (
        SELECT
            'https://synth.test/doc/' || CAST(doc_id AS VARCHAR) || '.html' AS src,
            'https://other.example/page' || CAST(doc_id AS VARCHAR) AS dst,
            'x' || CAST(doc_id AS VARCHAR) AS anchor
        FROM documents WHERE doc_id % 5 = 0
    ),
    anchor_edges AS (
        SELECT DISTINCT src, dst, anchor
        FROM (SELECT * FROM a_internal UNION ALL SELECT * FROM a_external)
        WHERE src <> dst
    )
"""


def anchor_stats_oracle_sql(edges_cte: str = LINKED_ANCHORS_CTE_SQL) -> str:
    return f"""
    WITH {edges_cte}
    SELECT
        dst AS url,
        count(*) AS n_refs,
        count(DISTINCT anchor) AS n_texts,
        string_agg(DISTINCT anchor, '|' ORDER BY anchor) AS anchors
    FROM anchor_edges GROUP BY dst
    """


def link_degrees_oracle_sql(edges_cte: str = LINKED_EDGES_CTE_SQL) -> str:
    return f"""
    WITH {edges_cte},
    outd AS (SELECT src AS node, count(*) AS out_degree FROM edges GROUP BY src),
    ind  AS (SELECT dst AS node, count(*) AS in_degree  FROM edges GROUP BY dst)
    SELECT
        COALESCE(outd.node, ind.node) AS node,
        CAST(COALESCE(out_degree, 0) AS BIGINT) AS out_degree,
        CAST(COALESCE(in_degree, 0) AS BIGINT) AS in_degree,
        COALESCE(out_degree, 0) = 0 AS is_dangling
    FROM outd FULL OUTER JOIN ind ON outd.node = ind.node
    """


def degree_histogram(degrees: DataFrame) -> DataFrame:
    """Log2-bucketed in/out-degree distribution of the link graph —
    the power-law telemetry read before every graph stage: the top
    in-degree buckets are the PageRank hub mass (and the skew keys a
    join must salt); a fat out-degree tail is link-farm signature.

    Bucket = length of the binary representation (0 for degree 0) —
    integer-exact on both engines, the ops/textstats.size_histogram
    idiom. Output per (direction, bucket): n_nodes, total_degree.
    One map-side agg over the degrees frame; ~2×40 rows out.
    """

    def hist(col: str, direction: str) -> DataFrame:
        n = F.col(col)
        bucket = (
            F.when(n <= 0, F.lit(0))
            .otherwise(F.length(F.conv(n.cast("string"), 10, 2)))
            .cast("int")
        )
        return (
            degrees.select(bucket.alias("bucket"), n.alias("deg"))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_nodes"),
                F.sum("deg").alias("total_degree"),
            )
            .select(F.lit(direction).alias("direction"), "*")
        )

    return hist("in_degree", "in").unionByName(hist("out_degree", "out"))
