"""Crawl-frontier scheduling: politeness-aware fetch plan + load audit.

The upstream neighbor of everything else in this repo: before a crawl
corpus exists, a frontier of candidate URLs has to be turned into a
fetch *schedule* that (a) never hits one host faster than the
politeness delay, and (b) spreads work across the fetcher fleet
host-stickily (one host's requests must flow through one fetcher or
per-host rate limiting is unenforceable — the Mercator/Heritrix queue
design). This module computes that schedule and its load audit as
plain DataFrame ops, deterministic end to end:

- ``slot``  = floor(md5-Horner-frac(host) * fetchers) — the same
  engine-exact hash the sampling ops use (``ops/sampling.hash_frac``),
  so the assignment is reproducible across engines, retries and
  cluster sizes (no ``xxhash64``, which DuckDB cannot mirror);
- ``seq``   = 1-based position within the host (deterministic
  ``(url, doc_id)`` order), i.e. the politeness queue index;
- ``start_s`` = ``(seq - 1) * delay_s`` — the earliest
  politeness-feasible fetch time relative to the crawl start.

``frontier_load`` rolls the schedule up per fetcher slot and reports
the two makespan terms that govern real crawls: the POLITENESS bound
(the slot's largest host queue — serial at one request per
``delay_s``) and the BANDWIDTH bound (total requests / fetcher rate);
the slot finishes no earlier than the max of the two. A slot whose
politeness term dominates is hostage to one giant host — exactly the
signal a crawl operator re-shards on.

Scale shape: one window exchange partitioned by ``host`` for the
queue index — irreducible, since per-host sequencing IS the politeness
semantics (a host's queue is serial no matter how many executors
exist), and bounded per-task by the largest single host, not by the
frontier size. The rollup is a ``fetchers``-row aggregate. Everything
else is in-row JVM expressions — zero Python, no joins. Giant-host
skew shows up *in the output* (that is the audit's purpose) rather
than in the plan: the window state per task is one counter, so even a
10^8-page host streams through row_number without memory growth
(Spark windows with row-frame row_number do not buffer the partition).
No reference counterpart (docling consumes documents; frontier
scheduling is the crawl-side operator a web-scale pipeline needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import hash_frac

__all__ = [
    "schedule_frontier",
    "frontier_load",
    "HOST_RE",
    "SLOT_SALT",
]

# authority component of an absolute URL (scheme mandatory; stops at
# path/query/fragment) — lowercased so host politeness is case-blind
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
SLOT_SALT = "frontier:"


def schedule_frontier(
    urls: DataFrame, fetchers: int = 64, delay_s: float = 1.0
) -> DataFrame:
    """Politeness-feasible fetch plan over ``(doc_id, url)``.

    Output: doc_id, url, host, slot, seq, start_s. Rows whose url has
    no parseable authority get host='' (they still schedule — into the
    ''-host queue — rather than silently dropping from the frontier).
    """
    host = F.lower(F.regexp_extract(F.col("url"), HOST_RE, 1))
    w = Window.partitionBy("host").orderBy("url", "doc_id")
    return (
        urls.select("doc_id", "url", host.alias("host"))
        .withColumn(
            "slot",
            F.floor(hash_frac(F.col("host"), SLOT_SALT) * fetchers).cast(
                "int"
            ),
        )
        .withColumn("seq", F.row_number().over(w))
        .withColumn(
            "start_s", (F.col("seq") - F.lit(1)) * F.lit(float(delay_s))
        )
    )


def frontier_load(
    urls: DataFrame,
    fetchers: int = 64,
    delay_s: float = 1.0,
    rate_rps: float = 10.0,
) -> DataFrame:
    """Per-fetcher-slot load audit of the schedule.

    Output per slot: n_urls, n_hosts, max_host_queue, the politeness
    makespan ``(max_host_queue - 1) * delay_s``, the bandwidth makespan
    ``n_urls / rate_rps`` and their max ``makespan_s`` — the slot's
    earliest possible finish time.
    """
    # NOT built on schedule_frontier: the audit needs only per-host
    # counts, so a direct groupBy(host) gets map-side partial
    # aggregation — the shuffle carries one row per host, not one per
    # url as the schedule's window sort must. At 10^12 urls that is the
    # difference between exchanging ~10^8 host rows and 10^12 full rows.
    host = F.lower(F.regexp_extract(F.col("url"), HOST_RE, 1))
    per_host = (
        urls.select(host.alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("host_n"))
        .withColumn(
            "slot",
            F.floor(hash_frac(F.col("host"), SLOT_SALT) * fetchers).cast(
                "int"
            ),
        )
    )
    politeness = (F.col("max_host_queue") - F.lit(1)) * F.lit(float(delay_s))
    bandwidth = F.col("n_urls").cast("double") / F.lit(float(rate_rps))
    return (
        per_host.groupBy("slot")
        .agg(
            F.sum("host_n").alias("n_urls"),
            F.count("*").alias("n_hosts"),
            F.max("host_n").alias("max_host_queue"),
        )
        .select(
            "slot",
            "n_urls",
            "n_hosts",
            "max_host_queue",
            politeness.alias("politeness_s"),
            bandwidth.alias("bandwidth_s"),
            F.greatest(politeness, bandwidth).alias("makespan_s"),
        )
    )


def schedule_frontier_oracle_sql(
    urls_cte: str, hash_frac_sql: str, fetchers: int = 64, delay_s: float = 1.0
) -> str:
    """DuckDB mirror. ``urls_cte`` must yield (doc_id, url);
    ``hash_frac_sql`` is the md5-Horner fraction over the column
    literally named ``host`` (the __spark_entry__ _hash_frac_sql
    idiom)."""
    return f"""
        WITH urls AS ({urls_cte}),
        hosted AS (
          SELECT doc_id, url,
                 lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host
          FROM urls
        )
        SELECT doc_id, url, host,
               CAST(floor({hash_frac_sql} * {fetchers}) AS INT) AS slot,
               CAST(row_number() OVER (PARTITION BY host
                                       ORDER BY url, doc_id) AS INT) AS seq,
               (CAST(row_number() OVER (PARTITION BY host
                                        ORDER BY url, doc_id) AS INT) - 1)
                 * {delay_s!r} AS start_s
        FROM hosted
    """


def frontier_load_oracle_sql(
    urls_cte: str,
    hash_frac_sql: str,
    fetchers: int = 64,
    delay_s: float = 1.0,
    rate_rps: float = 10.0,
) -> str:
    """DuckDB mirror of :func:`frontier_load` over the schedule CTE."""
    sched = schedule_frontier_oracle_sql(
        urls_cte, hash_frac_sql, fetchers=fetchers, delay_s=delay_s
    )
    return f"""
        WITH sched AS ({sched}),
        per_host AS (
          SELECT slot, host, count(*) AS host_n
          FROM sched GROUP BY slot, host
        ),
        per_slot AS (
          SELECT slot,
                 CAST(sum(host_n) AS BIGINT) AS n_urls,
                 count(*) AS n_hosts,
                 CAST(max(host_n) AS BIGINT) AS max_host_queue
          FROM per_host GROUP BY slot
        )
        SELECT slot, n_urls, n_hosts, max_host_queue,
               (max_host_queue - 1) * {delay_s!r} AS politeness_s,
               CAST(n_urls AS DOUBLE) / {rate_rps!r} AS bandwidth_s,
               greatest((max_host_queue - 1) * {delay_s!r},
                        CAST(n_urls AS DOUBLE) / {rate_rps!r}) AS makespan_s
        FROM per_slot
    """


def crawl_plan(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "doclingbot",
    fetchers: int = 64,
    default_delay_s: float = 1.0,
) -> DataFrame:
    """The composed crawl layer in ONE plan: robots.txt gate →
    per-host Crawl-delay → politeness schedule.

    URLs the REP evaluation rejects never enter a queue; every allowed
    url is sequenced within its host at that host's own Crawl-delay
    (falling back to ``default_delay_s`` when the file names none).
    This is the integration row — the same composition a production
    fetcher fleet runs, expressed as one declarative plan: the rule
    and delay tables are hosts-sized broadcast dims, the only
    frontier-sized exchange is the per-host sequence window (see
    :func:`schedule_frontier` on why that shuffle is irreducible).

    Output: doc_id, url, host, slot, seq, delay_s, start_s.
    """
    from .robotstxt import crawl_delays, robots_allowed

    allowed = (
        robots_allowed(urls, robots, agent=agent)
        .filter(F.col("allowed"))
        .select("doc_id", "url", "host")
    )
    delays = crawl_delays(robots, agent=agent)
    w = Window.partitionBy("host").orderBy("url", "doc_id")
    return (
        allowed.join(F.broadcast(delays), "host", "left")
        .withColumn(
            "slot",
            F.floor(hash_frac(F.col("host"), SLOT_SALT) * fetchers).cast(
                "int"
            ),
        )
        .withColumn("seq", F.row_number().over(w))
        .withColumn(
            "delay_s",
            F.coalesce(
                F.col("crawl_delay_s"), F.lit(float(default_delay_s))
            ),
        )
        .withColumn("start_s", (F.col("seq") - F.lit(1)) * F.col("delay_s"))
        .select(
            "doc_id", "url", "host", "slot", "seq", "delay_s", "start_s"
        )
    )


def crawl_plan_oracle_sql(
    allowed_sql: str,
    delays_sql: str,
    hash_frac_sql: str,
    fetchers: int = 64,
    default_delay_s: float = 1.0,
) -> str:
    """DuckDB mirror composing the robots_allowed and crawl_delays
    oracle texts (full statements — nested as CTE bodies)."""
    return f"""
        WITH gated AS ({allowed_sql}),
        delays AS ({delays_sql}),
        allowed AS (
          SELECT doc_id, url, host FROM gated WHERE allowed
        )
        SELECT a.doc_id, a.url, a.host,
               CAST(floor({hash_frac_sql} * {fetchers}) AS INT) AS slot,
               CAST(row_number() OVER (PARTITION BY a.host
                                       ORDER BY a.url, a.doc_id) AS INT)
                 AS seq,
               coalesce(d.crawl_delay_s, {default_delay_s!r}) AS delay_s,
               (CAST(row_number() OVER (PARTITION BY a.host
                                        ORDER BY a.url, a.doc_id) AS INT) - 1)
                 * coalesce(d.crawl_delay_s, {default_delay_s!r}) AS start_s
        FROM allowed a LEFT JOIN delays d ON a.host = d.host
    """
