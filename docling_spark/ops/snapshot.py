"""Crawl-snapshot delta (CDC): what changed between two crawl snapshots.

The incremental-processing primitive a 10^12-document pipeline lives on:
given the previous snapshot and a fresh crawl of the same north-rule
table shape (url, warc_ts, html, text, lang), classify every url as
``added`` / ``removed`` / ``changed`` / ``unchanged`` by content hash,
and emit the *work list* (added + changed rows only) so every
downstream stage — extraction, curation, dedup — reprocesses O(delta),
never O(corpus).

Scale shape
-----------
- Each side is first projected to a **slim frame** (url, 32-byte content
  hash, ts) — the 100 KB html blobs never enter the join. At 10^12 rows
  the shuffled bytes are ~50 B/row, not the corpus.
- The classifier is ONE full-outer sort-merge join on ``url``. On a real
  deployment both snapshots are bucketed by ``url`` (they are written by
  this very pipeline), making the join shuffle-free; unbucketed inputs
  fall back to a hash exchange that AQE sizes.
- The work list is a **left join of the new snapshot against the slim
  old frame** — the full-width new rows move at most once, and rows that
  are unchanged are filtered before any downstream stage sees them.
- No Python anywhere; ``sha2`` over the blob is JVM whole-stage codegen.

No reference counterpart (docling converts single documents); this is
the crawl-side operational layer around the extraction job
(``docling_spark/job.py``), same role as its lineage/resume machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "content_hash",
    "snapshot_delta",
    "old_slim_frame",
    "delta_worklist",
    "synth_snapshots",
    "snapshot_delta_oracle_sql",
    "delta_worklist_oracle_sql",
]


def content_hash(html: Column) -> Column:
    """Content identity of a page blob (hex sha256, JVM-side).

    NULL blobs (fetch failures) hash as empty content: sha2(NULL) would
    be NULL, and a NULL hash makes the full-outer classifier call a
    url that exists in BOTH snapshots 'added'/'removed' and makes the
    work-list inequality evaluate to NULL (silently dropping
    content→NULL transitions). Coalescing keeps presence and content
    questions orthogonal."""
    return F.sha2(F.coalesce(html, F.lit(b"")), 256)


def _slim(df: DataFrame, side: str) -> DataFrame:
    return df.select(
        F.col("url"),
        content_hash(F.col("html")).alias(f"{side}_hash"),
        F.col("warc_ts").alias(f"{side}_ts"),
    )


def snapshot_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """Classify every url across two snapshots.

    Returns (url, status, old_ts, new_ts) with status in
    {'added','removed','changed','unchanged'}. One full-outer join on
    url over slim (url, hash, ts) projections.
    """
    o = _slim(old, "old")
    n = _slim(new, "new")
    j = o.join(n, "url", "full_outer")
    return j.select(
        "url",
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_ts",
        "new_ts",
    )


def old_slim_frame(old: DataFrame) -> DataFrame:
    """The (url, _old_hash) projection the work list probes. Compute it
    once and persist when probing MANY batches against one snapshot
    (the streaming path) so the old blobs are scanned and hashed once,
    not per micro-batch."""
    return old.select("url", content_hash(F.col("html")).alias("_old_hash"))


def delta_worklist(
    old: DataFrame, new: DataFrame, old_slim: DataFrame | None = None
) -> DataFrame:
    """The rows a downstream stage must (re)process: the new snapshot's
    added + changed pages, full width, each tagged with its status.

    Left join of the full new snapshot against the slim old frame —
    blobs move once; unchanged rows are dropped before any extraction
    stage sees them. Pass ``old_slim`` (from :func:`old_slim_frame`,
    persisted) to amortize the old-snapshot hash across many probes.
    """
    o = old_slim if old_slim is not None else old_slim_frame(old)
    n = new.withColumn("_new_hash", content_hash(F.col("html")))
    return (
        n.join(o, "url", "left")
        .filter(
            F.col("_old_hash").isNull()
            | (F.col("_old_hash") != F.col("_new_hash"))
        )
        .select(
            *[c for c in new.columns],
            F.when(F.col("_old_hash").isNull(), F.lit("added"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )


# ------------------------------------------------------------ synthesis
# Deterministic two-snapshot law over the documents table (mirrored in
# the oracle CTEs below, which re-derive the expected classification
# straight from doc_id arithmetic — never by hashing in SQL):
#   membership: OLD has doc_id % 5 != 4; NEW has doc_id % 7 != 6
#   content:    OLD is always v1; NEW is v2 iff doc_id % 3 == 0
# so: added     = in NEW only        (doc_id % 5 == 4 and % 7 != 6)
#     removed   = in OLD only        (doc_id % 7 == 6 and % 5 != 4)
#     changed   = both, % 3 == 0
#     unchanged = both, % 3 != 0
_URL = "https://synth.test/page/"


def _snapshot(docs: DataFrame, version: Column, ts_base: str) -> DataFrame:
    d = F.col("doc_id")
    body = F.concat(
        F.lit("<html><body>page-"),
        d.cast("string"),
        F.lit("-v"),
        version.cast("string"),
        F.lit("</body></html>"),
    )
    return docs.select(
        F.concat(F.lit(_URL), d.cast("string")).alias("url"),
        (
            F.to_timestamp(F.lit(ts_base))
            + F.make_interval(secs=d.cast("double"))
        ).alias("warc_ts"),
        F.encode(body, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def synth_snapshots(spark, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(old, new) north-rule-shaped snapshots under the delta law."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    old = _snapshot(
        docs.filter(d % 5 != 4), F.lit(1), "2024-01-01 00:00:00"
    )
    new = _snapshot(
        docs.filter(d % 7 != 6),
        F.when(d % 3 == 0, F.lit(2)).otherwise(F.lit(1)),
        "2024-02-01 00:00:00",
    )
    return old, new


_DELTA_CTE = f"""
    old_ids AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 4),
    new_ids AS (SELECT doc_id FROM documents WHERE doc_id % 7 <> 6),
    classified AS (
        SELECT
            COALESCE(o.doc_id, n.doc_id) AS doc_id,
            CASE
                WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN COALESCE(o.doc_id, n.doc_id) % 3 = 0 THEN 'changed'
                ELSE 'unchanged'
            END AS status,
            o.doc_id IS NOT NULL AS in_old,
            n.doc_id IS NOT NULL AS in_new
        FROM old_ids o FULL OUTER JOIN new_ids n ON o.doc_id = n.doc_id
    )
"""


def snapshot_delta_oracle_sql() -> str:
    return f"""
    WITH {_DELTA_CTE}
    SELECT
        '{_URL}' || CAST(doc_id AS VARCHAR) AS url,
        status,
        CASE WHEN in_old THEN TIMESTAMP '2024-01-01 00:00:00'
             + to_seconds(doc_id) END AS old_ts,
        CASE WHEN in_new THEN TIMESTAMP '2024-02-01 00:00:00'
             + to_seconds(doc_id) END AS new_ts
    FROM classified
    """


def delta_worklist_oracle_sql() -> str:
    return f"""
    WITH {_DELTA_CTE}
    SELECT
        '{_URL}' || CAST(doc_id AS VARCHAR) AS url,
        status,
        'page-' || CAST(doc_id AS VARCHAR) || '-v'
            || CASE WHEN doc_id % 3 = 0 THEN '2' ELSE '1' END AS body_tag
    FROM classified
    WHERE status IN ('added', 'changed')
    """
