"""Paragraph-level global dedup (the Dolma / RefinedWeb practice).

The granularity between C4's three-sentence spans (``ops/c4.py``) and
whole-document exact dedup (``ops/dedup.py``): every paragraph that
appears anywhere else in the corpus is removed, keeping the single
global first occurrence in (doc_id, para_idx) order — boilerplate
navigation blocks, cookie banners and licence footers vanish corpus-wide
while the surrounding prose survives.

Scale shape (same as the C4 span remover): paragraph splitting and
hashing are in-row JVM expressions; the first occurrence per hash is
a min-struct aggregation (map-side combinable, so a cookie banner
shared by 10^8 pages collapses to one row per map task) joined back on
the hash — an AQE-skew-splittable equi-join, deliberately NOT a
row_number window (a window partition on the hot hash cannot be
split); the drop positions come back with a doc_id partial agg + join,
and the rebuild is an in-row indexed lambda filter. Zero Python,
nothing all-pairs, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "paragraph_dedup",
    "synth_para_corpus",
    "PARA_CTE_SQL",
    "paragraph_dedup_oracle_sql",
]

_PARA_SPLIT = r"\n\n+"


def _para_hash(p: Column) -> Column:
    # normalized identity: case- and edge-whitespace-insensitive, so a
    # reflowed copy of the same boilerplate still collapses
    return F.md5(F.lower(F.trim(p)))


def paragraph_dedup(df: DataFrame, col: str = "wtext") -> DataFrame:
    """(doc_id, <col>) -> (doc_id, n_paras, n_kept, clean_text) with every
    non-first global paragraph occurrence removed."""
    base = df.select(
        "doc_id", F.split(F.col(col), _PARA_SPLIT).alias("paras")
    )
    ex = base.select(
        "doc_id", F.posexplode("paras").alias("para_idx", "p")
    ).select("doc_id", "para_idx", _para_hash(F.col("p")).alias("h"))
    # keep-first via min-struct agg + join, NOT a row_number window: the
    # hot key here is real (a cookie banner on 10^8 pages hashes
    # identically) and a window partition cannot be split, while the
    # min-struct agg collapses duplicates map-side and the join back is
    # AQE-skew-splittable. Same keep-first-(doc_id, para_idx) law.
    firsts = ex.groupBy("h").agg(
        F.min(F.struct("doc_id", "para_idx")).alias("first")
    )
    drops = (
        ex.join(firsts, "h")
        .where(
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("para_idx") != F.col("first.para_idx"))
        )
        .groupBy("doc_id")
        .agg(F.collect_set("para_idx").alias("drops"))
    )
    joined = base.join(drops, "doc_id", "left")
    dropped = F.coalesce(F.col("drops"), F.array().cast("array<int>"))
    kept = F.filter(
        "paras", lambda p, i: ~F.array_contains(dropped, i)
    )
    return joined.select(
        "doc_id",
        F.size("paras").alias("n_paras"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n\n").alias("clean_text"),
    )


# ------------------------------------------------------------ synthesis
# Pooled-paragraph law (mirrored in PARA_CTE_SQL): doc d carries
# 2 + d % 4 paragraphs; paragraph j is pool entry (d*13 + j*17) % 97.
# 97 is prime and j < 6, so a doc never collides with itself, while the
# pool guarantees heavy CROSS-document duplication — the case this
# operator exists for. Pool entry k is two lines of deterministic text.
_POOL = 97


def synth_para_corpus(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    para = lambda k: F.concat(
        F.lit("shared block "),
        k.cast("string"),
        F.lit(" alpha beta\ngamma delta "),
        k.cast("string"),
    )
    paras = F.transform(
        F.sequence(F.lit(0), (1 + d % 4).cast("int")),
        lambda j: para((d * 13 + j * 17) % _POOL),
    )
    return docs.select(
        d.alias("doc_id"), F.array_join(paras, "\n\n").alias("wtext")
    )


PARA_CTE_SQL = f"""
    pd AS (
        SELECT doc_id, j AS para_idx,
               'shared block ' || CAST((doc_id * 13 + j * 17) % {_POOL} AS VARCHAR)
                   || ' alpha beta' || chr(10) || 'gamma delta '
                   || CAST((doc_id * 13 + j * 17) % {_POOL} AS VARCHAR) AS p
        FROM documents, UNNEST(range(0, 2 + doc_id % 4)) AS t(j)
    )
"""


def paragraph_dedup_oracle_sql() -> str:
    return f"""
    WITH {PARA_CTE_SQL},
    hashed AS (
        SELECT doc_id, para_idx, p, md5(lower(trim(p))) AS h FROM pd
    ),
    flagged AS (
        SELECT doc_id, para_idx, p,
               row_number() OVER (PARTITION BY h
                                  ORDER BY doc_id, para_idx) AS rn
        FROM hashed
    )
    SELECT doc_id,
           count(*) AS n_paras,
           count(*) FILTER (rn = 1) AS n_kept,
           coalesce(string_agg(p, chr(10) || chr(10) ORDER BY para_idx)
                        FILTER (rn = 1),
                    '') AS clean_text
    FROM flagged GROUP BY doc_id
    """
