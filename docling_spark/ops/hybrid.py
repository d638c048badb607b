"""Hybrid retrieval: reciprocal-rank fusion of lexical and dense top-k.

Fuses the two retrieval families this engine already ships — BM25
(``ops/bm25.py``, sparse/lexical) and cosine top-k (``ops/ann.py``,
dense/embedding) — with the standard RRF law
``score(d) = Σ_lists 1 / (C + rank_list(d))`` (C = 60, Cormack et al.
SIGIR'09). The identity space is shared: ``embeddings.vec_id`` is the
``documents.doc_id`` of the embedded document (the testdata tables are
generated that way).

Scale shape: both inputs are ALREADY top-k lists (bounded k, produced
by scale-safe plans — BM25's heap top-k, cosine's broadcast scan), so
the fusion operates on 2k rows: rank assignment is a window over a
bounded list, the fuse is one full-outer join on the id, and the final
cut is again a bounded sort. Nothing here touches the corpus.

Cross-engine determinism: ranks are integers; the fused score is a
two-term sum of exactly-rounded IEEE divisions in a fixed order, so it
matches DuckDB bit-for-bit (same posture as ops/bm25.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["rrf_fuse"]

RRF_C = 60


def rrf_fuse(
    lex: DataFrame,
    dense: DataFrame,
    k: int = 20,
    c: int = RRF_C,
) -> DataFrame:
    """Fuse two bounded result lists into (doc_id, rrf, lex_rank,
    dense_rank), top-``k`` by fused score.

    ``lex``:   (doc_id, score)  — ranked by (score desc, doc_id)
    ``dense``: (vec_id, cosine) — ranked by (cosine desc, vec_id)

    The single-partition windows are deliberate: the inputs are top-k
    lists of bounded size, not corpus-scale frames.
    """
    lw = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    l = lex.select(
        "doc_id", F.row_number().over(lw).alias("lex_rank")
    )
    dw = Window.orderBy(F.col("cosine").desc(), F.col("vec_id"))
    d = dense.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(dw).alias("dense_rank"),
    )
    fused = l.join(d, "doc_id", "full_outer")
    rrf = F.when(
        F.col("lex_rank").isNotNull(),
        1.0 / (F.lit(float(c)) + F.col("lex_rank").cast("double")),
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("dense_rank").isNotNull(),
        1.0 / (F.lit(float(c)) + F.col("dense_rank").cast("double")),
    ).otherwise(F.lit(0.0))
    return (
        fused.select("doc_id", rrf.alias("rrf"), "lex_rank", "dense_rank")
        .orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(k)
    )


def rrf_oracle_sql(
    lex_sql: str, dense_sql: str, k: int = 20, c: int = RRF_C
) -> str:
    """DuckDB mirror: wraps the two list oracles as CTEs, assigns the
    same (score desc, id) ranks, fuses with the same two-term sum."""
    return f"""
    WITH lex_list AS ({lex_sql}),
    dense_list AS ({dense_sql}),
    lr AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
        FROM lex_list
    ),
    dr AS (
        SELECT vec_id AS doc_id,
               row_number() OVER (ORDER BY cosine DESC, vec_id) AS dense_rank
        FROM dense_list
    )
    SELECT
        COALESCE(lr.doc_id, dr.doc_id) AS doc_id,
        (CASE WHEN lex_rank IS NOT NULL
              THEN 1.0 / ({c}.0 + CAST(lex_rank AS DOUBLE)) ELSE 0.0 END
         + CASE WHEN dense_rank IS NOT NULL
                THEN 1.0 / ({c}.0 + CAST(dense_rank AS DOUBLE)) ELSE 0.0 END)
            AS rrf,
        CAST(lex_rank AS INTEGER) AS lex_rank,
        CAST(dense_rank AS INTEGER) AS dense_rank
    FROM lr FULL OUTER JOIN dr ON lr.doc_id = dr.doc_id
    ORDER BY rrf DESC, COALESCE(lr.doc_id, dr.doc_id)
    LIMIT {k}
    """
