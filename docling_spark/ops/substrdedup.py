"""Exact-substring deduplication (Lee et al., arXiv 2107.06499,
"Deduplicating Training Data Makes Language Models Better" — ExactSubstr).

The reference implementation builds a corpus-wide suffix array and
excises every substring of >= 50 tokens that occurs more than once in
the corpus. A monolithic suffix array does not distribute; the standard
cluster re-expression (used by most production pipelines) is
fixed-length token-gram fingerprinting: every duplicated window of
exactly ``gram_len`` tokens is excised, which removes precisely the
same text as the suffix-array method for duplicates of length in
[gram_len, 2*gram_len) and a superset-aligned cover for longer ones
(every token inside a duplicated run >= gram_len is covered by some
duplicated gram, so long duplicates are still fully removed; the
first-occurrence copy is kept in full).

Semantics (deterministic, engine-independent):
- tokens are the whitespace words of the text (runs of whitespace
  collapse; case preserved, as in the paper's byte-level match);
- gram i (0-based) covers tokens [i, i+gram_len-1]; its key is the md5
  of the space-joined tokens;
- the GLOBAL first occurrence of a key in (doc_id, i) order is kept;
  every later occurrence (cross- OR intra-document, as in ExactSubstr)
  marks its covered token interval for removal;
- a token is dropped iff some marked interval covers it; overlapping
  marked intervals merge into islands (``n_islands`` counts the merged
  removal spans, the number of contiguous cuts a reader would see).

Scale shape: gram hashing is in-row (JVM higher-order functions, zero
Python); the first-occurrence flag is ONE hash exchange on the gram key
(window over ``h`` — same shuffle shape as the MinHash band join in
ops/dedup.py, AQE-skew-eligible); drop positions partial-aggregate by
doc_id; one join back; the text rebuild and island count are in-row
again. Nothing is all-pairs and nothing is driver-side, so the plan
survives 100 TB: the only wide edge is the gram-key exchange, which is
exactly the shuffle a suffix-array shard build would also pay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

GRAM_LEN = 8

# Boilerplate runs longer than GRAM_LEN so duplicated grams are
# guaranteed observable: B1 heads every %3==0 doc, B2 tails every
# %3==1 doc, and %9==4 docs carry B2 TWICE (the intra-document
# duplication case ExactSubstr also excises). Grams that straddle a
# boiler/text boundary differ per document (the text differs), so the
# law exercises partial-overlap interval merging too.
_B1 = "the quick brown fox jumps over the lazy dog again and again"
_B2 = "terms of service privacy policy all rights reserved contact us about this site"
_FILL = "middle marker section content words here"


def synth_boiler_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic boilerplate-injected corpus: (doc_id, wtext) over
    the documents table. Pure JVM column expressions, shuffle-free."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d, t = F.col("doc_id"), F.col("text")
    wtext = (
        F.when(d % 9 == 4, F.concat_ws(" ", t, F.lit(_B2), F.lit(_FILL), F.lit(_B2)))
        .when(d % 3 == 0, F.concat_ws(" ", F.lit(_B1), t))
        .when(d % 3 == 1, F.concat_ws(" ", t, F.lit(_B2)))
        .otherwise(t)
    )
    return docs.select("doc_id", wtext.alias("wtext"))


BOILER_CTE_SQL = f"""wt AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 4
                THEN text || ' ' || '{_B2}' || ' ' || '{_FILL}' || ' ' || '{_B2}'
              WHEN doc_id % 3 = 0 THEN '{_B1}' || ' ' || text
              WHEN doc_id % 3 = 1 THEN text || ' ' || '{_B2}'
              ELSE text END AS wtext
  FROM documents)"""


def _words(t: Column) -> Column:
    """Whitespace tokens with runs collapsed (no empty tokens)."""
    return F.split(F.trim(F.regexp_replace(t, r"\s+", " ")), " ")


def substr_dedup(
    df: DataFrame, col: str = "wtext", gram_len: int = GRAM_LEN
) -> DataFrame:
    """ExactSubstr over ``col`` -> (doc_id, n_words, n_dropped,
    n_islands, clean_text).

    One gram-key exchange + one doc_id partial agg + one join back;
    everything else is in-row. cf. reference pipeline scope note: the
    reference (docling) stops at extraction; this is the
    training-corpus stage its output feeds.
    """
    base = df.select("doc_id", _words(F.col(col)).alias("w"))
    nw = F.size("w")
    grams = F.when(
        nw >= gram_len,
        F.transform(
            F.sequence(F.lit(0), nw - gram_len),
            lambda i: F.md5(F.array_join(F.slice("w", i + 1, gram_len), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = base.select("doc_id", F.posexplode(grams).alias("i", "h"))
    w = Window.partitionBy("h").orderBy("doc_id", "i")
    drops = (
        ex.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("i")).alias("starts"))
    )
    joined = base.join(drops, "doc_id", "left")
    starts = F.coalesce(F.col("starts"), F.array().cast("array<int>"))
    covered = lambda j: F.exists(  # noqa: E731 — two-arg lambda helper
        starts, lambda s: (s <= j) & (j <= s + gram_len - 1)
    )
    kept = F.filter("w", lambda x, j: ~covered(j))
    # islands: 1 + number of gaps between consecutive sorted starts
    # (a gap means the previous interval [s, s+L-1] ends before the
    # next starts). element_at is 1-based; the ns <= 1 guard keeps
    # sequence() ascending and the index positive (CaseWhen only
    # evaluates the matched branch per row).
    ns = F.size(starts)
    gaps = F.size(
        F.filter(
            F.sequence(F.lit(2), ns),
            lambda k: F.element_at(starts, k)
            > F.element_at(starts, k - 1) + gram_len - 1,
        )
    )
    n_islands = (
        F.when(ns == 0, F.lit(0)).when(ns == 1, F.lit(1)).otherwise(gaps + 1)
    )
    return joined.select(
        "doc_id",
        F.size("w").alias("n_words"),
        (F.size("w") - F.size(kept)).alias("n_dropped"),
        n_islands.cast("int").alias("n_islands"),
        F.array_join(kept, " ").alias("clean_text"),
    )


# ------------------------------------------------------------------ oracle
def substr_oracle_sql(corpus_cte: str, gram_len: int = GRAM_LEN) -> str:
    """DuckDB mirror of :func:`substr_dedup` over a `wt AS (...)` CTE
    exposing (doc_id, wtext). NOTE: DuckDB's indexed list lambdas are
    1-based where Spark's are 0-based."""
    L = gram_len
    return (
        "WITH "
        + corpus_cte
        + f""",
wrd AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(wtext, '\\s+', ' ', 'g')), ' ') AS w
  FROM wt),
gr AS (
  SELECT doc_id, g.i,
         md5(array_to_string(list_slice(w, g.i + 1, g.i + {L}), ' ')) AS h
  FROM wrd, LATERAL (
    SELECT unnest(range(0, greatest(len(w) - {L} + 1, 0))) AS i) g),
dr AS (
  SELECT doc_id, list_sort(list(i)) AS starts
  FROM (SELECT doc_id, i,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn
        FROM gr)
  WHERE rn > 1 GROUP BY doc_id),
j AS (
  SELECT wrd.doc_id, w, coalesce(starts, []) AS st
  FROM wrd LEFT JOIN dr ON wrd.doc_id = dr.doc_id),
k AS (
  SELECT doc_id, len(w) AS n_words, st,
         list_filter(w, (x, jj) -> len(list_filter(st,
             s -> s <= jj - 1 AND jj - 1 <= s + {L} - 1)) = 0) AS kept
  FROM j)
SELECT doc_id, n_words,
       n_words - len(kept) AS n_dropped,
       CAST(CASE WHEN len(st) = 0 THEN 0
            ELSE 1 + len(list_filter(range(2, len(st) + 1),
                 kk -> list_extract(st, CAST(kk AS INTEGER))
                       > list_extract(st, CAST(kk AS INTEGER) - 1) + {L} - 1))
            END AS INTEGER) AS n_islands,
       coalesce(array_to_string(kept, ' '), '') AS clean_text
FROM k"""
    )
