"""C4-style web-text cleaning (Raffel et al., arXiv 1910.10683 §2.2).

The other canonical crawl-cleaning stage next to the Gopher gate
(``ops/webtext.py``): line-level filters (terminal punctuation, minimum
words, the literal "javascript"), page-level gates ("lorem ipsum", the
curly brace, minimum sentence count) and the three-sentence-span
deduplication.

Definitions (documented where the paper leaves latitude):
- a line is kept iff it ends in a terminal mark (``. ! ? "``), has >= 5
  whitespace words, and does not contain "javascript";
- sentences are maximal ``[^.!?]+[.!?]+`` runs of the text (newlines
  collapsed to spaces); trailing text without a terminal mark is not a
  sentence. "..." terminates exactly one sentence;
- page gates check the ORIGINAL text (a brace inside a dropped line
  still rejects the page, as in C4 which filters pages before lines);
- spans are every 3 consecutive sentences (sliding by 1), normalized
  lower+trim, hashed md5; the global first occurrence in
  (doc_id, span_idx) order is kept, later ones are flagged duplicate.

Scale shape: line/page filters and span construction are in-row JVM
higher-order functions (zero Python); the span dedup is ONE hash
exchange on ``span_hash`` — the same shuffle shape as the MinHash-LSH
band join in ``ops/dedup.py``, AQE-skew-eligible. At 100 TB nothing
here is all-pairs or driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MIN_LINE_WORDS = 5
MIN_SENTENCES = 3
_TERMINAL_RE = '[.!?"]$'
_SENTENCE_RE = "[^.!?]+[.!?]+"


def _kept_lines(t: Column) -> Column:
    lines = F.split(t, "\n+")
    return F.filter(
        lines,
        lambda l: l.rlike(_TERMINAL_RE)
        & (F.size(F.split(l, " ")) >= MIN_LINE_WORDS)
        & ~l.contains("javascript"),
    )


def c4_clean(df: DataFrame, col: str = "wtext") -> DataFrame:
    """Line filters + page gates -> (doc_id, n_lines, n_kept, clean_text,
    n_sentences, keep, reason). First-failing-reason attribution in the
    style of ops/curate.py: lorem_ipsum, brace, too_few_sentences, ok."""
    t = F.col(col)
    kept = _kept_lines(t)
    step = df.select(
        "doc_id",
        F.size(F.split(t, "\n+")).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
        F.lower(t).contains("lorem ipsum").alias("_lorem"),
        t.contains("{").alias("_brace"),
    ).withColumn(
        "n_sentences",
        F.size(F.expr("regexp_extract_all(clean_text, '[.!?]+', 0)")),
    )
    reason = (
        F.when(F.col("_lorem"), "lorem_ipsum")
        .when(F.col("_brace"), "brace")
        .when(F.col("n_sentences") < MIN_SENTENCES, "too_few_sentences")
        .otherwise("ok")
    )
    return step.select(
        "doc_id",
        "n_lines",
        "n_kept",
        "clean_text",
        "n_sentences",
        (reason == "ok").alias("keep"),
        reason.alias("reason"),
    )


def _sentences(col: str) -> Column:
    """Normalized (lower+trim) sentence array of the text column.

    regexp_extract_all has no DataFrame function, so it goes through
    F.expr; '\\n' inside the SQL literal is the newline escape."""
    return F.transform(
        F.expr(
            f"regexp_extract_all(regexp_replace({col}, '\\\\n+', ' '),"
            f" '{_SENTENCE_RE}', 0)"
        ),
        lambda s: F.lower(F.trim(s)),
    )


def c4_span_dedup(df: DataFrame, col: str = "wtext") -> DataFrame:
    """Three-sentence-span dedup: (doc_id, span_idx, span_hash, is_dup).

    Span construction is in-row; the duplicate flag is one global hash
    exchange (Window over span_hash ordered by (doc_id, span_idx))."""
    sent = _sentences(col)
    ns = F.size(sent)
    spans = F.when(
        ns >= 3,
        F.transform(
            F.sequence(F.lit(0), ns - 3),
            lambda i: F.md5(F.array_join(F.slice(sent, i + 1, 3), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select(
        "doc_id", F.posexplode(spans).alias("span_idx", "span_hash")
    )
    w = Window.partitionBy("span_hash").orderBy("doc_id", "span_idx")
    return exploded.select(
        "doc_id",
        "span_idx",
        "span_hash",
        (F.row_number().over(w) > 1).alias("is_dup"),
    )


def c4_remove_dup_spans(df: DataFrame, col: str = "wtext") -> DataFrame:
    """The full C4 span-dedup SEMANTICS: duplicated three-sentence spans
    are REMOVED from the text (all but the global first occurrence),
    not just flagged -> (doc_id, n_sents, n_kept, clean_text).

    A sentence is dropped iff some duplicate span occurrence in its own
    document covers it (positions idx..idx+2). Plan: in-row span hashing,
    ONE hash exchange for the first-occurrence window, a doc_id partial
    agg of drop positions, and one join back — then the rebuild is
    in-row again (indexed lambda filter, zero Python)."""
    sent = _sentences(col)
    base = df.select("doc_id", sent.alias("sents"))
    ns = F.size("sents")
    spans = F.when(
        ns >= 3,
        F.transform(
            F.sequence(F.lit(0), ns - 3),
            lambda i: F.md5(F.array_join(F.slice("sents", i + 1, 3), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = base.select("doc_id", F.posexplode(spans).alias("span_idx", "h"))
    w = Window.partitionBy("h").orderBy("doc_id", "span_idx")
    dups = (
        ex.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .groupBy("doc_id")
        .agg(F.collect_set("span_idx").alias("drops"))
    )
    joined = base.join(dups, "doc_id", "left")
    covered = lambda x, i: F.exists(  # noqa: E731 — needs two params
        F.coalesce(F.col("drops"), F.array().cast("array<int>")),
        lambda d: (d <= i) & (i <= d + 2),
    )
    kept = F.filter("sents", lambda x, i: ~covered(x, i))
    return joined.select(
        "doc_id",
        F.size("sents").alias("n_sents"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, " ").alias("clean_text"),
    )


# ------------------------------------------------------------------ oracles
def clean_oracle_sql(corpus_cte: str) -> str:
    """DuckDB mirror of c4_clean over the given `wt AS (...)` corpus CTE."""
    kept = (
        "list_filter(regexp_split_to_array(wtext, '\\n+'),"
        " l -> regexp_matches(l, '[.!?\"]$')"
        f" AND len(string_split(l, ' ')) >= {MIN_LINE_WORDS}"
        " AND NOT contains(l, 'javascript'))"
    )
    return (
        "WITH "
        + corpus_cte
        + f""",
k AS (
  SELECT doc_id,
         len(regexp_split_to_array(wtext, '\\n+')) AS n_lines,
         {kept} AS kept,
         lower(wtext) LIKE '%lorem ipsum%' AS lorem,
         contains(wtext, '{{') AS brace
  FROM wt),
c AS (
  SELECT doc_id, n_lines, len(kept) AS n_kept,
         array_to_string(kept, chr(10)) AS clean_text,
         len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]+'))
             AS n_sentences,
         lorem, brace
  FROM k)
SELECT doc_id, n_lines, n_kept, clean_text, n_sentences,
       (CASE WHEN lorem THEN 'lorem_ipsum' WHEN brace THEN 'brace'
             WHEN n_sentences < {MIN_SENTENCES} THEN 'too_few_sentences'
             ELSE 'ok' END) = 'ok' AS keep,
       CASE WHEN lorem THEN 'lorem_ipsum' WHEN brace THEN 'brace'
            WHEN n_sentences < {MIN_SENTENCES} THEN 'too_few_sentences'
            ELSE 'ok' END AS reason
FROM c"""
    )


def span_oracle_sql(corpus_cte: str) -> str:
    """DuckDB mirror of c4_span_dedup over the given corpus CTE."""
    return (
        "WITH "
        + corpus_cte
        + f""",
sent AS (
  SELECT doc_id,
         list_transform(
           regexp_extract_all(regexp_replace(wtext, '\\n+', ' ', 'g'),
                              '{_SENTENCE_RE}'),
           x -> lower(trim(x))) AS sn
  FROM wt),
sp AS (
  SELECT doc_id, g.i AS span_idx,
         md5(array_to_string(list_slice(sn, g.i + 1, g.i + 3), ' '))
             AS span_hash
  FROM sent, LATERAL (SELECT unnest(range(0, greatest(len(sn) - 2, 0))) AS i) g)
SELECT doc_id, CAST(span_idx AS INTEGER) AS span_idx, span_hash,
       row_number() OVER (PARTITION BY span_hash
                          ORDER BY doc_id, span_idx) > 1 AS is_dup
FROM sp"""
    )


def removal_oracle_sql(corpus_cte: str) -> str:
    """DuckDB mirror of c4_remove_dup_spans (NOTE: DuckDB's indexed
    list_filter lambda is 1-based where Spark's is 0-based)."""
    return (
        "WITH "
        + corpus_cte
        + f""",
sent AS (
  SELECT doc_id,
         list_transform(
           regexp_extract_all(regexp_replace(wtext, '\\n+', ' ', 'g'),
                              '{_SENTENCE_RE}'),
           x -> lower(trim(x))) AS sn
  FROM wt),
sp AS (
  SELECT doc_id, g.i AS span_idx,
         md5(array_to_string(list_slice(sn, g.i + 1, g.i + 3), ' '))
             AS span_hash
  FROM sent, LATERAL (SELECT unnest(range(0, greatest(len(sn) - 2, 0))) AS i) g),
dup AS (
  SELECT doc_id, list(span_idx) AS drops
  FROM (SELECT doc_id, span_idx,
               row_number() OVER (PARTITION BY span_hash
                                  ORDER BY doc_id, span_idx) AS rn
        FROM sp)
  WHERE rn > 1 GROUP BY doc_id)
SELECT s.doc_id, len(sn) AS n_sents,
       len(list_filter(sn, (x, i) ->
           len(list_filter(coalesce(d.drops, []),
               dd -> dd <= i - 1 AND i - 1 <= dd + 2)) = 0)) AS n_kept,
       coalesce(array_to_string(list_filter(sn, (x, i) ->
           len(list_filter(coalesce(d.drops, []),
               dd -> dd <= i - 1 AND i - 1 <= dd + 2)) = 0), ' '), '')
           AS clean_text
FROM sent s LEFT JOIN dup d ON s.doc_id = d.doc_id"""
    )
