"""Gopher-style repetition / quality signals over multi-line web text.

The reference pipeline stops at extraction (DoclingDocument out); a
crawl-scale training-data pipeline additionally FILTERS the extracted text.
This module implements the repetition and quality heuristics popularized by
the Gopher paper (Rae et al., arXiv 2112.11446, Appendix A1.1) — duplicate
line fraction, duplicate-line character fraction, top-bigram character
coverage, bullet/ellipsis line ratios, symbol-to-word ratio, alphabetic-word
fraction, mean word length — plus a first-failing-reason keep/reject gate in
the style of ``ops/curate.py``.

Scale shape: every signal is computed IN-ROW with JVM higher-order
functions (``transform`` / ``filter`` / ``aggregate`` over the line and
word arrays) — zero joins, zero shuffles, zero Python in the hot path. At
100 TB the plan is scan -> project, embarrassingly parallel.

The synthetic corpus is a deterministic law over ``documents.doc_id``
(``/root/testdata`` documents are single-line, so multi-line text is
synthesized the same way ``ops/multimodal.py`` synthesizes media blobs):
lines are word sequences from a 16-word vocabulary; every line ``i >= 3``
with ``(doc_id + i) % 3 == 0`` is an exact copy of line ``i % 3`` (the
duplicate-line signal); a line gets a ``"- "`` bullet prefix when
``(doc_id + src*2) % 5 == 0`` and a ``"..."`` suffix when
``(doc_id*3 + src) % 7 == 0``. The law is expressible in both Spark SQL and
DuckDB list lambdas, so the value oracle rebuilds the identical corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = [
    "data", "spark", "table", "query", "scan", "join", "filter", "agg",
    "row", "batch", "value", "key", "sort", "merge", "stream", "window",
]


# ------------------------------------------------------------------ corpus
def _vocab_at(idx: Column) -> Column:
    return F.element_at(
        F.array(*[F.lit(w) for w in VOCAB]), (idx + 1).cast("int")
    )


def _word(doc_id: Column, src: Column, j: Column) -> Column:
    """Word law with four doc classes so every Gopher rule is exercised:
    doc_id % 46 == 0 -> 2-char numeric words (mean_word_len < 3);
    doc_id % 23 == 0 -> 3-char numeric words (alpha_word_frac < 0.8);
    doc_id % 19 == 0 -> two alternating words (top-bigram coverage ~0.5);
    otherwise a 16-word vocabulary walk."""
    return (
        F.when(
            doc_id % 46 == 0,
            ((doc_id + src * 3 + j * 7) % 90 + 10).cast("string"),
        )
        .when(
            doc_id % 23 == 0,
            ((doc_id + src * 3 + j * 7) % 900 + 100).cast("string"),
        )
        .when(doc_id % 19 == 0, _vocab_at((doc_id + (j % 2) * 5) % 16))
        .otherwise(_vocab_at((doc_id * 7 + src * 11 + j * 5) % 16))
    )


def _line(doc_id: Column, src: Column) -> Column:
    """One deterministic line keyed ENTIRELY off (doc_id, src) so that a
    duplicated src yields a byte-identical line."""
    n_words = F.lit(4) + (doc_id * 5 + src * 3) % 6
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1), lambda j: _word(doc_id, src, j)
    )
    bullet = F.when(
        (doc_id % 13 == 0) | ((doc_id + src * 2) % 5 == 0), F.lit("- ")
    ).otherwise("")
    ellipsis = F.when(
        (doc_id % 17 == 0) | ((doc_id * 3 + src) % 7 == 0), F.lit("...")
    ).otherwise("")
    return F.concat(bullet, F.array_join(words, " "), ellipsis)


def synth_webtext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-line webtext corpus: (doc_id, wtext).

    Pure JVM column expressions over the documents scan — the corpus
    builder itself is shuffle-free and Python-free.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    n_lines = F.lit(6) + d % 9
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: _line(
            d, F.when((i >= 3) & ((d + i) % 3 == 0), i % 3).otherwise(i)
        ),
    )
    return docs.select(d.alias("doc_id"), F.array_join(lines, "\n").alias("wtext"))


def _cte_sql() -> str:
    """DuckDB mirror of synth_webtext, generated so the src-substitution
    stays mechanical (same law, list-lambda dialect)."""
    vocab = "[" + ",".join(f"'{w}'" for w in VOCAB) + "]"
    s = "(CASE WHEN i >= 3 AND (doc_id + i) % 3 = 0 THEN i % 3 ELSE i END)"
    word = f"""CASE
      WHEN doc_id % 46 = 0
        THEN CAST((doc_id + {s} * 3 + j * 7) % 90 + 10 AS VARCHAR)
      WHEN doc_id % 23 = 0
        THEN CAST((doc_id + {s} * 3 + j * 7) % 900 + 100 AS VARCHAR)
      WHEN doc_id % 19 = 0
        THEN list_extract({vocab},
               CAST((doc_id + (j % 2) * 5) % 16 + 1 AS INTEGER))
      ELSE list_extract({vocab},
             CAST((doc_id * 7 + {s} * 11 + j * 5) % 16 + 1 AS INTEGER))
    END"""
    line = f"""concat(
      CASE WHEN doc_id % 13 = 0 OR (doc_id + {s} * 2) % 5 = 0
           THEN '- ' ELSE '' END,
      array_to_string(list_transform(
        range(0, 4 + (doc_id * 5 + {s} * 3) % 6), j -> {word}), ' '),
      CASE WHEN doc_id % 17 = 0 OR (doc_id * 3 + {s}) % 7 = 0
           THEN '...' ELSE '' END)"""
    return f"""
wt AS (
  SELECT doc_id,
         array_to_string(list_transform(range(0, 6 + doc_id % 9),
           i -> {line}), chr(10)) AS wtext
  FROM documents)
"""


WEBTEXT_CTE_SQL = _cte_sql()


# ------------------------------------------------------------------ signals
def repetition_signals(df: DataFrame, col: str = "wtext") -> DataFrame:
    """Gopher A1.1 repetition + quality signals, all in-row JVM.

    Definitions (documented because the paper leaves some latitude):
    - dup_line_frac: 1 - distinct_lines / lines.
    - dup_line_char_frac: characters on the 2nd+ occurrences of a repeated
      line, over total line characters.
    - top_2gram_char_frac: (count * chars-excluding-separator) of the
      word-bigram with the highest character coverage, over total word chars.
    - symbol_word_ratio: occurrences of "..." per word.
    - alpha_word_frac: fraction of whitespace words containing [a-z].
    """
    t = F.col(col)
    lines = F.split(t, "\n")
    nl = F.size(lines)
    nd = F.size(F.array_distinct(lines))
    line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, l: acc + F.length(l)
    )
    dup_chars = F.aggregate(
        F.transform(
            F.array_distinct(lines),
            lambda l: (F.size(F.filter(lines, lambda x: x == l)) - 1)
            * F.length(l),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    words = F.split(F.regexp_replace(t, "\n", " "), " ")
    nw = F.size(words)
    word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    bigrams = F.transform(
        F.sequence(F.lit(0), nw - 2),
        lambda i: F.concat(
            F.element_at(words, i + 1), F.lit(" "), F.element_at(words, i + 2)
        ),
    )
    top2 = F.array_max(
        F.transform(
            F.array_distinct(bigrams),
            lambda g: F.size(F.filter(bigrams, lambda x: x == g))
            * (F.length(g) - 1),
        )
    )
    n_ellipsis = (F.length(t) - F.length(F.replace(t, F.lit("...")))) / 3
    return df.select(
        "doc_id",
        nl.alias("n_lines"),
        nw.alias("n_words"),
        F.round(F.lit(1.0) - nd.cast("double") / nl, 4).alias("dup_line_frac"),
        F.round(dup_chars.cast("double") / line_chars, 4).alias(
            "dup_line_char_frac"
        ),
        F.round(top2.cast("double") / word_chars, 4).alias(
            "top_2gram_char_frac"
        ),
        F.round(
            F.size(F.filter(lines, lambda l: l.startswith("- "))).cast("double")
            / nl,
            4,
        ).alias("bullet_line_frac"),
        F.round(
            F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("double")
            / nl,
            4,
        ).alias("ellipsis_line_frac"),
        F.round(n_ellipsis / nw, 4).alias("symbol_word_ratio"),
        F.round(
            F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("double")
            / nw,
            4,
        ).alias("alpha_word_frac"),
        F.round(word_chars.cast("double") / nw, 4).alias("mean_word_len"),
    )


# Gopher's published cut-offs (arXiv 2112.11446 A1.1). Attribution is
# first-failing-rule; the order front-loads the more specific rules and
# places the dup-line pair before top-bigram coverage (duplicate lines
# imply repeated bigrams, so the reverse order would shadow `dup_lines`
# entirely) — with this order every reason code is observable on the
# synthetic corpus. Gopher drops a failing doc regardless; the reason
# code is a reporting choice.
GOPHER_RULES = [
    ("bullet_line_frac", ">", 0.90, "bullets"),
    ("symbol_word_ratio", ">", 0.10, "symbols"),
    ("mean_word_len", "<", 3.0, "word_len"),
    ("mean_word_len", ">", 10.0, "word_len"),
    ("alpha_word_frac", "<", 0.80, "non_alpha"),
    ("ellipsis_line_frac", ">", 0.30, "ellipsis"),
    ("dup_line_frac", ">", 0.30, "dup_lines"),
    ("dup_line_char_frac", ">", 0.20, "dup_line_chars"),
    ("top_2gram_char_frac", ">", 0.20, "top_ngram"),
]


def gopher_filter(signals: DataFrame) -> DataFrame:
    """First-failing-rule keep/reject gate (reason-code style of
    ops/curate.py). Pure in-row CASE chain."""
    # built innermost-out so the FIRST failing rule wins the CASE chain
    reason = F.lit("keep")
    for name, op, thr, code in reversed(GOPHER_RULES):
        cond = F.col(name) > thr if op == ">" else F.col(name) < thr
        reason = F.when(cond, code).otherwise(reason)
    return signals.select(
        "*",
        reason.alias("reject_reason"),
        (reason == "keep").alias("keep"),
    )


def _rules_case_sql() -> str:
    parts = []
    for name, op, thr, code in GOPHER_RULES:
        parts.append(f"WHEN {name} {op} {thr} THEN '{code}'")
    return "CASE " + " ".join(parts) + " ELSE 'keep' END"


SIGNALS_ORACLE_SQL = (
    "WITH "
    + WEBTEXT_CTE_SQL
    + """,
sig AS (
  SELECT doc_id,
         len(string_split(wtext, chr(10))) AS n_lines,
         len(string_split(replace(wtext, chr(10), ' '), ' ')) AS n_words,
         round(1.0 - len(list_distinct(string_split(wtext, chr(10))))
                   / len(string_split(wtext, chr(10))), 4) AS dup_line_frac,
         round(list_aggregate(list_transform(
                 list_distinct(string_split(wtext, chr(10))), l ->
                 (len(list_filter(string_split(wtext, chr(10)), x -> x = l)) - 1)
                 * length(l)), 'sum')
               / list_aggregate(list_transform(string_split(wtext, chr(10)),
                 l -> length(l)), 'sum'), 4) AS dup_line_char_frac,
         round(list_max(list_transform(
                 list_distinct(list_transform(
                   range(0, len(string_split(replace(wtext, chr(10), ' '), ' ')) - 1),
                   i -> concat(
                     list_extract(string_split(replace(wtext, chr(10), ' '), ' '),
                                  CAST(i + 1 AS INTEGER)), ' ',
                     list_extract(string_split(replace(wtext, chr(10), ' '), ' '),
                                  CAST(i + 2 AS INTEGER))))), g ->
                 len(list_filter(list_transform(
                   range(0, len(string_split(replace(wtext, chr(10), ' '), ' ')) - 1),
                   i -> concat(
                     list_extract(string_split(replace(wtext, chr(10), ' '), ' '),
                                  CAST(i + 1 AS INTEGER)), ' ',
                     list_extract(string_split(replace(wtext, chr(10), ' '), ' '),
                                  CAST(i + 2 AS INTEGER)))), x -> x = g))
                 * (length(g) - 1)))
               / list_aggregate(list_transform(
                   string_split(replace(wtext, chr(10), ' '), ' '),
                   w -> length(w)), 'sum'), 4) AS top_2gram_char_frac,
         round(len(list_filter(string_split(wtext, chr(10)),
                   l -> l LIKE '- %'))
               / len(string_split(wtext, chr(10))), 4) AS bullet_line_frac,
         round(len(list_filter(string_split(wtext, chr(10)),
                   l -> l LIKE '%...'))
               / len(string_split(wtext, chr(10))), 4) AS ellipsis_line_frac,
         round(((length(wtext) - length(replace(wtext, '...', ''))) / 3)
               / len(string_split(replace(wtext, chr(10), ' '), ' ')), 4)
           AS symbol_word_ratio,
         round(len(list_filter(string_split(replace(wtext, chr(10), ' '), ' '),
                   w -> regexp_matches(w, '[a-z]')))
               / len(string_split(replace(wtext, chr(10), ' '), ' ')), 4)
           AS alpha_word_frac,
         round(list_aggregate(list_transform(
                 string_split(replace(wtext, chr(10), ' '), ' '),
                 w -> length(w)), 'sum')
               / len(string_split(replace(wtext, chr(10), ' '), ' ')), 4)
           AS mean_word_len
  FROM wt)
SELECT sig.*, """
    + _rules_case_sql()
    + " AS reject_reason, ("
    + _rules_case_sql()
    + ") = 'keep' AS keep FROM sig"
)
