"""Unicode script mix: the script-first routing signal of a crawl.

Before any language model runs, a web pipeline routes documents by
SCRIPT — Latin text goes to the Latin-alphabet lang-ID path, CJK to
the CJK path, mixed-script spam (Cyrillic lookalikes inside Latin
words, zero-information emoji floods) gets flagged. This op counts
code points per major script with plain character-class regexes —
identical literal ranges on both engines (Java regex and RE2 agree on
``[א-ת]``-style ranges), so the whole signal is engine-exact — and
reports the dominant script with its ratio.

Ranges (BMP blocks, the curation-grade approximation — NOT full
Unicode Script= property, which Java and RE2 spell differently;
literal ranges keep the law portable):

==========  =====================================
latin       A-Z a-z À-ÿ Ā-ſ (Basic + Supplement + Extended-A)
cyrillic    U+0400–U+04FF
greek       U+0370–U+03FF
arabic      U+0600–U+06FF
hebrew      U+0590–U+05FF
devanagari  U+0900–U+097F
cjk         U+4E00–U+9FFF (unified ideographs)
kana        U+3040–U+30FF (hiragana + katakana)
hangul      U+AC00–U+D7AF (syllables)
==========  =====================================

Dominant script = argmax over the counts in the table order above
(first wins ties — deterministic); ``dominant_ratio`` is its share of
all script-classified characters (NULL when the document has none,
e.g. pure digits/punctuation).

Scale shape: nine ``length - length(regexp_replace(...))`` columns —
pure in-row JVM expressions inside one projection, zero shuffles, zero
Python, whole-stage codegen; scan-bound at 100 TB like the rest of the
textstats family. No reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["script_mix", "script_mix_oracle_sql", "SCRIPT_RANGES"]

# (name, character-class body) — order defines the dominance tie-break
SCRIPT_RANGES: list[tuple[str, str]] = [
    ("latin", "A-Za-zÀ-ÿĀ-ſ"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("arabic", "؀-ۿ"),
    ("hebrew", "֐-׿"),
    ("devanagari", "ऀ-ॿ"),
    ("cjk", "一-鿿"),
    ("kana", "぀-ヿ"),
    ("hangul", "가-힯"),
]


def _count(cls: str):
    return (
        F.length(F.col("text"))
        - F.length(F.regexp_replace(F.col("text"), f"[{cls}]", ""))
    ).cast("bigint")


def script_mix(docs: DataFrame) -> DataFrame:
    """Per-document script profile over ``(doc_id, text)``: one count
    column per script, their sum, the dominant script and its ratio."""
    counted = docs.select(
        "doc_id",
        *[_count(cls).alias(name) for name, cls in SCRIPT_RANGES],
    )
    total = None
    for name, _ in SCRIPT_RANGES:
        c = F.col(name)
        total = c if total is None else total + c
    counted = counted.withColumn("n_script_chars", total)
    # argmax in SCRIPT_RANGES order: first script attaining the max wins
    mx = F.greatest(*[F.col(name) for name, _ in SCRIPT_RANGES])
    dom = None
    for name, _ in reversed(SCRIPT_RANGES):
        cond = F.when(F.col(name) == mx, F.lit(name))
        dom = cond.otherwise(dom) if dom is not None else cond
    has = F.col("n_script_chars") > 0
    return counted.select(
        "doc_id",
        *[name for name, _ in SCRIPT_RANGES],
        "n_script_chars",
        F.when(has, dom).alias("dominant_script"),
        F.when(
            has, mx.cast("double") / F.col("n_script_chars").cast("double")
        ).alias("dominant_ratio"),
    )


def script_mix_oracle_sql(table: str = "documents") -> str:
    """DuckDB mirror: same literal ranges, same argmax tie-break."""
    counts = ",\n                 ".join(
        f"length(text) - length(regexp_replace(text, '[{cls}]', '', 'g'))"
        f" AS {name}"
        for name, cls in SCRIPT_RANGES
    )
    total = " + ".join(name for name, _ in SCRIPT_RANGES)
    mx = f"greatest({', '.join(name for name, _ in SCRIPT_RANGES)})"
    dom = "CASE " + " ".join(
        f"WHEN {name} = {mx} THEN '{name}'"
        for name, _ in SCRIPT_RANGES
    ) + " END"
    cols = ", ".join(name for name, _ in SCRIPT_RANGES)
    return f"""
        WITH counted AS (
          SELECT doc_id,
                 {counts}
          FROM {table}
        ),
        tot AS (
          SELECT *, {total} AS n_script_chars FROM counted
        )
        SELECT doc_id, {cols}, CAST(n_script_chars AS BIGINT) AS n_script_chars,
               CASE WHEN n_script_chars > 0 THEN {dom} END
                 AS dominant_script,
               CASE WHEN n_script_chars > 0
                    THEN CAST({mx} AS DOUBLE) / n_script_chars END
                 AS dominant_ratio
        FROM tot
    """


def _line_dominant(line):
    """Dominant-script expression for one line Column (NULL if the line
    has no script-classified characters) — same ranges/tie-break as
    :func:`script_mix`."""
    counts = {
        name: F.length(line) - F.length(F.regexp_replace(line, f"[{cls}]", ""))
        for name, cls in SCRIPT_RANGES
    }
    mx = F.greatest(*counts.values())
    dom = None
    for name, _ in reversed(SCRIPT_RANGES):
        cond = F.when(counts[name] == mx, F.lit(name))
        dom = cond.otherwise(dom) if dom is not None else cond
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return F.when(total > 0, dom)


def line_script_switches(docs: DataFrame) -> DataFrame:
    """Code-switching detection: per-LINE dominant script and the count
    of adjacent-line script changes.

    A document whose lines alternate scripts is either genuinely
    multilingual (parallel text, forums — valuable, route to bitext
    mining) or laundered spam (keyword blocks in a second script) —
    either way it must not flow through the single-language pipeline
    that document-level `script_mix` would route it to. Lines with no
    script-classified characters (separators, digit rows) are
    transparent: they neither carry a script nor break a run.

    Output: doc_id, n_lines (non-blank), n_classified,
    n_switches (adjacent classified-line script changes),
    is_code_switched (n_switches >= 1).

    Scale shape: one in-row expression tree — split, per-line dominant
    via the same literal ranges, adjacent-pair comparison over the
    classified sequence. Zero shuffles, zero Python.
    """
    lines_expr = F.filter(
        F.split(F.col("text"), r"\n"),
        lambda l: F.length(F.trim(l)) > 0,
    )
    # Materialize the classified-dominants array in its own projection
    # BEFORE the adjacent-pair pass: lambda bodies inline referenced
    # expressions, so comparing element_at(doms, i) over the raw
    # filter(transform(...9 regexes...)) expression would re-evaluate
    # the whole per-line classification once per pair — O(n_lines²)
    # regex work on line-heavy docs (the ops/winnow.py lesson).
    staged = docs.select(
        "doc_id",
        F.size(lines_expr).alias("n_lines"),
        F.filter(
            F.transform(lines_expr, _line_dominant),
            lambda d: d.isNotNull(),
        ).alias("doms"),
    )
    doms = F.col("doms")
    n = F.size(doms)
    switches = F.when(
        n >= 2,
        F.size(
            F.filter(
                F.transform(
                    F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
                    lambda i: F.element_at(doms, i)
                    != F.element_at(doms, i - 1),
                ),
                lambda x: x,
            )
        ),
    ).otherwise(F.lit(0))
    return staged.select(
        "doc_id",
        "n_lines",
        n.alias("n_classified"),
        switches.cast("bigint").alias("n_switches"),
        (switches >= 1).alias("is_code_switched"),
    )


def line_script_switches_oracle_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`line_script_switches`."""
    counts = {
        name: f"(length(l) - length(regexp_replace(l, '[{cls}]', '', 'g')))"
        for name, cls in SCRIPT_RANGES
    }
    mx = f"greatest({', '.join(counts.values())})"
    dom = (
        "CASE WHEN ("
        + " + ".join(counts.values())
        + ") > 0 THEN CASE "
        + " ".join(
            f"WHEN {expr} = {mx} THEN '{name}'"
            for name, expr in counts.items()
        )
        + " END END"
    )
    return f"""
        WITH split AS (
          SELECT doc_id,
                 list_filter(string_split(text, chr(10)),
                             l -> length(trim(l)) > 0) AS lines
          FROM {table}
        ),
        clsf AS (
          SELECT doc_id, len(lines) AS n_lines,
                 list_filter(list_transform(lines, l -> {dom}),
                             d -> d IS NOT NULL) AS doms
          FROM split
        )
        SELECT doc_id,
               CAST(n_lines AS BIGINT) AS n_lines,
               CAST(len(doms) AS BIGINT) AS n_classified,
               CAST(CASE WHEN len(doms) >= 2 THEN
                 len(list_filter(list_transform(
                       range(2, len(doms) + 1),
                       i -> list_extract(doms, i)
                            != list_extract(doms, i - 1)),
                     x -> x))
               ELSE 0 END AS BIGINT) AS n_switches,
               (CASE WHEN len(doms) >= 2 THEN
                 len(list_filter(list_transform(
                       range(2, len(doms) + 1),
                       i -> list_extract(doms, i)
                            != list_extract(doms, i - 1)),
                     x -> x))
               ELSE 0 END) >= 1 AS is_code_switched
        FROM clsf
    """
