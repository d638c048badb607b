"""Web-text normalization: mojibake repair, control-character and
zero-width hygiene, whitespace canonicalization.

Every large crawl contains double-encoded UTF-8 ("mojibake": UTF-8
bytes decoded as Latin-1/cp1252 and re-encoded — 'Ã©' where 'é' was
meant), stray C0 control characters, zero-width code points, and
whitespace noise. This is the deterministic core of what ftfy
(Speer, "fixing Unicode text") repairs, restricted to the fixed
high-frequency table below so the law is engine-independent and
value-checkable.

Normalization law, in order:
1. mojibake: apply the replacement table sequentially (longest
   sequences first so shared prefixes cannot mis-fire);
   ``n_mojibake`` counts the occurrences actually replaced at each
   step (computed from the length delta before/after each step);
2. newlines: CRLF then bare CR fold to LF;
3. controls: count then strip C0 controls except TAB/LF, DEL, and the
   zero-width set U+200B..U+200D, U+FEFF (``n_controls``); NBSP
   becomes a plain space (not counted — it is whitespace, not noise);
4. whitespace: runs of space/tab collapse to one space, spaces/tabs
   around a newline drop, 3+ newlines fold to exactly 2 (one blank
   line), leading/trailing whitespace trims.

Scale shape: one projection — chained JVM ``replace``/
``regexp_replace`` expressions over the text column, zero shuffles,
zero joins, zero Python (the same in-row shape as ops/pii.py). The
regex escapes use the \\x{...} form, which Java regex and RE2 (DuckDB)
both accept, so the Spark plan and the DuckDB oracle interpret the
SAME pattern strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (broken, fixed) — cp1252-mojibake sequences, longest first.
MOJIBAKE = [
    ("â€™", "’"),  # â€™ -> ’
    ("â€œ", "“"),  # â€œ -> “
    ("â€“", "–"),  # â€“ -> –
    ("â€”", "—"),  # â€” -> —
    ("â€¦", "…"),  # â€¦ -> …
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Â«", "«"),  # Â« -> «
    ("Â»", "»"),  # Â» -> »
    ("Â°", "°"),  # Â° -> °
]

# C0 minus TAB/LF, plus DEL and the zero-width set; the \x{...} escape
# form parses identically under Java regex and RE2.
CTRL_RE = (
    "[\\x{00}-\\x{08}\\x{0b}\\x{0c}\\x{0e}-\\x{1f}\\x{7f}"
    "\\x{200b}-\\x{200d}\\x{feff}]"
)
_NBSP = " "


def normalize_text(df: DataFrame, col: str = "wtext") -> DataFrame:
    """-> (doc_id, n_mojibake, n_controls, clean_text). One in-row
    projection; see module docstring for the exact law."""
    s: Column = F.col(col)
    n_moj: Column = F.lit(0).cast("long")
    for broken, fixed in MOJIBAKE:
        replaced = F.replace(s, F.lit(broken), F.lit(fixed))
        # occurrences = length delta / (len(broken) - len(fixed));
        # every table entry strictly shrinks, so the divisor is > 0
        n_moj = n_moj + (
            (F.length(s) - F.length(replaced)) / (len(broken) - len(fixed))
        ).cast("long")
        s = replaced
    s = F.replace(s, F.lit("\r\n"), F.lit("\n"))
    s = F.replace(s, F.lit("\r"), F.lit("\n"))
    stripped = F.regexp_replace(s, CTRL_RE, "")
    n_ctl = (F.length(s) - F.length(stripped)).cast("long")
    s = F.replace(stripped, F.lit(_NBSP), F.lit(" "))
    s = F.regexp_replace(s, "[ \t]+", " ")
    s = F.regexp_replace(s, "[ \t]*\n[ \t]*", "\n")
    s = F.regexp_replace(s, "\n{3,}", "\n\n")
    # F.trim strips only spaces — the law trims all edge whitespace
    s = F.regexp_replace(s, "^[ \t\n]+|[ \t\n]+$", "")
    return df.select(
        "doc_id",
        n_moj.alias("n_mojibake"),
        n_ctl.alias("n_controls"),
        s.alias("clean_text"),
    )


# ------------------------------------------------------------ synth corpus
def synth_dirty_text(spark, sf_dir: str) -> DataFrame:
    """Deterministic dirty corpus over documents: %4==0 docs get
    mojibake ('e' -> 'Ã©'), %4==1 get NBSP-for-space, %4==2 get a BEL
    after every 'a' and CRLF line breaks, %4==3 get 4-newline runs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d, t = F.col("doc_id"), F.col("text")
    wtext = (
        F.when(d % 4 == 0, F.replace(t, F.lit("e"), F.lit("Ã©")))
        .when(d % 4 == 1, F.replace(t, F.lit(" "), F.lit(_NBSP)))
        .when(
            d % 4 == 2,
            F.replace(
                F.replace(t, F.lit("a"), F.lit("a\x07")),
                F.lit(" "),
                F.lit("\r\n"),
            ),
        )
        .otherwise(F.replace(t, F.lit("table"), F.lit("table\n\n\n\n")))
    )
    return docs.select("doc_id", wtext.alias("wtext"))


DIRTY_CTE_SQL = """wt AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
                THEN replace(text, 'e', chr(195) || chr(169))
              WHEN doc_id % 4 = 1 THEN replace(text, ' ', chr(160))
              WHEN doc_id % 4 = 2
                THEN replace(replace(text, 'a', 'a' || chr(7)),
                             ' ', chr(13) || chr(10))
              ELSE replace(text, 'table', 'table' || repeat(chr(10), 4))
         END AS wtext
  FROM documents)"""


# ------------------------------------------------------------------ oracle
def normalize_oracle_sql(corpus_cte: str) -> str:
    """DuckDB mirror of :func:`normalize_text` over a `wt AS (...)`
    CTE exposing (doc_id, wtext)."""
    steps = []
    s = "wtext"
    moj_terms = []
    for i, (broken, fixed) in enumerate(MOJIBAKE):
        b = "".join(f"chr({ord(c)})" for c in broken).replace(")chr", ") || chr")
        f_ = "".join(f"chr({ord(c)})" for c in fixed).replace(")chr", ") || chr")
        prev, cur = f"s{i}", f"s{i + 1}"
        src = s if i == 0 else prev
        steps.append(f"{cur} AS (SELECT doc_id, replace({src}, {b}, {f_}) AS {cur}, "
                     f"(length({src}) - length(replace({src}, {b}, {f_})))"
                     f" // {len(broken) - len(fixed)} AS m{i}"
                     + (", " + ", ".join(f"m{j}" for j in range(i)) if i else "")
                     + f" FROM {'wt' if i == 0 else prev})")
        moj_terms.append(f"m{i}")
        s = cur
    n = len(MOJIBAKE)
    last = f"s{n}"
    body = f""",
nl AS (SELECT doc_id, replace(replace({last}, chr(13) || chr(10), chr(10)),
                              chr(13), chr(10)) AS t,
              {" + ".join(moj_terms)} AS n_mojibake
       FROM {last}),
ct AS (SELECT doc_id, n_mojibake,
              length(t) - length(regexp_replace(t, '{CTRL_RE}', '', 'g'))
                  AS n_controls,
              regexp_replace(t, '{CTRL_RE}', '', 'g') AS t
       FROM nl)
SELECT doc_id, CAST(n_mojibake AS BIGINT) AS n_mojibake,
       CAST(n_controls AS BIGINT) AS n_controls,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                replace(t, chr(160), ' '),
                '[ \t]+', ' ', 'g'),
                '[ \t]*\n[ \t]*', chr(10), 'g'),
                chr(10) || '{{3,}}', chr(10) || chr(10), 'g'),
                '^[ \t\n]+|[ \t\n]+$', '', 'g') AS clean_text
FROM ct"""
    return "WITH " + corpus_cte + ",\n" + ",\n".join(steps) + body
