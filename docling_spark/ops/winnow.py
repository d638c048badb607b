"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003).

The MOSS local-fingerprinting algorithm — the third member of the
near-dup family next to MinHash (global sketch, ``ops/dedup.py``) and
ExactSubstr (suffix-style exact runs, ``ops/substrdedup.py``):
winnowing selects the MINIMUM k-gram hash inside every sliding window
of ``w`` consecutive grams, which guarantees that any shared substring
of length ≥ ``w + k - 1`` contributes at least one IDENTICAL selected
fingerprint in both documents (the algorithm's coverage theorem).
That local guarantee is what MinHash lacks (it sketches whole-set
similarity, not shared passages) and what makes winnowing the
standard plagiarism/passage-borrowing detector.

Law (engine-exact):

- k-gram hash = the md5-Horner bigint over the first 8 hex nibbles —
  the same portable hash family as ``ops/sampling.hash_frac``, without
  the division;
- per window ``j``: ``min`` of the hashes in ``[j, j+w)`` (value
  selection only — the classic rightmost-position refinement changes
  which POSITION is reported, never which values; the value set below
  is exactly the paper's fingerprint set);
- a document's fingerprints = the DISTINCT selected values;
- documents shorter than one gram/window degrade gracefully (one
  truncated gram / one window).

``winnow_pairs`` then runs the standard inverted-index join on the
fingerprint table with the same document-frequency cap as
``dedup.jaccard_pairs`` — shared-fingerprint counts are the passage-
overlap candidates an edit-distance or ExactSubstr verifier confirms.

Scale shape: fingerprint selection is pure in-row array work (zero
shuffles, zero Python; O(n·w) per doc with JVM codegen); the pair
stage is the capped equi-join shape every other dedup verifier here
uses. No reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "winnow_fingerprints",
    "winnow_pairs",
    "winnow_fingerprints_oracle_sql",
    "winnow_pairs_oracle_sql",
]

_HEX = "0123456789abcdef"


def _md5int(col: Column) -> Column:
    """Horner over the first 8 hex nibbles of md5(col) → bigint
    (the ops/sampling.hash_frac idiom without the division)."""
    h = F.md5(col)
    val = F.lit(0).cast("long")
    for i in range(8):
        nib = F.instr(F.lit(_HEX), F.substring(h, i + 1, 1)) - 1
        val = val * 16 + nib.cast("long")
    return val


def _md5int_sql(expr: str) -> str:
    out = "0"
    for i in range(1, 9):
        nib = f"(strpos('{_HEX}', substring(md5({expr}), {i}, 1)) - 1)"
        out = f"({out} * 16 + {nib})"
    return out


def winnow_fingerprints(
    docs: DataFrame, k: int = 5, w: int = 4
) -> DataFrame:
    """(doc_id, fp): the distinct winnowing fingerprints of ``text``.

    The hash array is MATERIALIZED in its own projection before the
    window pass: lambda bodies inline the expressions they reference,
    so computing windows directly over the ``transform(... md5 ...)``
    expression would re-evaluate the entire O(n·md5) array once PER
    WINDOW — O(n²) md5 calls per document (measured: ~9 min for a
    500-doc check vs seconds with the split; the job.py dispatch-probe
    lesson at array scale).
    """
    n_grams = F.greatest(F.length("text") - (k - 1), F.lit(1))
    hashes_expr = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: _md5int(F.substr(F.col("text"), i, F.lit(k))),
    )
    hashed = docs.select("doc_id", hashes_expr.alias("hashes"))
    h = F.col("hashes")
    n = F.size(h)
    n_win = F.greatest(n - (w - 1), F.lit(1))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda j: F.array_min(
                F.slice(h, j, F.least(F.lit(w), n - j + 1))
            ),
        )
    )
    return hashed.select("doc_id", F.explode(fps).alias("fp"))


def winnow_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Passage-overlap candidates: pairs sharing >= ``min_shared``
    fingerprints, via the capped inverted-index join. Output:
    (doc_a, doc_b, shared_fps)."""
    fp = winnow_fingerprints(docs, k=k, w=w)
    hot = (
        fp.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("fp")
    )
    fp = fp.join(F.broadcast(hot), "fp", "left_anti")
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def _fps_cte_sql(docs_cte: str, k: int, w: int) -> str:
    return f"""
        docs AS ({docs_cte}),
        grams AS (
          SELECT doc_id,
                 list_transform(
                   range(1, greatest(length(text) - {k - 1}, 1) + 1),
                   i -> {_md5int_sql(f"substring(text, i, {k})")}
                 ) AS hashes
          FROM docs
        ),
        fps AS (
          SELECT DISTINCT doc_id, fp
          FROM (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                     range(1, greatest(len(hashes) - {w - 1}, 1) + 1),
                     j -> list_min(list_slice(hashes, j,
                                              least(j + {w - 1},
                                                    len(hashes))))
                   ))) AS fp
            FROM grams
          )
        )"""


def winnow_fingerprints_oracle_sql(
    docs_cte: str, k: int = 5, w: int = 4
) -> str:
    """DuckDB mirror of :func:`winnow_fingerprints`."""
    return f"""
        WITH {_fps_cte_sql(docs_cte, k, w)}
        SELECT doc_id, CAST(fp AS BIGINT) AS fp FROM fps
    """


def winnow_pairs_oracle_sql(
    docs_cte: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_doc_freq: int = 1000,
) -> str:
    """DuckDB mirror of :func:`winnow_pairs`."""
    return f"""
        WITH {_fps_cte_sql(docs_cte, k, w)},
        hot AS (
          SELECT fp FROM fps GROUP BY fp HAVING count(*) > {max_doc_freq}
        ),
        kept AS (SELECT * FROM fps WHERE fp NOT IN (SELECT fp FROM hot))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS shared_fps
        FROM kept a JOIN kept b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= {min_shared}
    """
