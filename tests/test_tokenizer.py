"""Pluggable tokenizer seam for chunk packing (ops/chunker.token_count_col)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_spark.ops.chunker import BPE_LITE_PATTERN, token_count_col

CASES = [
    ("alpha beta gamma", 3, 3),
    # pre-tokens: "alpha" "," " it" "'s" " #" "4" → 6
    ("alpha, it's #4", 6, 3),
    # bpe: "hello" + "   " (\s+ run, no lookahead in RE2) + "world" → 3;
    # ws split: ['hello','','','world'] → 4
    ("hello   world", 3, 4),
    # "3" "." "14" " costs" " $" "2" → 6
    ("3.14 costs $2", 6, 3),
    ("", 0, 1),  # split("") -> [''], regexp finds nothing
]


@pytest.fixture(scope="module")
def spark():
    yield (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )


def _spark_counts(spark, tokenizer):
    df = spark.createDataFrame(
        [(t,) for t, _, _ in CASES], schema="chunk_text string"
    )
    out = df.select(
        "chunk_text",
        token_count_col(F.col("chunk_text"), tokenizer).alias("n"),
    )
    return {r.chunk_text: r.n for r in out.collect()}


def test_bpe_lite_exact_counts(spark):
    got = _spark_counts(spark, "bpe_lite")
    for text, bpe, _ws in CASES:
        assert got[text] == bpe, (text, got[text])


def test_whitespace_exact_counts(spark):
    got = _spark_counts(spark, "whitespace")
    for text, _bpe, ws in CASES:
        assert got[text] == ws, (text, got[text])


def test_bpe_pattern_agrees_with_duckdb_re2(spark):
    """The SAME pattern string must count identically under Java regex
    (Spark) and RE2 (DuckDB) — that equivalence is what lets the value
    oracle recompute pack boundaries independently."""
    con = duckdb.connect()
    sql_pat = BPE_LITE_PATTERN.replace("'", "''")
    spark_counts = _spark_counts(spark, "bpe_lite")
    for text, _bpe, _ws in CASES:
        (n,) = con.execute(
            f"SELECT len(regexp_extract_all(?, '{sql_pat}'))", [text]
        ).fetchone()
        assert n == spark_counts[text], text


def test_unknown_tokenizer_rejected():
    with pytest.raises(ValueError):
        token_count_col(F.col("x"), "sentencepiece")
