"""Paragraph-level global dedup (ops/paradedup): keep-first law,
rebuild, normalization, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.paradedup import paragraph_dedup, synth_para_corpus

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, wtext string")


def test_global_first_occurrence_kept(spark):
    df = _corpus(
        spark,
        [
            (1, "unique one\n\nshared banner\n\nunique two"),
            (2, "shared banner\n\nother text here"),
            (3, "shared banner"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
        for r in paragraph_dedup(df).collect()
    }
    # doc 1 owns the first occurrence (lowest doc_id)
    assert got[1] == (3, 3, "unique one\n\nshared banner\n\nunique two")
    assert got[2] == (2, 1, "other text here")
    assert got[3] == (1, 0, "")


def test_normalized_identity(spark):
    # case + edge whitespace insensitive: a reflowed copy collapses
    df = _corpus(
        spark, [(1, "Cookie Notice Text"), (2, "  cookie notice text ")]
    )
    got = {r["doc_id"]: r["n_kept"] for r in paragraph_dedup(df).collect()}
    assert got == {1: 1, 2: 0}


def test_in_doc_duplicates_also_collapse(spark):
    df = _corpus(spark, [(5, "same block\n\nsame block\n\nsame block")])
    row = paragraph_dedup(df).collect()[0]
    assert (row["n_paras"], row["n_kept"], row["clean_text"]) == (
        3,
        1,
        "same block",
    )


def test_pooled_corpus_law(spark):
    """Independent python derivation of the pooled law at sf0.001."""
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"])
        for r in paragraph_dedup(synth_para_corpus(spark, SF)).collect()
    }
    seen: set[int] = set()
    for d in range(n):
        kept = 0
        for j in range(2 + d % 4):
            k = (d * 13 + j * 17) % 97
            if k not in seen:
                seen.add(k)
                kept += 1
        assert got[d] == (2 + d % 4, kept), d


def test_plan_single_hash_exchange_no_python(spark):
    plan = (
        paragraph_dedup(synth_para_corpus(spark, SF))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
