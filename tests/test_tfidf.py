"""TF-IDF keyword extraction (ops/tfidf): law, stop-word gate, plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.tfidf import QUANT, tfidf_top_terms


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
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed(spark):
    df = _corpus(
        spark,
        [
            (1, "cat cat dog"),
            (2, "dog fish"),
            (3, "fish fish bird"),
            (4, "bird cat"),
        ],
    )
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["score"], r["rank"])
        for r in tfidf_top_terms(df, k=2, max_df_frac=1.0).collect()
    }
    idf2 = round(math.log(4 / 2) * QUANT) / QUANT  # every term has df=2
    # doc 1: cat tf=2 outranks dog tf=1
    assert got[(1, "cat")] == (2, 2 * idf2, 1)
    assert got[(1, "dog")] == (1, idf2, 2)
    # doc 2 tie (both tf=1): term ascending breaks it
    assert got[(2, "dog")][2] == 1 and got[(2, "fish")][2] == 2


def test_stopword_gate(spark):
    # 'the' in every doc -> pruned at max_df_frac=0.5
    df = _corpus(
        spark,
        [(1, "the alpha"), (2, "the beta"), (3, "the alpha beta")],
    )
    terms = {
        r["term"] for r in tfidf_top_terms(df, k=5, max_df_frac=0.9).collect()
    }
    assert "the" not in terms and {"alpha", "beta"} <= terms


def test_k_bound_and_plan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = tfidf_top_terms(docs, k=3, max_df_frac=0.9)
    from pyspark.sql import functions as F

    per_doc = out.groupBy("doc_id").count().agg(F.max("count")).collect()
    assert per_doc[0][0] <= 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
