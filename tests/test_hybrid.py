"""RRF fusion (ops/hybrid): fusion law, one-sided hits, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.hybrid import RRF_C, rrf_fuse


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_fusion_law(spark):
    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    dense = spark.createDataFrame(
        [(2, 0.99), (4, 0.5)], "vec_id long, cosine double"
    )
    got = {
        r["doc_id"]: (r["rrf"], r["lex_rank"], r["dense_rank"])
        for r in rrf_fuse(lex, dense, k=10).collect()
    }
    c = float(RRF_C)
    # doc 2: rank 2 lexical + rank 1 dense
    assert got[2] == (1 / (c + 2) + 1 / (c + 1), 2, 1)
    # one-sided docs still score (the other list contributes 0)
    assert got[1] == (1 / (c + 1), 1, None)
    assert got[4] == (1 / (c + 2), None, 2)
    assert got[3] == (1 / (c + 3), 3, None)
    # both-list doc outranks every one-sided doc here
    top = rrf_fuse(lex, dense, k=1).collect()[0]
    assert top["doc_id"] == 2


def test_tie_break_by_doc_id(spark):
    lex = spark.createDataFrame(
        [(7, 3.0), (5, 3.0)], "doc_id long, score double"
    )
    dense = spark.createDataFrame([], "vec_id long, cosine double")
    rows = rrf_fuse(lex, dense, k=2).collect()
    # equal scores: rank assignment and final order both break ties by id
    assert [r["doc_id"] for r in rows] == [5, 7]
