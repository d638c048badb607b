"""BM25 retrieval (ops/bm25): hand-computed scores, ranking laws,
partitioning determinism, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.bm25 import B, K1, QUANT, bm25_scores

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
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_bm25(texts: dict[int, str], terms: list[str]) -> dict[int, float]:
    toks = {d: t.lower().split() for d, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, tv in toks.items():
        s = 0.0
        for w in terms:
            tf = tv.count(w)
            df = sum(1 for v in toks.values() if w in v)
            idf = round(math.log((n - df + 0.5) / (df + 0.5) + 1) * QUANT) / QUANT
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(tv) / avgdl))
        if s > 0:
            out[d] = s
    return out


def test_hand_computed_scores(spark):
    texts = {
        1: "apple banana apple",
        2: "banana cherry cherry date",
        3: "date date date",
    }
    df = _corpus(spark, list(texts.items()))
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(df, ["apple", "cherry"], k=10).collect()
    }
    want = _ref_bm25(texts, ["apple", "cherry"])
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-12), d


def test_more_matches_rank_higher(spark):
    # same length docs: the one matching both terms must outrank
    df = _corpus(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha omega gamma delta"),
            (3, "omega omega gamma delta"),
        ],
    )
    rows = bm25_scores(df, ["alpha", "beta"], k=10).collect()
    order = [r["doc_id"] for r in rows]
    assert order[0] == 1 and set(order) == {1, 2}
    assert rows[0]["matched"] == 2 and rows[1]["matched"] == 1


def test_partitioning_invariance(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = bm25_scores(docs, ["spark", "window"], k=50).collect()
    b = bm25_scores(docs.repartition(13), ["spark", "window"], k=50).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_plan_no_corpus_shuffle_topk_heap(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        bm25_scores(docs, ["spark"], k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # top-k is a per-partition heap + driver merge, not a global sort
    assert "TakeOrderedAndProject" in plan
    # the only shuffle is the SinglePartition one feeding the scalar
    # stats aggregation (the broadcast back is a BroadcastExchange);
    # the scored corpus itself is never exchanged
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1 and "Exchange SinglePartition" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
