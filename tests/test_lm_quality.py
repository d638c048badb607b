"""CCNet-style unigram-LM quality scoring tests: ops/lm_quality.py."""

import math

import pytest
from pyspark.sql import functions as F

from docling_spark.ops import lm_quality as lmq


@pytest.fixture(scope="module")
def spark():
    from docling_spark.job import tuned_session

    s = tuned_session(master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_train_counts_and_quantization(spark):
    ref = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c")], "doc_id long, text string"
    )
    lm = {r["token"]: r["nll"] for r in lmq.train_unigram_lm(ref).collect()}
    # counts: a=4, b=2, c=1, total=7
    assert lm["a"] == round(math.log(7 / 4) * 1024) / 1024
    assert lm["b"] == round(math.log(7 / 2) * 1024) / 1024
    assert lm["c"] == round(math.log(7 / 1) * 1024) / 1024
    # quantized to dyadic 1/1024
    for v in lm.values():
        assert v * 1024 == int(v * 1024)


def test_score_oov_penalty_and_buckets(spark):
    ref = spark.createDataFrame([(1, "a a a a b b c d")], "doc_id long, text string")
    lm = lmq.train_unigram_lm(ref)
    docs = spark.createDataFrame(
        [
            (10, "a a a a"),          # all high-prob -> low nll
            (11, "zz qq xx yy"),      # all OOV -> avg = 16.0 -> tail
            (12, "a zz"),             # mixed
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lmq.lm_score(docs, lm, head=2.0, tail=9.0).collect()}
    nll_a = round(math.log(8 / 4) * 1024) / 1024
    assert out[10]["avg_nll"] == pytest.approx(nll_a)
    assert out[10]["bucket"] == "head"
    assert out[11]["avg_nll"] == 16.0
    assert out[11]["bucket"] == "tail"
    assert out[12]["avg_nll"] == pytest.approx((nll_a + 16.0) / 2)
    assert out[12]["bucket"] == "middle"
    assert out[10]["n_tokens"] == 4


def test_case_fold_and_whitespace_runs(spark):
    ref = spark.createDataFrame([(1, "The  the\tTHE")], "doc_id long, text string")
    lm = lmq.train_unigram_lm(ref).collect()
    assert len(lm) == 1 and lm[0]["token"] == "the" and lm[0]["nll"] == 0.0


def test_plan_broadcast_only_scoring_join(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i % 7} and some text") for i in range(50)],
        "doc_id long, text string",
    )
    out = lmq.lm_score(docs, lmq.train_unigram_lm(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_stupid_backoff_laws(spark):
    """Hand-checkable stupid-backoff: seen bigram beats backed-off
    unseen one; first token scores by unigram alone; OOV worst."""
    import math

    from docling_spark.ops.lm_quality import (
        BACKOFF_NLL,
        QUANT,
        bigram_score,
        train_bigram_lm,
        train_unigram_lm,
    )

    ref = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id long, text string"
    )
    uni = train_unigram_lm(ref)
    bi = train_bigram_lm(ref)
    # bigram table: c(a ·)=3 -> a b:2 (nll ln(3/2)), a c:1 (ln 3); b a:2 (ln 1)
    got_bi = {(r["prev"], r["cur"]): r["nll2"] for r in bi.collect()}
    q = lambda x: round(math.log(x) * QUANT) / QUANT
    assert got_bi[("a", "b")] == q(3 / 2)
    assert got_bi[("b", "a")] == q(1.0)
    assert got_bi[("a", "c")] == q(3.0)

    docs = spark.createDataFrame(
        [(10, "a b"), (11, "a a"), (12, "zz")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_score(docs, bi, uni).collect()}
    uni_nll = {r["token"]: r["nll"] for r in uni.collect()}
    # doc 10: first 'a' unigram, then seen bigram (a,b)
    assert out[10]["avg_nll"] == pytest.approx(
        (uni_nll["a"] + q(3 / 2)) / 2, abs=1e-12
    )
    # doc 11: (a,a) unseen -> backoff + unigram(a)
    assert out[11]["avg_nll"] == pytest.approx(
        (uni_nll["a"] + BACKOFF_NLL + uni_nll["a"]) / 2, abs=1e-12
    )
    # doc 12: single OOV token -> 16.0
    assert out[12]["avg_nll"] == 16.0
