"""Property tests for the round-5 retrieval/dedup ops: BM25 against an
independent reference on random corpora; paragraph-dedup idempotence
and conservation laws. One shared Spark session, hypothesis-driven."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_spark.ops.bm25 import B, K1, QUANT, bm25_scores
from docling_spark.ops.paradedup import paragraph_dedup

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _ref_bm25(texts: list[str], terms: list[str]) -> dict[int, float]:
    toks = {d: t.split() for d, t in enumerate(texts)}
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


@settings(max_examples=15, deadline=None)
@given(doc_strategy, st.lists(st.sampled_from(WORDS), min_size=1, max_size=3, unique=True))
def test_bm25_matches_reference(spark, texts, terms):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(df, terms, k=len(texts)).collect()
    }
    want = _ref_bm25(texts, terms)
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-9), (d, texts, terms)


para_corpus = st.lists(
    st.lists(
        st.sampled_from(["block one", "block two", "block three", "unique x"]),
        min_size=1,
        max_size=4,
    ).map("\n\n".join),
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(para_corpus)
def test_para_dedup_laws(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, wtext string"
    )
    out = {
        r["doc_id"]: r for r in paragraph_dedup(df).collect()
    }
    # conservation: kept <= total per doc; corpus-wide each distinct
    # paragraph survives exactly once
    all_kept = []
    for d, text in enumerate(texts):
        r = out[d]
        assert r["n_kept"] <= r["n_paras"]
        if r["clean_text"]:
            all_kept.extend(r["clean_text"].split("\n\n"))
    assert len(all_kept) == len(set(all_kept))
    assert set(all_kept) == {
        p for t in texts for p in t.split("\n\n")
    }
    # idempotence: dedup of the rebuilt corpus is a fixpoint
    df2 = spark.createDataFrame(
        [(d, out[d]["clean_text"]) for d in out if out[d]["clean_text"]],
        "doc_id long, wtext string",
    )
    if df2.count():
        again = {r["doc_id"]: r for r in paragraph_dedup(df2).collect()}
        for d, r in again.items():
            assert r["clean_text"] == out[d]["clean_text"]
            assert r["n_kept"] == r["n_paras"]
