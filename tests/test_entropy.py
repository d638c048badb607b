"""Entropy signals (ops/entropy): hand-computed values, edge cases,
plan pin, and a hypothesis cross-check vs plain-python Shannon."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_spark.ops.entropy import QUANT, entropy_signals


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


def _ref_entropy(symbols: list[str]) -> float:
    n = len(symbols)
    if n == 0:
        return 0.0
    s = 0.0
    for _, c in sorted(Counter(symbols).items()):
        p = c / n
        s += round(-p * math.log(p) * QUANT) / QUANT
    return s


def _run(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    return {r["doc_id"]: r for r in entropy_signals(df).collect()}


def test_edges(spark):
    got = _run(spark, ["", "aaaa", "ab"])
    assert got[0]["char_entropy"] == 0.0 and got[0]["n_chars"] == 0
    # single symbol: exactly 0.0, not -0.0 (the serialized sign matters
    # for the cross-engine value hash)
    assert got[1]["char_entropy"] == 0.0
    assert math.copysign(1.0, got[1]["char_entropy"]) == 1.0
    assert got[2]["char_entropy"] == pytest.approx(math.log(2), abs=1e-5)


def test_gibberish_separates(spark):
    mash = "aaaaaaaaaaaaaaaaaaaa"
    prose = "the quick brown fox jumps over the lazy dog"
    got = _run(spark, [mash, prose])
    assert got[0]["char_entropy"] < 0.1 < got[1]["char_entropy"]
    assert got[0]["word_entropy"] == 0.0 < got[1]["word_entropy"]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc d", min_size=0, max_size=30),
        min_size=1,
        max_size=5,
    )
)
def test_matches_reference(spark, texts):
    got = _run(spark, texts)
    for d, t in enumerate(texts):
        chars = [c for c in t]
        words = [w for w in t.lower().split() if w]
        assert got[d]["char_entropy"] == pytest.approx(
            _ref_entropy(chars), abs=1e-9
        ), t
        assert got[d]["word_entropy"] == pytest.approx(
            _ref_entropy(words), abs=1e-9
        ), t


def test_plan_zero_exchange_zero_python(spark):
    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    plan = (
        entropy_signals(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan and "MapInPandas" not in plan
