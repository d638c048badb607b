"""Readability battery (ops/readability): hand-computed values, edge
cases, a hypothesis cross-check vs a plain-python reference, and a
zero-shuffle/zero-Python plan pin."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_spark.ops.readability import readability


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


def _ref(text: str) -> dict:
    words = [w for w in re.split(r"\s+", text) if w]
    n_words = len(words)
    n_sentences = max(1, len(re.findall(r"[.!?]+", text)))
    n_letters = len(re.findall(r"[A-Za-z]", text))
    if n_words == 0:
        return {
            "n_words": 0,
            "n_sentences": n_sentences,
            "n_letters": n_letters,
            "n_syllables": None,
            "ari": None,
            "coleman_liau": None,
            "flesch": None,
            "flesch_band": None,
        }
    n_syll = sum(
        max(1, len(re.findall(r"[aeiouy]+", w.lower()))) for w in words
    )
    ari = 4.71 * (n_letters / n_words) + 0.5 * (n_words / n_sentences) - 21.43
    coleman = (
        0.0588 * (n_letters / n_words * 100.0)
        - 0.296 * (n_sentences / n_words * 100.0)
        - 15.8
    )
    flesch = (
        206.835 - 1.015 * (n_words / n_sentences) - 84.6 * (n_syll / n_words)
    )
    for lo, name in [
        (90.0, "very_easy"),
        (80.0, "easy"),
        (70.0, "fairly_easy"),
        (60.0, "standard"),
        (50.0, "fairly_hard"),
        (30.0, "hard"),
    ]:
        if flesch >= lo:
            band = name
            break
    else:
        band = "very_hard"
    return {
        "n_words": n_words,
        "n_sentences": n_sentences,
        "n_letters": n_letters,
        "n_syllables": n_syll,
        "ari": ari,
        "coleman_liau": coleman,
        "flesch": flesch,
        "flesch_band": band,
    }


def _run(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in readability(df).collect()}


def _check(got: dict, text: str) -> None:
    exp = _ref(text)
    for k in ("n_words", "n_sentences", "n_letters", "n_syllables",
              "flesch_band"):
        assert got[k] == exp[k], (k, text)
    for k in ("ari", "coleman_liau", "flesch"):
        if exp[k] is None:
            assert got[k] is None, (k, text)
        else:
            assert got[k] == pytest.approx(exp[k], abs=1e-12), (k, text)


def test_hand_computed(spark):
    texts = [
        # The canonical easy sentence: short words, one sentence.
        "The cat sat on the mat.",
        # Multi-sentence with mixed terminals and a run "?!".
        "Is this hard?! No. It is not hard at all. Truly!",
        # Digits and symbols: letters-only count diverges from length.
        "Call 555-0100 now! Offer #1 ends 2026-12-31.",
        # No terminal punctuation at all -> one sentence.
        "a stream of words with no sentence boundary markers",
        # Consonant-only tokens still cost one syllable each.
        "hmm pfft tsk",
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        _check(got[i], t)
    # the easy sentence lands in a high band, dense jargon lands low
    assert got[0]["flesch_band"] in ("very_easy", "easy")


def test_empty_and_whitespace(spark):
    got = _run(spark, ["", "   \t\n  ", "."])
    for i in range(2):
        assert got[i]["n_words"] == 0
        assert got[i]["n_syllables"] is None
        assert got[i]["ari"] is None
        assert got[i]["coleman_liau"] is None
        assert got[i]["flesch"] is None
        assert got[i]["flesch_band"] is None
    # "." is one (vowel-less) word, one sentence run, one floor syllable
    assert got[2]["n_words"] == 1
    assert got[2]["n_sentences"] == 1
    assert got[2]["n_letters"] == 0
    assert got[2]["n_syllables"] == 1
    _check(got[2], ".")


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyzAEIOUY .!?0123456789-,",
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_matches_python_reference(spark_global, texts):
    got = _run(spark_global, texts)
    for i, t in enumerate(texts):
        _check(got[i], t)


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_plan_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame([(1, "One sentence.")], "doc_id long, text string")
    plan = readability(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF crossing: pure JVM expressions


def test_size_histogram_buckets(spark):
    from docling_spark.ops.textstats import size_histogram

    rows = [(0, 0), (1, 1), (2, 1), (3, 7), (4, 8), (5, 1023), (6, 1024)]
    df = spark.createDataFrame(
        [(i, "x" * n if n else "") for i, n in rows],
        "doc_id long, text string",
    ).selectExpr("doc_id", "length(text) AS n_chars")
    got = {r["bucket"]: r for r in size_histogram(df).collect()}
    assert got[0]["n_docs"] == 1 and got[0]["lo_chars"] == 0
    assert got[1]["n_docs"] == 2  # n=1 twice
    assert got[1]["lo_chars"] == 1 and got[1]["hi_chars"] == 1
    assert got[3]["n_docs"] == 1  # n=7 -> bucket 3 (4..7)
    assert got[3]["lo_chars"] == 4 and got[3]["hi_chars"] == 7
    assert got[4]["n_docs"] == 1 and got[4]["lo_chars"] == 8
    # power-of-two boundary: 1023 -> bucket 10, 1024 -> bucket 11
    assert got[10]["n_docs"] == 1 and got[10]["hi_chars"] == 1023
    assert got[11]["n_docs"] == 1 and got[11]["lo_chars"] == 1024
    assert sum(r["n_docs"] for r in got.values()) == 7
