"""Gopher-style webtext quality signals (docling_spark/ops/webtext.py).

Covers: hand-computed signal values on degenerate docs, first-failing-rule
attribution incl. full reason-code coverage on the synthetic corpus, and
the scale-shape pin (scan -> project, zero exchanges, zero Python).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, SparkSession

from docling_spark.ops.webtext import (
    GOPHER_RULES,
    gopher_filter,
    repetition_signals,
    synth_webtext,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("webtext-test")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def _signals_of(spark, text: str) -> Row:
    df = spark.createDataFrame([(0, text)], "doc_id long, wtext string")
    return repetition_signals(df).collect()[0]


def test_hand_computed_signals(spark):
    # 3 lines, one exact duplicate; one bullet; one ellipsis line
    r = _signals_of(spark, "- alpha beta\ngamma delta...\n- alpha beta")
    assert r.n_lines == 3
    # the bullet marker "-" tokenizes as a word (8 = 6 words + 2 markers)
    assert r.n_words == 8
    assert r.dup_line_frac == round(1 - 2 / 3, 4)
    # duplicate line "- alpha beta" = 12 chars, total line chars = 38
    assert r.dup_line_char_frac == round(12 / 38, 4)
    assert r.bullet_line_frac == round(2 / 3, 4)
    assert r.ellipsis_line_frac == round(1 / 3, 4)
    assert r.symbol_word_ratio == round(1 / 8, 4)
    assert r.alpha_word_frac == 0.75


def test_top_bigram_coverage(spark):
    # "ab cd ab cd ab" -> bigrams: (ab cd)x2, (cd ab)x2; each covers
    # 2 occurrences * 5 non-sep chars... len("ab cd")-1 = 4 chars each,
    # word_chars = 10 -> 2*4/10 = 0.8
    r = _signals_of(spark, "ab cd ab cd ab")
    assert r.top_2gram_char_frac == 0.8
    assert r.mean_word_len == 2.0
    assert r.alpha_word_frac == 1.0


def test_non_alpha_and_word_len(spark):
    r = _signals_of(spark, "123 456 789 word")
    assert r.alpha_word_frac == 0.25
    assert r.mean_word_len == round(13 / 4, 4)


def test_paragraph_and_ngram_signals(spark):
    # 3 paragraphs, the 3rd repeats the 1st; a 5-word phrase repeats
    # across two otherwise-distinct lines of the middle paragraph
    p1 = "the quick brown fox jumps"
    p2 = "one two three four five six\nzz one two three four five yy"
    text = f"{p1}\n\n{p2}\n\n{p1}"
    r = _signals_of(spark, text)
    assert r.n_paras == 3
    assert r.n_lines == 4
    assert r.dup_para_frac == round(1 - 2 / 3, 4)
    # repeated para chars = len(p1); para chars include p2's inner newline
    assert r.dup_para_char_frac == round(len(p1) / (2 * len(p1) + len(p2)), 4)
    # repeated 5-grams: "the quick brown fox jumps" (2x, 21 word-chars)
    # and "one two three four five" (2x, 19 word-chars)
    words = text.replace("\n", " ").split(" ")
    words = [w for w in words if w]
    wc = sum(len(w) for w in words)
    assert r.dup_5gram_char_frac == round((2 * 21 + 2 * 19) / wc, 4)
    assert r.stop_word_hits == 2  # "the" twice


def test_stop_word_hits_counts_occurrences(spark):
    r = _signals_of(spark, "the cat and the dog with a hat")
    assert r.stop_word_hits == 4  # the, and, the, with


def test_first_failing_rule_attribution(spark):
    # bullet-saturated doc: fails bullets AND dup_lines; bullets wins
    df = spark.createDataFrame(
        [(1, "- x y\n- x y\n- x y")], "doc_id long, wtext string"
    )
    out = gopher_filter(repetition_signals(df)).collect()[0]
    assert out.reject_reason == "bullets"
    assert out.keep is False


def test_all_reason_codes_observable(spark):
    """The synthetic corpus law exercises keep + every reject code
    (needs the 500-doc corpus: the rarer classes are ~doc_id % 29/31)."""
    out = gopher_filter(
        repetition_signals(synth_webtext(spark, "/root/testdata/sf0.01"))
    )
    seen = {r.reject_reason for r in out.select("reject_reason").collect()}
    expected = {code for _, _, _, code in GOPHER_RULES} | {"keep"}
    assert seen == expected


def test_plan_scan_project_only(spark):
    """Scale pin: the whole signals+gate stage is in-row JVM — no joins,
    no exchanges, no Python crossings. At 10^12 rows this is
    embarrassingly parallel over the scan."""
    df = gopher_filter(repetition_signals(synth_webtext(spark, SF)))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    for py in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert py not in plan


def test_lexicon_gate_whole_word(spark):
    from docling_spark.ops.webtext import lexicon_gate

    rows = [
        (0, "a clean page about cooking"),
        (1, "win at the casino tonight"),
        (2, "CASINO CASINO casino"),  # case-folded, 3 hits
        (3, "maxxximum effort"),  # substring only: must NOT hit 'xxx'
        (4, "xxx"),  # exact token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lexicon_gate(df).collect()}
    assert got[0]["keep"] and got[0]["lex_hits"] == 0
    assert not got[1]["keep"] and got[1]["lex_hits"] == 1
    assert got[2]["lex_hits"] == 3
    assert got[3]["keep"], "Scunthorpe-style substring must not match"
    assert not got[4]["keep"]
