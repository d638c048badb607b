"""C4-style cleaning (docling_spark/ops/c4.py): hand-computed line/page
filter cases, span dedup semantics, and the scale-shape plan pins."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_spark.ops.c4 import c4_clean, c4_remove_dup_spans, c4_span_dedup
from docling_spark.ops.webtext import synth_webtext

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("c4-test")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def _clean_of(spark, text: str):
    df = spark.createDataFrame([(0, text)], "doc_id long, wtext string")
    return c4_clean(df).collect()[0]


def test_line_filters(spark):
    text = (
        "one two three four five six.\n"  # kept
        "too short line.\n"  # < 5 words
        "no terminal punctuation here at all\n"  # no . ! ? "
        "click here to enable javascript on this page.\n"  # javascript
        'he said "hello there my good friend"\n'  # ends in quote: kept
        "does this line have enough words? yes!"  # kept
    )
    r = _clean_of(spark, text)
    assert r.n_lines == 6
    assert r.n_kept == 3
    assert r.clean_text.splitlines() == [
        "one two three four five six.",
        'he said "hello there my good friend"',
        "does this line have enough words? yes!",
    ]
    # sentences in kept text: "six." + "?" run + "!" run + quote line has
    # none (no terminal mark run after stripping? the quote itself is not
    # [.!?]) -> runs: '.', '?', '!' = 3
    assert r.n_sentences == 3
    assert r.keep is True
    assert r.reason == "ok"


def test_page_gates(spark):
    base = "one two three four five six.\nseven eight nine ten eleven twelve.\nthirteen fourteen fifteen sixteen seventeen."
    assert _clean_of(spark, base).keep is True
    r = _clean_of(spark, base + "\nthis page contains Lorem Ipsum filler.")
    assert (r.keep, r.reason) == (False, "lorem_ipsum")
    r = _clean_of(spark, base + "\nfunction f() { return 1; }")
    assert (r.keep, r.reason) == (False, "brace")
    r = _clean_of(spark, "one two three four five six.")
    assert (r.keep, r.reason) == (False, "too_few_sentences")
    # the brace gate checks the ORIGINAL text even when its line is dropped
    r = _clean_of(spark, base + "\n{")
    assert (r.keep, r.reason) == (False, "brace")


def test_span_dedup_semantics(spark):
    # doc 0: sentences a b c d -> spans (a b c), (b c d)
    # doc 1: sentences a b c   -> span (a b c) = duplicate of doc 0 span 0
    # normalization: lower + trim
    d0 = "Alpha one. beta two. gamma three. delta four."
    d1 = "alpha one.  BETA two. gamma three."
    df = spark.createDataFrame(
        [(0, d0), (1, d1)], "doc_id long, wtext string"
    )
    rows = {(r.doc_id, r.span_idx): r for r in c4_span_dedup(df).collect()}
    assert len(rows) == 3
    assert rows[(0, 0)].is_dup is False
    assert rows[(0, 1)].is_dup is False
    assert rows[(1, 0)].is_dup is True
    assert rows[(0, 0)].span_hash == rows[(1, 0)].span_hash


def test_short_doc_has_no_spans(spark):
    df = spark.createDataFrame(
        [(0, "only one. two sentences.")], "doc_id long, wtext string"
    )
    assert c4_span_dedup(df).count() == 0


def test_span_removal_semantics(spark):
    # doc 0: a b c d (4 sentences, spans abc bcd)
    # doc 1: a b c e -> its span (a b c) duplicates doc 0 span 0, so
    #         sentences 0..2 are removed; e survives
    # doc 2: x y z   -> unique span, untouched
    d0 = "Aa one. Bb two. Cc three. Dd four."
    d1 = "aa one. bb two. cc three. Ee five."
    d2 = "Xx six. Yy seven. Zz eight."
    df = spark.createDataFrame(
        [(0, d0), (1, d1), (2, d2)], "doc_id long, wtext string"
    )
    rows = {r.doc_id: r for r in c4_remove_dup_spans(df).collect()}
    assert (rows[0].n_sents, rows[0].n_kept) == (4, 4)
    assert rows[0].clean_text == "aa one. bb two. cc three. dd four."
    assert (rows[1].n_sents, rows[1].n_kept) == (4, 1)
    assert rows[1].clean_text == "ee five."
    assert (rows[2].n_sents, rows[2].n_kept) == (3, 3)


def test_span_removal_within_doc(spark):
    # the same 3 sentences repeat inside ONE doc: the second occurrence
    # (positions 3..5) is removed; overlap spans (1..3, 2..4) are unique
    d = "a one. b two. c three. a one. b two. c three."
    df = spark.createDataFrame([(0, d)], "doc_id long, wtext string")
    r = c4_remove_dup_spans(df).collect()[0]
    assert (r.n_sents, r.n_kept) == (6, 3)
    assert r.clean_text == "a one. b two. c three."


def test_span_removal_empty_doc_result(spark):
    # two identical docs of exactly 3 sentences: the later doc empties
    d = "a one. b two. c three."
    df = spark.createDataFrame(
        [(0, d), (1, d)], "doc_id long, wtext string"
    )
    rows = {r.doc_id: r for r in c4_remove_dup_spans(df).collect()}
    assert rows[0].n_kept == 3
    assert (rows[1].n_kept, rows[1].clean_text) == (0, "")


def test_plan_shapes(spark):
    """c4_clean is scan -> project (zero exchanges, zero Python);
    c4_span_dedup is exactly ONE hash exchange (the global window)."""
    clean = c4_clean(synth_webtext(spark, SF))
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    assert "MapInPandas" not in plan and "EvalPython" not in plan

    spans = c4_span_dedup(synth_webtext(spark, SF))
    plan = spans._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(span_hash" in plan
    assert "MapInPandas" not in plan and "EvalPython" not in plan

    removal = c4_remove_dup_spans(synth_webtext(spark, SF))
    plan = removal._jdf.queryExecution().executedPlan().toString()
    # window on hash + partial/final agg on doc_id + join back — and the
    # sentence rebuild itself adds no exchange (in-row indexed filter)
    assert plan.count("Exchange") <= 4
    assert "MapInPandas" not in plan and "EvalPython" not in plan


def test_domain_cap(spark):
    from docling_spark.ops.curate import domain_cap

    rows = [
        (f"https://{d}.org/p/{i}", f"2024-01-0{ts}")
        for d, i, ts in [
            ("a", 1, 1), ("a", 2, 2), ("a", 3, 3), ("a", 4, 4),
            ("b", 5, 1),
        ]
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts string").select(
        "url", F.to_timestamp("warc_ts").alias("warc_ts")
    )
    out = {r.url: r for r in domain_cap(df, k=2).collect()}
    # domain a: latest two (ts 4, 3) kept; older two dropped
    assert out["https://a.org/p/4"].kept is True
    assert out["https://a.org/p/3"].kept is True
    assert out["https://a.org/p/2"].kept is False
    assert out["https://a.org/p/1"].kept is False
    assert out["https://b.org/p/5"].kept is True
    assert out["https://a.org/p/4"].domain == "a.org"
