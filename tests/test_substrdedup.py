"""Exact-substring dedup (docling_spark/ops/substrdedup.py, Lee et al.
2107.06499 ExactSubstr): hand-computed excision cases — cross-doc,
intra-doc, overlap merging, island counting — plus the scale-shape
plan pin (one gram-key exchange, zero Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.substrdedup import substr_dedup, synth_boiler_text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("substrdedup-test")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def _run(spark, rows, gram_len=4):
    df = spark.createDataFrame(rows, "doc_id long, wtext string")
    out = substr_dedup(df, gram_len=gram_len).collect()
    return {r.doc_id: r for r in out}


def test_cross_doc_first_kept(spark):
    """The global first occurrence (lowest doc_id, leftmost) keeps its
    text; the later doc loses exactly the shared window."""
    shared = "alpha beta gamma delta"
    r = _run(
        spark,
        [(0, f"{shared} tail zero"), (1, f"head one {shared}")],
    )
    assert r[0].n_dropped == 0
    assert r[0].clean_text == "alpha beta gamma delta tail zero"
    assert r[1].n_dropped == 4
    assert r[1].n_islands == 1
    assert r[1].clean_text == "head one"


def test_intra_doc_second_occurrence_excised(spark):
    """ExactSubstr removes intra-document repeats too: the second copy
    inside the SAME doc goes, the first stays."""
    r = _run(spark, [(0, "alpha beta gamma delta mid alpha beta gamma delta")])
    assert r[0].n_words == 9
    assert r[0].n_dropped == 4
    assert r[0].n_islands == 1
    assert r[0].clean_text == "alpha beta gamma delta mid"


def test_overlapping_windows_merge_into_one_island(spark):
    """A duplicated run LONGER than gram_len marks overlapping windows;
    they merge into a single island covering the whole run."""
    run6 = "a b c d e f"  # 6 words, gram_len 4 -> 3 overlapping windows
    r = _run(spark, [(0, f"{run6} x"), (1, f"y {run6}")])
    assert r[1].n_dropped == 6
    assert r[1].n_islands == 1
    assert r[1].clean_text == "y"


def test_two_separate_islands(spark):
    d0 = "alpha beta gamma delta mid1 mid2 mid3 mid4 epsilon zeta eta theta"
    d1 = "alpha beta gamma delta q w e r epsilon zeta eta theta"
    r = _run(spark, [(0, d0), (1, d1)])
    assert r[0].n_dropped == 0
    assert r[1].n_dropped == 8
    assert r[1].n_islands == 2
    assert r[1].clean_text == "q w e r"


def test_short_doc_untouched(spark):
    r = _run(spark, [(0, "one two three")])  # < gram_len words
    assert r[0].n_dropped == 0 and r[0].n_islands == 0
    assert r[0].clean_text == "one two three"


def test_whitespace_runs_collapse(spark):
    r = _run(spark, [(0, "a  b\t c \n d")])
    assert r[0].n_words == 4
    assert r[0].clean_text == "a b c d"


def test_plan_shape(spark):
    """Gram hashing is in-row; the first-occurrence flag is one hash
    exchange on the gram key; drops partial-aggregate on doc_id and
    join back; the rebuild adds no exchange and no Python stage."""
    out = substr_dedup(synth_boiler_text(spark, SF))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(h" in plan  # the one wide edge
    # window on h + partial/final agg on doc_id + join back
    assert plan.count("Exchange") <= 4
    assert "MapInPandas" not in plan and "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_boiler_corpus_signal(spark):
    """The synthetic corpus exercises every law: cross-doc boiler dedup,
    the intra-doc %9==4 twin, and multi-island docs."""
    rows = substr_dedup(synth_boiler_text(spark, SF)).collect()
    dropped = [r for r in rows if r.n_dropped > 0]
    assert len(dropped) > len(rows) // 4
    assert any(r.n_islands >= 2 for r in rows)
    assert all(r.n_dropped <= r.n_words for r in rows)
