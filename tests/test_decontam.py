"""Benchmark-decontamination tests: ops/decontam.py."""

import pytest
from pyspark.sql import functions as F

from docling_spark.ops import decontam


@pytest.fixture(scope="module")
def spark():
    from docling_spark.job import tuned_session

    s = tuned_session(master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


W = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike"


def _verdicts(spark, corpus_rows, bench_rows, n=13):
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = decontam.benchmark_grams(
        spark.createDataFrame(bench_rows, "doc_id long, text string"), n=n
    )
    return {
        r["doc_id"]: r for r in decontam.decontaminate(corpus, bench, n=n).collect()
    }


def test_exact_13gram_overlap_flags(spark):
    # corpus doc embeds the benchmark's 13 tokens verbatim mid-text
    out = _verdicts(
        spark,
        [
            (1, "prefix words here " + W + " and a suffix"),
            (2, "totally unrelated november oscar papa quebec romeo sierra "
                "tango uniform victor whiskey xray yankee zulu here"),
        ],
        [(100, W)],
    )
    assert out[1]["contaminated"] is True and out[1]["n_contaminated"] >= 1
    assert out[2]["contaminated"] is False and out[2]["n_contaminated"] == 0


def test_twelve_token_overlap_does_not_flag(spark):
    twelve = " ".join(W.split()[:12])
    out = _verdicts(spark, [(1, f"x {twelve} y")], [(100, W)])
    assert out[1]["contaminated"] is False


def test_short_benchmark_full_sequence_gram(spark):
    # 3-token benchmark: its full sequence is the gram; a corpus doc
    # containing those 3 tokens as one of its own short-doc grams flags
    out = _verdicts(
        spark,
        [(1, "alpha bravo charlie"), (2, "alpha bravo delta")],
        [(100, "alpha bravo charlie")],
    )
    assert out[1]["contaminated"] is True
    assert out[2]["contaminated"] is False


def test_case_and_whitespace_normalized(spark):
    out = _verdicts(spark, [(1, "  ALPHA\tbravo  " + " ".join(W.split()[2:]))], [(100, W)])
    assert out[1]["contaminated"] is True


def test_scrub_removes_only_covered_tokens(spark):
    corpus = spark.createDataFrame(
        [(1, "aa bb " + W + " yy zz"), (2, "clean doc with no overlap here")],
        "doc_id long, text string",
    )
    bench = decontam.benchmark_grams(
        spark.createDataFrame([(100, W)], "doc_id long, text string")
    )
    out = {
        r["doc_id"]: r
        for r in decontam.scrub_contaminated_spans(corpus, bench).collect()
    }
    assert out[1]["clean_text"] == "aa bb yy zz"
    assert out[1]["n_removed"] == 13
    # untouched docs come back token-normalized with zero removals
    assert out[2]["clean_text"] == "clean doc with no overlap here"
    assert out[2]["n_removed"] == 0


def test_scrub_overlapping_windows_union(spark):
    # benchmark is 14 tokens -> two overlapping 13-gram windows in a doc
    # that embeds all 14: both windows hit, union covers all 14 tokens
    w14 = W + " nov"
    corpus = spark.createDataFrame(
        [(1, "x " + w14 + " y")], "doc_id long, text string"
    )
    bench = decontam.benchmark_grams(
        spark.createDataFrame([(100, w14)], "doc_id long, text string")
    )
    row = decontam.scrub_contaminated_spans(corpus, bench).collect()[0]
    assert row["clean_text"] == "x y"
    assert row["n_removed"] == 14


def test_plan_broadcast_no_smj(spark):
    docs = spark.createDataFrame(
        [(i, W + f" tail{i}") for i in range(20)], "doc_id long, text string"
    )
    bench = decontam.benchmark_grams(docs.limit(2))
    plan = (
        decontam.decontaminate(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
