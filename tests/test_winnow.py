"""Winnowing fingerprints (ops/winnow): the MOSS coverage guarantee,
selection law vs a plain-python reference, pair counting, plan pin."""

from __future__ import annotations

import hashlib

import pytest

from docling_spark.ops.winnow import winnow_fingerprints, winnow_pairs


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


def _ref_fps(text: str, k: int, w: int) -> set[int]:
    n_grams = max(len(text) - (k - 1), 1)
    hashes = [
        int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(n_grams)
    ]
    n_win = max(len(hashes) - (w - 1), 1)
    return {min(hashes[j : j + w]) for j in range(n_win)}


def _run(spark, texts, k=5, w=4):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    return out


def test_matches_python_reference(spark):
    texts = [
        "the winnowing algorithm selects minimum hashes",
        "short",
        "",
        "aaaaaaaaaaaaaaaa",  # degenerate: all grams identical
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == _ref_fps(t, 5, 4), i


def test_coverage_guarantee(spark):
    # any shared substring of length >= w + k - 1 (= 8) must contribute
    # at least one identical fingerprint in both documents
    shared = "COMMONPASSAGEXYZ"  # length 16 >= 8
    a = "left context totally unlike " + shared + " trailing words here"
    b = shared + " appears at the start of this other document instead"
    got = _run(spark, [a, b])
    assert got[0] & got[1], "coverage theorem violated"


def test_pairs_threshold_and_plan(spark):
    docs = spark.createDataFrame(
        [
            (1, "identical body of text for the pair check"),
            (2, "identical body of text for the pair check"),
            (3, "nothing in common with the others qqqq zzzz"),
        ],
        "doc_id long, text string",
    )
    out = winnow_pairs(docs, k=5, w=4, min_shared=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2) and r["shared_fps"] >= 2
    # fingerprint stage: the hash array is materialized once — the plan
    # must stay JVM-only
    plan = (
        winnow_fingerprints(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Exchange" not in plan
