"""Incremental MinHash-LSH near-dup (ops/dedup.lsh_incremental_dups)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_lsh_incremental_dups(spark):
    """Incremental near-dup probe: history collisions flag, earlier-id
    wins within a batch, novel docs pass."""
    from docling_spark.ops.dedup import lsh_bands, lsh_incremental_dups

    hist = spark.createDataFrame(
        [(i, f"history document number {i} with shared prefix words")
         for i in range(5)],
        "doc_id long, text string",
    )
    hb = lsh_bands(hist, k=8, seeds=[1, 2, 3, 4], band_size=2)
    new = spark.createDataFrame(
        [
            # exact copy of history doc 2
            (100, "history document number 2 with shared prefix words"),
            # novel pair, identical to each other only
            (200, "a completely different novel text body here xyzzy"),
            (201, "a completely different novel text body here xyzzy"),
            # unique novel doc
            (300, "qqq unrelated content that matches nothing at all zz"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_hist_hits"], r["n_batch_hits"], r["maybe_dup"])
        for r in lsh_incremental_dups(
            new, hb, k=8, seeds=[1, 2, 3, 4], band_size=2
        ).collect()
    }
    assert got[100][0] >= 1 and got[100][2] is True
    # earlier-id wins: 200 survives, 201 flags against it
    assert got[200] == (0, 0, False)
    assert got[201] == (0, 1, True)
    assert got[300] == (0, 0, False)


def test_lsh_incremental_recrawl_same_id_not_self_dup(spark):
    """A page re-crawled under its OWN historical doc_id must not flag
    against itself — only collisions with OTHER documents count."""
    from docling_spark.ops.dedup import lsh_bands, lsh_incremental_dups

    hist = spark.createDataFrame(
        [(7, "stable page body that barely changes between crawls")],
        "doc_id long, text string",
    )
    hb = lsh_bands(hist, k=8, seeds=[1, 2, 3, 4], band_size=2)
    new = spark.createDataFrame(
        [(7, "stable page body that barely changes between crawls")],
        "doc_id long, text string",
    )
    got = lsh_incremental_dups(
        new, hb, k=8, seeds=[1, 2, 3, 4], band_size=2
    ).collect()[0]
    assert got["n_hist_hits"] == 0 and got["maybe_dup"] is False


def test_edit_verify_pairs_verdicts_and_plan(spark):
    """Near-identical pair accepted, unrelated pair rejected, prefix cap
    bounds the cost, is_dup uses the rounded similarity; plan stays JVM."""
    from docling_spark.ops.dedup import edit_verify_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 5),
            (2, "XX" + "the quick brown fox jumps over the lazy dog " * 5),
            (3, "completely different content about something else"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a long, doc_b long"
    )
    out = edit_verify_pairs(docs, pairs, threshold=0.9, prefix=500)
    got = {(r["doc_a"], r["doc_b"]): r for r in out.collect()}
    assert got[(1, 2)]["edit_dist"] == 2 and got[(1, 2)]["is_dup"]
    assert not got[(1, 3)]["is_dup"]
    # prefix cap: distance computed on the capped window only
    long = spark.createDataFrame(
        [(1, "a" * 2000), (2, "a" * 10 + "b" * 1990)],
        "doc_id long, text string",
    )
    p = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    r = edit_verify_pairs(long, p, prefix=10).collect()[0]
    assert r["edit_dist"] == 0 and r["is_dup"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_containment_pairs_relations(spark):
    from docling_spark.ops.dedup import containment_pairs

    full = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (1, full),
        (2, full),                      # exact copy -> near_exact
        (3, full[: len(full) // 3]),    # prefix third -> contained in 1 and 2
        (4, "totally different words nothing shared here at all ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in containment_pairs(df, k=8, threshold=0.5).collect()
    }
    assert out[(1, 2)]["relation"] == "near_exact"
    assert out[(1, 2)]["jaccard"] == 1.0
    # every shingle of the prefix is a shingle of the full text: exactly 1.0
    assert out[(1, 3)]["relation"] == "b_in_a"
    assert out[(1, 3)]["containment_b"] == 1.0
    assert out[(1, 3)]["jaccard"] < 0.9
    assert out[(2, 3)]["relation"] == "b_in_a"
    # the disjoint doc pairs with nobody
    assert not any(4 in pair for pair in out)


def test_containment_threshold_gate(spark):
    from docling_spark.ops.dedup import containment_pairs

    # shared suffix is a minority of each doc's DISTINCT shingles:
    # below the 0.5 max-containment gate, above 0.1
    tail = " shared tail words one two three"
    pa = " ".join(f"apple{i} banana{i} cherry{i}" for i in range(8))
    pb = " ".join(f"delta{i} echo{i} foxtrot{i}" for i in range(8))
    rows = [(1, pa + tail), (2, pb + tail)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hi = containment_pairs(df, k=8, threshold=0.5).collect()
    lo = containment_pairs(df, k=8, threshold=0.1).collect()
    assert hi == [] and len(lo) == 1
    assert lo[0]["relation"] == "partial_overlap"


def test_source_overlap_matrix(spark):
    from docling_spark.ops.dedup import source_overlap

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        ("mirror1", base),
        ("mirror2", base),                 # exact mirror: jaccard 1.0
        ("subset", base[: len(base) // 2]),  # prefix dump: overlap 1.0
        ("other", "completely different material with zero shared grams"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap(df, k=8).collect()
    }
    m = got[("mirror1", "mirror2")]
    assert m["jaccard"] == 1.0 and m["overlap_coef"] == 1.0
    s = got[("mirror1", "subset")]
    assert s["overlap_coef"] == 1.0  # the containment signature
    assert s["jaccard"] < 0.9
    assert ("mirror1", "other") not in got  # zero intersection: no row


def test_ngram_novelty(spark):
    from docling_spark.ops.dedup import ngram_novelty

    unique = "qwerty uiop asdfgh jkl zxcvbn m1234 original only"
    shared = "this exact passage occurs verbatim elsewhere zz"
    rows = [(1, unique), (2, shared), (3, shared)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(df, k=8).collect()}
    assert got[1]["novelty"] == 1.0 and got[1]["n_shared"] == 0
    # exact twins: every shingle shared -> novelty exactly 0.0
    assert got[2]["novelty"] == 0.0 and got[3]["novelty"] == 0.0
    assert got[2]["n_shingles"] == got[3]["n_shingles"]
