"""Trained quality classifier (ops/qclassifier): separation on a
junk-degraded corpus, determinism across partitionings, rounding-law
twins, and the plan posture (zero Python, one feature exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_spark.ops.qclassifier import (
    _qpy,
    quality_classifier_scores,
    train_quality_classifier,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _junk_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    junk = F.repeat(
        F.lit(" zq9x vv3k zzp1"), ((F.length("text") + 29) / 30).cast("int")
    )
    noisy = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat("text", junk).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(noisy)


def test_separates_junk_from_originals(spark):
    corpus = _junk_corpus(spark)
    w, scored = train_quality_classifier(corpus, F.col("doc_id") < 200000)
    rows = scored.toPandas()
    orig = rows[rows.y == 1]
    junk = rows[rows.y == 0]
    assert orig.p.mean() > 0.7
    assert junk.p.mean() < 0.5
    acc = ((rows.p >= 0.5).astype(int) == rows.y).mean()
    assert acc >= 0.95
    # weights stay dyadic-20 exact doubles
    assert all(v == round(v * (1 << 20)) / (1 << 20) for v in w)


def test_deterministic_across_partitionings(spark):
    corpus = _junk_corpus(spark)
    a = quality_classifier_scores(
        corpus.repartition(2), F.col("doc_id") < 200000
    ).toPandas()
    b = quality_classifier_scores(
        corpus.repartition(13, "doc_id"), F.col("doc_id") < 200000
    ).toPandas()
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    assert key(a).equals(key(b))


def test_qpy_matches_engine_rounding():
    """Half-AWAY-from-zero at exact .5 quanta (Python round() would
    give half-even and diverge)."""
    Q = 1 << 20
    assert _qpy(1.5 / Q) == 2 / Q
    assert _qpy(2.5 / Q) == 3 / Q  # half-even would say 2/Q
    assert _qpy(-1.5 / Q) == -2 / Q
    assert _qpy(-2.5 / Q) == -3 / Q
    assert _qpy(0.0) == 0.0


def test_plan_zero_python(spark):
    corpus = _junk_corpus(spark)
    scored = quality_classifier_scores(corpus, F.col("doc_id") < 200000)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
    # the scoring pass reuses the persisted doc_id layout: its only
    # exchange is inside the cached feature build (InMemoryTableScan)
    after_cache = plan.split("InMemoryTableScan")[0]
    assert "Exchange" not in after_cache
