"""DSIR importance resampling (docling_spark/ops/dsir.py, Xie et al.
2302.03169): the reshape-toward-target property, exact-fraction
Gumbel top-k, determinism across partitionings, and the plan pin
(bucket-keyed aggs + broadcast ratio dim, zero Python)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_spark.ops.dsir import dsir_weights

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("dsir-test")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_target_slice_upweighted(spark):
    """Docs matching the target distribution score higher logw on
    average — the whole point of importance reweighting."""
    out = (
        dsir_weights(_docs(spark), target_filter=F.col("lang") == "en")
        .join(_docs(spark).select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("logw").alias("m"))
        .collect()
    )
    m = {r[0]: r.m for r in out}
    assert m[True] > m[False]


def test_keep_fraction_exact(spark):
    rows = dsir_weights(
        _docs(spark), target_filter=F.col("lang") == "en"
    ).collect()
    n = len(rows)
    kept = sum(1 for r in rows if r.keep)
    assert kept == -(-n // 4)  # ceil(n * 0.25)
    # keep is exactly the top-`kept` ranks
    assert all(r.keep == (r.rank <= kept) for r in rows)


def test_deterministic_across_partitionings(spark):
    """No RNG state and dyadic-quantized sums: repartitioning the
    input cannot change a single weight, key, or keep flag."""
    docs = _docs(spark)
    a = dsir_weights(docs, target_filter=F.col("lang") == "en").collect()
    b = dsir_weights(
        docs.repartition(13, "doc_id"), target_filter=F.col("lang") == "en"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_all_target_is_identity(spark):
    """Target = raw -> every log ratio is ~0 (identical smoothed
    models), so logw collapses to ~0 for every doc."""
    rows = dsir_weights(
        _docs(spark), target_filter=F.lit(True)
    ).collect()
    assert all(abs(r.logw) < 1e-9 for r in rows)


def test_plan_shape(spark):
    """Model fits are bucket-keyed partial aggs; the ratio table joins
    back broadcast; no Python stage; the only global sort is the slim
    final rank window (documented: threshold-cut in production)."""
    out = dsir_weights(_docs(spark), target_filter=F.col("lang") == "en")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "MapInPandas" not in plan and "EvalPython" not in plan
    assert "CartesianProduct" not in plan
