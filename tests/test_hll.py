"""Engine-exact HyperLogLog (ops/hll): accuracy vs exact distinct,
duplicate-invariance, grouping, cross-engine equality, plan shape."""

from __future__ import annotations

import duckdb
import pytest

from docling_spark.ops.hll import hll_cardinality, hll_cardinality_oracle_sql


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


def test_accuracy_and_duplicate_invariance(spark):
    n = 20000
    df = spark.createDataFrame(
        [(f"key-{i % 5000}",) for i in range(n)], "k string"
    )
    (r,) = hll_cardinality(df, "k", b=10).collect()
    # ~1.04/sqrt(1024) ≈ 3.3% std error; allow 4 sigma
    assert abs(r["estimate"] - 5000) / 5000 < 0.13
    # duplicates must not move the sketch at all
    (r2,) = hll_cardinality(
        spark.createDataFrame([(f"key-{i}",) for i in range(5000)], "k string"),
        "k",
        b=10,
    ).collect()
    assert r2["sum_inv"] == r["sum_inv"] and r2["estimate"] == r["estimate"]


def test_small_cardinality_linear_counting(spark):
    df = spark.createDataFrame([(f"x{i}",) for i in range(30)], "k string")
    (r,) = hll_cardinality(df, "k", b=10).collect()
    # tiny set: linear counting is near-exact
    assert abs(r["estimate"] - 30) < 3
    assert r["n_registers"] <= 30


def test_grouped_and_cross_engine(spark):
    rows = [(f"g{i % 3}", f"k{i % (40 * (1 + i % 3))}") for i in range(600)]
    df = spark.createDataFrame(rows, "g string, k string")
    got = {
        r["g"]: r
        for r in hll_cardinality(df, "k", group_cols=["g"], b=8).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g VARCHAR, k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = {
        r[0]: r
        for r in con.execute(
            hll_cardinality_oracle_sql(
                "SELECT g, k FROM t", "k", group_cols=["g"], b=8
            )
        ).fetchall()
    }
    assert set(got) == set(exp)
    for g, r in got.items():
        eg = exp[g]  # (g, m, n_registers, sum_inv, estimate)
        assert r["n_registers"] == eg[2]
        assert r["sum_inv"] == eg[3]  # dyadic-exact: bit-identical
        assert r["estimate"] == pytest.approx(eg[4], rel=1e-12)


def test_plan_mapside_registers_no_python(spark):
    df = spark.createDataFrame([("a",)], "k string")
    plan = (
        hll_cardinality(df, "k")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
    # partial aggregation before the exchange: the shuffle carries
    # register rows, not keys
    assert "partial" in plan.lower()
