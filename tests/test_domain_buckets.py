"""Head/middle/tail domain buckets (ops/curate.domain_buckets):
coverage law, level granularity, boundary-straddle rule, plan shape."""

from __future__ import annotations

import pytest

from docling_spark.ops.curate import domain_buckets


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


def _urls(spark, host_counts):
    rows = []
    for host, n in host_counts.items():
        rows += [(f"https://{host}/p{i}",) for i in range(n)]
    return spark.createDataFrame(rows, "url string")


def test_coverage_buckets(spark):
    # giant 50, mid 20, four tails of 5 → total 90
    counts = {"giant.test": 50, "mid.test": 20,
              "t1.test": 5, "t2.test": 5, "t3.test": 5, "t4.test": 5}
    got = {
        r["host"]: r
        for r in domain_buckets(
            _urls(spark, counts), head_frac=0.5, mid_frac=0.8
        ).collect()
    }
    # head cut at 45: giant level starts at 0 → head
    assert got["giant.test"]["bucket"] == "head"
    assert got["giant.test"]["cum_before"] == 0
    # mid cut at 72: level 20 starts at 50 → middle
    assert got["mid.test"]["bucket"] == "middle"
    assert got["mid.test"]["cum_before"] == 50
    # level 5 starts at 70 < 72 → the WHOLE level is middle (straddle
    # rule: a level crossing the boundary goes to the earlier bucket)
    for h in ("t1.test", "t2.test", "t3.test", "t4.test"):
        assert got[h]["bucket"] == "middle"
        assert got[h]["cum_before"] == 70


def test_tail_and_level_sharing(spark):
    counts = {"a.test": 8, "b.test": 2, "c.test": 1, "d.test": 1}
    got = {
        r["host"]: r["bucket"]
        for r in domain_buckets(
            _urls(spark, counts), head_frac=0.5, mid_frac=0.8
        ).collect()
    }
    # total 12: head cut 6 (a starts at 0), mid cut 9.6 (b starts at 8),
    # level-1 starts at 10 → tail; level-mates share a bucket
    assert got == {
        "a.test": "head",
        "b.test": "middle",
        "c.test": "tail",
        "d.test": "tail",
    }


def test_plan_no_per_domain_global_sort(spark):
    df = _urls(spark, {"a.test": 2, "b.test": 1})
    plan = (
        domain_buckets(df)._jdf.queryExecution().executedPlan().toString()
    )
    # the only Window must consume the count-level HISTOGRAM (an
    # aggregate), never the per-domain frame: no Window directly over
    # the host aggregation's output size — proxy check: exactly one
    # Window operator and it sits above the second HashAggregate
    assert plan.count("Window") == 1
    assert "Python" not in plan
