"""Sliding token windows (ops/windows): coverage law, tail handling,
edge cases, plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.windows import sliding_windows


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, text, size, stride):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        (r["win_idx"], r["win_start"], r["win_len"], r["wtext"])
        for r in sliding_windows(df, size=size, stride=stride).collect()
    )


def test_window_law(spark):
    text = " ".join(f"t{i}" for i in range(10))
    got = _run(spark, text, size=4, stride=3)
    assert got == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
    ]
    # every token covered; consecutive windows overlap by size - stride
    covered = set()
    for _, start, ln, _ in got:
        covered |= set(range(start, start + ln))
    assert covered == set(range(10))


def test_short_tail_and_edges(spark):
    # 11 tokens, size 4, stride 3 -> ceil(7/3)+1 = 4 windows, last short
    got = _run(spark, " ".join(f"t{i}" for i in range(11)), 4, 3)
    assert [g[2] for g in got] == [4, 4, 4, 2]
    # doc shorter than a window -> exactly one short window
    assert _run(spark, "a b", 4, 3) == [(0, 0, 2, "a b")]
    # empty doc -> no windows
    assert _run(spark, "   ", 4, 3) == []


def test_stride_validation_and_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        sliding_windows(df, size=4, stride=5)
    plan = (
        sliding_windows(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan and "MapInPandas" not in plan
