"""Count-Min Sketch (ops/cms): never-underestimate law, collision
overestimates, absent keys, cross-engine equality, plan shape."""

from __future__ import annotations

import duckdb
import pytest

from docling_spark.ops.cms import cms_counters, cms_estimates, cms_estimates_oracle_sql


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


def _keys(spark, occurrences):
    return spark.createDataFrame([(k,) for k in occurrences], "k string")


def test_never_underestimates_and_exact_when_sparse(spark):
    occ = ["a"] * 100 + ["b"] * 10 + ["c"]
    probes = _keys(spark, ["a", "b", "c", "absent"]).distinct()
    got = {
        r["key"]: r
        for r in cms_estimates(
            _keys(spark, occ), probes, "k", d=4, w=512
        ).collect()
    }
    for k, true in [("a", 100), ("b", 10), ("c", 1), ("absent", 0)]:
        assert got[k]["true_cnt"] == true
        assert got[k]["est"] >= true  # the CMS one-sided guarantee
        assert got[k]["overestimate"] >= 0
    # 3 distinct keys in a 4x512 sketch: collisions impossible to matter
    assert got["a"]["est"] == 100 and got["absent"]["est"] == 0


def test_counter_mass_conservation(spark):
    occ = [f"k{i % 7}" for i in range(70)]
    rows = cms_counters(_keys(spark, occ), "k", d=3, w=64).collect()
    # every row of the sketch holds the full occurrence mass
    by_r = {}
    for r in rows:
        by_r[r["r"]] = by_r.get(r["r"], 0) + r["cnt"]
    assert by_r == {0: 70, 1: 70, 2: 70}


def test_cross_engine(spark):
    occ = [f"tok{i % 13}" for i in range(200)]
    probes = [f"tok{i}" for i in range(5)] + ["nope"]
    got = {
        r["key"]: (r["est"], r["true_cnt"])
        for r in cms_estimates(
            _keys(spark, occ),
            _keys(spark, probes),
            "k",
            d=4,
            w=32,  # small w: force collisions, both engines must agree
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE occ(k VARCHAR)")
    con.executemany("INSERT INTO occ VALUES (?)", [(k,) for k in occ])
    con.execute("CREATE TABLE pr(k VARCHAR)")
    con.executemany("INSERT INTO pr VALUES (?)", [(k,) for k in probes])
    exp = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            cms_estimates_oracle_sql(
                "SELECT k FROM occ", "SELECT k FROM pr", key="k", d=4, w=32
            )
        ).fetchall()
    }
    assert got == exp


def test_plan_mapside_no_python(spark):
    plan = (
        cms_counters(_keys(spark, ["x"]), "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "partial" in plan.lower()


def test_join_size_guarantee_and_disjoint(spark):
    from docling_spark.ops.cms import cms_join_size

    a = _keys(spark, ["x"] * 3 + ["y"] * 2 + ["only-a"])
    b = _keys(spark, ["x"] * 4 + ["y"] * 1 + ["only-b"] * 5)
    (r,) = cms_join_size(a, b, "k", d=4, w=64).collect()
    assert r["true_pairs"] == 3 * 4 + 2 * 1
    assert r["est_pairs"] >= r["true_pairs"]  # one-sided guarantee
    # fully disjoint sides in a roomy sketch: estimate collapses to 0
    c = _keys(spark, [f"a{i}" for i in range(5)])
    e = _keys(spark, [f"b{i}" for i in range(5)])
    (r2,) = cms_join_size(c, e, "k", d=4, w=512).collect()
    assert r2["true_pairs"] == 0 and r2["est_pairs"] == 0


def test_cms_stream_batch_parity(spark, tmp_path):
    """CMS counters are mergeable by SUM — a streaming count(*) per
    (r, c) across micro-batches IS the merged sketch; pin equality
    with the batch counters."""
    from docling_spark.ops.cms import cms_counters

    inp = str(tmp_path / "cms_in")
    ckpt = str(tmp_path / "cms_ckpt")
    occ = [f"tok{i % 11}" for i in range(300)]
    for lo, hi in [(0, 100), (100, 200), (200, 300)]:
        spark.createDataFrame(
            [(k,) for k in occ[lo:hi]], "k string"
        ).coalesce(1).write.mode("append").parquet(inp)
    stream_in = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    q = (
        cms_counters(stream_in, "k", d=3, w=32)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["r"], r["c"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_stream").collect()
    }
    want = {
        (r["r"], r["c"]): r["cnt"]
        for r in cms_counters(_keys(spark, occ), "k", d=3, w=32).collect()
    }
    assert got == want and len(got) > 0
