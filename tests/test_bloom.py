"""Bloom-filter incremental dedup tests: ops/bloom.py."""

import pytest
from pyspark.sql import functions as F

from docling_spark.ops import bloom


@pytest.fixture(scope="module")
def spark():
    from docling_spark.job import tuned_session

    s = tuned_session(master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_no_false_negatives(spark):
    hist = _df(spark, [(i, f"history document number {i}") for i in range(100)])
    filt = bloom.bloom_build(hist, "text")
    # a new batch repeating 20 historical texts must flag ALL of them
    batch = _df(spark, [(1000 + i, f"history document number {i}") for i in range(20)])
    out = bloom.bloom_maybe_dup(batch, filt, "text").collect()
    assert all(r["maybe_dup"] for r in out) and len(out) == 20


def test_fresh_docs_pass_at_design_fp_rate(spark):
    hist = _df(spark, [(i, f"history document number {i}") for i in range(200)])
    filt = bloom.bloom_build(hist, "text")
    batch = _df(spark, [(5000 + i, f"completely fresh text {i}") for i in range(200)])
    flagged = (
        bloom.bloom_maybe_dup(batch, filt, "text")
        .filter(F.col("maybe_dup"))
        .count()
    )
    # m=2^18, k=3, n=200 -> FP ~ 1e-8; any flag would be a logic bug
    assert flagged == 0


def test_incremental_fold_union(spark):
    """A second ingest folds in by union+distinct — the persistable shape."""
    a = bloom.bloom_build(_df(spark, [(1, "batch one doc")]), "text")
    b = bloom.bloom_build(_df(spark, [(2, "batch two doc")]), "text")
    merged = a.union(b).distinct()
    out = {
        r["doc_id"]: r["maybe_dup"]
        for r in bloom.bloom_maybe_dup(
            _df(spark, [(10, "batch one doc"), (11, "batch two doc"), (12, "neither")]),
            merged,
            "text",
        ).collect()
    }
    assert out == {10: True, 11: True, 12: False}


def test_small_m_forces_false_positives_never_negatives(spark):
    hist = _df(spark, [(i, f"doc {i}") for i in range(300)])
    filt = bloom.bloom_build(hist, "text", m=256, k=3)  # saturated filter
    batch = _df(
        spark,
        [(1000, "doc 5"), (1001, "something else entirely")],
    )
    out = {
        r["doc_id"]: r["maybe_dup"]
        for r in bloom.bloom_maybe_dup(batch, filt, "text", m=256, k=3).collect()
    }
    assert out[1000] is True  # true dup still flagged (no false negative)


def test_plan_broadcast_no_smj(spark):
    hist = _df(spark, [(i, f"h{i}") for i in range(50)])
    filt = bloom.bloom_build(hist, "text")
    plan = (
        bloom.bloom_maybe_dup(_df(spark, [(1, "h1")]), filt, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_production_m_withholds_broadcast_hint(spark):
    """At m above BROADCAST_M_CEILING the auto mode must NOT force a
    broadcast (the set-bit table of a 10^11-key filter is billions of
    longs); the shuffled-join plan still yields identical verdicts."""
    big_m = bloom.BROADCAST_M_CEILING << 4
    hist = _df(spark, [(i, f"history doc {i}") for i in range(100)])
    filt = bloom.bloom_build(hist, "text", m=big_m)
    batch = _df(
        spark,
        [(1000, "history doc 7"), (1001, "fresh text never ingested")],
    )
    probed = bloom.bloom_maybe_dup(batch, filt, "text", m=big_m)
    # disable AQE's own small-table promotion so the plan shows what the
    # op itself asked for: no forced BroadcastHashJoin
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        out = {r["doc_id"]: r["maybe_dup"] for r in probed.collect()}
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert out == {1000: True, 1001: False}
    # explicit override still broadcasts (the operator parameter wins)
    forced = bloom.bloom_maybe_dup(
        batch, filt, "text", m=big_m, broadcast=True
    )
    assert (
        "BroadcastHashJoin"
        in forced._jdf.queryExecution().executedPlan().toString()
    )


def test_big_m_bucketed_probe_is_shuffle_free_on_filter_side(spark, tmp_path):
    """The documented big-m path (module docstring): persist the set-bit
    table BUCKETED on pos and bucket the candidate positions the same way
    → the membership join runs with ZERO exchanges (bucket once, probe
    every future ingest shuffle-free), verdicts identical to the plain
    path."""
    import shutil

    big_m = bloom.BROADCAST_M_CEILING << 4
    hist = _df(spark, [(i, f"history doc {i}") for i in range(80)])
    batch = _df(
        spark,
        [(900, "history doc 3"), (901, "something new entirely")],
    )
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bloom_bits", "bloom_cand"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bloom.bloom_build(hist, "text", m=big_m).write.bucketBy(
            4, "pos"
        ).sortBy("pos").mode("overwrite").saveAsTable("bloom_bits")
        cand = batch.select(
            "doc_id",
            F.explode(
                bloom._positions(F.md5(F.col("text")), big_m, bloom.DEFAULT_K)
            ).alias("pos"),
        )
        cand.write.bucketBy(4, "pos").sortBy("pos").mode(
            "overwrite"
        ).saveAsTable("bloom_cand")
        flt = spark.table("bloom_bits").withColumn("__set", F.lit(1))
        probe = (
            spark.table("bloom_cand")
            .join(flt, "pos", "left")
            .groupBy("doc_id")
            .agg(
                (F.sum(F.coalesce("__set", F.lit(0))) == bloom.DEFAULT_K).alias(
                    "maybe_dup"
                )
            )
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        # join itself is exchange-free; the only exchange is the final
        # slim per-doc agg
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Bucketed: true" in plan
        assert "Exchange" not in join_part
        got = {r["doc_id"]: r["maybe_dup"] for r in probe.collect()}
        want = {
            r["doc_id"]: r["maybe_dup"]
            for r in bloom.bloom_maybe_dup(
                batch, bloom.bloom_build(hist, "text", m=big_m), "text",
                m=big_m,
            ).collect()
        }
        assert got == want == {900: True, 901: False}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        for t in ("bloom_bits", "bloom_cand"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
