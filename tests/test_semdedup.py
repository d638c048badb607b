"""SemDeDup (docling_spark/ops/semdedup.py, Abbas et al. 2303.09540):
hand-computed removal law cases and the bounded-quadratic plan pin
(pairs joined on cluster id, never corpus-wide all-pairs)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.semdedup import semdedup, synth_semdedup_input

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("semdedup-test")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def _run(spark, vecs, n_clusters=2, threshold=0.9):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = semdedup(df, n_clusters=n_clusters, threshold=threshold).collect()
    return {r.vec_id: r for r in out}


def test_exact_dup_removes_centroid_closer(spark):
    """Two identical-direction vectors in one cluster: the one CLOSER
    to the centroid is removed; equal sims tie-break keeps lower id."""
    # centroids (seeded) = vecs 0 and 1; vec 2 parallel to vec 0 ->
    # same centroid_sim (1.0) -> tie -> keep vec 0, remove vec 2
    r = _run(spark, [[1, 0, 0], [0, 1, 0], [2, 0, 0]])
    assert r[0].keep is True
    assert r[2].keep is False
    assert r[1].keep is True  # alone near centroid 1


def test_keeps_the_outlier(spark):
    """Of a >= tau pair, the member FARTHER from the centroid (lower
    centroid_sim) survives — the paper's diversity rule."""
    a = [1.0, 0.05, 0.0]  # closer to centroid 0 = [1,0,0]
    b = [1.0, 0.25, 0.0]  # farther from centroid 0, cos(a,b) ~ 0.98
    cos_ab = (1 + 0.05 * 0.25) / (
        math.hypot(1, 0.05) * math.hypot(1, 0.25)
    )
    assert cos_ab > 0.97
    r = _run(spark, [[1, 0, 0], [0, 1, 0], a, b])
    assert r[2].keep is False  # closer to centroid -> removed
    assert r[3].keep is True  # outlier kept
    assert r[3].centroid_sim < r[2].centroid_sim


def test_below_threshold_pair_survives(spark):
    r = _run(spark, [[1, 0, 0], [0, 1, 0], [1, 0.2, 0], [0.2, 0, 1]])
    # cos(v2, v3) well below 0.9 even if co-clustered
    assert r[2].keep is True and r[3].keep is True


def test_cross_cluster_pair_never_compared(spark):
    """Identical vectors in DIFFERENT clusters are both kept — the
    paper's explicit trade (cluster boundary misses are accepted to
    bound the quadratic)."""
    # centroids [1,0,0] and [0.9, 0.436, 0]: v2 sits on centroid 0,
    # v3 = v2 but nudged so argmax flips to centroid 1
    r = _run(
        spark,
        [[1, 0, 0], [0.9, 0.436, 0], [1, 0.2, 0], [1, 0.28, 0]],
        threshold=0.9,
    )
    clusters = {i: r[i].cluster for i in (2, 3)}
    if clusters[2] != clusters[3]:  # geometry holds on this corpus
        assert r[2].keep is True and r[3].keep is True


def test_synth_corpus_signal(spark):
    rows = semdedup(synth_semdedup_input(spark, SF)).collect()
    removed = [r.vec_id for r in rows if not r.keep]
    assert removed, "injected near-dups must produce removals"
    # exact-direction copies tie on centroid_sim -> lower id (the
    # original) is kept, so every removed scaled-copy id is >= 100000
    scaled_removed = [v for v in removed if 100000 <= v < 200000]
    assert scaled_removed


def test_plan_shape(spark):
    """Codebook is broadcast; the pair stage is an equi-join on the
    cluster id (no CartesianProduct anywhere); zero Python stages."""
    out = semdedup(synth_semdedup_input(spark, SF))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "MapInPandas" not in plan and "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the k-row codebook fanout
