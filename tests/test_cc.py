"""Connected-components (large-star/small-star) unit tests: ops/cc.py."""

import pytest
from pyspark.sql import functions as F

from docling_spark.ops import cc, dedup


@pytest.fixture(scope="module")
def spark():
    from docling_spark.job import tuned_session

    s = tuned_session(master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "u long, v long")
    rows = cc.connected_components(edges).collect()
    return {r["node"]: r["component"] for r in rows}


def test_chain_collapses_to_min(spark):
    # path 1-2-3-4-5: diameter 4 forces multiple star rounds
    out = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_long_chain_logarithmic_rounds(spark):
    out = _cc(spark, [(i, i + 1) for i in range(100, 140)])
    assert set(out.values()) == {100}
    assert len(out) == 41


def test_disjoint_components(spark):
    out = _cc(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)])
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_clique_one_round(spark):
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    out = _cc(spark, pairs)
    assert set(out.values()) == {0}


def test_self_loop_is_singleton(spark):
    out = _cc(spark, [(7, 7), (1, 2)])
    assert out[7] == 7 and out[1] == 1 and out[2] == 1


def test_dedup_assignments_keeps_one_per_cluster(spark):
    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 7), (1, 2)], "doc_a long, doc_b long"
    )
    rows = cc.dedup_assignments(docs, pairs).collect()
    comp = {r["doc_id"]: (r["component"], r["is_canonical"]) for r in rows}
    assert len(comp) == 10
    assert comp[0] == (0, True) and comp[3] == (0, False) and comp[7] == (0, False)
    assert comp[1] == (1, True) and comp[2] == (1, False)
    for single in (4, 5, 6, 8, 9):
        assert comp[single] == (single, True)
    keep = [d for d, (_, can) in comp.items() if can]
    assert sorted(keep) == [0, 1, 4, 5, 6, 8, 9]


def test_max_iter_guard_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "u long, v long"
    )
    with pytest.raises(RuntimeError, match="no convergence"):
        cc.connected_components(edges, max_iter=1)


def test_lsh_pairs_compose(spark):
    """End-to-end: duplicated docs → LSH pairs → cluster keep-list."""
    base = [(i, f"the quick brown fox jumps over dog number {i} " * 6) for i in range(6)]
    dups = [(i + 100, t) for i, t in base[:3]]
    docs = spark.createDataFrame(base + dups, "doc_id long, text string")
    pairs = dedup.lsh_candidate_pairs(docs, k=8, seeds=[1, 2, 3, 4], band_size=2)
    out = cc.dedup_assignments(docs, pairs)
    kept = out.filter(F.col("is_canonical")).count()
    # exact copies must collapse: canonical count < total docs
    assert kept < 9
    # every exact copy maps to its original's component
    rows = {r["doc_id"]: r["component"] for r in out.collect()}
    for i in range(3):
        assert rows[i + 100] == rows[i]


def test_dedup_report_histogram(spark):
    from docling_spark.ops.cc import dedup_assignments, dedup_report

    # components: {1,2,3} (path), {10,11}, singletons 20 and 21
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 21)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    rep = {
        r["cluster_size"]: r
        for r in dedup_report(dedup_assignments(docs, pairs)).collect()
    }
    assert rep[1]["n_clusters"] == 2 and rep[1]["n_removable"] == 0
    assert rep[2]["n_clusters"] == 1 and rep[2]["n_removable"] == 1
    assert rep[3]["n_clusters"] == 1 and rep[3]["n_removable"] == 2
    assert sum(r["n_docs"] for r in rep.values()) == 7
    # total row reduction == docs - components
    assert sum(r["n_removable"] for r in rep.values()) == 3


def test_canonical_by_policy(spark):
    from docling_spark.ops.cc import canonical_by, dedup_assignments

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 9)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0)], "doc_id long, q double"
    )  # doc 9: no score row at all
    asn = dedup_assignments(docs, pairs)
    got = {
        r["doc_id"]: r
        for r in canonical_by(asn, scores, score_col="q").collect()
    }
    # cluster {1,2,3}: max score 9.0 tie between 2 and 3 -> doc 2 wins
    assert got[2]["is_canonical"] and not got[1]["is_canonical"]
    assert not got[3]["is_canonical"]
    # singleton with a NULL score is still its own canonical
    assert got[9]["is_canonical"] and got[9]["score"] is None
    assert sum(r["is_canonical"] for r in got.values()) == 2
