"""Link-graph PageRank tests: ops/graph.py."""

import pytest
from pyspark.sql import functions as F

from docling_spark.ops import graph


@pytest.fixture(scope="module")
def spark():
    from docling_spark.job import tuned_session

    s = tuned_session(master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _pr(spark, edges, nodes, iters=20):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    return {r["node"]: r["rank"] for r in graph.pagerank(n, e, iters=iters).collect()}


def test_rank_mass_conserved_and_sums_to_one(spark):
    docs = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    nodes = docs.select(F.col("doc_id").alias("node"))
    out = graph.pagerank(nodes, graph.synth_links(docs), iters=10).collect()
    assert len(out) == 60
    assert abs(sum(r["rank"] for r in out) - 1.0) < 1e-4


def test_star_center_dominates(spark):
    # everyone links to node 0
    ranks = _pr(spark, [(i, 0) for i in range(1, 8)], range(8))
    assert ranks[0] == max(ranks.values())
    leaves = {v for k, v in ranks.items() if k != 0}
    assert len(leaves) == 1  # symmetry: all leaves equal


def test_cycle_is_uniform(spark):
    n = 6
    ranks = _pr(spark, [(i, (i + 1) % n) for i in range(n)], range(n))
    assert max(ranks.values()) - min(ranks.values()) < 1e-9


def test_dangling_mass_redistributed(spark):
    # 0 -> 1, node 1 dangles; mass must not leak (sum stays 1)
    ranks = _pr(spark, [(0, 1)], range(3))
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    assert ranks[1] > ranks[0]  # 1 receives 0's vote


def test_edge_layout_reused_across_iterations(spark):
    """The per-iteration rank⋈edge join must reuse the persisted
    src-partitioned edge layout: one iteration's contribution plan reads
    the edges from InMemoryTableScan with NO fresh exchange on the edge
    side — its only exchanges are the slim ranks shuffle and the per-dst
    partial agg. (iters edge shuffles → 1, VERDICT r4 #4.)"""
    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    edges = graph.synth_links(docs)
    deg, edges_deg = graph._prepare_edges(edges, 4)
    try:
        edges_deg.count()  # materialize the cached layout
        ranks = docs.select(
            F.col("doc_id").alias("node"), F.lit(1.0 / 200).alias("rank")
        )
        contribs = (
            ranks.join(edges_deg, ranks["node"] == edges_deg["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__contrib"))
        )
        # forbid the tiny-test-scale broadcast so the plan shows the
        # at-scale join strategy (SMJ) the reuse is designed for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            contribs.collect()
            plan = contribs._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        # the executed plan prints the cached lineage under
        # InMemoryRelation — only the portion ABOVE the cache is what this
        # iteration actually runs
        live = plan.split("InMemoryRelation")[0]
        assert "InMemoryTableScan" in live
        import re

        exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", live)
        # ranks side (node) + partial-agg (dst); the edge side contributes
        # no exchange — its cached partitioning satisfies the join
        assert sorted(set(exchanges)) == ["dst", "node"], exchanges
    finally:
        edges_deg.unpersist()
        deg.unpersist()


def test_synth_links_law(spark):
    docs = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    rows = {(r["src"], r["dst"]) for r in graph.synth_links(docs).collect()}
    for s_, d_ in rows:
        assert 0 <= d_ < 50 and s_ != d_
    # doc 3 (3 % 4 + 1 = 4 fanout): dsts (3*7 + 13j) % 50
    exp = {(3, (21 + 13 * j) % 50) for j in range(1, 5) if (21 + 13 * j) % 50 != 3}
    assert {p for p in rows if p[0] == 3} == exp
