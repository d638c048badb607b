"""HITS (ops/hits): structural laws on known graphs, mass conservation,
partitioning determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_spark.ops.hits import hits


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _graph(spark, edges):
    e = spark.createDataFrame(edges, "src string, dst string")
    n = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    return n, e


def test_star_hub_vs_authorities(spark):
    # h -> {a1, a2, a3}: h is the pure hub, leaves are pure authorities
    n, e = _graph(spark, [("h", "a1"), ("h", "a2"), ("h", "a3")])
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(n, e).collect()}
    assert got["h"][0] > 0.9 and got["h"][1] == 0.0
    for a in ("a1", "a2", "a3"):
        assert got[a][0] == 0.0 and got[a][1] == pytest.approx(1 / 3, abs=1e-5)


def test_popular_authority_wins(spark):
    # both hubs point at x, only one at y -> auth(x) > auth(y)
    n, e = _graph(
        spark, [("h1", "x"), ("h2", "x"), ("h1", "y")]
    )
    got = {r["node"]: r["auth"] for r in hits(n, e).collect()}
    assert got["x"] > got["y"] > 0


def test_mass_conserved_and_deterministic(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    n, e = _graph(spark, edges)
    out = hits(n, e, iters=4)
    sums = out.agg(F.sum("hub"), F.sum("auth")).collect()[0]
    # L1-normalized, up to the per-node 1/2^20 quantization
    assert sums[0] == pytest.approx(1.0, abs=1e-4)
    assert sums[1] == pytest.approx(1.0, abs=1e-4)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, hits(n.repartition(7), e.repartition(5), iters=4).collect()))
    assert a == b


def test_link_similarity_pairs(spark):
    """Co-citation / coupling laws on a known graph + the hot-key cap."""
    from docling_spark.ops.linksim import bibliographic_coupling, cocitation

    _, e = _graph(
        spark,
        [
            ("p1", "x"), ("p1", "y"), ("p1", "z"),
            ("p2", "x"), ("p2", "y"),
            ("p3", "z"),
            ("h", "p1"), ("h", "p2"),
        ],
    )
    bc = {
        (r["page_a"], r["page_b"]): r["n_shared"]
        for r in bibliographic_coupling(e, min_shared=2).collect()
    }
    # p1,p2 share {x,y}; p3 shares only z with p1 (below min_shared)
    assert bc == {("p1", "p2"): 2}
    cc = {
        (r["page_a"], r["page_b"]): r["n_shared"]
        for r in cocitation(e, min_shared=1).collect()
    }
    # h co-cites p1,p2; p1 co-cites x/y/z pairwise
    assert cc[("p1", "p2")] == 1 and cc[("x", "y")] == 2
    # hot-key cap: with max_degree=1 every shared target (x,y,z all have
    # in-degree 2) drops from the index, so no coupling pair survives —
    # a shared endpoint that common carries no signal
    assert bibliographic_coupling(e, min_shared=1, max_degree=1).count() == 0
    # at max_degree=2 they return: (p1,p2) via {x,y}, (p1,p3) via {z}
    bc2 = {
        (r["page_a"], r["page_b"]): r["n_shared"]
        for r in bibliographic_coupling(e, min_shared=1, max_degree=2).collect()
    }
    assert bc2 == {("p1", "p2"): 2, ("p1", "p3"): 1}


def test_triangles(spark):
    """Known graph: one triangle (a,b,c) plus a dangling wedge; the
    degree cap removes triangles through hub nodes."""
    from docling_spark.ops.linksim import triangles

    _, e = _graph(
        spark,
        [
            ("a", "b"), ("b", "c"), ("c", "a"),  # triangle (direction mixed)
            ("c", "d"),                            # wedge only
        ],
    )
    got = {tuple(r) for r in triangles(e).collect()}
    assert got == {("a", "b", "c")}
    # cap: node degrees are a:2 b:2 c:3 d:1 -> max_degree=2 drops every
    # edge touching c, killing the triangle
    assert triangles(e, max_degree=2).count() == 0
