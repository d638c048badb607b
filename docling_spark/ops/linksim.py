"""Link-structure similarity: co-citation and bibliographic coupling.

The classic related-page signals over a crawl graph (Small 1973 /
Kessler 1963): two pages are *co-cited* when the same source links to
both (shared in-links), and *coupled* when they link to the same
targets (shared out-links). Both are standard candidate generators for
"related pages" and link-farm detection next to HITS (``ops/hits.py``).

Scale shape: the standard inverted-index self-join — explode is already
the edge list, so it is ONE equi-join on the shared endpoint plus a
pair-count aggregation. The quadratic danger is a hot endpoint (every
page couples through a footer link to the same homepage), handled
exactly like ops/dedup.jaccard_pairs: endpoints with degree above
``max_degree`` are dropped from the index with a broadcast anti-join
BEFORE the self-join (documented capped semantics — a shared endpoint
that common carries no similarity signal anyway, the idf intuition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bibliographic_coupling", "cocitation", "triangles"]


def _shared_endpoint_pairs(
    edges: DataFrame,
    group_col: str,
    pair_col: str,
    min_shared: int,
    max_degree: int,
) -> DataFrame:
    hot = (
        edges.groupBy(group_col)
        .agg(F.count("*").alias("__deg"))
        .filter(F.col("__deg") > max_degree)
        .select(group_col)
    )
    e = edges.join(F.broadcast(hot), group_col, "left_anti")
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
            & (F.col(f"a.{pair_col}") < F.col(f"b.{pair_col}")),
        )
        .groupBy(
            F.col(f"a.{pair_col}").alias("page_a"),
            F.col(f"b.{pair_col}").alias("page_b"),
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def triangles(
    edges: DataFrame, max_degree: int = 1000
) -> DataFrame:
    """Distinct undirected triangles (a, b, c), lexicographic a < b < c —
    the clustering-structure primitive (link-farm cliques light up as
    dense triangle neighborhoods; organic link graphs are triangle-
    sparse).

    Shape: canonicalize to undirected a < b edges, then the standard
    two-join edge-iterator — wedges (a,b)⋈(b,c) closed against (a,c).
    The quadratic hot key is a high-degree node's wedge set, handled by
    the same capped semantics as the pair ops: edges touching nodes
    with degree > ``max_degree`` are dropped first (broadcast
    anti-join), i.e. triangles among hub nodes are out of scope by
    contract."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("__deg"))
    )
    hot = deg.filter(F.col("__deg") > max_degree).select("node")
    und = und.join(
        F.broadcast(hot), und["a"] == hot["node"], "left_anti"
    ).join(F.broadcast(hot), und["b"] == hot["node"], "left_anti")
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    return (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )


def bibliographic_coupling(
    edges: DataFrame, min_shared: int = 2, max_degree: int = 1000
) -> DataFrame:
    """(page_a, page_b, n_shared): source pairs sharing >= ``min_shared``
    out-link targets (targets with in-degree > ``max_degree`` excluded —
    capped-coupling semantics)."""
    return _shared_endpoint_pairs(
        edges, group_col="dst", pair_col="src",
        min_shared=min_shared, max_degree=max_degree,
    )


def cocitation(
    edges: DataFrame, min_shared: int = 2, max_degree: int = 1000
) -> DataFrame:
    """(page_a, page_b, n_shared): target pairs co-linked by >=
    ``min_shared`` common sources (sources with out-degree >
    ``max_degree`` excluded)."""
    return _shared_endpoint_pairs(
        edges, group_col="src", pair_col="dst",
        min_shared=min_shared, max_degree=max_degree,
    )
