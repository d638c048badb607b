"""Link-graph analytics: PageRank over a crawl's hyperlink edges.

Web-scale curation uses link-graph signals (PageRank/harmonic centrality
feed quality priors — e.g. Common Crawl publishes exactly these ranks).
This implements power-iteration PageRank Spark-first:

- per iteration: ranks ⋈ edges (shuffle on src) → groupBy(dst) partial-
  agg of contributions → node-frame left join; the dangling-node mass is
  a 1-row aggregate crossJoined back (never a driver collect);
- each iteration references the previous ranks THREE times (contribs,
  dangling mass, carry-through), so composing lazily would triple the
  logical plan per iteration — 3^iters subtree copies. Iterations are
  therefore materialized with an eager localCheckpoint by default
  (``checkpoint_every=1``, the ops/cc.py hygiene); raise it only for
  tiny graphs where replanning is cheaper than materialization;
- damping + dangling handling follow the canonical formulation:
  rank = (1-d)/N + d·(Σ in-contribs + dangling_mass/N).

Determinism: float reductions agree across engines to ~1e-14 at test
scale; outputs round to 6 decimals, and the DuckDB oracle UNROLLS the
same iterations as chained CTEs (recursive CTEs cannot aggregate), so
the driver gate value-checks every rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synth_links(docs: DataFrame) -> DataFrame:
    """Deterministic hyperlink law over the documents table:
    doc i links to (i*7 + 13*j) mod N for j = 1..(i % 4 + 1), self-links
    dropped. N is the table count, so the law scales with SF and is
    mirrored exactly in the oracle SQL."""
    n = docs.select(F.count("*").alias("n"))
    fanout = F.sequence(F.lit(1), (F.col("doc_id") % 4 + 1).cast("int"))
    return (
        docs.select("doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.transform(
                    fanout,
                    lambda j: (F.col("doc_id") * 7 + 13 * j) % F.col("n"),
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _prepare_edges(edges: DataFrame, width: int):
    """One-time edge layout for the power loop: fold out-degree into the
    edge list and persist BOTH frames hash-partitioned on ``src`` so each
    iteration's join reuses the exchange instead of re-shuffling the edge
    list (``iters`` full edge shuffles → 1)."""
    deg = (
        edges.groupBy("src")
        .agg(F.count("*").alias("__deg"))
        .repartition(width, "src")
        .persist()
    )
    edges_deg = (
        edges.join(deg, "src")
        .select("src", "dst", "__deg")
        .repartition(width, "src")
        .persist()
    )
    return deg, edges_deg


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 10,
    d: float = 0.85,
    checkpoint_every: int | None = 1,
) -> DataFrame:
    """(node, rank) after ``iters`` power iterations. ``nodes`` must have
    a ``node`` column covering every vertex; ``edges`` (src, dst).

    Edge-reuse posture (the dominant cost at 10^12 edges): the out-degree
    join is folded into the edge list ONCE and the result is persisted
    hash-partitioned on ``src`` at the session's shuffle width, so every
    iteration's rank⋈edge join reuses that layout — each of the ``iters``
    rounds shuffles only the slim (node, rank) frame plus the per-dst
    contribution partial-agg, never the edge list. One edge exchange
    total, not ``iters`` (plan-pinned in tests/test_graph.py)."""
    spark = edges.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_row = nodes.select(F.count("*").alias("__n"))
    deg, edges_deg = _prepare_edges(edges, width)
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for it in range(iters):
        contribs = (
            ranks.join(edges_deg, ranks["node"] == edges_deg["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__contrib"))
            .withColumnRenamed("dst", "node")
        )
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__mass"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .crossJoin(F.broadcast(n_row))
            .select(
                "node",
                (
                    (1.0 - d) / F.col("__n")
                    + d
                    * (
                        F.coalesce("__contrib", F.lit(0.0))
                        + F.col("__mass") / F.col("__n")
                    )
                ).alias("rank"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("node", F.round("rank", 6).alias("rank"))
    if checkpoint_every and iters % checkpoint_every == 0:
        # the eager checkpoint after the last iteration already
        # materialized the ranks, so the cached edge layout has served
        # its iters joins and can go; without a trailing checkpoint the
        # lazy plan still references it — leave it to executor eviction
        edges_deg.unpersist()
        deg.unpersist()
    return out
