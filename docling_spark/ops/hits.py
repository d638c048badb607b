"""HITS hubs & authorities over a crawl link graph (Kleinberg 1999).

The companion centrality to PageRank (``ops/graph.py``): authorities
are pages many good hubs point at; hubs are pages that point at many
good authorities. On a web corpus the authority score is the classic
"canonical page for this topic" prior, and hub score flags link farms
and directories.

Engine-exact trajectory (the ops/qclassifier.py idiom): after every
L1 normalization the scores are quantized to 1/2^20. Quantized (dyadic)
values within double range sum EXACTLY in any order, so the per-node
aggregations are partitioning-independent, the L1 sums are exact, the
normalizing division is one exactly-rounded IEEE op, and the whole
``iters``-round trajectory — not just a fixpoint — is reproducible
bit-for-bit by the DuckDB oracle's unrolled CTEs.

Edge-reuse posture (the PageRank lesson, PLANS §20): the authority
update JOINS edges on src (to attach each source's hub score) and the
hub update joins on dst, so the edge list is persisted TWICE,
pre-partitioned by each join key — two edge exchanges total for the
whole run; every iteration then shuffles only the slim (node, score)
frames (the group-by side of each update). Per-iteration eager
localCheckpoint caps the plan (the measured 3^iters blowup lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hits", "hits_oracle_sql"]

QUANT = 1 << 20


def _q(col):
    return F.round(col * QUANT, 0) / QUANT


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 4,
) -> DataFrame:
    """(node, hub, auth) after ``iters`` full HITS rounds (authority
    update then hub update, L1-normalized and dyadically quantized after
    each update). ``nodes`` must carry a ``node`` column covering every
    vertex; ``edges`` (src, dst), assumed distinct."""
    spark = edges.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e_by_src = edges.repartition(width, "src").persist()
    e_by_dst = edges.repartition(width, "dst").persist()
    n_row = nodes.select(F.count("*").alias("__n"))
    # start uniform: 1/n is not dyadic for general n, so quantize the
    # seed too — the oracle does the same
    scores = nodes.crossJoin(F.broadcast(n_row)).select(
        "node",
        _q(F.lit(1.0) / F.col("__n")).alias("hub"),
        _q(F.lit(1.0) / F.col("__n")).alias("auth"),
    )

    def _normalize(df: DataFrame, col: str) -> DataFrame:
        total = df.agg(F.sum(col).alias("__t"))  # exact: dyadic inputs
        return df.crossJoin(F.broadcast(total)).select(
            "node",
            *[c for c in df.columns if c not in ("node", col)],
            F.when(F.col("__t") > 0, _q(F.col(col) / F.col("__t")))
            .otherwise(F.lit(0.0))
            .alias(col),
        )

    for _ in range(iters):
        # authority update: a(v) = Σ_{u→v} h(u) — keyed on dst
        a_new = (
            scores.select("node", "hub")
            .join(e_by_src, scores["node"] == e_by_src["src"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))  # exact dyadic sum
            .withColumnRenamed("dst", "node")
        )
        scores = (
            scores.select("node", "hub")
            .join(a_new, "node", "left")
            .select(
                "node",
                "hub",
                F.coalesce("auth", F.lit(0.0)).alias("auth"),
            )
        )
        scores = _normalize(scores, "auth")
        # hub update: h(u) = Σ_{u→v} a(v) — keyed on src
        h_new = (
            scores.select("node", "auth")
            .join(e_by_dst, scores["node"] == e_by_dst["dst"])
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
            .withColumnRenamed("src", "node")
        )
        scores = (
            scores.select("node", "auth")
            .join(h_new, "node", "left")
            .select(
                "node",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                "auth",
            )
        )
        scores = _normalize(scores, "hub")
        scores = scores.localCheckpoint(eager=True)
    e_by_src.unpersist()
    e_by_dst.unpersist()
    return scores.select("node", "hub", "auth")


def hits_oracle_sql(
    nodes_cte: str, edges_cte: str, iters: int = 4
) -> str:
    """DuckDB mirror: the same trajectory unrolled as CTEs. Expects
    ``nodes_cte`` to define ``hits_nodes(node)`` and ``edges_cte`` to
    define ``hits_edges(src, dst)`` (distinct; mark both MATERIALIZED —
    every round references them, and the score chain re-references each
    step twice, so inlined CTEs re-evaluate exponentially)."""
    q = f"round(({{x}}) * {QUANT}) / {QUANT}"
    parts = [
        p for p in (nodes_cte.strip(), edges_cte.strip()) if p
    ] + [
        f"""s0 AS MATERIALIZED (
            SELECT node,
                   {q.format(x='1.0 / (SELECT count(*) FROM hits_nodes)')} AS hub,
                   {q.format(x='1.0 / (SELECT count(*) FROM hits_nodes)')} AS auth
            FROM hits_nodes
        )""",
    ]
    prev = "s0"
    for i in range(iters):
        a_raw = f"a{i}_raw"
        a_n = f"a{i}_n"
        h_raw = f"h{i}_raw"
        cur = f"s{i + 1}"
        parts.append(
            f"""{a_raw} AS MATERIALIZED (
            SELECT s.node, s.hub,
                   coalesce(x.auth, 0.0) AS auth
            FROM {prev} s LEFT JOIN (
                SELECT e.dst AS node, sum(p.hub) AS auth
                FROM hits_edges e JOIN {prev} p ON p.node = e.src
                GROUP BY e.dst
            ) x USING (node)
        )"""
        )
        parts.append(
            f"""{a_n} AS MATERIALIZED (
            SELECT node, hub,
                   CASE WHEN t > 0 THEN {q.format(x='auth / t')}
                        ELSE 0.0 END AS auth
            FROM {a_raw}, (SELECT sum(auth) AS t FROM {a_raw})
        )"""
        )
        parts.append(
            f"""{h_raw} AS MATERIALIZED (
            SELECT s.node,
                   coalesce(x.hub, 0.0) AS hub,
                   s.auth
            FROM {a_n} s LEFT JOIN (
                SELECT e.src AS node, sum(p.auth) AS hub
                FROM hits_edges e JOIN {a_n} p ON p.node = e.dst
                GROUP BY e.src
            ) x USING (node)
        )"""
        )
        parts.append(
            f"""{cur} AS MATERIALIZED (
            SELECT node,
                   CASE WHEN t > 0 THEN {q.format(x='hub / t')}
                        ELSE 0.0 END AS hub,
                   auth
            FROM {h_raw}, (SELECT sum(hub) AS t FROM {h_raw})
        )"""
        )
        prev = cur
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, hub, auth FROM {prev}"
    )
