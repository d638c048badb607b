"""Connected components over a duplicate-pair graph (cluster resolution).

The missing last stage of a MinHash/SimHash dedup pipeline: LSH banding
produces candidate *pairs*; keeping one document per duplicate *cluster*
needs the transitive closure of those pairs. This implements the
large-star / small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC 2014) as pure DataFrame ops:

- each round is two groupBy/join passes (large-star then small-star),
  no driver-side graph state — the edge list never leaves the cluster;
- converges in O(log n) rounds on any graph (duplicate clusters are
  near-cliques and converge in 1-2), each round's shuffle is bounded by
  the current edge count, which is non-increasing after round one;
- ``localCheckpoint`` per round cuts the lineage so round k's plan does
  not replay rounds 1..k-1 (the standard iterative-algorithm hygiene —
  same pattern GraphX/GraphFrames uses internally);
- convergence is detected from a per-round (count, checksum) aggregate —
  one tiny driver-side scalar per round, not a collect of the edges.

Reference parity note: the reference (docling) has no cluster stage —
dedup families here go beyond it per the brief's LLM-data-pipeline
contract; the algorithm itself is from the public paper above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    # no distinct: duplicate edges do not change any min-aggregate, and the
    # end-of-round distinct in _small_star bounds growth (one exchange saved
    # per round — per-round stage count is the latency floor of iterative
    # Spark jobs)
    return (
        edges.select("u", "v")
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u.

    Symmetrizes internally (the paper's map step emits both directions),
    so it accepts the asymmetric (node, root) output of a prior small-star.
    """
    sym = _symmetrize(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient (max, min); for each u: m = min(N(u) ∪ {u});
    emit (v, m) for v in N(u) ∪ {u} \\ {m}."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = oriented.join(mins, "u").select(
        F.col("v").alias("n"), F.col("m"), F.col("u")
    )
    self_edges = mins.select(F.col("u").alias("n"), "m", "u")
    return (
        nbrs.union(self_edges)
        .filter(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("c"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("s"),
    ).first()
    return int(row["c"]), int(row["s"])


def connected_components(
    edges: DataFrame, max_iter: int = 24, checkpoint: bool = True
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id reachable. Columns in: ``u``, ``v``.

    ``max_iter`` bounds the driver loop (2·log2(n) rounds suffice per the
    paper; 24 covers n up to ~4 × 10^3 chained — real dup clusters
    converge in 1-3 rounds). Raises if not converged, rather than
    silently returning partial components.
    """
    base = edges.select("u", "v")
    if checkpoint:
        # cut the UPSTREAM plan once before iterating: a round references
        # its edge frame several times (symmetrize, min-aggregate, join),
        # and node extraction adds two more — without this cut an
        # expensive producer plan (LSH banding over a corpus) re-executes
        # per reference. Lazy: the first round's checksum action
        # materializes it, so no extra job
        base = base.localCheckpoint(eager=False)
    nodes = (
        base.select(F.col("u").alias("node"))
        .union(base.select(F.col("v").alias("node")))
        .distinct()
    )
    cur = base
    prev_sig: tuple[int, int] | None = None
    for _ in range(max_iter):
        cur = _small_star(_large_star(cur))
        if checkpoint:
            # lazy: the checksum action below materializes the checkpoint,
            # so each round is ONE Spark job with the lineage still cut
            cur = cur.localCheckpoint(eager=False)
        sig = _checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    # converged: every edge is (node, root). Roots map to themselves.
    assign = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        nodes.join(assign, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def dedup_assignments(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Cluster-resolve duplicate pairs into a keep/drop decision per doc.

    ``docs``: any frame with ``doc_id``; ``pairs``: (doc_a, doc_b) from
    lsh_candidate_pairs / simhash_candidate_pairs. Returns
    (doc_id, component, is_canonical) for EVERY doc — singletons keep
    their own id and are canonical. Keep-list = filter(is_canonical).
    """
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    comp = connected_components(edges).withColumnRenamed("node", "doc_id")
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
        )
        .withColumn("is_canonical", F.col("component") == F.col("doc_id"))
    )


def dedup_report(assignments: DataFrame) -> DataFrame:
    """Cluster-size histogram of a dedup assignment — the audit row a
    100 TB dedup run ships next to its keep-list.

    Input: (doc_id, component, ...) from :func:`dedup_assignments`.
    Output per distinct cluster size: n_clusters, n_docs they cover,
    and n_removable = docs minus canonicals — summing n_removable over
    the report IS the dedup's total row reduction, and a fat tail of
    giant clusters is the signature of template spam / mirror farms.

    Scale shape: two map-side-combining aggregations (component →
    size, size → histogram); the second input is one row per cluster
    and the output is one row per DISTINCT size (≤ a few hundred at
    any corpus scale). Zero Python.
    """
    sizes = assignments.groupBy("component").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters")).alias(
                "n_removable"
            ),
        )
    )


def canonical_by(
    assignments: DataFrame, scores: DataFrame, score_col: str = "score"
) -> DataFrame:
    """Policy-based canonical selection: keep the BEST-scoring copy of
    each duplicate cluster instead of the smallest id.

    ``dedup_assignments`` picks min(doc_id) — deterministic but
    arbitrary; production pipelines (RefinedWeb et al.) keep the copy
    with the highest quality signal (LM bucket, readability, length).
    Given (doc_id, component) and a (doc_id, score) frame, the winner
    per component is the max score with doc_id as the deterministic
    tie-break.

    Output: (doc_id, component, score, is_canonical). Scale shape:
    one join on doc_id + one component-keyed window whose partitions
    are cluster-sized (near-cliques — bounded), with rank pushdown
    eligible. Missing scores rank last (NULLs sort after any value in
    the descending order).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("component").orderBy(
        F.col("score").desc_nulls_last(), F.col("doc_id").asc()
    )
    return (
        assignments.select("doc_id", "component")
        .join(scores.select("doc_id", F.col(score_col).alias("score")),
              "doc_id", "left")
        .withColumn("_rn", F.row_number().over(w))
        .select(
            "doc_id",
            "component",
            "score",
            (F.col("_rn") == 1).alias("is_canonical"),
        )
    )
