"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al., arXiv 2303.09540).

The algorithm that made embedding-space dedup tractable at web scale:
cluster the embeddings with k-means, then compare pairs ONLY inside a
cluster (the clustering bounds the quadratic all-pairs cost to
per-cluster work — the entire design point). Within a cluster, for any
pair with cosine >= tau the member FARTHER from the centroid is kept
(keeping outliers preserves diversity, per the paper §3) and the
closer one is removed.

Removal law (deterministic, engine-independent): vector ``b`` is
removed iff some ``a`` in the same cluster has ``cos(a, b) >= tau``
and (``centroid_sim(a) < centroid_sim(b)``, or the sims tie — rounded
to 4 — and ``a.vec_id < b.vec_id``). Centroids for the oracle-checked
query are the deterministic seeded codebook (first ``n_clusters``
vectors, as in ops/ann.ivf_assign); the production path passes
``cents=`` from :func:`ops.ann.fit_codebook_distributed` — the fully
cluster-side Lloyd trainer — without changing the removal law.

Scale shape: assignment is a broadcast of the (k × dim) codebook plus
one window exchange on vec_id (ops/ann.ivf_assign); the pair stage is
an equi-join on the cluster id — NEVER corpus-wide all-pairs; the
per-cluster quadratic is the knob the paper itself turns via k
(cluster count grows with corpus size so per-cluster cost stays
bounded). Nothing is driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_spark.ops.ann import _dot, _norm, ivf_assign

THRESHOLD = 0.90
N_CLUSTERS = 8


def synth_semdedup_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings plus deterministic injected near-duplicates:
    every %7==0 vector gets an exact-direction copy (scaled x1.25 —
    cosine exactly 1.0) at id+100000, every %11==3 vector a perturbed
    copy (first coordinate +0.3 — cosine ~0.95 on unit vectors) at
    id+200000. x1.25 is dyadic and +0.3 is the same double literal in
    both engines, so the injected values are bit-identical to the
    DuckDB mirror. Everything is cast to double up front."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    v = F.col("vec_id")
    scaled = emb.filter(v % 7 == 0).select(
        (v + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.25).alias("embedding"),
    )
    bumped = emb.filter(v % 11 == 3).select(
        (v + 200000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x + 0.3).otherwise(x),
        ).alias("embedding"),
    )
    return emb.unionByName(scaled).unionByName(bumped)


SEMDEDUP_CTE_SQL = """se AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.25)
  FROM embeddings WHERE vec_id % 7 = 0
  UNION ALL
  SELECT vec_id + 200000,
         list_transform(CAST(embedding AS DOUBLE[]),
                        (x, i) -> CASE WHEN i = 1 THEN x + 0.3 ELSE x END)
  FROM embeddings WHERE vec_id % 11 = 3
)"""


def semdedup(
    embeddings: DataFrame,
    n_clusters: int = N_CLUSTERS,
    threshold: float = THRESHOLD,
    codebook: str = "seeded",
    cents: "DataFrame | None" = None,
) -> DataFrame:
    """SemDeDup -> (vec_id, cluster, centroid_sim, keep).

    ``keep`` is False for every vector removed by the law above; the
    survivors of each near-dup group are the members farthest from
    their centroid (plus every vector with no >= tau neighbor).
    """
    assign = ivf_assign(embeddings, n_clusters, codebook, cents)
    side = assign.join(embeddings, "vec_id")
    a = side.select(
        F.col("centroid_id").alias("cluster"),
        F.col("vec_id").alias("a_id"),
        F.col("centroid_sim").alias("a_csim"),
        F.col("embedding").alias("a_emb"),
    )
    b = side.select(
        F.col("centroid_id").alias("cluster"),
        F.col("vec_id").alias("b_id"),
        F.col("centroid_sim").alias("b_csim"),
        F.col("embedding").alias("b_emb"),
    )
    cos = F.round(
        _dot(F.col("a_emb"), F.col("b_emb"))
        / (_norm(F.col("a_emb")) * _norm(F.col("b_emb"))),
        4,
    )
    dominates = (F.col("a_csim") < F.col("b_csim")) | (
        (F.col("a_csim") == F.col("b_csim")) & (F.col("a_id") < F.col("b_id"))
    )
    removed = (
        a.join(b, "cluster")
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(dominates)
        .filter(cos >= threshold)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("_rm", F.lit(True))
    )
    return (
        assign.join(removed, "vec_id", "left")
        .select(
            "vec_id",
            F.col("centroid_id").alias("cluster"),
            "centroid_sim",
            F.coalesce(~F.col("_rm"), F.lit(True)).alias("keep"),
        )
    )


# ------------------------------------------------------------------ oracle
def semdedup_oracle_sql(
    n_clusters: int = N_CLUSTERS,
    threshold: float = THRESHOLD,
    source: str = "se",
) -> str:
    """DuckDB mirror over the injected-near-dup corpus CTE. Rounding
    mirrors the Spark side (centroid sims and pair cosines to 4)."""
    return f"""
WITH {SEMDEDUP_CTE_SQL},
e AS (SELECT vec_id, embedding FROM {source}),
c AS (SELECT vec_id AS centroid_id, embedding AS centroid
      FROM {source} WHERE vec_id < {n_clusters}),
sims AS (
  SELECT e.vec_id, c.centroid_id,
         round(list_dot_product(e.embedding, c.centroid) /
               (sqrt(list_dot_product(e.embedding, e.embedding)) *
                sqrt(list_dot_product(c.centroid, c.centroid))), 4) AS sim
  FROM e CROSS JOIN c),
assign AS (
  SELECT vec_id, centroid_id AS cluster, sim AS centroid_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY sim DESC, centroid_id) AS rn FROM sims)
  WHERE rn = 1),
pairs AS (
  SELECT bb.vec_id AS b_id
  FROM assign aa JOIN assign bb ON aa.cluster = bb.cluster
                              AND aa.vec_id != bb.vec_id
  JOIN e ea ON ea.vec_id = aa.vec_id
  JOIN e eb ON eb.vec_id = bb.vec_id
  WHERE (aa.centroid_sim < bb.centroid_sim
         OR (aa.centroid_sim = bb.centroid_sim AND aa.vec_id < bb.vec_id))
    AND round(list_dot_product(ea.embedding, eb.embedding) /
              (sqrt(list_dot_product(ea.embedding, ea.embedding)) *
               sqrt(list_dot_product(eb.embedding, eb.embedding))), 4)
        >= {threshold}),
removed AS (SELECT DISTINCT b_id FROM pairs)
SELECT a.vec_id, a.cluster, a.centroid_sim,
       r.b_id IS NULL AS keep
FROM assign a LEFT JOIN removed r ON a.vec_id = r.b_id"""
