"""IVF k-means codebook (ops/ann.fit_codebook): determinism + recall.

The sampled-Lloyd fit has no oracle (iterative, not SQL-expressible), so
these tests pin what the oracle can't: bit-for-bit determinism across
fits, convergence of the codebook, and that the k-means cells beat the
seeded first-N baseline on mean recall against exact brute-force top-k.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops import ann

# sf0.01 (500 vectors): big enough that cell quality matters — at sf0.001
# the cells are so small that recall is noise either way
SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    yield (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


def test_codebook_deterministic(emb):
    a = sorted(map(tuple, (r.centroid for r in ann.fit_codebook(emb, 8).collect())))
    b = sorted(map(tuple, (r.centroid for r in ann.fit_codebook(emb, 8).collect())))
    assert a == b


def test_codebook_unit_norm_and_count(emb):
    rows = ann.fit_codebook(emb, 8).collect()
    assert len(rows) == 8
    for r in rows:
        norm = sum(v * v for v in r.centroid) ** 0.5
        assert abs(norm - 1.0) < 1e-9


def test_assignment_covers_all_vectors(emb):
    n = emb.count()
    assign = ann.ivf_assign(emb, n_centroids=8, codebook="kmeans")
    assert assign.count() == n
    assert assign.select("vec_id").distinct().count() == n


def test_kmeans_recall_beats_seeded(emb):
    queries = [3, 57, 111, 230, 404]
    k = 10

    def mean_recall(codebook: str) -> float:
        tot = 0.0
        for q in queries:
            exact = {r.vec_id for r in ann.cosine_topk(emb, query_id=q, k=k).collect()}
            got = {
                r.vec_id
                for r in ann.ivf_search(
                    emb, query_id=q, k=k, n_centroids=16, nprobe=4,
                    codebook=codebook,
                ).collect()
            }
            tot += len(got & exact) / k
        return tot / len(queries)

    km, seeded = mean_recall("kmeans"), mean_recall("seeded")
    assert km >= seeded, (km, seeded)
    assert km >= 0.5  # nprobe=4 of 16 cells must still find most neighbors


def test_distributed_lloyd_shape_and_norm(emb):
    rows = ann.fit_codebook_distributed(emb, 8, iters=4).collect()
    assert len(rows) == 8
    for r in rows:
        norm = sum(v * v for v in r.centroid) ** 0.5
        assert abs(norm - 1.0) < 1e-9


def test_distributed_lloyd_recall_matches_sampled(emb):
    """The distributed trainer (no driver-sample cap) must be at least as
    good as the sampled trainer on nprobe recall — it sees ALL points."""
    queries = [3, 57, 111, 230, 404]
    k = 10

    def mean_recall(codebook: str) -> float:
        tot = 0.0
        for q in queries:
            exact = {r.vec_id for r in ann.cosine_topk(emb, query_id=q, k=k).collect()}
            got = {
                r.vec_id
                for r in ann.ivf_search(
                    emb, query_id=q, k=k, n_centroids=16, nprobe=4,
                    codebook=codebook,
                ).collect()
            }
            tot += len(got & exact) / k
        return tot / len(queries)

    dist, seeded = mean_recall("kmeans_dist"), mean_recall("seeded")
    assert dist >= seeded, (dist, seeded)
    assert dist >= 0.5


def test_distributed_lloyd_stable_assignments(emb):
    """Bit equality is not guaranteed under distributed float reduction,
    but cell ASSIGNMENTS must be stable across two fits on this data."""
    c1 = ann.fit_codebook_distributed(emb, 8, iters=4)
    c2 = ann.fit_codebook_distributed(emb, 8, iters=4)
    a1 = {r.vec_id: r.centroid_id for r in ann.ivf_assign(emb, 8, cents=c1).collect()}
    a2 = {r.vec_id: r.centroid_id for r in ann.ivf_assign(emb, 8, cents=c2).collect()}
    assert a1 == a2
