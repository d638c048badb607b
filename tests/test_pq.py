"""Product-quantization ANN tests: ops/pq.py (train/encode/search)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from docling_spark.ops import pq

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from docling_spark.job import tuned_session

    s = tuned_session(master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def fitted(spark, emb):
    cb = pq.fit_pq_codebooks(emb)
    codes = pq.pq_encode(emb, cb).cache()
    codes.count()
    return cb, codes


def test_codebook_shape_and_determinism(spark, emb):
    a = pq.fit_pq_codebooks(emb).collect()
    b = pq.fit_pq_codebooks(emb).collect()
    key = lambda r: (r["subspace"], r["code"])  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
    av = {key(r): r["centroid"] for r in a}
    bv = {key(r): r["centroid"] for r in b}
    assert av == bv  # bit-identical training
    assert {r["subspace"] for r in a} == set(range(8))
    assert all(len(r["centroid"]) == 8 for r in a)  # 64/8 dims


def test_codes_bounded_and_complete(fitted, emb):
    cb, codes = fitted
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_self_retrieval_and_recall_floor(spark, fitted, emb):
    cb, codes = fitted
    X = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    hits = 0
    trials = [0, 7, 42, 99, 123]
    for qid in trials:
        q = X[qid]
        top = pq.pq_search(codes, cb, list(q), k=10).collect()
        got = [r["vec_id"] for r in top]
        assert got[0] == qid  # the query's own code is its nearest code
        d = {v: ((x - q) ** 2).sum() for v, x in X.items()}
        exact = set(sorted(d, key=lambda v: (d[v], v))[:10])
        hits += len(exact & set(got))
    recall = hits / (10 * len(trials))
    # 32x-compressed codes on synthetic embeddings: chance is 0.02
    assert recall >= 0.25, recall


def test_distributed_trainer_recall_matches_or_beats_sampled(
    spark, fitted, emb
):
    """fit_pq_codebooks_distributed sees every vector (no 4096 driver
    sample); at sf0.01 it must retrieve at least as well as the sampled
    trainer, with the same schema and code bounds."""
    cb_d = pq.fit_pq_codebooks_distributed(emb)
    rows = cb_d.collect()
    assert {r["subspace"] for r in rows} == set(range(8))
    assert all(len(r["centroid"]) == 8 for r in rows)
    codes_d = pq.pq_encode(emb, cb_d).cache()
    assert codes_d.count() == emb.count()
    for r in codes_d.collect():
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])

    X = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    trials = [0, 7, 42, 99, 123]

    def recall(codes, cb):
        hits = 0
        for qid in trials:
            q = X[qid]
            got = [
                r["vec_id"]
                for r in pq.pq_search(codes, cb, list(q), k=10).collect()
            ]
            d = {v: ((x - q) ** 2).sum() for v, x in X.items()}
            exact = set(sorted(d, key=lambda v: (d[v], v))[:10])
            hits += len(exact & set(got))
        return hits / (10 * len(trials))

    cb_s, codes_s = fitted
    r_dist, r_sampled = recall(codes_d, cb_d), recall(codes_s, cb_s)
    assert r_dist >= r_sampled, (r_dist, r_sampled)
    codes_d.unpersist()


def test_distributed_trainer_assignment_stability(spark, emb):
    """Two runs of the distributed trainer produce identical code
    ASSIGNMENTS (the deterministic init + argmin tie-break make the
    trained cells stable even though float reduction order may differ in
    the last bits of the centroids)."""
    a = pq.fit_pq_codebooks_distributed(emb, iters=2)
    b = pq.fit_pq_codebooks_distributed(emb, iters=2)
    ca = {r["vec_id"]: r["codes"] for r in pq.pq_encode(emb, a).collect()}
    cbb = {r["vec_id"]: r["codes"] for r in pq.pq_encode(emb, b).collect()}
    assert ca == cbb


def test_search_is_jvm_only(spark, fitted):
    cb, _ = fitted
    # literal codes frame isolates the SEARCH plan from the encode UDF
    codes = spark.createDataFrame(
        [(i, [i % 16] * 8) for i in range(64)], "vec_id long, codes array<int>"
    )
    plan = (
        pq.pq_search(codes, cb, [0.0] * 64, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the ADC scan over codes must not cross into Python
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
