"""Product quantization (IVF-PQ's PQ half): compressed ANN for 10^9+ vectors.

At embedding-corpus scale the limiting resource is MEMORY BANDWIDTH, not
compute: a 10^9 × 64-dim float32 table is 256 GB; its PQ codes at
m=8 subspaces × 16 centroids are 8 GB (32× smaller) and the asymmetric-
distance search touches ONLY the codes. This is the standard Jégou et
al. (TPAMI 2011) design, composed Spark-first:

- training: deterministic Lloyd per subspace yielding a
  (subspace, code, centroid) frame — either the bounded driver-sample
  trainer (``fit_pq_codebooks``, exactly oracle-reproducible) or the
  FULLY DISTRIBUTED one (``fit_pq_codebooks_distributed``: all m
  subspaces in one Arrow partial-sum pass per iteration, the
  ops/ann.fit_codebook_distributed shape — the production path for
  10^9+ vectors where a 4096-row sample underfits);
- encoding: one vectorized pandas UDF over the corpus — per subspace,
  argmin L2 to the m×k broadcast centroids → `array<int>` codes
  (k ≤ 256 ⇒ one byte per subspace in storage);
- search: the query is turned into an m×k LUT of subspace distances on
  the driver and inlined as a LITERAL nested array — scoring is a pure
  JVM `aggregate` over the codes column (zero Python in the hot scan),
  then TakeOrdered for top-k. Scan cost per vector: m array lookups.

Training is iterative Lloyd, hence rows-only at the driver gate (same
adjudication as ivf_kmeans_search); determinism, code bounds, recall
floor vs exact L2, and the 32x compression arithmetic are pinned in
tests/test_pq.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 8,
    sample_cap: int = 4096,
) -> DataFrame:
    """(subspace, code, centroid) via deterministic sampled Lloyd per
    subspace (L2 metric). Driver-sample trainer (bounded stride sample,
    exactly oracle-reproducible); for production-scale corpora use
    :func:`fit_pq_codebooks_distributed`, which runs Lloyd fully on the
    cluster and sees every vector — the two emit the same schema, so
    ``pq_encode``/``pq_search`` accept either."""
    import numpy as np

    n = embeddings.count()
    stride = max(1, -(-n // sample_cap))
    sample = (
        embeddings.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    X = np.array([r.embedding for r in sample], dtype=np.float64)
    dim = X.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    rows = []
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        kk = min(k, len(Xs))
        C = Xs[:: max(1, len(Xs) // kk)][:kk].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(kk):
                members = Xs[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        for j in range(kk):
            rows.append((s, j, [float(v) for v in C[j]]))
    return embeddings.sparkSession.createDataFrame(
        rows, schema="subspace int, code int, centroid array<double>"
    )


def fit_pq_codebooks_distributed(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 8,
) -> DataFrame:
    """(subspace, code, centroid) via FULLY DISTRIBUTED Lloyd — the
    production path behind the ``fit_pq_codebooks`` driver-sample seam,
    reusing the ``ann.fit_codebook_distributed`` partial-sum shape
    (one Arrow UDF pass per iteration) but running ALL m subspaces in
    that single pass with a plain-L2 metric:

    - init: the k vectors with the smallest md5(vec_id) (deterministic
      uniform pseudo-random seeding, one TakeOrdered, no RNG state),
      sliced per subspace — so every subspace starts from the same
      bounded k×dim driver state;
    - assign+partial: per Arrow batch, per subspace, argmin-L2 against
      the broadcast-by-closure m×k×sub centroids → emit (subspace,
      code, vsum, cnt) partial sums — at most m×k rows per batch,
      never a per-vector shuffle;
    - update: posexplode the partial vectors → groupBy (subspace, code,
      pos) sum → collect m×k×sub scalars → divide by counts on the
      driver. Per iteration the cluster shuffles m×k×sub×batches slim
      rows — independent of corpus size; the driver only ever holds the
      m×k×sub codebook. Empty cells keep their previous centroid.

    At 10^9+ vectors the 4096-row driver sample underfits 48-dim
    subspace codebooks; this trainer sees every vector. Deterministic up
    to floating-point reduction order (the standard distributed-k-means
    caveat); recall-vs-sampled-trainer and assignment stability are
    pinned in tests/test_pq.py."""
    import numpy as np
    from typing import Iterator

    import pandas as pd

    seed_rows = (
        embeddings.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .select("embedding")
        .collect()
    )
    X0 = np.array([r.embedding for r in seed_rows], dtype=np.float64)
    dim = X0.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    kk = min(k, len(X0))
    # C[s] : (kk, sub) — subspace s's codebook
    C = [X0[:kk, s * sub : (s + 1) * sub].copy() for s in range(m)]
    for _ in range(iters):
        C_cur = [c.copy() for c in C]

        def partials(batches: "Iterator[pd.DataFrame]"):
            for b in batches:
                X = np.array(list(b["embedding"]), dtype=np.float64)
                rows = []
                for s in range(m):
                    Xs = X[:, s * sub : (s + 1) * sub]
                    d2 = ((Xs[:, None, :] - C_cur[s][None, :, :]) ** 2).sum(
                        axis=2
                    )
                    assign = d2.argmin(axis=1)
                    for j in range(kk):
                        members = Xs[assign == j]
                        if len(members):
                            rows.append(
                                (
                                    s,
                                    int(j),
                                    [float(v) for v in members.sum(axis=0)],
                                    int(len(members)),
                                )
                            )
                yield pd.DataFrame(
                    rows, columns=["subspace", "code", "vsum", "cnt"]
                )

        stats = (
            embeddings.select("embedding")
            .mapInPandas(
                partials,
                schema="subspace int, code int, vsum array<double>, cnt long",
            )
            .groupBy("subspace", "code")
            .agg(
                # element-wise vector sum of the per-batch partials: zip the
                # running accumulator with each vsum (slim k-length arrays)
                F.aggregate(
                    F.collect_list("vsum"),
                    F.array_repeat(F.lit(0.0), sub),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("vsum"),
                F.sum("cnt").alias("cnt"),
            )
            .collect()
        )
        newC = [c.copy() for c in C]
        for r in stats:
            if r["cnt"]:
                newC[r["subspace"]][r["code"]] = (
                    np.asarray(r["vsum"], dtype=np.float64) / r["cnt"]
                )
        C = newC
    rows = [
        (s, j, [float(v) for v in C[s][j]])
        for s in range(m)
        for j in range(kk)
    ]
    return embeddings.sparkSession.createDataFrame(
        rows, schema="subspace int, code int, centroid array<double>"
    )


def _codebook_array(codebooks: DataFrame):
    """Driver-side m×k×sub numpy view of the codebook frame (bounded)."""
    import numpy as np

    rows = codebooks.orderBy("subspace", "code").collect()
    m = 1 + max(r["subspace"] for r in rows)
    by_s = [[] for _ in range(m)]
    for r in rows:
        by_s[r["subspace"]].append(r["centroid"])
    return [np.array(c, dtype=np.float64) for c in by_s]


def pq_encode(embeddings: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(vec_id, codes array<int>): per-subspace argmin-L2 centroid id.
    One Arrow-batched pandas UDF; the codebook broadcasts by closure."""
    import numpy as np
    import pandas as pd
    from typing import Iterator

    C = _codebook_array(codebooks)
    m = len(C)

    def run(batches: "Iterator[pd.DataFrame]"):
        for b in batches:
            X = np.array(list(b["embedding"]), dtype=np.float64)
            sub = X.shape[1] // m
            codes = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * sub : (s + 1) * sub]
                d2 = ((Xs[:, None, :] - C[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": b["vec_id"], "codes": [list(map(int, c)) for c in codes]}
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        run, schema="vec_id long, codes array<int>"
    )


def pq_search(
    codes: DataFrame,
    codebooks: DataFrame,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k: LUT[s][c] = ||query_s - C[s][c]||² is
    built on the driver and inlined as a nested literal array; per-vector
    distance is a pure-JVM `aggregate` over the codes (m lookups), then
    TakeOrdered. The float corpus is never read."""
    import numpy as np

    C = _codebook_array(codebooks)
    m = len(C)
    q = np.asarray(query, dtype=np.float64)
    sub = len(q) // m
    lut = [
        [float(((q[s * sub : (s + 1) * sub] - c) ** 2).sum()) for c in C[s]]
        for s in range(m)
    ]
    lut_col = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(lut_col, s + 1), F.element_at("codes", s + 1) + 1
        ),
    )
    return (
        codes.select("vec_id", F.round(dist, 6).alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(k)
    )
