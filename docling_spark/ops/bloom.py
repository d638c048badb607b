"""Bloom-filter incremental dedup: test a new crawl against history
WITHOUT scanning it (Dolma's paragraph dedup uses exactly this shape).

At 100 TB you cannot anti-join every new crawl against every previous
crawl. Instead, each historical ingest folds its content hashes into a
compact Bloom filter (m bits, k hashes); deduplicating a new batch is
then: compute each candidate's k bit positions in-row, check membership
against the broadcast filter, and flag `maybe_dup` (Bloom semantics:
false positives possible at a known rate, never false negatives — route
maybe-dups to an exact verifier if the FP rate matters).

Spark-native representation: the filter is a DataFrame of SET BIT
POSITIONS (distinct ints ≤ m), built by one explode → distinct — tiny
versus the corpus (≤ k·n rows, deduplicated), broadcastable, and
persistable as a parquet table that the next ingest appends to.
Membership = explode the candidate's k positions → broadcast join →
count hits per doc == k (map-side re-collapse, one slim exchange — the
same shape as ops/urlfilter and ops/decontam).

Hashes are md5-nibble Horner values (engine-portable, like
ops/sampling.hash_frac) with the hash index salted in — deterministic,
so the DuckDB oracle rebuilds filter and verdicts bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"

DEFAULT_M = 1 << 18  # bits; n=10^4 keys, k=3 -> FP ~ 5e-5
DEFAULT_K = 3


def _hash_pos(key: Column, i: int, m: int) -> Column:
    """Bit position of hash #i: first 8 md5 nibbles of ('bloom:i:'||key),
    Horner-accumulated, mod m."""
    h = F.md5(F.concat(F.lit(f"bloom:{i}:"), key.cast("string")))
    val = F.lit(0).cast("long")
    for j in range(8):
        nib = F.instr(F.lit(_HEX), F.substring(h, j + 1, 1)) - 1
        val = val * 16 + nib.cast("long")
    return (val % m).cast("long")


def _positions(key: Column, m: int, k: int) -> Column:
    return F.array(*[_hash_pos(key, i, m) for i in range(k)])


def bloom_build(
    df: DataFrame, key_col: str, m: int = DEFAULT_M, k: int = DEFAULT_K
) -> DataFrame:
    """Set-bit-position table of the Bloom filter over ``key_col``
    (md5 of the key is the inserted element). Union + distinct with a
    previous ingest's table to fold batches together."""
    return (
        df.select(
            F.explode(_positions(F.md5(F.col(key_col)), m, k)).alias("pos")
        )
        .distinct()
    )


def bloom_maybe_dup(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """(doc_id, maybe_dup): true iff ALL k positions of the doc's key are
    set in ``bloom`` — no false negatives; false positives at the
    filter's design rate. One slim exchange, history never rescanned."""
    cand = df.select(
        "doc_id",
        F.explode(_positions(F.md5(F.col(key_col)), m, k)).alias("pos"),
    )
    return (
        cand.join(
            F.broadcast(bloom.withColumn("__set", F.lit(1))), "pos", "left"
        )
        .groupBy("doc_id")
        .agg((F.sum(F.coalesce("__set", F.lit(0))) == k).alias("maybe_dup"))
    )
